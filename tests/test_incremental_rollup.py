"""Drills for the incremental rollup store (`incremental/rollup.py`):

- incremental == batch recompute after EVERY batch (late data included);
- replay idempotency (same batch re-committed, report unchanged);
- additive compaction: report identical before/after, partitions folded,
  exclude honored;
- compaction crash points (sidecar-only; fold-written-no-GC) leave
  readers consistent and a re-run converges;
- GDPR forget == batch recompute over the filtered events;
- the update path never reads the store (write-only hot path).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.incremental.rollup import (
    _COMPACT_PREFIX,
    compact_rollup_store,
    forget_user_from_rollup,
    read_rollup,
    read_rollup_grain,
    update_rollup_store,
)
from dataworks_audit_data_ingest_spark.tables import table

SF = "/root/testdata/sf0.001"


def _batches(spark, n=3):
    """Deterministic n-way split of the events fixture; every slice holds
    a mix of days (so 'late data' — an old day arriving in a new batch —
    is exercised by construction)."""
    ev = table(spark, SF, "events")
    return [
        ev.filter(F.pmod(F.xxhash64("event_id"), F.lit(n)) == i).localCheckpoint()
        for i in range(n)
    ]


def _report_rows(spark, store):
    rep = read_rollup(spark, store)
    assert rep is not None
    return sorted(tuple(r) for r in rep.collect())


def _batch_recompute(df):
    cents = F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)")
    return sorted(
        tuple(r)
        for r in df.select(
            F.to_date("ts").alias("day"),
            "event_type",
            "user_id",
            cents.alias("cents"),
        )
        .groupBy("day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum("cents").alias("sum_cents"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
        .collect()
    )


def test_incremental_equals_batch_after_every_batch(spark, tmp_path):
    store = str(tmp_path / "rollup")
    batches = _batches(spark)
    seen = None
    for i, b in enumerate(batches):
        update_rollup_store(spark, store, b, str(i))
        seen = b if seen is None else seen.unionByName(b)
        assert _report_rows(spark, store) == _batch_recompute(seen)


def test_replay_is_idempotent(spark, tmp_path):
    store = str(tmp_path / "rollup")
    batches = _batches(spark)
    for i, b in enumerate(batches):
        update_rollup_store(spark, store, b, str(i))
    before = _report_rows(spark, store)
    update_rollup_store(spark, store, batches[1], "1")  # replay
    assert _report_rows(spark, store) == before


def test_compaction_preserves_report_and_folds(spark, tmp_path):
    store = str(tmp_path / "rollup")
    batches = _batches(spark)
    for i, b in enumerate(batches):
        update_rollup_store(spark, store, b, str(i))
    before = _report_rows(spark, store)
    grain_before = sorted(
        tuple(r) for r in read_rollup_grain(spark, store).collect()
    )
    folded = compact_rollup_store(spark, store, exclude=("2",))
    assert folded == 2  # batches 0 and 1; 2 excluded as replayable
    assert _report_rows(spark, store) == before
    assert (
        sorted(tuple(r) for r in read_rollup_grain(spark, store).collect())
        == grain_before
    )
    # the excluded batch can still replay safely after compaction
    update_rollup_store(spark, store, batches[2], "2")
    assert _report_rows(spark, store) == before
    # second compaction folds the compacted partition + batch 2
    assert compact_rollup_store(spark, store) == 2
    assert _report_rows(spark, store) == before


def test_compaction_crash_sidecar_only_is_ignored_then_aborted(
    spark, tmp_path
):
    """Crash point 1: sidecar written, fold never started. Readers ignore
    it; the next compaction aborts it and folds cleanly."""
    store = str(tmp_path / "rollup")
    for i, b in enumerate(_batches(spark)):
        update_rollup_store(spark, store, b, str(i))
    before = _report_rows(spark, store)
    spark.createDataFrame(
        [("0", "__compacted_deadbeef__"), ("1", "__compacted_deadbeef__")],
        "folded_id string, target string",
    ).coalesce(1).write.parquet(f"{store}/{_COMPACT_PREFIX}deadbeef")
    assert _report_rows(spark, store) == before  # target absent: originals live
    assert compact_rollup_store(spark, store) == 3
    assert _report_rows(spark, store) == before
    import os

    assert not any(
        n.startswith(_COMPACT_PREFIX) for n in os.listdir(store)
    )


def test_compaction_crash_after_fold_before_gc_is_consistent(
    spark, tmp_path
):
    """Crash point 2: fold written (visible), GC of claimed originals not
    done. Readers must already exclude the originals (no double count);
    a re-run completes the GC. The pre-GC state is reconstructed from a
    completed compaction by restoring a claimed original partition and
    its sidecar — byte-identical to a crash between fold and GC."""
    import os

    store = str(tmp_path / "rollup")
    for i, b in enumerate(_batches(spark)):
        update_rollup_store(spark, store, b, str(i))
    before = _report_rows(spark, store)
    folded = compact_rollup_store(spark, store)
    assert folded == 3
    target = next(
        n.split("=", 1)[1]
        for n in os.listdir(store)
        if n.startswith("batch_id=__compacted_")
    )
    b0 = _batches(spark)[0]
    from dataworks_audit_data_ingest_spark.incremental.rollup import (
        rollup_partials,
    )
    from dataworks_audit_data_ingest_spark.incremental.store import (
        commit_batch_partition,
    )

    commit_batch_partition(rollup_partials(b0), store, "0")
    spark.createDataFrame(
        [("0", target)], "folded_id string, target string"
    ).coalesce(1).write.parquet(f"{store}/{_COMPACT_PREFIX}cafecafe")
    # reader: target complete -> claimed original excluded -> no double count
    assert _report_rows(spark, store) == before
    # re-run completes the GC and folds nothing new (single live partition)
    assert compact_rollup_store(spark, store) == 0
    assert _report_rows(spark, store) == before
    assert "batch_id=0" not in os.listdir(store)
    assert not any(n.startswith(_COMPACT_PREFIX) for n in os.listdir(store))


def test_forget_user_equals_filtered_batch_recompute(spark, tmp_path):
    store = str(tmp_path / "rollup")
    ev = table(spark, SF, "events")
    batches = _batches(spark)
    for i, b in enumerate(batches):
        update_rollup_store(spark, store, b, str(i))
    subjects = ev.select("user_id").distinct().orderBy("user_id").limit(3)
    subject_ids = [r.user_id for r in subjects.collect()]
    removed = forget_user_from_rollup(spark, store, subjects)
    assert sum(removed.values()) > 0
    survivors = ev.filter(~F.col("user_id").isin(subject_ids))
    assert _report_rows(spark, store) == _batch_recompute(survivors)
    # idempotent
    assert forget_user_from_rollup(spark, store, subjects) == {}


def test_forget_composes_with_compaction(spark, tmp_path):
    store = str(tmp_path / "rollup")
    ev = table(spark, SF, "events")
    for i, b in enumerate(_batches(spark)):
        update_rollup_store(spark, store, b, str(i))
    compact_rollup_store(spark, store)
    subjects = ev.select("user_id").distinct().orderBy("user_id").limit(2)
    subject_ids = [r.user_id for r in subjects.collect()]
    forget_user_from_rollup(spark, store, subjects)
    survivors = ev.filter(~F.col("user_id").isin(subject_ids))
    assert _report_rows(spark, store) == _batch_recompute(survivors)


def test_update_path_is_write_only(spark, tmp_path, monkeypatch):
    """The hot path must not read the store: poison the read helpers and
    update anyway."""
    import dataworks_audit_data_ingest_spark.incremental.rollup as R

    store = str(tmp_path / "rollup")

    def boom(*a, **k):  # pragma: no cover - called == failure
        raise AssertionError("update path read the store")

    monkeypatch.setattr(R, "_live_partition_dirs", boom)
    monkeypatch.setattr(R, "_list_partitions", boom)
    b = _batches(spark, n=2)[0]
    update_rollup_store(spark, store, b, "0")
    monkeypatch.undo()
    assert read_rollup(spark, store) is not None


def test_read_missing_store_is_none_and_foreign_store_rejected(
    spark, tmp_path
):
    assert read_rollup(spark, str(tmp_path / "nope")) is None
    foreign = tmp_path / "foreign"
    foreign.mkdir()
    (foreign / "stray.txt").write_text("x")
    with pytest.raises(ValueError):
        read_rollup(spark, str(foreign))


def test_q254_partition_invariant(spark):
    from dataworks_audit_data_ingest_spark.queries.streaming_shaped import (
        q254_rollup_store_report,
    )

    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        rows = {}
        for n in ("7", before):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            rows[n] = [
                tuple(r) for r in q254_rollup_store_report(spark, SF).collect()
            ]
        assert rows["7"] == rows[before]
        assert rows[before]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)


def test_escaped_batch_ids_survive_compaction(spark, tmp_path):
    """Batch ids with characters Hadoop %XX-escapes in partition paths
    (':') must round-trip through update → compact → read; the GC pass
    addresses directories through the listing, not rebuilt raw paths."""
    store = str(tmp_path / "rollup")
    batches = _batches(spark)
    ids = ("day:2026-08-14", "day:2026-08-15", "day:2026-08-16")
    for bid, b in zip(ids, batches):
        update_rollup_store(spark, store, b, bid)
    before = _report_rows(spark, store)
    assert compact_rollup_store(spark, store) == 3
    assert _report_rows(spark, store) == before
    import os

    names = os.listdir(store)
    assert not any(n.startswith(_COMPACT_PREFIX) for n in names)
    assert sum(n.startswith("batch_id=__compacted_") for n in names) == 1
    # the escaped originals are gone (GC really found them)
    assert not any("day" in n for n in names)


def test_torn_sidecar_ignored_and_aborted(spark, tmp_path):
    """A sidecar directory WITHOUT its own _SUCCESS (crash during the
    sidecar write — before any fold write) is invisible to readers and
    deleted by the next resolution; a complete sidecar that fails to
    READ must propagate, not be swallowed (the family discipline)."""
    import os

    store = str(tmp_path / "rollup")
    for i, b in enumerate(_batches(spark)):
        update_rollup_store(spark, store, b, str(i))
    before = _report_rows(spark, store)
    torn = f"{store}/{_COMPACT_PREFIX}torn00"
    os.makedirs(torn)
    with open(f"{torn}/part-00000.parquet", "wb") as f:
        f.write(b"\x00garbage, not parquet")  # no _SUCCESS alongside
    assert _report_rows(spark, store) == before  # reader ignores it
    assert compact_rollup_store(spark, store) == 3  # resolver aborted it
    assert not any(
        n.startswith(_COMPACT_PREFIX) for n in os.listdir(store)
    )
    assert _report_rows(spark, store) == before


def test_complete_sidecar_read_error_propagates(spark, tmp_path):
    """Corrupt parquet UNDER a _SUCCESS-complete sidecar is a real IO
    problem: both the reader and the compactor must raise, never treat
    the store as sidecar-free (which would double-count a pre-GC fold)."""
    import os

    import pytest

    store = str(tmp_path / "rollup")
    for i, b in enumerate(_batches(spark, n=2)):
        update_rollup_store(spark, store, b, str(i))
    bad = f"{store}/{_COMPACT_PREFIX}badread"
    os.makedirs(bad)
    with open(f"{bad}/part-00000.parquet", "wb") as f:
        f.write(b"\x00garbage, not parquet")
    open(f"{bad}/_SUCCESS", "w").close()  # claims completeness
    with pytest.raises(Exception):
        read_rollup(spark, store)
    with pytest.raises(Exception):
        compact_rollup_store(spark, store)


def test_forget_over_pre_gc_residue_counts_once(spark, tmp_path):
    """Forget on a store left between fold-complete and GC (claimed
    originals still on disk) must resolve the compaction first: the
    subject's erasure is counted ONCE, and the report afterwards equals
    the filtered batch recompute."""
    import os

    store = str(tmp_path / "rollup")
    ev = table(spark, SF, "events")
    for i, b in enumerate(_batches(spark)):
        update_rollup_store(spark, store, b, str(i))
    assert compact_rollup_store(spark, store) == 3
    # reconstruct the pre-GC state: restore a claimed original + sidecar
    from dataworks_audit_data_ingest_spark.incremental.rollup import (
        rollup_partials,
    )
    from dataworks_audit_data_ingest_spark.incremental.store import (
        commit_batch_partition,
    )

    target = next(
        n.split("=", 1)[1]
        for n in os.listdir(store)
        if n.startswith("batch_id=__compacted_")
    )
    commit_batch_partition(rollup_partials(_batches(spark)[0]), store, "0")
    spark.createDataFrame(
        [("0", target)], "folded_id string, target string"
    ).coalesce(1).write.parquet(f"{store}/{_COMPACT_PREFIX}residue0")

    subjects = ev.select("user_id").distinct().orderBy("user_id").limit(2)
    subject_ids = [r.user_id for r in subjects.collect()]
    # the subject's grain rows exist ONCE per (day, type) after resolution;
    # a blind sweep over the residue would count them twice
    expected_once = (
        rollup_partials(ev)
        .filter(F.col("user_id").isin(subject_ids))
        .count()
    )
    removed = forget_user_from_rollup(spark, store, subjects)
    assert sum(removed.values()) == expected_once
    survivors = ev.filter(~F.col("user_id").isin(subject_ids))
    assert _report_rows(spark, store) == _batch_recompute(survivors)


def test_fully_forgotten_store_reads_as_none(spark, tmp_path):
    """Erasing every subject leaves a store directory with no live
    partitions — legitimately empty state, read as None (no maintained
    state), not an error."""
    store = str(tmp_path / "rollup")
    ev = table(spark, SF, "events")
    update_rollup_store(spark, store, _batches(spark, n=1)[0], "0")
    everyone = ev.select("user_id").distinct()
    removed = forget_user_from_rollup(spark, store, everyone)
    assert sum(removed.values()) > 0
    assert read_rollup(spark, store) is None


# ---------------------------------------------------------------------------
# property: for ANY rows and ANY batch slicing, the maintained report
# equals the single-pass recompute, before and after compaction
# ---------------------------------------------------------------------------

import math
import shutil
import tempfile
from datetime import date, datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_ROW = st.tuples(
    st.integers(0, 2),                      # day index
    st.integers(0, 1),                      # type index
    st.integers(0, 3),                      # user index
    st.one_of(st.none(), st.integers(-10_000, 10_000)),  # cents or NULL
)


@given(
    rows=st.lists(_ROW, min_size=1, max_size=30),
    n_batches=st.integers(1, 3),
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_rollup_merge_property(spark, rows, n_batches):
    data = [
        (
            datetime(2026, 1, d + 1, 12, 0, 0),
            f"type_{t}",
            u,
            (c / 100.0) if c is not None else None,
            i,
        )
        for i, (d, t, u, c) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "ts timestamp, event_type string, user_id long, "
        "value double, event_id long"
    )
    store = tempfile.mkdtemp(prefix="rollup_prop_") + "/store"
    try:
        for b in range(n_batches):
            batch = df.filter(F.pmod(F.col("event_id"), F.lit(n_batches)) == b)
            update_rollup_store(spark, store, batch, str(b))
        got = _report_rows(spark, store)

        # pure-python model over the same rows (same IEEE cents formula)
        model: dict = {}
        for d, t, u, c in rows:
            key = (date(2026, 1, d + 1), f"type_{t}")
            m = model.setdefault(
                key, {"n": 0, "users": set(), "cents": []}
            )
            m["n"] += 1
            m["users"].add(u)
            if c is not None:
                m["cents"].append(math.floor((c / 100.0) * 100 + 0.5))
        want = sorted(
            (
                day,
                typ,
                m["n"],
                len(m["users"]),
                sum(m["cents"]) if m["cents"] else None,
                min(m["cents"]) if m["cents"] else None,
                max(m["cents"]) if m["cents"] else None,
            )
            for (day, typ), m in model.items()
        )
        assert got == want
        compact_rollup_store(spark, store)
        assert _report_rows(spark, store) == want
    finally:
        shutil.rmtree(store.rsplit("/", 1)[0], ignore_errors=True)


def test_coarser_report_grains_match_recompute(spark, tmp_path):
    """One store serves any grain coarser than (day, type, user): the
    by=('event_type',) and by=('day',) reports equal direct recomputes."""
    store = str(tmp_path / "rollup")
    ev = table(spark, SF, "events")
    for i, b in enumerate(_batches(spark)):
        update_rollup_store(spark, store, b, str(i))
    cents = F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)")
    base = ev.select(
        F.to_date("ts").alias("day"), "event_type", "user_id",
        cents.alias("cents"),
    )
    for by in (("event_type",), ("day",)):
        got = sorted(
            tuple(r) for r in read_rollup(spark, store, by=by).collect()
        )
        want = sorted(
            tuple(r)
            for r in base.groupBy(*by)
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.countDistinct("user_id").alias("n_users"),
                F.sum("cents").alias("sum_cents"),
                F.min("cents").alias("min_cents"),
                F.max("cents").alias("max_cents"),
            )
            .collect()
        )
        assert got == want


def test_compact_with_everything_excluded_is_noop(spark, tmp_path):
    store = str(tmp_path / "rollup")
    for i, b in enumerate(_batches(spark)):
        update_rollup_store(spark, store, b, str(i))
    before = _report_rows(spark, store)
    assert compact_rollup_store(spark, store, exclude=("0", "1", "2")) == 0
    assert _report_rows(spark, store) == before


def test_forget_writes_audit_manifest(spark, tmp_path):
    store = str(tmp_path / "rollup")
    audit = str(tmp_path / "audit")
    ev = table(spark, SF, "events")
    update_rollup_store(spark, store, _batches(spark, n=1)[0], "0")
    subjects = ev.select("user_id").distinct().orderBy("user_id").limit(1)
    removed = forget_user_from_rollup(
        spark, store, subjects, audit_path=audit
    )
    rows = spark.read.parquet(audit).collect()
    assert len(rows) == 1
    assert rows[0].n_affected == sum(removed.values()) > 0
