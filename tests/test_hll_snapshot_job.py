"""HLL view materialization through SnapshotTable
(`streaming/hll_snapshot_job.py`): the composed contract — per-batch
atomic view commits, time travel over the view's evolution, replay
no-ops, and the crash-between-legs recovery."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.sinks.snapshots import SnapshotTable
from dataworks_audit_data_ingest_spark.streaming.hll_job import (
    read_distinct_estimates,
)
from dataworks_audit_data_ingest_spark.streaming.hll_snapshot_job import (
    hll_view_microbatch,
)
from dataworks_audit_data_ingest_spark.tables import table

SF = "/root/testdata/sf0.001"


def _batches(spark, n=3):
    ev = table(spark, SF, "events").select("user_id", "event_type", "ts")
    return [ev.filter(F.col("event_id") % n == i) for i in range(n)] if (
        "event_id" in ev.columns
    ) else [ev.filter(F.col("user_id") % n == i) for i in range(n)]


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_view_tracks_store_and_time_travels(spark, tmp_path):
    store, view = str(tmp_path / "store"), str(tmp_path / "view")
    batches = _batches(spark)

    heads = []
    for i, b in enumerate(batches):
        assert hll_view_microbatch(b, i, store, view)
        heads.append(_rows(SnapshotTable(view).read(spark)))

    t = SnapshotTable(view)
    snaps = t.snapshots()
    assert len(snaps) == len(batches)

    # HEAD == merged estimate over the full store (derivation consistent)
    want = _rows(read_distinct_estimates(spark, store))
    assert heads[-1] == want

    # time travel: snapshot k replays the view as of batch k
    for k, snap in enumerate(snaps):
        assert _rows(t.read(spark, snap["snapshot_id"])) == heads[k]

    # the view after all batches == a one-shot build over all events
    # (batch boundaries invisible — the register-merge associativity)
    full = table(spark, SF, "events").select("user_id", "event_type", "ts")
    one_store = str(tmp_path / "one")
    assert hll_view_microbatch(full, 0, one_store, str(tmp_path / "oneview"))
    assert heads[-1] == _rows(read_distinct_estimates(spark, one_store))


def test_replayed_batch_is_a_full_noop(spark, tmp_path):
    store, view = str(tmp_path / "store"), str(tmp_path / "view")
    b0, b1, _ = _batches(spark)
    assert hll_view_microbatch(b0, 0, store, view)
    assert hll_view_microbatch(b1, 1, store, view)
    head = _rows(SnapshotTable(view).read(spark))
    n_snaps = len(SnapshotTable(view).snapshots())

    # replay batch 1 (checkpoint lost after sink work finished)
    assert hll_view_microbatch(b1, 1, store, view) is False
    assert _rows(SnapshotTable(view).read(spark)) == head
    assert len(SnapshotTable(view).snapshots()) == n_snaps


def test_crash_between_store_and_view_commit_recovers(spark, tmp_path):
    """A batch that wrote its registers but died before the view commit:
    the replay rewrites the same store partitions (dynamic overwrite) and
    lands the missing view commit — the final state is indistinguishable
    from a clean run."""
    from dataworks_audit_data_ingest_spark.streaming.hll_job import (
        hll_microbatch,
    )

    store, view = str(tmp_path / "store"), str(tmp_path / "view")
    b0, b1, _ = _batches(spark)
    assert hll_view_microbatch(b0, 0, store, view)

    # simulate the crash: batch 1's store leg only
    hll_microbatch(b1, 1, store, "CAST(user_id AS STRING)")
    assert len(SnapshotTable(view).snapshots()) == 1  # view is behind

    # replay closes the gap
    assert hll_view_microbatch(b1, 1, store, view)
    assert len(SnapshotTable(view).snapshots()) == 2
    assert _rows(SnapshotTable(view).read(spark)) == _rows(
        read_distinct_estimates(spark, store)
    )
