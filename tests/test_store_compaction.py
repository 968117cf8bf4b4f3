"""Incremental-store compaction (`incremental/store.py::compact_store`):
partition-count reduction without any semantic change, exclusion of
replayable batches, idempotent re-run, and crash-window harmlessness."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.incremental.store import (
    COMPACTED_ID,
    compact_store,
)
from dataworks_audit_data_ingest_spark.tables import table
from dataworks_audit_data_ingest_spark.text.cdc import incremental_cdc_batch

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return (
        table(spark, SF, "documents")
        .filter((F.col("doc_id") < 80) & (F.length("text") >= 8))
        .select("doc_id", "text")
    )


def _drive(spark, store, upto):
    d = _docs(spark)
    for i, hi in enumerate(range(20, upto + 1, 20)):
        b = d.filter((F.col("doc_id") >= hi - 20) & (F.col("doc_id") < hi))
        incremental_cdc_batch(spark, store, b, str(i))


def _dirs(path):
    return sorted(
        x for x in os.listdir(path) if x.startswith("batch_id=")
    )


def test_compaction_preserves_novelty_semantics(spark, tmp_path):
    """After folding the old batches, the next batch's novelty verdicts are
    IDENTICAL to an uncompacted twin store's, and the partition count
    drops to compacted + the excluded (still-replayable) batch."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _drive(spark, a, 60)
    shutil.copytree(a, b)

    removed = compact_store(spark, a, exclude=("2",))
    assert removed == 2  # batches 0 and 1 folded; 2 kept replayable
    assert _dirs(a) == ["batch_id=2", f"batch_id={COMPACTED_ID}"]

    nxt = _docs(spark).filter(F.col("doc_id") >= 60)
    novel_a, stats_a = incremental_cdc_batch(spark, a, nxt, "3")
    novel_b, stats_b = incremental_cdc_batch(spark, b, nxt, "3")
    assert sorted(map(tuple, novel_a.collect())) == sorted(
        map(tuple, novel_b.collect())
    )
    assert sorted(map(tuple, stats_a.collect())) == sorted(
        map(tuple, stats_b.collect())
    )

    # a replay of the EXCLUDED batch still works on the compacted store
    # (its own partition is still separate, so the exclusion-on-read
    # discipline holds and nothing self-matches)
    b2 = _docs(spark).filter((F.col("doc_id") >= 40) & (F.col("doc_id") < 60))
    replay_novel, replay_stats = incremental_cdc_batch(spark, a, b2, "2")
    twin_novel, _ = incremental_cdc_batch(spark, b, b2, "2")
    assert sorted(map(tuple, replay_novel.collect())) == sorted(
        map(tuple, twin_novel.collect())
    )


def test_compaction_is_idempotent_and_refolds_previous(spark, tmp_path):
    store = str(tmp_path / "s")
    _drive(spark, store, 40)
    assert compact_store(spark, store) == 2
    assert _dirs(store) == [f"batch_id={COMPACTED_ID}"]
    n = spark.read.parquet(store).count()
    # nothing left to fold -> no-op
    assert compact_store(spark, store) == 0
    assert spark.read.parquet(store).count() == n
    # new batches after a compaction fold INTO the compacted partition
    nxt = _docs(spark).filter(F.col("doc_id") >= 40)
    incremental_cdc_batch(spark, store, nxt, "9")
    assert compact_store(spark, store) == 1
    assert _dirs(store) == [f"batch_id={COMPACTED_ID}"]
    st = spark.read.parquet(store)
    assert st.count() == st.select("chunk_hash").distinct().count()


def test_crash_window_duplicates_are_harmless(spark, tmp_path):
    """Simulate a crash between the fold-write and the deletes: the store
    holds duplicate membership rows (compacted + originals). Novelty
    verdicts must be unchanged, and a re-run completes the cleanup."""
    store = str(tmp_path / "s")
    _drive(spark, store, 40)
    # fold WITHOUT deleting: copy the partitions back after compacting
    backup = str(tmp_path / "bk")
    shutil.copytree(store, backup)
    compact_store(spark, store)
    for d in _dirs(backup):
        if COMPACTED_ID not in d:
            shutil.copytree(os.path.join(backup, d), os.path.join(store, d))
    assert len(_dirs(store)) == 3  # duplicates present

    nxt = _docs(spark).filter(F.col("doc_id") >= 40)
    novel, stats = incremental_cdc_batch(spark, store, nxt, "9")
    clean_novel, _ = incremental_cdc_batch(spark, backup, nxt, "9")
    assert sorted(map(tuple, novel.collect())) == sorted(
        map(tuple, clean_novel.collect())
    )
    # re-run finishes the interrupted cleanup (folds 0, 1 and batch 9)
    assert compact_store(spark, store) == 3
    assert _dirs(store) == [f"batch_id={COMPACTED_ID}"]


def test_excluded_batch_ids_compare_as_directory_strings(spark, tmp_path):
    """The two reproduced identity bugs: (a) a colon-bearing batch id
    (Hadoop %XX-escaped directory) listed in exclude must be neither
    folded nor DELETED; (b) a zero-padded id must not be folded via the
    type-inferred integer form despite an exact-string exclude."""
    store = str(tmp_path / "s")
    d = _docs(spark)
    b1 = d.filter(F.col("doc_id") < 20)
    b2 = d.filter((F.col("doc_id") >= 20) & (F.col("doc_id") < 40))
    b3 = d.filter((F.col("doc_id") >= 40) & (F.col("doc_id") < 60))
    incremental_cdc_batch(spark, store, b1, "007")
    incremental_cdc_batch(spark, store, b2, "2026-08-14T10:00")
    incremental_cdc_batch(spark, store, b3, "1")

    before = spark.read.parquet(store).count()
    removed = compact_store(
        spark, store, exclude=("007", "2026-08-14T10:00")
    )
    assert removed == 1  # only batch "1" folded
    names = _dirs(store)
    assert f"batch_id={COMPACTED_ID}" in names
    assert any("007" in n for n in names)
    assert any("2026-08-14T10" in n for n in names)  # escaped dir kept
    # no rows lost, and the excluded batches' rows still live under
    # their own partitions (replay discipline intact)
    st = spark.read.parquet(store)
    assert st.count() == before
    assert (
        st.filter(F.col("batch_id").cast("string") == "007").count() > 0
    )

    # replay of the zero-padded excluded batch: nothing self-matches
    novel, stats = incremental_cdc_batch(spark, store, b1, "007")
    assert stats.filter(F.col("n_novel") > 0).count() > 0


def test_compact_missing_store_is_noop(spark, tmp_path):
    assert compact_store(spark, str(tmp_path / "nope")) == 0


def test_int_batch_ids_coerce_and_empty_ids_reject(spark, tmp_path):
    """An int batch id must address the same partition as its string form
    (replay with either spelling excludes the own partition); an empty id
    is rejected up front — Spark would write it as
    __HIVE_DEFAULT_PARTITION__, unmatchable forever after."""
    import pytest

    store = str(tmp_path / "s")
    d = _docs(spark).filter(F.col("doc_id") < 20)
    incremental_cdc_batch(spark, store, d, 7)  # int id
    # replay with the string spelling: own partition excluded, nothing
    # self-matches, every doc still scores novel
    novel, stats = incremental_cdc_batch(spark, store, d, "7")
    assert stats.filter(F.col("n_novel") > 0).count() > 0
    with pytest.raises(ValueError, match="HIVE_DEFAULT"):
        incremental_cdc_batch(spark, store, d, "")


def test_stray_file_named_like_partition_is_foreign(spark, tmp_path):
    """A root-level FILE called batch_id=x is not a partition: it must not
    be read as parquet, folded, or recursively deleted — the store read
    raises the foreign-content error instead."""
    import pytest

    store = tmp_path / "s"
    _drive(spark, str(store), 20)
    stray = store / "batch_id=stray"
    stray.write_text("not a partition directory")
    compact_store(spark, str(store))  # must not delete or fold the file
    assert stray.exists()
    # a store consisting ONLY of stray files is foreign content
    lone = tmp_path / "lone"
    lone.mkdir()
    (lone / "batch_id=oops").write_text("x")
    with pytest.raises(ValueError, match="partitioned parquet store"):
        compact_store(spark, str(lone))


def test_guardrails_on_batch_id_and_exclude_types(spark, tmp_path):
    """None/other types are rejected (str(None) must not become a real
    'None' partition); a bare-string exclude would iterate per character
    and silently fold the replayable batch, so it raises."""
    import pytest

    store = str(tmp_path / "s")
    d = _docs(spark).filter(F.col("doc_id") < 20)
    with pytest.raises(TypeError, match="str or int"):
        incremental_cdc_batch(spark, store, d, None)
    incremental_cdc_batch(spark, store, d, "2026-08-13")
    with pytest.raises(TypeError, match="bare string"):
        compact_store(spark, store, exclude="2026-08-13")


def _write_batch_files(src, docs, n_files, start=0):
    import json

    per = (len(docs) + n_files - 1) // n_files
    for i in range(n_files):
        with open(src / f"{start + i}.json", "w") as f:
            for doc_id, text in docs[i * per : (i + 1) * per]:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")


def _run_stream(spark, src, base, ck):
    from dataworks_audit_data_ingest_spark.streaming.cdc_job import (
        start_cdc_stream,
    )

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .format("json")
        .load(str(src))
    )
    q = start_cdc_stream(
        stream, f"{base}/out", f"{base}/store", f"{base}/ck/{ck}"
    )
    q.awaitTermination(180)


def test_compaction_inside_a_live_streaming_job(spark, tmp_path):
    """The drill the compact_store docstring prescribes, end to end: run
    the streaming CDC job for N micro-batches, derive the exclude list
    FROM THE CHECKPOINT (checkpoint_replayable_ids), compact, then
    CONTINUE the same stream — novelty results must be identical to an
    uncompacted control run of the same sequence."""
    from dataworks_audit_data_ingest_spark.incremental.store import (
        checkpoint_replayable_ids,
    )

    docs = [
        (r.doc_id, r.text) for r in _docs(spark).filter("doc_id < 60").collect()
    ]
    fresh = [
        (r.doc_id, r.text)
        for r in _docs(spark).filter("doc_id >= 60").collect()
    ]
    assert len(docs) >= 9 and fresh
    # one file per stream invocation: the stream's file->batch assignment
    # is NOT deterministic under maxFilesPerTrigger when several files
    # are pending (the topk-job lesson), and cross-run comparison needs
    # identical slicing — chunk-novelty ATTRIBUTION between docs sharing
    # a chunk depends on which batch saw the chunk first
    per = (len(docs) + 2) // 3
    for name in ("a", "b"):
        (tmp_path / name).mkdir()
        (tmp_path / name / "in").mkdir()
        for i in range(3):
            _write_batch_files(
                tmp_path / name / "in", docs[i * per : (i + 1) * per], 1, start=i
            )
            _run_stream(
                spark, tmp_path / name / "in", str(tmp_path / name), "ck"
            )

    # phase 2: compact the live store in `a` with the derived exclude;
    # a clean availableNow termination leaves nothing replayable
    a = str(tmp_path / "a")
    replayable = checkpoint_replayable_ids(spark, f"{a}/ck/ck")
    assert replayable == ()
    removed = compact_store(spark, f"{a}/store", exclude=replayable)
    assert removed == 3
    assert _dirs(f"{a}/store") == [f"batch_id={COMPACTED_ID}"]

    # phase 3: the stream continues — re-arrived docs (first file's
    # content again) plus genuinely fresh ones
    rearrived_docs = docs[: len(docs) // 3]
    for name in ("a", "b"):
        for j, part in enumerate((rearrived_docs, fresh)):
            _write_batch_files(tmp_path / name / "in", part, 1, start=3 + j)
            _run_stream(
                spark, tmp_path / name / "in", str(tmp_path / name), "ck"
            )

    got, want = (
        sorted(
            map(
                tuple,
                spark.read.parquet(f"{tmp_path / n}/out/doc_stats")
                .select("doc_id", "n_chunks", "n_novel")
                .collect(),
            )
        )
        for n in ("a", "b")
    )
    assert got == want  # compaction changed NOTHING downstream
    # re-arrived docs contributed zero novel chunks post-compaction
    rearrived = {d for d, _ in rearrived_docs}
    post = spark.read.parquet(f"{a}/out/doc_stats").filter(
        F.col("batch_id").isin("3", "4") & F.col("doc_id").isin(rearrived)
    )
    assert post.count() > 0
    assert post.filter(F.col("n_novel") > 0).count() == 0
    # fresh docs were novel; store remains duplicate-free
    store = spark.read.parquet(f"{a}/store")
    assert store.count() == store.select("chunk_hash").distinct().count()


def test_checkpoint_replayable_ids_reports_uncommitted_batch(spark, tmp_path):
    """Crash-shaped checkpoint: an offsets/N entry with no commits/N twin
    is exactly the batch a restart re-runs — the derivation must surface
    it, compaction must then leave its partition alone, and the restart
    must complete with the store still consistent."""
    import os as _os

    from dataworks_audit_data_ingest_spark.incremental.store import (
        checkpoint_replayable_ids,
    )

    docs = [
        (r.doc_id, r.text) for r in _docs(spark).filter("doc_id < 60").collect()
    ]
    base = tmp_path / "c"
    base.mkdir()
    (base / "in").mkdir()
    _write_batch_files(base / "in", docs, 3)
    _run_stream(spark, base / "in", str(base), "ck")
    assert checkpoint_replayable_ids(spark, f"{base}/ck/ck") == ()

    # simulate the crash window: batch 2 planned-but-unconfirmed (a real
    # crash writes neither the commit file nor its .crc checksum twin —
    # leaving the stale .crc behind would collide with the replay's
    # rename-based commit write)
    _os.remove(base / "ck" / "ck" / "commits" / "2")
    crc = base / "ck" / "ck" / "commits" / ".2.crc"
    if crc.exists():
        _os.remove(crc)
    assert checkpoint_replayable_ids(spark, f"{base}/ck/ck") == ("2",)

    removed = compact_store(
        spark,
        f"{base}/store",
        exclude=checkpoint_replayable_ids(spark, f"{base}/ck/ck"),
    )
    assert removed == 2  # batches 0,1 folded; replayable 2 untouched
    assert _dirs(f"{base}/store") == [
        "batch_id=2",
        f"batch_id={COMPACTED_ID}",
    ]

    # restart: Spark re-runs batch 2 against its own (excluded-on-read)
    # partition — replay is a no-op rewrite, outputs stay stable
    _run_stream(spark, base / "in", str(base), "ck")
    out = spark.read.parquet(f"{base}/out/doc_stats")
    assert out.select("doc_id").distinct().count() == len(docs)
    store = spark.read.parquet(f"{base}/store")
    assert store.count() == store.select("chunk_hash").distinct().count()


def test_stream_batch_id_convention_and_replay_guard(spark, tmp_path):
    """One id convention across every streaming rung (r11 verdict #4):
    micro-batch ints commit zero-padded, and the only exception is the
    upgrade boundary — a batch the pre-padding binary already committed
    BARE replays under its bare id so the overwrite hits the same
    partition instead of duplicating rows under the padded name."""
    from pyspark.sql import functions as F

    from dataworks_audit_data_ingest_spark.incremental.store import (
        commit_batch_partition,
        pad_batch_id,
        resolve_stream_batch_id,
    )

    store = str(tmp_path / "s")
    # store not yet created -> padded from birth
    assert resolve_stream_batch_id(spark, store, 7) == pad_batch_id(7)
    assert pad_batch_id(10) > pad_batch_id(9)  # the lexicographic point

    # a pre-upgrade BARE partition for this exact batch -> bare reused
    df = spark.range(3).select(F.col("id").alias("v"))
    commit_batch_partition(df, store, "7")
    assert resolve_stream_batch_id(spark, store, 7) == "7"
    # any other batch stays padded (migration completes from here on)
    assert resolve_stream_batch_id(spark, store, 8) == pad_batch_id(8)
