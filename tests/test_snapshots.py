"""`sinks/snapshots.py`: snapshot isolation, time travel, rollback,
crash atomicity, vacuum, and the optimistic-concurrency conflict check."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.sinks.snapshots import (
    SnapshotConflict,
    SnapshotTable,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    )


def _ids(df):
    return sorted(r.id for r in df.collect())


def test_append_accumulates_and_overwrite_replaces(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    s0 = t.commit_append(_df(spark, 0, 5))
    s1 = t.commit_append(_df(spark, 5, 8))
    assert (s0, s1) == (0, 1)
    assert _ids(t.read(spark)) == list(range(8))
    t.commit_overwrite(_df(spark, 100, 103))
    assert _ids(t.read(spark)) == [100, 101, 102]


def test_time_travel_and_history(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.commit_append(_df(spark, 0, 3))
    t.commit_append(_df(spark, 3, 6))
    t.commit_overwrite(_df(spark, 9, 10))
    assert _ids(t.read(spark, snapshot_id=0)) == [0, 1, 2]
    assert _ids(t.read(spark, snapshot_id=1)) == [0, 1, 2, 3, 4, 5]
    assert _ids(t.read(spark, snapshot_id=2)) == [9]
    ops = [m["operation"] for m in t.snapshots()]
    assert ops == ["append", "append", "overwrite"]


def test_rollback_preserves_history(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.commit_append(_df(spark, 0, 3))
    t.commit_overwrite(_df(spark, 50, 51))
    new_id = t.rollback(0)
    assert new_id == 2
    assert _ids(t.read(spark)) == [0, 1, 2]
    # bad state still reachable — rollback is a new commit, not a rewrite
    assert _ids(t.read(spark, snapshot_id=1)) == [50]


def test_crashed_commit_invisible_to_readers(spark, tmp_path):
    """Data + manifest written but HEAD never swapped (crash window):
    readers stay on the old snapshot; vacuum reclaims the orphans."""
    t = SnapshotTable(str(tmp_path / "t"))
    t.commit_append(_df(spark, 0, 4))

    # Simulate the crash: do everything _commit does except the swap.
    files = t._write_data(_df(spark, 1000, 2000), snapshot_id=99)
    with open(t._manifest_path(99), "w") as f:
        import json

        json.dump(
            {"snapshot_id": 99, "parent": 0, "operation": "append",
             "files": files, "schema": _df(spark, 0, 1).schema.json(),
             "committed_at": 0}, f,
        )

    assert t.current_snapshot_id() == 0
    assert _ids(t.read(spark)) == [0, 1, 2, 3]
    deleted = t.vacuum(keep_last=1)
    assert any("commit-99" in p for p in deleted)
    assert _ids(t.read(spark)) == [0, 1, 2, 3]


def test_vacuum_keeps_recent_drops_old(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.commit_overwrite(_df(spark, 0, 2))
    t.commit_overwrite(_df(spark, 2, 4))
    t.commit_append(_df(spark, 4, 6))
    deleted = t.vacuum(keep_last=2)
    # snapshot 0's files are unreferenced by snapshots 1-2 → gone
    assert any(p.startswith("data/commit-0-") for p in deleted)
    assert _ids(t.read(spark)) == [2, 3, 4, 5]
    assert _ids(t.read(spark, snapshot_id=1)) == [2, 3]
    with pytest.raises(ValueError):
        t.read(spark, snapshot_id=0)
    # history chain still walkable after re-parenting
    assert [m["snapshot_id"] for m in t.snapshots()] == [1, 2]


def test_concurrent_commit_conflict(spark, tmp_path):
    path = str(tmp_path / "t")
    a, b = SnapshotTable(path), SnapshotTable(path)
    a.commit_append(_df(spark, 0, 2))

    # b starts a commit from HEAD=0; a commits first; b must refuse.
    files = b._write_data(_df(spark, 10, 12), snapshot_id=1)
    a.commit_append(_df(spark, 5, 7))
    with pytest.raises(SnapshotConflict):
        b._swap_head(1, expected_parent=0)
    assert _ids(a.read(spark)) == [0, 1, 5, 6]
    assert files  # loser's orphans exist until vacuum
    a.vacuum(keep_last=2)
    assert not any(
        "commit-1-" in p and os.path.exists(os.path.join(path, p))
        for p in files
    ) or _ids(a.read(spark)) == [0, 1, 5, 6]


def test_read_before_any_commit_raises(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    with pytest.raises(ValueError):
        t.read(spark)


# ---------------------------------------------------------------------------
# Streaming commits (streaming/snapshot_job.py)
# ---------------------------------------------------------------------------


def _write_json_batch(path, rows, name):
    import json as _json

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")


def test_streaming_snapshot_commits_per_batch(spark, tmp_path):
    from dataworks_audit_data_ingest_spark.streaming.snapshot_job import (
        start_snapshot_stream,
    )

    src = str(tmp_path / "src")
    _write_json_batch(src, [{"id": 1}, {"id": 2}], "a.json")
    _write_json_batch(src, [{"id": 3}], "b.json")
    stream = (
        spark.readStream.schema("id long")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = start_snapshot_stream(
        stream, str(tmp_path / "table"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    t = SnapshotTable(str(tmp_path / "table"))
    assert _ids(t.read(spark)) == [1, 2, 3]
    # one atomic snapshot per micro-batch; batch ids recorded
    batch_ids = sorted(
        m["properties"]["batch_id"] for m in t.snapshots()
    )
    assert batch_ids == ["0", "1"]
    # time travel to the first micro-batch
    first = t.find_snapshot_by_property("batch_id", "0")
    assert len(t.read(spark, first["snapshot_id"]).collect()) in (1, 2)


def test_streaming_replay_is_idempotent(spark, tmp_path):
    """Fresh checkpoint + same source replays batches with the same ids;
    the table must not double-append."""
    import shutil

    from dataworks_audit_data_ingest_spark.streaming.snapshot_job import (
        start_snapshot_stream,
    )

    src = str(tmp_path / "src")
    _write_json_batch(src, [{"id": 7}, {"id": 8}], "a.json")
    table_path = str(tmp_path / "table")

    for attempt in range(2):
        ckpt = str(tmp_path / f"ckpt{attempt}")  # lost-checkpoint replay
        stream = spark.readStream.schema("id long").json(src)
        q = start_snapshot_stream(stream, table_path, ckpt)
        q.awaitTermination(120)

    t = SnapshotTable(table_path)
    assert _ids(t.read(spark)) == [7, 8]
    assert len(t.snapshots()) == 1
    shutil.rmtree(src)
