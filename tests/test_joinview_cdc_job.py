"""Streaming CDC join-view drills (`streaming/joinview_cdc_job.py`):
after an op-tagged change stream (inserts, deletes, updates, a key
move) drains, the net view equals the dict-model recompute of the final
states joined; a checkpointed restart is a no-op; in-stream compaction
does not disturb; unknown op tags fail loudly; micro-batch ids are
zero-padded so batch 10 does not sort before batch 9."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.incremental import (
    JoinViewSpec,
    read_join_view_cdc,
)
from dataworks_audit_data_ingest_spark.streaming.joinview_cdc_job import (
    pad_batch_id,
    start_cdc_join_view_stream,
)

SPEC = JoinViewSpec(key="k", left_id="lid", right_id="rid", n_buckets=4)
LEFT_COLS = ("lid", "k", "lval")
RIGHT_COLS = ("rid", "k", "rval")
SCHEMA = (
    "side string, op string, lid int, rid int, k int,"
    " lval string, rval string"
)

# twelve single-row chunks -> twelve micro-batches (one file per
# trigger, the deterministic-slicing lesson), exercising insert,
# cross-batch match, value update, delete, key move, and batch id 10
# (the zero-padding regression: bare "10" < "9" lexicographically)
CHUNKS = [
    {"side": "left", "op": "upsert", "lid": 1, "k": 10, "lval": "a"},
    {"side": "right", "op": "upsert", "rid": 100, "k": 10, "rval": "X"},
    {"side": "left", "op": "upsert", "lid": 2, "k": 20, "lval": "b"},
    {"side": "right", "op": "upsert", "rid": 101, "k": 20, "rval": "Y"},
    {"side": "left", "op": "upsert", "lid": 1, "k": 10, "lval": "a2"},
    {"side": "right", "op": "delete", "rid": 101, "k": 20},
    {"side": "left", "op": "upsert", "lid": 3, "k": 10, "lval": "c"},
    {"side": "left", "op": "delete", "lid": 3, "k": 10},
    {"side": "left", "op": "upsert", "lid": 4, "k": 30, "lval": "d"},
    {"side": "right", "op": "upsert", "rid": 102, "k": 30, "rval": "Z"},
    # batch 10: the move — delete then upsert land in SEPARATE batches
    # here (stream order); same-batch moves are the batch API's drill
    {"side": "left", "op": "delete", "lid": 4, "k": 30},
    {"side": "left", "op": "upsert", "lid": 4, "k": 10, "lval": "d-moved"},
]

# final states: left {1:(10,a2), 2:(20,b), 4:(10,d-moved)};
# right {100:(10,X), 102:(30,Z)} -> pairs at k=10: (1,100), (4,100)
WANT = {(10, 1, "a2", 100, "X"), (10, 4, "d-moved", 100, "X")}


def _spill(src):
    # the file source orders by modification time in MILLISECONDS; a
    # quick write loop ties every file and the tie-break is undefined —
    # harmless for the insert-only rung (order-independent) but fatal
    # for CDC, where a delete replayed after its re-insert flips the
    # outcome. Strictly increasing mtimes pin one batch order.
    import os
    import time

    t0 = time.time() - 3600
    for i, row in enumerate(CHUNKS):
        p = src / f"c{i:02d}.json"
        p.write_text(json.dumps(row))
        os.utime(p, (t0 + i, t0 + i))


def _start(spark, src, root, ckpt, compact_every=4):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    return start_cdc_join_view_stream(
        stream,
        root,
        ckpt,
        SPEC,
        left_cols=LEFT_COLS,
        right_cols=RIGHT_COLS,
        compact_every=compact_every,
    )


def _got(spark, root):
    df = read_join_view_cdc(spark, root)
    return {
        (r.k, r.lid, r.lval, r.rid, r.rval) for r in df.collect()
    }


def test_stream_cdc_view_and_restart_noop(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _spill(src)
    root, ckpt = str(tmp_path / "jv"), str(tmp_path / "ckpt")
    _start(spark, src, root, ckpt).awaitTermination()
    assert _got(spark, root) == WANT
    # batch 10/11 landed under padded ids (the lexicographic regression)
    import os

    assert os.path.isdir(f"{root}/left/batch_id={pad_batch_id(11)}")
    _start(spark, src, root, ckpt).awaitTermination()  # drained restart
    assert _got(spark, root) == WANT


def test_unknown_op_tag_fails_loudly(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "bad.json").write_text(
        json.dumps(
            {"side": "left", "op": "upsrt", "lid": 1, "k": 1, "lval": "x"}
        )
    )
    q = _start(spark, src, str(tmp_path / "jv"), str(tmp_path / "ckpt"))
    try:
        q.awaitTermination()
        raise AssertionError("stream should have failed on the typo'd op")
    except Exception as e:
        assert "unknown tags" in str(e) or "upsrt" in str(e)
