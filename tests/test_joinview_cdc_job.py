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


SEQ_SCHEMA = SCHEMA + ", seq long"

# one micro-batch, physically SHUFFLED (a multi-partition source's
# interleaving), logically ordered by seq. Exercises: the Debezium
# same-key UPDATE encoding (delete old image + insert new image — the
# batch API's ambiguous clash), insert-then-delete (net absent), and a
# key move with a later re-ordering.
SEQ_ROWS = [  # written in this scrambled order on purpose
    {"side": "left", "op": "upsert", "lid": 1, "k": 10, "lval": "a2", "seq": 4},
    {"side": "left", "op": "delete", "lid": 2, "k": 20, "seq": 6},
    {"side": "right", "op": "upsert", "rid": 100, "k": 10, "rval": "X", "seq": 2},
    {"side": "left", "op": "upsert", "lid": 3, "k": 10, "lval": "c-moved", "seq": 10},
    {"side": "left", "op": "delete", "lid": 1, "k": 10, "seq": 3},
    {"side": "left", "op": "upsert", "lid": 2, "k": 20, "lval": "b", "seq": 5},
    {"side": "left", "op": "upsert", "lid": 1, "k": 10, "lval": "a", "seq": 1},
    {"side": "right", "op": "upsert", "rid": 101, "k": 20, "rval": "Y", "seq": 7},
    {"side": "left", "op": "upsert", "lid": 3, "k": 20, "lval": "c", "seq": 8},
    {"side": "left", "op": "delete", "lid": 3, "k": 20, "seq": 9},
]
# resolved final states: left {1:(10,a2), 3:(10,c-moved)} (lid 2
# insert-then-delete nets to absent), right {100, 101} -> pairs at k=10
SEQ_WANT = {(10, 1, "a2", 100, "X"), (10, 3, "c-moved", 100, "X")}


def _start_seq(spark, src, root, ckpt, seq_col):
    stream = spark.readStream.schema(SEQ_SCHEMA).json(str(src))
    return start_cdc_join_view_stream(
        stream,
        root,
        ckpt,
        SPEC,
        left_cols=LEFT_COLS,
        right_cols=RIGHT_COLS,
        seq_col=seq_col,
    )


def test_seq_col_resolves_within_batch_reorder(spark, tmp_path):
    """r11 ADVICE: with a monotone sequence column the job resolves a
    reordered multi-op micro-batch to its final op per (side, key, id)
    — including the Debezium update encoding — instead of either
    corrupting the z-set or rejecting the batch."""
    src = tmp_path / "src"
    src.mkdir()
    (src / "batch.json").write_text(
        "\n".join(json.dumps(r) for r in SEQ_ROWS)
    )
    root, ckpt = str(tmp_path / "jv"), str(tmp_path / "ckpt")
    _start_seq(spark, src, root, ckpt, "seq").awaitTermination()
    assert _got(spark, root) == SEQ_WANT


def test_same_feed_without_seq_is_rejected_loudly(spark, tmp_path):
    """The identical one-batch feed WITHOUT seq resolution must fail
    with the ambiguity error (naming the Debezium encoding), not
    silently pick an order."""
    src = tmp_path / "src"
    src.mkdir()
    (src / "batch.json").write_text(
        "\n".join(json.dumps(r) for r in SEQ_ROWS)
    )
    q = _start_seq(
        spark, src, str(tmp_path / "jv"), str(tmp_path / "ckpt"), None
    )
    try:
        q.awaitTermination()
        raise AssertionError("un-sequenced ambiguous batch must fail")
    except Exception as e:
        # whichever batch-contract guard fires first (the duplicate-
        # upsert-id check precedes the upsert+delete clash), the feed
        # is rejected loudly rather than silently picking an order
        msg = str(e)
        assert (
            "Debezium" in msg or "ambiguous" in msg or "repeats" in msg
        )


def test_seq_tie_on_same_version_fails_loudly(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    rows = [
        {"side": "left", "op": "upsert", "lid": 1, "k": 10, "lval": "a", "seq": 1},
        {"side": "left", "op": "delete", "lid": 1, "k": 10, "seq": 1},
    ]
    (src / "batch.json").write_text("\n".join(json.dumps(r) for r in rows))
    q = _start_seq(
        spark, src, str(tmp_path / "jv"), str(tmp_path / "ckpt"), "seq"
    )
    try:
        q.awaitTermination()
        raise AssertionError("tied top seq must fail")
    except Exception as e:
        assert "unrecoverable" in str(e) or "seq" in str(e)


def test_seq_cross_batch_misorder_fails_loudly(spark, tmp_path):
    """Round 12: seq_col is enforced ACROSS micro-batches too — the op
    log keeps each version's latest seq (tombstones included), so a
    feed that re-orders a delete after its row's later re-insert into
    the NEXT micro-batch fails with the out-of-order error instead of
    leaving a stale version alive."""
    import os
    import time

    src = tmp_path / "src"
    src.mkdir()
    rows = [
        {"side": "left", "op": "upsert", "lid": 1, "k": 10,
         "lval": "v2", "seq": 5},
        # the stale delete of v1 arrives in the NEXT micro-batch
        {"side": "left", "op": "delete", "lid": 1, "k": 10, "seq": 4},
    ]
    t0 = time.time() - 3600
    for i, row in enumerate(rows):
        p = src / f"c{i}.json"
        p.write_text(json.dumps(row))
        os.utime(p, (t0 + i, t0 + i))
    stream = (
        spark.readStream.schema(SEQ_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = start_cdc_join_view_stream(
        stream,
        str(tmp_path / "jv"),
        str(tmp_path / "ckpt"),
        SPEC,
        left_cols=LEFT_COLS,
        right_cols=RIGHT_COLS,
        seq_col="seq",
    )
    try:
        q.awaitTermination()
        raise AssertionError("cross-batch misordered feed must fail")
    except Exception as e:
        assert "OUT OF ORDER" in str(e)
