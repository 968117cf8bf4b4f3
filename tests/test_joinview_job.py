"""Streaming join-view maintenance drill (`streaming/joinview_job.py`):
after a multiplexed change stream drains, the standing view equals a
from-scratch join over every change ingested, an in-stream compaction
does not disturb it, and a checkpointed restart is a no-op."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.incremental import (
    JoinViewSpec,
    read_join_view,
)
from dataworks_audit_data_ingest_spark.streaming.joinview_job import (
    start_join_view_maintenance_stream,
)
from dataworks_audit_data_ingest_spark.tables import table

SF = "/root/testdata/sf0.001"

SPEC = JoinViewSpec(
    key="c_custkey", left_id="o_orderkey", right_id="c_custkey", n_buckets=4
)
LEFT_COLS = ("o_orderkey", "c_custkey", "o_totalprice")
RIGHT_COLS = ("c_custkey", "c_mktsegment")
SCHEMA = (
    "side string, o_orderkey long, c_custkey long, o_totalprice double,"
    " c_mktsegment string"
)


def _spill_changes(spark, src, n_chunks=3):
    """Interleave order (left) and customer (right) inserts across chunk
    files so matches arrive in every order: left-first, right-first,
    same-batch."""
    orders = [
        {
            "side": "left",
            "o_orderkey": r.o_orderkey,
            "c_custkey": r.o_custkey,
            "o_totalprice": r.o_totalprice,
        }
        for r in table(spark, SF, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(300)
        .collect()
    ]
    custs = [
        {
            "side": "right",
            "c_custkey": r.c_custkey,
            "c_mktsegment": r.c_mktsegment,
        }
        for r in table(spark, SF, "customer")
        .select("c_custkey", "c_mktsegment")
        .collect()
    ]
    rows = orders + custs
    for c in range(n_chunks):
        chunk = [r for i, r in enumerate(rows) if i % n_chunks == c]
        (src / f"c{c}.json").write_text(
            "\n".join(json.dumps(r) for r in chunk)
        )
    return orders, custs


def _start(spark, src, root, ckpt):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    return start_join_view_maintenance_stream(
        stream,
        root,
        ckpt,
        SPEC,
        left_cols=LEFT_COLS,
        right_cols=RIGHT_COLS,
        compact_every=2,
    )


def test_stream_view_equals_batch_join_and_restart_is_noop(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    orders, custs = _spill_changes(spark, src)
    root = str(tmp_path / "jv")
    ckpt = str(tmp_path / "ckpt")

    _start(spark, src, root, ckpt).awaitTermination()

    got = read_join_view(spark, root)
    want = (
        spark.createDataFrame(orders)
        .drop("side")
        .join(spark.createDataFrame(custs).drop("side"), on="c_custkey")
    )
    got = got.select(*want.columns)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    n_before = got.count()
    assert n_before > 0

    # restart on the drained checkpoint: no new data, no state change
    _start(spark, src, root, ckpt).awaitTermination()
    after = read_join_view(spark, root)
    assert after.count() == n_before
    assert after.exceptAll(want).count() == 0


def test_unknown_side_tag_fails_loudly(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "bad.json").write_text(
        json.dumps(
            {
                "side": "letf",
                "o_orderkey": 1,
                "c_custkey": 1,
                "o_totalprice": 1.0,
            }
        )
    )
    q = _start(
        spark, src, str(tmp_path / "jv"), str(tmp_path / "ckpt")
    )
    try:
        q.awaitTermination()
        raise AssertionError("stream should have failed on the typo'd tag")
    except Exception as e:  # StreamingQueryException wraps the ValueError
        assert "unknown side" in str(e) or "letf" in str(e)


def test_null_side_tag_fails_loudly(spark, tmp_path):
    # regression: isin() is NULL for a NULL tag, and a bare NOT-filter
    # silently passes it over — the row would vanish from both deltas
    src = tmp_path / "src"
    src.mkdir()
    (src / "bad.json").write_text(
        json.dumps(
            {"o_orderkey": 1, "c_custkey": 1, "o_totalprice": 1.0}
        )  # no "side" field at all -> NULL tag
    )
    q = _start(spark, src, str(tmp_path / "jv"), str(tmp_path / "ckpt"))
    try:
        q.awaitTermination()
        raise AssertionError("stream should have failed on the NULL tag")
    except Exception as e:
        assert "unknown side" in str(e) or "None" in str(e)
