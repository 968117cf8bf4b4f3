"""Streaming IVM-cascade drills (`streaming/cascade_job.py`): ONE
foreachBatch maintains the join view AND the rollup store it feeds.

Pinned here: (1) stream == batch-cascade == direct-recompute parity,
(2) the crash window BETWEEN the two store commits — view committed,
rollup not — converges to the clean-run state on a checkpointed
restart, (3) a drained restart is a no-op."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.incremental import (
    JoinViewSpec,
    read_join_view,
    read_join_view_delta,
    read_rollup,
    update_join_view,
    update_rollup_store,
)
from dataworks_audit_data_ingest_spark.streaming.cascade_job import (
    start_enriched_rollup_cascade_stream,
)
from dataworks_audit_data_ingest_spark.tables import table

SF = "/root/testdata/sf0.001"

SPEC = JoinViewSpec(
    key="c_custkey", left_id="o_orderkey", right_id="c_custkey", n_buckets=4
)
LEFT_COLS = ("o_orderkey", "c_custkey", "o_totalprice", "o_orderdate")
RIGHT_COLS = ("c_custkey", "c_mktsegment")
SCHEMA = (
    "side string, o_orderkey long, c_custkey long, o_totalprice double,"
    " o_orderdate date, c_mktsegment string"
)
ROLLUP_ARGS = dict(
    ts_col="o_orderdate",
    type_col="c_mktsegment",
    user_col="c_custkey",
    value_col="o_totalprice",
)


def _spill_changes(spark, src, n_chunks=3):
    orders = [
        {
            "side": "left",
            "o_orderkey": r.o_orderkey,
            "c_custkey": r.o_custkey,
            "o_totalprice": r.o_totalprice,
            "o_orderdate": str(
                r.o_orderdate.date()
                if hasattr(r.o_orderdate, "date")
                else r.o_orderdate
            ),
        }
        for r in table(spark, SF, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .limit(240)
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
    chunks = []
    for c in range(n_chunks):
        chunk = [r for i, r in enumerate(rows) if i % n_chunks == c]
        (src / f"c{c}.json").write_text(
            "\n".join(json.dumps(r) for r in chunk)
        )
        chunks.append(chunk)
    return chunks


def _start(spark, src, jv_root, rl_store, ckpt, compact_every=2):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    return start_enriched_rollup_cascade_stream(
        stream,
        jv_root,
        rl_store,
        ckpt,
        SPEC,
        left_cols=LEFT_COLS,
        right_cols=RIGHT_COLS,
        compact_every=compact_every,
        **ROLLUP_ARGS,
    )


def _batch_cascade(spark, chunks, jv_root, rl_store):
    """The q264-shape control: same chunks through the batch APIs."""
    for i, chunk in enumerate(chunks):
        rows = spark.read.schema(SCHEMA).json(
            spark.sparkContext.parallelize([json.dumps(r) for r in chunk])
        )
        ld = rows.filter(F.col("side") == "left").select(*LEFT_COLS)
        rd = rows.filter(F.col("side") == "right").select(*RIGHT_COLS)
        update_join_view(
            spark, jv_root, str(i), SPEC, left_delta=ld, right_delta=rd
        )
        delta = read_join_view_delta(spark, jv_root, str(i))
        if delta is not None:
            update_rollup_store(
                spark, rl_store, delta, str(i), **ROLLUP_ARGS
            )


def _report(spark, store):
    df = read_rollup(spark, store)
    assert df is not None
    return sorted(tuple(r) for r in df.collect())


def test_stream_equals_batch_cascade_and_direct(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    chunks = _spill_changes(spark, src)
    jv_root, rl_store = str(tmp_path / "jv"), str(tmp_path / "rl")
    ckpt = str(tmp_path / "ckpt")

    _start(spark, src, jv_root, rl_store, ckpt).awaitTermination()
    got = _report(spark, rl_store)

    # batch-cascade twin over the same chunk slicing
    bjv, brl = str(tmp_path / "bjv"), str(tmp_path / "brl")
    _batch_cascade(spark, chunks, bjv, brl)
    assert got == _report(spark, brl)

    # ground truth: one-shot join + aggregate over everything ingested
    view = read_join_view(spark, jv_root)
    cents = F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)")
    want = sorted(
        tuple(r)
        for r in view.groupBy(
            F.col("o_orderdate").alias("day"),
            F.col("c_mktsegment").alias("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("c_custkey").alias("n_users"),
            F.sum(cents).alias("sum_cents"),
            F.min(cents).alias("min_cents"),
            F.max(cents).alias("max_cents"),
        )
        .collect()
    )
    assert got == want
    assert len(got) > 0

    # drained restart is a no-op for BOTH stores
    _start(spark, src, jv_root, rl_store, ckpt).awaitTermination()
    assert _report(spark, rl_store) == got


def test_crash_between_store_commits_converges(spark, tmp_path, monkeypatch):
    """The transactionality claim: kill the job AFTER the view store
    commits batch 1 but BEFORE the rollup store does. The checkpoint has
    no commit entry for the batch, so the restart replays it; the view
    recomputes an identical delta and the rollup's dynamic overwrite
    lands exactly once."""
    import dataworks_audit_data_ingest_spark.streaming.cascade_job as cj

    src = tmp_path / "src"
    src.mkdir()
    chunks = _spill_changes(spark, src)
    jv_root, rl_store = str(tmp_path / "jv"), str(tmp_path / "rl")
    ckpt = str(tmp_path / "ckpt")

    calls = {"n": 0}
    real = cj._rl.update_rollup_store

    def flaky(spark_, store, delta, batch_id, **kw):
        calls["n"] += 1
        if calls["n"] == 2:  # batch 1: view is committed, rollup is not
            raise RuntimeError("crash between the two store commits")
        return real(spark_, store, delta, batch_id, **kw)

    monkeypatch.setattr(cj._rl, "update_rollup_store", flaky)
    q = _start(spark, src, jv_root, rl_store, ckpt, compact_every=None)
    with pytest.raises(Exception, match="crash between the two store"):
        q.awaitTermination()

    # the window is real: the view store holds batch 1, the rollup not
    import os

    assert os.path.isdir(f"{jv_root}/view/batch_id=000000000001")
    assert not os.path.isdir(f"{rl_store}/batch_id=000000000001")

    monkeypatch.setattr(cj._rl, "update_rollup_store", real)
    _start(
        spark, src, jv_root, rl_store, ckpt, compact_every=None
    ).awaitTermination()

    # converged: equals the clean control cascade
    bjv, brl = str(tmp_path / "bjv"), str(tmp_path / "brl")
    _batch_cascade(spark, chunks, bjv, brl)
    assert _report(spark, rl_store) == _report(spark, brl)
