"""Drills for offline streaming-state inspection
(`streaming/state_inspect.py`): the state read back from a checkpoint
must equal what the query's own output says it is holding, historical
batch versions must stay addressable, and the skew report must expose a
planted hot key."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.streaming.state_inspect import (
    read_streaming_state,
    state_metadata,
    state_skew_report,
)


def _run_sum_query(spark, tmp_path, files):
    src = tmp_path / "src"
    src.mkdir(exist_ok=True)
    for name, rows in files.items():
        (src / f"{name}.json").write_text(
            "\n".join(json.dumps(r) for r in rows)
        )
    stream = spark.readStream.schema("user string, v long").option(
        "maxFilesPerTrigger", 1
    ).json(str(src))
    agg = stream.groupBy("user").agg(F.sum("v").alias("total"))
    ckpt = str(tmp_path / "ckpt")
    q = (
        agg.writeStream.format("noop")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return ckpt


def test_state_equals_batch_aggregate_and_versions(spark, tmp_path):
    files = {
        "a": [{"user": f"u{i % 4}", "v": i} for i in range(40)],
        "b": [{"user": f"u{i % 6}", "v": i} for i in range(30)],
    }
    ckpt = _run_sum_query(spark, tmp_path, files)

    meta = state_metadata(spark, ckpt).collect()
    assert len(meta) == 1
    assert meta[0].operatorName == "stateStoreSave"
    assert meta[0].maxBatchId >= 1

    # latest state == a batch aggregate over everything ingested;
    # NOTE the value struct carries the PHYSICAL aggregate name ("sum"),
    # not the query's alias — state schemas are internal
    st = read_streaming_state(spark, ckpt)
    got = sorted((r.user, r["sum"]) for r in st.collect())
    all_rows = [r for rows in files.values() for r in rows]
    want = sorted(
        (r.user, r.total)
        for r in spark.createDataFrame(all_rows)
        .groupBy("user")
        .agg(F.sum("v").alias("total"))
        .collect()
    )
    assert got == want
    # flattened columns carry partition_id through
    assert {"user", "sum", "partition_id"} == set(st.columns)

    # batch 0's pinned version == aggregate over the FIRST file only
    st0 = read_streaming_state(spark, ckpt, batch_id=0)
    got0 = sorted((r.user, r["sum"]) for r in st0.collect())
    want0 = sorted(
        (r.user, r.total)
        for r in spark.createDataFrame(files["a"])
        .groupBy("user")
        .agg(F.sum("v").alias("total"))
        .collect()
    )
    assert got0 == want0


def test_skew_report_exposes_hot_partition(spark, tmp_path):
    # many distinct keys -> uniform; one key family planted per row so a
    # single SHUFFLE partition ends up holding one key each, then verify
    # totals and share arithmetic rather than hash placement (which is
    # Spark-internal)
    files = {"a": [{"user": f"u{i}", "v": i} for i in range(64)]}
    ckpt = _run_sum_query(spark, tmp_path, files)
    rep = state_skew_report(spark, ckpt)
    rows = rep.collect()
    assert sum(r.n_keys for r in rows) == 64
    assert abs(sum(r.share_milli for r in rows) - 1000) <= len(rows)
    # worst-first ordering
    assert [r.n_keys for r in rows] == sorted(
        (r.n_keys for r in rows), reverse=True
    )


def test_flatten_survives_partition_id_named_key(spark, tmp_path):
    # regression: a grouping key literally named partition_id collided
    # with the reader's own partition_id column (duplicate names ->
    # AMBIGUOUS_REFERENCE on first use)
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.json").write_text(
        "\n".join(
            json.dumps({"partition_id": f"p{i % 3}", "v": i})
            for i in range(12)
        )
    )
    stream = spark.readStream.schema("partition_id string, v long").json(
        str(src)
    )
    agg = stream.groupBy("partition_id").agg(F.sum("v").alias("total"))
    ckpt = str(tmp_path / "ckpt")
    (
        agg.writeStream.format("noop")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    st = read_streaming_state(spark, ckpt)
    assert len(st.columns) == len(set(st.columns))
    assert "key_partition_id" in st.columns and "partition_id" in st.columns
    got = sorted((r.key_partition_id, r["sum"]) for r in st.collect())
    assert got == [("p0", 18), ("p1", 22), ("p2", 26)]
    # the skew report groups by the reader's own partition_id unambiguously
    assert state_skew_report(spark, ckpt).count() >= 1
