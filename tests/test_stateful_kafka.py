"""Custom stateful operator (applyInPandasWithState) and Kafka payload
parsing tests.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.streaming.kafka import (
    KAFKA_WIRE_SCHEMA,
    parse_kafka_events,
)
from dataworks_audit_data_ingest_spark.streaming.stateful import (
    running_user_profiles,
)
from dataworks_audit_data_ingest_spark.streaming import stream_events_json
from dataworks_audit_data_ingest_spark.tables import table

SF = "/root/testdata/sf0.001"


def test_stateful_profiles_accumulate_across_microbatches(spark, tmp_path):
    """Two files × maxFilesPerTrigger=1 ⇒ two micro-batches; the final state
    must equal the batch-computed totals — state genuinely carried over."""
    src = tmp_path / "ev"
    src.mkdir()
    rows = table(spark, SF, "events").filter(F.col("user_id") < 20).collect()
    half = len(rows) // 2
    for name, chunk in (("a.json", rows[:half]), ("b.json", rows[half:])):
        with open(src / name, "w") as f:
            for r in chunk:
                f.write(
                    json.dumps(
                        {
                            "event_id": r.event_id,
                            "ts": r.ts.isoformat(sep=" "),
                            "user_id": r.user_id,
                            "event_type": r.event_type,
                            "value": r.value,
                            "props": r.props,
                        }
                    )
                    + "\n"
                )
    stream = stream_events_json(spark, str(src), max_files_per_trigger=1)
    q = (
        running_user_profiles(stream)
        .writeStream.format("memory")
        .queryName("profiles")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert len(q.recentProgress) >= 2  # proves multiple micro-batches ran

    # last emitted row per user = final state
    final = {
        r.user_id: r
        for r in spark.sql(
            """
            SELECT user_id, total_events, total_value_micros, max_event_id
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                               ORDER BY total_events DESC) rn
                  FROM profiles) WHERE rn = 1
            """
        ).collect()
    }
    expected = {
        r.user_id: r
        for r in (
            table(spark, SF, "events")
            .filter(F.col("user_id") < 20)
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("total_events"),
                F.max("event_id").alias("max_event_id"),
            )
        ).collect()
    }
    # per-event micros rounding is chunking-independent, so the exact total
    # is computable here regardless of Arrow frame boundaries
    expected_micros: dict[int, int] = {}
    for r in rows:
        expected_micros[r.user_id] = expected_micros.get(r.user_id, 0) + int(
            round(r.value * 1_000_000)
        )
    assert set(final) == set(expected)
    for uid, e in expected.items():
        assert final[uid].total_events == e.total_events
        assert final[uid].max_event_id == e.max_event_id
        assert final[uid].total_value_micros == expected_micros[uid]


def test_tws_profiles_match_v1_and_batch(spark, tmp_path):
    """transformWithStateInPandas twin: same two-micro-batch drive as the
    v1 test; final per-user state must equal the batch aggregate. Pins the
    v1/v2 interchangeability claim and that the RocksDB state store (a
    transformWithState requirement, and the provider of record for large
    state) works in this build.

    Environment gate: transformWithState's Python state server speaks
    protobuf to the JVM (pyspark.sql.streaming.proto); without the
    ``protobuf`` package the streaming runner init crashes
    (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE). Skip cleanly when
    absent — same posture as the Kafka connector jar."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState state server requires protobuf "
        "(absent in this container; operator wiring is still exercised "
        "by test_tws_operator_assembles)",
    )
    from dataworks_audit_data_ingest_spark.streaming.stateful import (
        running_user_profiles_v2,
    )

    src = tmp_path / "ev"
    src.mkdir()
    rows = table(spark, SF, "events").filter(F.col("user_id") < 20).collect()
    half = len(rows) // 2
    for name, chunk in (("a.json", rows[:half]), ("b.json", rows[half:])):
        with open(src / name, "w") as f:
            for r in chunk:
                f.write(
                    json.dumps(
                        {
                            "event_id": r.event_id,
                            "ts": r.ts.isoformat(sep=" "),
                            "user_id": r.user_id,
                            "event_type": r.event_type,
                            "value": r.value,
                            "props": r.props,
                        }
                    )
                    + "\n"
                )

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    rocksdb = (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )
    before = spark.conf.get(provider_key, None)
    spark.conf.set(provider_key, rocksdb)
    try:
        stream = stream_events_json(spark, str(src), max_files_per_trigger=1)
        q = (
            running_user_profiles_v2(stream)
            .writeStream.format("memory")
            .queryName("profiles_v2")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        if before is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, before)
    assert len(q.recentProgress) >= 2

    final = {
        r.user_id: r
        for r in spark.sql(
            """
            SELECT user_id, total_events, total_value_micros, max_event_id
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                               ORDER BY total_events DESC) rn
                  FROM profiles_v2) WHERE rn = 1
            """
        ).collect()
    }
    expected = {
        r.user_id: r
        for r in (
            table(spark, SF, "events")
            .filter(F.col("user_id") < 20)
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("total_events"),
                F.max("event_id").alias("max_event_id"),
            )
        ).collect()
    }
    expected_micros: dict[int, int] = {}
    for r in rows:
        expected_micros[r.user_id] = expected_micros.get(r.user_id, 0) + int(
            round(r.value * 1_000_000)
        )
    assert set(final) == set(expected)
    for uid, e in expected.items():
        assert final[uid].total_events == e.total_events
        assert final[uid].max_event_id == e.max_event_id
        assert final[uid].total_value_micros == expected_micros[uid]


def test_tws_operator_assembles(spark, tmp_path):
    """Plan-time wiring of the transformWithStateInPandas operator: the
    streaming DataFrame assembles with the contract output schema without
    launching the Python state server (which needs protobuf — see the
    skip in test_tws_profiles_match_v1_and_batch)."""
    from dataworks_audit_data_ingest_spark.streaming.stateful import (
        running_user_profiles_v2,
    )

    src = tmp_path / "ev"
    src.mkdir()
    (src / "a.json").write_text(
        json.dumps(
            {
                "event_id": 1,
                "ts": "2024-01-01 00:00:00",
                "user_id": 1,
                "event_type": "t",
                "value": 1.0,
                "props": "{}",
            }
        )
        + "\n"
    )
    out = running_user_profiles_v2(stream_events_json(spark, str(src)))
    assert out.isStreaming
    assert dict(out.dtypes) == {
        "user_id": "bigint",
        "total_events": "bigint",
        "total_value_micros": "bigint",
        "max_event_id": "bigint",
    }


def test_parse_kafka_events_wire_format(spark):
    good = json.dumps(
        {
            "event_id": 7,
            "ts": "2024-01-02 03:04:05",
            "user_id": 42,
            "event_type": "purchase",
            "value": 9.5,
            "props": '{"k": 1}',
        }
    ).encode()
    corrupt = b"not json at all"
    kafka_rows = spark.createDataFrame(
        [
            (b"k1", good, "audit", 0, 100, None, 0),
            (b"k2", corrupt, "audit", 0, 101, None, 0),
        ],
        KAFKA_WIRE_SCHEMA,
    )
    out = parse_kafka_events(kafka_rows).collect()
    by_offset = {r.offset: r for r in out}
    assert by_offset[100].event_id == 7
    assert by_offset[100].event_type == "purchase"
    assert by_offset[100].user_id == 42
    # corrupt payload quarantined as NULL fields, stream not failed
    assert by_offset[101].event_id is None


def test_kafka_wire_graph_matches_q30_batch(spark, tmp_path):
    """Full parse→window→sink parity: events serialized into Kafka's exact
    wire schema (binary JSON value + topic/partition/offset coordinates),
    streamed through parse_kafka_events and the q30 tumbling-daily window
    into a parquet sink — results must equal the q30 batch query on the same
    data. This drives everything but the broker socket; read_kafka swaps in
    format("kafka") for the file source with the connector jar present."""
    from dataworks_audit_data_ingest_spark.queries import all_queries
    from dataworks_audit_data_ingest_spark.queries.base import dsum

    wire_dir = str(tmp_path / "wire")
    ckpt = str(tmp_path / "ckpt")

    ev = table(spark, SF, "events")
    (
        ev.select(
            F.encode(F.col("event_id").cast("string"), "UTF-8").alias("key"),
            F.encode(
                F.to_json(
                    F.struct("event_id", "ts", "user_id", "event_type", "value", "props")
                ),
                "UTF-8",
            ).alias("value"),
            F.lit("audit").alias("topic"),
            (F.col("event_id") % 4).cast("int").alias("partition"),
            F.col("event_id").alias("offset"),
            F.col("ts").cast("timestamp").alias("timestamp"),
            F.lit(0).alias("timestampType"),
        )
        .repartition(3)
        .write.parquet(wire_dir)
    )

    wire_stream = spark.readStream.schema(KAFKA_WIRE_SCHEMA).parquet(wire_dir)
    windowed = (
        parse_kafka_events(wire_stream)
        .withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.expr(dsum("value", "sum_value")))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    # append mode would hold back windows newer than the watermark when the
    # bounded stream ends — complete mode emits every window, which is what
    # the batch comparison needs (a live pipeline keeps append + parquet)
    (
        windowed.writeStream.format("memory")
        .queryName("kafka_wire_q30")
        .option("checkpointLocation", ckpt)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
        .awaitTermination(300)
    )

    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.table("kafka_wire_q30").collect()
    }
    expect = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in all_queries()["q30_tumbling_daily"].fn(spark, SF).collect()
    }
    assert got == expect


def test_read_kafka_documents_connector_requirement(spark):
    """read_kafka needs the spark-sql-kafka connector jar; with it absent
    the failure must be the well-known missing-data-source error (the CI
    requirement: submit with --packages org.apache.spark:spark-sql-kafka).
    With the jar on the classpath this test instead exercises reader
    assembly (no broker contact happens until .start())."""
    from dataworks_audit_data_ingest_spark.streaming.kafka import read_kafka

    try:
        df = read_kafka(spark, "localhost:9092", "audit-topic")
    except Exception as exc:  # jar absent: documented failure mode
        msg = str(exc)
        assert "kafka" in msg.lower(), msg
        pytest.skip("spark-sql-kafka connector not on classpath (expected in CI)")
    assert df.isStreaming and dict(df.dtypes)["value"] == "binary"
