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
    assert set(final) == set(expected)
    for uid, e in expected.items():
        assert final[uid].total_events == e.total_events
        assert final[uid].max_event_id == e.max_event_id


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
