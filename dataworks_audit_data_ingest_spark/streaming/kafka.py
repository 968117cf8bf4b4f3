"""Kafka source wiring — the production stream the reference's data came
from ("UC Kafka audit data", `README.md:5`; BASELINE.json north_star:
"Structured Streaming with Kafka source + S3 sink").

No broker exists in the test environment, so construction and payload
parsing are split: ``parse_kafka_events`` is pure DataFrame code, unit-tested
against statically-built rows with Kafka's exact wire schema; ``read_kafka``
only assembles the reader (requires the spark-sql-kafka package at submit
time: ``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<version>``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .jobs import EVENT_SCHEMA

# Kafka's fixed source schema, for reference and tests.
KAFKA_WIRE_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int"
)


def read_kafka(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Raw Kafka stream reader (requires the Kafka connector on the
    classpath; driver-side config only, no broker contact until start())."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    return reader.load()


def parse_kafka_events(kafka_df: DataFrame) -> DataFrame:
    """Kafka wire rows → typed event rows: cast value to string, parse JSON
    with the shared event schema, keep the Kafka coordinates for exactly-once
    bookkeeping. PERMISSIVE parsing surfaces corrupt payloads as NULL-field
    rows rather than failing the stream (filter on ``event_id IS NULL`` to
    quarantine them)."""
    return kafka_df.select(
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        F.from_json(F.col("value").cast("string"), EVENT_SCHEMA).alias("e"),
    ).select("topic", "partition", "offset", "e.*")
