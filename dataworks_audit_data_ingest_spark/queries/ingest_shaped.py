"""Ingest-semantics queries: the reference's scan + watermark-filter behavior
(`audit_data_ingest.py:26-33` strict-``>`` resume; `:129-150` listing) and the
binary envelope shape (`:118-125`), expressed as checkable relational queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import table
from .base import dsum, register


@register(
    "q40_incremental_watermark",
    sql=f"""
    SELECT CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
           COUNT(*) AS n_events,
           {dsum('value', 'sum_value')}
    FROM events
    WHERE CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE) > DATE '2024-01-15'
    GROUP BY 1
    ORDER BY day
    """,
    tags=("ingest", "watermark", "filter"),
)
def q40_incremental_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-watermark incremental filter: strictly-greater-than resume, the
    semantics of the reference's `filter_date` (`audit_data_ingest.py:33` —
    the committed day itself is never reprocessed). With `day` as a partition
    column this predicate becomes Catalyst partition pruning."""
    ev = table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").cast("date")
    return (
        ev.select(day.alias("day"), "value")
        .filter(F.col("day") > F.lit("2024-01-15").cast("date"))
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(dsum("value", "sum_value")),
        )
        .orderBy("day")
    )


@register(
    "q41_binary_payload_stats",
    sql="""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(OCTET_LENGTH(ENCODE(text))) AS BIGINT) AS total_bytes,
           MAX(OCTET_LENGTH(ENCODE(text))) AS max_bytes
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
    tags=("ingest", "binary"),
)
def q41_binary_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary payload handling: documents as (blob, metadata) rows —
    the file-as-record model of the reference (`audit_data_ingest.py:118-120`)
    mapped onto a binary column."""
    d = table(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    return (
        d.select("source", F.octet_length(payload).alias("nbytes"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nbytes").alias("total_bytes"),
            F.max("nbytes").alias("max_bytes"),
        )
        .orderBy("source")
    )
