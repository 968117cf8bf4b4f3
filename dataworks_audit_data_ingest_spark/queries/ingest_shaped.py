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


# ---------------------------------------------------------------------------
# q237 — the Python Data Source under the oracle
# ---------------------------------------------------------------------------
# Spark 4's Python Data Source API as a first-class source
# (`sources/synthetic.py`): deterministic synthetic events generated ON
# the executors from the row index through the portable MD5 hash — the
# load-test input that needs no fixture staging at any volume. The
# oracle REGENERATES the identical rows in DuckDB from RANGE + the same
# hash text, so the source implementation itself (batch reader,
# partition ranges, generation law) sits under the driver's value hash.

from ..sources.synthetic import (  # noqa: E402
    SyntheticEventsDataSource,
    duckdb_generation_sql,
)

_Q237_ROWS = 20_000


@register(
    "q237_python_datasource_census",
    sql=f"""
    WITH gen AS ({duckdb_generation_sql(_Q237_ROWS)})
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(SUM(value_cents) AS BIGINT) AS total_cents,
           CAST(MIN(ts_us) AS BIGINT) AS first_ts_us,
           CAST(MAX(ts_us) AS BIGINT) AS last_ts_us
    FROM gen GROUP BY event_type ORDER BY event_type
    """,
    tags=("sources", "python-datasource", "synthetic", "scale-path"),
)
def q237_python_datasource_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Census over the Python Data Source (`sources/synthetic.py`):
    20 000 deterministic events read through
    ``spark.read.format("synthetic_events")`` — partitioned executor-side
    generation, zero input bytes — rolled up per type. The DuckDB twin
    regenerates the same rows from RANGE + the portable hash, so a drift
    anywhere in the source (partitioning, generation law, Arrow
    hand-off) breaks the hash. Fixture-independent by design: the query
    pins the SOURCE, not fixture data (sanctioned Python scan — the
    generator has to run somewhere; everything downstream is columnar).
    """
    spark.dataSource.register(SyntheticEventsDataSource)
    df = (
        spark.read.format("synthetic_events")
        .option("rows", _Q237_ROWS)
        .option("n_partitions", 8)
        .load()
    )
    return (
        df.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.sum("value_cents").cast("bigint").alias("total_cents"),
            F.min("ts_us").cast("bigint").alias("first_ts_us"),
            F.max("ts_us").cast("bigint").alias("last_ts_us"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q246 — the north-star RECORD CONTRACT under the oracle
# ---------------------------------------------------------------------------
# The round-10 streaming rehearsal (streaming/jobs.py::
# start_synthetic_encrypted_ingest_stream) ships records shaped by
# `synthetic_event_records`: one record per synthetic event, canonical
# JSON payload, integer-derived UTC day, id-keyed basename. Encryption
# itself cannot sit under a value hash (fresh nonces), but the record
# CONTRACT can: this query runs the exact shaping the streaming job
# encrypts, with the DuckDB twin regenerating the same rows from RANGE
# and constructing the identical day/basename/payload strings — so a
# drift in the JSON field order, the day arithmetic, or the basename
# format breaks the driver hash, not just a pytest.

_Q246_ROWS = 5_000


@register(
    "q246_ingest_record_contract",
    sql=f"""
    WITH gen AS ({duckdb_generation_sql(_Q246_ROWS)})
    SELECT CAST(DATE '1970-01-01'
                + CAST(ts_us // 86400000000 AS INT) AS VARCHAR) AS day,
           CONCAT('event-', CAST(event_id AS VARCHAR), '.json')
             AS basename,
           CONCAT('{{"event_id":', CAST(event_id AS VARCHAR),
                  ',"user_id":', CAST(user_id AS VARCHAR),
                  ',"event_type":"', event_type,
                  '","value_cents":', CAST(value_cents AS VARCHAR),
                  ',"ts_us":', CAST(ts_us AS VARCHAR), '}}') AS payload,
           CAST(LEN(CONCAT('{{"event_id":', CAST(event_id AS VARCHAR),
                  ',"user_id":', CAST(user_id AS VARCHAR),
                  ',"event_type":"', event_type,
                  '","value_cents":', CAST(value_cents AS VARCHAR),
                  ',"ts_us":', CAST(ts_us AS VARCHAR), '}}'))
                AS BIGINT) AS n_bytes
    FROM gen
    ORDER BY basename
    """,
    tags=("ingest", "streaming-shaped", "sources", "contract"),
)
def q246_ingest_record_contract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The streaming rehearsal's record shaping, verbatim, under the
    value hash: generate {_Q246_ROWS} events through the Python data
    source's batch reader and apply `synthetic_event_records` — day,
    basename and the exact payload bytes (decoded to UTF-8 for the
    hash; all fields ASCII by construction).

    Fixture-independent by design (like q237): the query pins the
    SOURCE + the record CONTRACT, not fixture data."""
    from ..sources.synthetic import SyntheticEventsDataSource
    from ..streaming.jobs import synthetic_event_records

    spark.dataSource.register(SyntheticEventsDataSource)
    df = (
        spark.read.format("synthetic_events")
        .option("rows", _Q246_ROWS)
        .option("n_partitions", 8)
        .load()
    )
    rec = synthetic_event_records(df)
    return rec.select(
        "day",
        "basename",
        F.decode("content", "UTF-8").alias("payload"),
        F.octet_length("content").cast("bigint").alias("n_bytes"),
    ).orderBy("basename")


# ---------------------------------------------------------------------------
# q255 — native XML source (Spark 4) round-trip under the oracle
# ---------------------------------------------------------------------------
# SPARK-44265 folded spark-xml into the distribution, making XML the one
# interchange format (after parquet/ORC/JSON/CSV/binary and the Python
# Data Source) this engine hadn't pinned. The query writes document
# METADATA as XML, reads it back with an EXPLICIT schema (inference on
# XML is a second full scan at scale — readers.py::read_xml docs), and
# aggregates; the DuckDB twin aggregates the original parquet directly,
# so any loss or coercion in the XML round-trip breaks the value hash.


@register(
    "q255_xml_roundtrip_census",
    sql="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS total_chars,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc,
           CAST(MAX(doc_id) AS BIGINT) AS last_doc
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
    tags=("sources", "xml", "spark4", "roundtrip"),
)
def q255_xml_roundtrip_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language census computed THROUGH an XML round-trip: document
    metadata → native XML files → explicit-schema read-back → aggregate.
    Free text stays OUT of the XML leg on purpose (control characters
    are the format's classic loss channel; metadata columns are the
    contract being pinned — the text path has its own binary/parquet
    pins). Equality with the parquet-direct oracle proves the XML writer/
    reader preserve values and types end to end."""
    import shutil
    import tempfile

    from ..sources.readers import read_xml, write_xml

    meta = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    tmp = tempfile.mkdtemp(prefix="q255_xml_")
    try:
        write_xml(meta, f"{tmp}/docs", row_tag="doc")
        back = read_xml(
            spark,
            f"{tmp}/docs",
            row_tag="doc",
            schema="doc_id bigint, lang string, n_chars bigint",
        )
        out = (
            back.groupBy("lang")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.sum("n_chars").cast("bigint").alias("total_chars"),
                F.min("doc_id").cast("bigint").alias("first_doc"),
                F.max("doc_id").cast("bigint").alias("last_doc"),
            )
            .orderBy("lang")
            # materialize before the XML files are removed (driver
            # collects after return)
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out
