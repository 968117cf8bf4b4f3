"""SparkSession construction and runtime tuning.

All queries must behave identically on a session we build and on a session
handed to us by the correctness driver, so everything that matters is applied
as *runtime* conf via :func:`tune` (legal on any live session).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs every query relies on.
#
# - session.timeZone=UTC: fixture timestamps are naive (parquet NTZ); pinning
#   UTC makes any LTZ value we synthesize (timestamp_micros) collect to the
#   same naive datetime DuckDB returns.
# - nanosAsLong: events.parquet stores ts as INT64 TIMESTAMP(NANOS) which the
#   Spark parquet reader rejects; with this flag it surfaces as LONG nanos and
#   tables.load_events() converts to a proper timestamp column.
# - AQE + skew-join handling: runtime re-planning for the 100 TB design point.
_RUNTIME_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime confs; safe and idempotent on externally-owned sessions."""
    for k, v in _RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Conf not settable at runtime in this deployment — keep going;
            # individual loaders have fallbacks where it matters.
            pass
    return spark


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "dataworks-audit-data-ingest-spark") -> SparkSession:
    """Build a local session shaped like the target cluster profile.

    local[N] with N shuffle partitions: on a real cluster these come from
    spark-submit; nothing in the engine assumes local mode.
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    return tune(builder.getOrCreate())
