"""Fixture-table loaders.

One parquet file per table under ``{sf_dir}/{name}.parquet`` (see TESTDATA.md).
``events.ts`` has shipped in two physical forms across fixture generations:

- INT64 TIMESTAMP(NANOS): Spark's reader rejects nanos, so we read it as LONG
  (``spark.sql.legacy.parquet.nanosAsLong``) and rebuild a microsecond
  timestamp with integer arithmetic (``DIV 1000`` — a double division would
  lose precision: 2024 epoch-nanos ≈ 1.7e18 > 2^53).
- TIMESTAMP(MICROS) with isAdjustedToUTC=false: Spark reads TIMESTAMP_NTZ,
  which ``unix_micros``/``window``/``withWatermark`` reject. We cast to the
  session-zoned TIMESTAMP — the session timezone is pinned UTC, so the wall
  values (and the DuckDB oracle's naive-timestamp view of the same file) are
  bit-identical.

Both normalizations are keyed on the observed read dtype, so either fixture
generation loads to the same ``ts: timestamp`` column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import tune

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table, normalizing types to match the DuckDB oracle."""
    tune(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # nanos → micros, truncating toward zero exactly like DuckDB's
            # ns→us cast
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif ts_type == "timestamp_ntz":
            # UTC session: NTZ → LTZ is a pure reinterpretation, same micros
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(
    spark: SparkSession, sf_dir: str, prefix: str = ""
) -> list[str]:
    """Register every fixture table as a temp view so users can work in raw
    SQL (``spark.sql("SELECT ... FROM lineitem ...")``) — the same table
    names the DuckDB oracle sees. Returns the view names."""
    names = []
    for name in TABLE_NAMES:
        view = f"{prefix}{name}"
        table(spark, sf_dir, name).createOrReplaceTempView(view)
        names.append(view)
    return names
