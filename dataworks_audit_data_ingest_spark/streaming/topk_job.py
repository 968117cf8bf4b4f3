"""Streaming heavy hitters: per-micro-batch count-min grids + candidate
sets, merged at read time into period top-k — q87's sketch as a
maintained stream artifact (the same store discipline as hll_job).

Count-min cells are SUM-mergeable (each cell is a plain counter), so
per-batch d×w grids written under ``batch_id=`` partitions roll up to the
exact whole-stream sketch by cell-wise addition — batch boundaries are
invisible (pinned by the merge test). The candidate set is each batch's
local top-m keys: a key heavy over the period is heavy in at least one
batch whenever batches are not adversarially skewed (the standard
practical heuristic; a key spread THINLY below every batch's top-m is the
documented miss mode — widen ``m_candidates`` to tighten it, the grid
itself never loses mass).

At scale per batch: one map-side partial aggregation to ≤ d·w rows per
task, one sketch-sized write, one top-m candidate selection (map-side
WindowGroupLimit bounds it). The store grows with batches × (d·w + m),
not with traffic; reads are sketch-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import spark_hash32, universal_hash

CMS_D = 4  # depth (independent hash rows) — same family as q87
CMS_W = 1024  # width (cells per row)


def _stack_cells() -> str:
    args = ", ".join(
        f"{i}, ({universal_hash('h', i)}) % {CMS_W}" for i in range(CMS_D)
    )
    return f"STACK({CMS_D}, {args}) AS (row_idx, cell)"


def batch_sketch(df: DataFrame, key_sql: str) -> DataFrame:
    """(row_idx, cell, c) — this batch's count-min grid (≤ d·w rows)."""
    hashed = df.select(F.expr(spark_hash32(key_sql, "cms")).alias("h"))
    cells = hashed.select(F.expr(_stack_cells()))
    return cells.groupBy("row_idx", "cell").agg(F.count(F.lit(1)).alias("c"))


def batch_candidates(df: DataFrame, key_sql: str, m: int) -> DataFrame:
    """(key, batch_count) — the batch-local top-m keys (ties → key asc)."""
    counts = (
        df.select(F.expr(key_sql).alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("batch_count"))
    )
    w = Window.orderBy(F.desc("batch_count"), F.asc("key"))
    return (
        counts.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= m)
        .drop("_rk")
    )


def topk_microbatch(
    batch_df: DataFrame,
    batch_id: int | str,
    out_dir: str,
    key_sql: str,
    m_candidates: int = 32,
) -> None:
    """Land this batch's grid + candidates under batch_id= partitions
    (dynamic overwrite — replay rewrites exactly its own partitions)."""
    (
        batch_sketch(batch_df, key_sql)
        .withColumn("batch_id", F.lit(str(batch_id)))
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(f"{out_dir}/sketch")
    )
    (
        batch_candidates(batch_df, key_sql, m_candidates)
        .withColumn("batch_id", F.lit(str(batch_id)))
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(f"{out_dir}/candidates")
    )


def start_topk_stream(
    event_stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    key_sql: str = "event_type",
    m_candidates: int = 32,
    available_now: bool = True,
):
    """foreachBatch heavy-hitter maintenance via :func:`topk_microbatch`."""

    def one_batch(batch_df: DataFrame, batch_id: int) -> None:
        topk_microbatch(batch_df, batch_id, out_dir, key_sql, m_candidates)

    writer = (
        event_stream.writeStream.foreachBatch(one_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def merged_sketch(spark: SparkSession, out_dir: str) -> DataFrame:
    """Cell-wise SUM over all stored batch grids — the whole-stream
    count-min, exactly as if built in one pass."""
    return (
        spark.read.parquet(f"{out_dir}/sketch")
        .groupBy("row_idx", "cell")
        .agg(F.sum("c").alias("c"))
    )


def read_topk(spark: SparkSession, out_dir: str, k: int) -> DataFrame:
    """(key, est_count, rnk) — period top-k: candidate keys (union of
    batch-local heavies) point-queried against the merged grid (MIN over
    the key's d cells — the one-sided count-min estimate)."""
    cand = (
        spark.read.parquet(f"{out_dir}/candidates")
        .select("key")
        .distinct()
    )
    probes = cand.withColumn(
        "h", F.expr(spark_hash32("key", "cms"))
    ).select("key", F.expr(_stack_cells()))
    est = (
        probes.join(F.broadcast(merged_sketch(spark, out_dir)), ["row_idx", "cell"])
        .groupBy("key")
        .agg(F.min("c").cast("bigint").alias("est_count"))
    )
    w = Window.orderBy(F.desc("est_count"), F.asc("key"))
    return (
        est.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("key", "est_count", "rnk")
    )
