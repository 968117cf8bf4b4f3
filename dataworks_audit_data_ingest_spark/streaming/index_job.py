"""Streaming ANN index maintenance: embedding vectors arrive as a stream;
each micro-batch is routed to its nearest trained IVF cell (broadcast
centroid table — `similarity/kmeans.py::assign_cells`), optionally int8-
quantized (`similarity/quantize.py`), and appended to a cell-partitioned
parquet store. The store is immediately queryable with
``knn_join(method="ivf", cell_col="cell")`` and each probe is partition
pruning — a continuously-growing corpus indexes incrementally, never
re-indexed wholesale.

Exactly-once: output partitions are keyed (cell, batch_id) with dynamic
partition overwrite, and cell assignment is deterministic (exact decimal
distances, lowest-cell tie-break), so a replayed micro-batch rewrites
exactly the partitions it wrote before — the same idempotency discipline
as the curation job (`streaming/curation_job.py`) and, before it, the
reference's commit-after-success day loop.

At scale: per batch, one broadcast (k·dim centroid doubles), one map over
the batch, one write of batch-sized data — no shuffle of the existing
store, whose size never enters the per-batch cost. Periodic centroid
retraining (distribution drift) is a batch `train_cells` run plus a
one-time store rewrite; the job takes the new centroid table on restart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..similarity.kmeans import assign_cells
from ..similarity.quantize import quantize_int8

VEC_SCHEMA = "vec_id long, embedding array<double>"


def stream_embeddings_json(
    spark: SparkSession,
    src_dir: str,
    schema: StructType | str = VEC_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    reader = spark.readStream.schema(schema).format("json")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(src_dir)


def index_microbatch(
    batch_df: DataFrame,
    batch_id: int | str,
    centroids: DataFrame,
    out_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: bool = True,
) -> None:
    """One micro-batch of index maintenance: route → (optionally) quantize
    → write under cell=/batch_id= partitions with dynamic overwrite.
    Replay-idempotent BY CONSTRUCTION: assignment is deterministic, so a
    replay touches exactly the (cell, batch_id) partitions the first
    attempt wrote and dynamic overwrite replaces them in place — pinned by
    `tests/test_index_job.py::test_replayed_microbatch_is_idempotent`."""
    pts = batch_df.select(
        F.col(id_col).alias("id"),
        F.expr(f"TRANSFORM({vec_col}, x -> CAST(x AS DOUBLE))").alias("vec"),
    )
    assigned = assign_cells(pts, centroids).select(
        F.col("id").alias(id_col), "cell"
    )
    rows = batch_df.join(assigned, id_col)
    if quantize:
        rows = quantize_int8(rows, vec_col)
    (
        rows.withColumn("batch_id", F.lit(str(batch_id)))
        .write.mode("overwrite")
        .partitionBy("cell", "batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(out_dir)
    )


def start_index_stream(
    vec_stream: DataFrame,
    centroids: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize: bool = True,
    available_now: bool = True,
):
    """foreachBatch indexing via :func:`index_microbatch`. ``centroids`` is
    a (cell, cvec) table from ``train_cells`` (or any partitioner with that
    shape)."""

    def index_batch(batch_df: DataFrame, batch_id: int) -> None:
        index_microbatch(
            batch_df,
            batch_id,
            centroids,
            out_dir,
            id_col=id_col,
            vec_col=vec_col,
            quantize=quantize,
        )

    writer = (
        vec_stream.writeStream.foreachBatch(index_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
