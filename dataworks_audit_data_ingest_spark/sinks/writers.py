"""Batch and streaming sink writers.

The reference's sink is S3 objects with envelope metadata — that lives in
``ingest.pipeline`` (`foreachPartition`, the only sink needing custom code).
These are the engine's standard columnar sinks: partitioned parquet (the
lakehouse layout downstream analytics reads) and JSON lines.

Layout discipline for 100 TB: partition by the incremental key (``day``),
so the watermark filter on re-reads is partition pruning; size output files
via repartition before write (aim 128 MB-1 GB per file, never thousands of
KB-sized files per partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = ("day",),
    mode: str = "overwrite",
    files_per_partition: int | None = None,
) -> None:
    """Day-partitioned parquet sink (Hive layout ⇒ native partition
    pruning on read — the Spark-idiomatic form of the reference's
    `{prefix}{day}/` key scheme, `audit_data_ingest.py:172-173`)."""
    if files_per_partition is not None:
        df = df.repartition(files_per_partition, *partition_by)
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink (interchange format of the audit payloads)."""
    df.write.mode(mode).json(path)


def start_parquet_stream_sink(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    partition_by: tuple[str, ...] = (),
    available_now: bool = True,
):
    """Streaming parquet file sink with exactly-once file commit via the
    checkpoint log (the built-in alternative to the foreachBatch S3 sink
    when per-object metadata isn't required)."""
    writer = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_parquet_partition(
    spark, path: str, target_files: int = 1, partition_filter: str | None = None
) -> int:
    """Small-file compaction: rewrite a parquet location (optionally one
    partition predicate) into ``target_files`` files per partition dir.

    The small-files problem is the chronic failure mode of incremental
    sinks (every micro-batch adds files); compaction restores scan
    efficiency. Returns the number of rows rewritten. Rewrite is
    staged-then-swapped so readers never see a half-written directory.
    """
    import shutil
    import tempfile

    df = spark.read.parquet(path)
    if partition_filter:
        df = df.filter(partition_filter)
    n = df.count()
    staged = tempfile.mkdtemp(prefix="compact_")
    df.coalesce(target_files).write.mode("overwrite").parquet(staged)
    shutil.rmtree(path)
    shutil.move(staged, path)
    return n
