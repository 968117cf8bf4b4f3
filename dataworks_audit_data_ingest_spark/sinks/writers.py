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
from pyspark.sql import functions as F


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
    spark,
    path: str,
    target_files: int = 1,
    partition_filter: str | None = None,
    partition_by: tuple[str, ...] = (),
) -> int:
    """Small-file compaction: rewrite a parquet location (optionally only the
    partitions matching ``partition_filter``) into ``target_files`` files per
    partition dir, preserving the Hive ``key=value`` layout.

    The small-files problem is the chronic failure mode of incremental
    sinks (every micro-batch adds files); compaction restores scan
    efficiency. Returns the number of rows rewritten. Rewrite is
    staged-then-swapped so readers never see a half-written directory;
    with ``partition_filter`` only the matching partition directories are
    swapped — every other partition's files are untouched.
    """
    import os
    import shutil
    import tempfile

    if partition_filter and not partition_by:
        raise ValueError(
            "partition_filter requires partition_by so the rewrite can be "
            "scoped to the matching partition directories"
        )

    df = spark.read.parquet(path)
    if partition_filter:
        df = df.filter(partition_filter)
    n = df.count()

    # One output task per partition value (hash-repartition on the partition
    # key) keeps each Hive dir at <= target_files files without a global
    # coalesce bottleneck.
    if partition_by:
        out = df.repartition(max(target_files, 1), *partition_by)
    else:
        out = df.coalesce(max(target_files, 1))

    staged = tempfile.mkdtemp(prefix="compact_")
    writer = out.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staged)

    if not partition_filter:
        shutil.rmtree(path)
        shutil.move(staged, path)
        return n

    # Swap only the partition dirs present in the staged output: walk to the
    # depth of the partition spec collecting key=value relative paths.
    def _partition_dirs(root: str, depth: int) -> list[str]:
        rels = [""]
        for _ in range(depth):
            nxt = []
            for rel in rels:
                base = os.path.join(root, rel) if rel else root
                for name in os.listdir(base):
                    if "=" in name and os.path.isdir(os.path.join(base, name)):
                        nxt.append(os.path.join(rel, name) if rel else name)
            rels = nxt
        return rels

    try:
        for rel in _partition_dirs(staged, len(partition_by)):
            dest = os.path.join(path, rel)
            if os.path.exists(dest):
                shutil.rmtree(dest)
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            shutil.move(os.path.join(staged, rel), dest)
    finally:
        shutil.rmtree(staged, ignore_errors=True)
    return n


def merge_upsert_partitioned(
    spark,
    path: str,
    updates: "DataFrame",
    key_cols: tuple[str, ...],
    partition_by: tuple[str, ...] = ("day",),
    order_col: str | None = None,
) -> int:
    """MERGE/upsert into a Hive-partitioned parquet dataset without a table
    format: rows in ``updates`` replace existing rows with the same key;
    new keys are inserted. Only the partitions present in ``updates`` are
    rewritten and swapped — untouched partitions keep their files (CDC-merge
    at the partition grain, the same discipline as compaction).

    ``order_col`` picks the winner among duplicate keys *within* updates
    (highest wins); by default the update row always beats the existing row.
    Returns the number of rows written into the rewritten partitions.

    Precondition (inherent to partition-grain CDC): the partition value must
    be stable per key — e.g. ``day`` derived from the record's immutable
    event date. If an update re-partitions a key, the old row in the
    now-untouched partition is NOT removed (removing it would require
    scanning the whole dataset, defeating the partition-scoped cost model);
    property test pins this contract.

    At 100 TB: cost ∝ data in the touched partitions, not the dataset —
    updates keyed to recent days rewrite only those days. The existing-side
    read is partition-pruned by an IN filter on the touched partition
    values (broadcast-sized by construction).
    """
    import os
    import shutil
    import tempfile

    from pyspark.sql import Window

    if not partition_by:
        raise ValueError("merge_upsert_partitioned requires partition_by")

    touched = updates.select(*partition_by).distinct().collect()
    if not touched:
        return 0
    # partition-prune the existing side to the touched partitions only
    cond = None
    for row in touched:
        this = None
        for c in partition_by:
            eq = F.col(c) == F.lit(row[c])
            this = eq if this is None else (this & eq)
        cond = this if cond is None else (cond | this)

    existing = spark.read.parquet(path).filter(cond)
    # precedence: update rows beat existing rows; order_col beats both
    upd = updates.withColumn("_src", F.lit(1))
    old = existing.withColumn("_src", F.lit(0))
    unioned = upd.unionByName(old)
    order = (
        [F.col(order_col).desc(), F.col("_src").desc()]
        if order_col
        else [F.col("_src").desc()]
    )
    w = Window.partitionBy(*key_cols).orderBy(*order)
    merged = (
        unioned.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )

    n = merged.count()
    staged = tempfile.mkdtemp(prefix="merge_")
    (
        merged.repartition(1, *partition_by)
        .write.mode("overwrite")
        .partitionBy(*partition_by)
        .parquet(staged)
    )

    def _partition_dirs(root: str, depth: int) -> list[str]:
        rels = [""]
        for _ in range(depth):
            nxt = []
            for rel in rels:
                base = os.path.join(root, rel) if rel else root
                for name in os.listdir(base):
                    if "=" in name and os.path.isdir(os.path.join(base, name)):
                        nxt.append(os.path.join(rel, name) if rel else name)
            rels = nxt
        return rels

    try:
        for rel in _partition_dirs(staged, len(partition_by)):
            dest = os.path.join(path, rel)
            if os.path.exists(dest):
                shutil.rmtree(dest)
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            shutil.move(os.path.join(staged, rel), dest)
    finally:
        shutil.rmtree(staged, ignore_errors=True)
    return n


def write_partitioned_orc(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = (),
    mode: str = "overwrite",
) -> None:
    """ORC sink, same layout discipline as the parquet sink."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)
