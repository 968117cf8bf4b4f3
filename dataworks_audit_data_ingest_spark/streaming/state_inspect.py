"""Offline inspection of Structured Streaming state — Spark 4's
``statestore`` / ``state-metadata`` data sources wrapped as the two
operations an operator actually runs against a production checkpoint:

- **What state is a query holding?** (:func:`read_streaming_state`) —
  the live key/value rows of a stateful operator (windowed agg,
  dedup-within-watermark, stream-stream join buffer), read from the
  checkpoint WITHOUT stopping or touching the query. The first question
  in every "why is my watermark not advancing" / "why did this late row
  drop" incident.
- **Is the state skewed?** (:func:`state_skew_report`) — keys per state
  partition. Stateful operators shuffle by grouping key; one hot key
  (a bot user, a default session id) concentrates state in one
  partition, which then dominates checkpoint commit time and memory.
  The report is the same number-per-partition shape as
  `functions/skew.py`'s key histogram, taken from state instead of
  data — at 100 TB the state store IS the working set, so this is
  where streaming skew shows first.

Both read checkpoint files only — safe against a RUNNING query (state
snapshots are immutable per batch version; ``batch_id`` pins one), and
the natural post-mortem tool on a stopped one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def state_metadata(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    """The checkpoint's stateful-operator inventory: operatorId/name,
    store name, partition count, and the [minBatchId, maxBatchId] window
    of retained state versions — the coordinates every other read here
    needs."""
    return spark.read.format("state-metadata").load(checkpoint_dir)


def read_streaming_state(
    spark: SparkSession,
    checkpoint_dir: str,
    *,
    operator_id: int = 0,
    store_name: str | None = None,
    batch_id: int | None = None,
    flatten: bool = True,
) -> DataFrame:
    """Live state rows of one stateful operator in the checkpoint.

    ``batch_id`` pins a retained historical version (default: latest
    committed); ``flatten`` spreads the ``key``/``value`` structs into
    top-level columns (prefixed ``key_``/``value_`` on collision), which
    is what ad-hoc debugging joins want."""
    reader = (
        spark.read.format("statestore")
        .option("operatorId", operator_id)
    )
    if store_name is not None:
        reader = reader.option("storeName", store_name)
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    df = reader.load(checkpoint_dir)
    if not flatten:
        return df
    key_fields = df.schema["key"].dataType.names
    val_fields = df.schema["value"].dataType.names
    cols = []
    # prefix on ANY collision — key vs value, or either vs the reader's
    # own partition_id column (a grouping key literally named
    # partition_id would otherwise yield a duplicate column name and
    # AMBIGUOUS_REFERENCE on first use)
    for f in key_fields:
        clash = f in val_fields or f == "partition_id"
        cols.append(F.col(f"key.{f}").alias(f"key_{f}" if clash else f))
    for f in val_fields:
        clash = f in key_fields or f == "partition_id"
        cols.append(
            F.col(f"value.{f}").alias(f"value_{f}" if clash else f)
        )
    cols.append(F.col("partition_id"))
    return df.select(*cols)


def state_skew_report(
    spark: SparkSession,
    checkpoint_dir: str,
    *,
    operator_id: int = 0,
    store_name: str | None = None,
    batch_id: int | None = None,
) -> DataFrame:
    """Keys per state partition for one operator, worst first, with each
    partition's share in milli (integer — portable, no float compare):
    ``(partition_id, n_keys, share_milli)``. A healthy uniform shuffle
    sits near 1000/n_partitions; a partition holding a large multiple of
    that is the hot-key signal — the cue to salt the grouping key or
    bump ``spark.sql.shuffle.partitions`` BEFORE the first batch (state
    partitioning is fixed at query start)."""
    st = read_streaming_state(
        spark,
        checkpoint_dir,
        operator_id=operator_id,
        store_name=store_name,
        batch_id=batch_id,
        flatten=False,
    )
    per = st.groupBy("partition_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys")
    )
    total = per.agg(F.sum("n_keys").alias("t"))
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            "partition_id",
            "n_keys",
            (F.col("n_keys") * 1000 / F.col("t"))
            .cast("bigint")
            .alias("share_milli"),
        )
        .orderBy(F.desc("n_keys"), "partition_id")
    )
