"""Shared batch-partitioned store contract for the incremental dedup
family — lexical bands (`text/incremental_dedup.py`), semantic signatures
(`text/incremental_semantic.py`), perceptual hashes
(`multimodal/incremental_phash.py`), and content-defined chunks
(`text/cdc.py`). All four rungs persist tiny per-item state in a parquet
store partitioned by ``batch_id`` and share one replay discipline; this
module is that discipline written once:

- **Read** (:func:`read_store_excluding_batch`): ``None`` means first
  batch (only PATH_NOT_FOUND — corrupt/permission/IO errors PROPAGATE; a
  swallowed read error would silently skip cross-batch dedup and admit
  duplicates). The current batch's own partition is EXCLUDED: on a
  replay (failure after the store write but before the downstream sink
  write) the store already holds this batch's rows, and reading them
  back would make every item self-match and silently drop the whole
  batch. The partition-column filter also prunes the scan.
- **Commit** (:func:`commit_batch_partition`): rows land under
  ``batch_id=<id>`` via dynamic partition overwrite, so a replayed batch
  rewrites exactly its own partition — idempotent, the same
  commit-after-success discipline as the ingest watermark
  (`audit_data_ingest.py:65-68` in the reference).

Recovery precondition (documented once here, shared by every rung's
streaming wrapper): replay idempotency requires the SAME batch slicing —
streaming jobs must reuse their checkpoint on restart. A fresh checkpoint
with different slicing restarts batch_ids from 0 but leaves the old run's
higher-batch_id partitions in place, making genuinely new content look
non-novel; either redirect to a fresh store or clear partitions at/after
the restart point first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BATCH_COL = "batch_id"


def read_store_excluding_batch(
    spark: SparkSession, store_path: str, batch_id: str
) -> DataFrame | None:
    """The store minus the current batch's partition (``batch_id``
    dropped), or ``None`` on the first batch — see the module docstring
    for why both halves of that contract are load-bearing."""
    from ..sources.readers import read_parquet_store_or_none

    store = read_parquet_store_or_none(spark, store_path)
    if store is None:
        return None
    return store.filter(F.col(BATCH_COL) != F.lit(batch_id)).drop(BATCH_COL)


def commit_batch_partition(
    df: DataFrame, store_path: str, batch_id: str
) -> None:
    """Write ``df`` as the store's ``batch_id=<id>`` partition via dynamic
    overwrite (replay ⇒ identical rewrite of exactly this partition)."""
    (
        df.withColumn(BATCH_COL, F.lit(batch_id))
        .write.mode("overwrite")
        .partitionBy(BATCH_COL)
        .option("partitionOverwriteMode", "dynamic")
        .parquet(store_path)
    )
