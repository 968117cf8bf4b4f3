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


COMPACTED_ID = "__compacted__"


def compact_store(
    spark: SparkSession, store_path: str, exclude: tuple[str, ...] = ()
) -> int:
    """Fold the store's batch partitions into one ``batch_id=__compacted__``
    partition and remove the originals; returns the number of partition
    directories removed.

    Why: every incremental batch reads the WHOLE store, and a long-lived
    job accumulates one ``batch_id=`` directory per batch — after 10⁴
    batches the file listing dwarfs the actual (tiny) store rows.
    Compaction restores O(1) partition count without changing any rung's
    semantics: store membership is consumed through anti-/band-joins, so
    row ORDER and PARTITION of the store never matter, only the set.

    HARD PRECONDITION — ``exclude``: a batch that may still be REPLAYED
    (at or after the streaming checkpoint's position, or the most recent
    batch of a manually driven job) must be listed in ``exclude``. The
    replay discipline works by excluding the current batch's own
    partition on read; folding a replayable batch into ``__compacted__``
    breaks that exclusion and the replay would self-match, silently
    marking the whole batch as duplicate. Batches strictly before the
    checkpoint can never re-run and are always safe to fold.

    Crash safety: the fold WRITES first (dynamic overwrite of
    ``__compacted__``) and DELETES second. A crash between the two
    leaves duplicate membership rows (compacted + original partitions),
    which is harmless — set-membership joins are idempotent to
    duplicates — and a re-run completes the deletion. The distinct() in
    the fold keeps the compacted partition itself duplicate-free.
    """
    store = spark.read.parquet(store_path)
    keep = set(exclude) | {COMPACTED_ID}
    # partition values come back type-inferred (batch_id=3 reads as int),
    # so normalize to the string form the directories use
    batch_ids = {
        str(r[0]) for r in store.select(BATCH_COL).distinct().collect()
    }
    foldable = sorted(batch_ids - (set(exclude) - {COMPACTED_ID}))
    if foldable in ([], [COMPACTED_ID]):
        return 0
    folded = (
        store.filter(F.col(BATCH_COL).cast("string").isin(foldable))
        .drop(BATCH_COL)
        .distinct()
    )
    commit_batch_partition(folded, store_path, COMPACTED_ID)
    # delete the folded originals (everything except __compacted__ and
    # the excluded replayable batches) through the Hadoop FS API so the
    # same code works on local disk, HDFS, and S3A
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(store_path)
    fs = root.getFileSystem(hconf)
    removed = 0
    for status in fs.listStatus(root):
        name = status.getPath().getName()
        if not name.startswith(f"{BATCH_COL}="):
            continue
        bid = name.split("=", 1)[1]
        if bid in keep:
            continue
        fs.delete(status.getPath(), True)
        removed += 1
    return removed
