"""Key erasure ("right to be forgotten") over a partitioned parquet store
— delete every row matching a key list, rewriting ONLY the partitions
that contain matches, with an audit manifest of what was removed.

The compliance twin of `sinks/writers.py::merge_upsert_partitioned`, with
the same cost model and the same crash-safe staging/swap machinery:

1. **Locate** — one column-pruned scan (key + partition columns only)
   semi-joined against the broadcast key list finds the touched
   partitions and the per-partition match counts. Partitions without
   matches are never read again, let alone rewritten.
2. **Rewrite** — the touched partitions are re-read partition-pruned,
   anti-joined against the keys, staged, and atomically swapped
   (dot-hidden asides, all-or-nothing across partitions). A partition
   whose every row matched is REMOVED through the same aside discipline
   — erasure must not leave an empty husk that still lists as a
   partition.
3. **Audit** — the returned manifest records per-partition removed
   counts and totals; erasure requests are auditable events, and
   re-running the same request is a no-op (idempotency is the natural
   audit check).

At 100 TB: the locate pass is a key+partition projection (columnar scan
of two narrow columns); the rewrite cost ∝ data in touched partitions.
Erasure requests keyed to users cluster heavily by partition in practice
(recent days), so the rewrite set stays small. The key list must be
broadcast-sized — bucket mass-erasure jobs into batches if not.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .writers import _stage_dir, _swap_partition_dirs


def forget_keys(
    spark: SparkSession,
    path: str,
    keys: DataFrame,
    key_cols: tuple[str, ...],
    partition_by: tuple[str, ...] = ("day",),
) -> dict:
    """Erase all rows whose ``key_cols`` match a row of ``keys``.

    Returns the audit manifest::

        {"total_removed": n, "partitions_rewritten": k,
         "partitions_removed": j,
         "partitions": {"day=2024-01-02": {"removed": n, "kept": m}, ...}}
    """
    if not partition_by:
        raise ValueError("forget_keys requires partition_by")
    klist = F.broadcast(keys.select(*key_cols).distinct())
    existing = spark.read.parquet(path)

    # 1. locate: narrow scan -> per-partition removed/kept counts
    narrow = existing.select(*partition_by, *key_cols)
    flagged = narrow.join(
        klist.withColumn("_hit", F.lit(1)), list(key_cols), "left"
    )
    stats = (
        flagged.groupBy(*partition_by)
        .agg(
            F.count(F.when(F.col("_hit").isNotNull(), 1)).alias("removed"),
            F.count(F.when(F.col("_hit").isNull(), 1)).alias("kept"),
        )
        .filter(F.col("removed") > 0)
        .collect()
    )

    def rel(row) -> str:
        return "/".join(f"{c}={row[c]}" for c in partition_by)

    manifest = {
        "total_removed": int(sum(r.removed for r in stats)),
        "partitions_rewritten": 0,
        "partitions_removed": 0,
        "partitions": {
            rel(r): {"removed": int(r.removed), "kept": int(r.kept)}
            for r in stats
        },
    }
    if not stats:
        return manifest

    # 2. rewrite touched partitions (partition-pruned read, anti-join)
    cond = None
    for row in stats:
        this = None
        for c in partition_by:
            eq = F.col(c) == F.lit(row[c])
            this = eq if this is None else (this & eq)
        cond = this if cond is None else (cond | this)
    remaining = existing.filter(cond).join(klist, list(key_cols), "left_anti")

    staged = _stage_dir(path)
    try:
        (
            remaining.repartition(len(stats), *partition_by)
            .write.mode("overwrite")
            .partitionBy(*partition_by)
            .parquet(staged)
        )
        _swap_partition_dirs(staged, path, len(partition_by))
        # fully-erased partitions produce no staged dir: remove their old
        # dirs through the same aside-then-delete discipline (rename is
        # atomic; a crash between the two leaves only a dot-hidden aside,
        # which readers ignore and a later run cleans)
        for r in stats:
            if r.kept == 0:
                dest = os.path.join(path, rel(r))
                if os.path.exists(dest):
                    aside = os.path.join(
                        os.path.dirname(dest),
                        "." + os.path.basename(dest) + ".old",
                    )
                    if os.path.exists(aside):
                        shutil.rmtree(aside)
                    os.rename(dest, aside)
                    shutil.rmtree(aside)
                manifest["partitions_removed"] += 1
            else:
                manifest["partitions_rewritten"] += 1
    except BaseException:
        shutil.rmtree(staged, ignore_errors=True)
        raise
    finally:
        shutil.rmtree(staged, ignore_errors=True)
    return manifest
