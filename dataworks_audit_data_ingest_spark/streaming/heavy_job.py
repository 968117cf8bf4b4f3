"""Streaming heavy hitters: a standing top-k most-frequent-keys view over
everything ever ingested, maintained per micro-batch with BOUNDED state.

The classic streaming pairing (count-min sketch + candidate heap,
q87's sketch in its incremental form):

- **Sketch rung** — every micro-batch contributes one d x w count-min
  increment table (at most d*w rows regardless of batch size; partial
  aggregation builds it map-side).  Increments are ADDITIVE, so the
  standing sketch is just the per-cell SUM across batch partitions.
- **Candidate rung** — a key can only be reported if it was a LOCAL
  top-m key of at least one micro-batch (its per-batch count rows are
  stored alongside).  A global heavy hitter has, by averaging, at least
  its global share in some batch, so m >> k makes a miss require
  adversarial spreading; this is the standard sketch trade-off and the
  reason ``m`` defaults to 8x ``k``.

Both rungs live in ONE batch_id-partitioned store under the shared
incremental contract (`incremental/store.py`): a replayed micro-batch
recomputes identical increments/candidates and dynamic-overwrites its own
partition — replay-idempotent without fencing reads, exactly like the CDC
and dedup rungs.

The shared contract's compaction is SET-semantics (`compact_store` folds
with ``distinct()``; crash-window duplicates are tolerated because the
set stores consume membership through joins).  Counts are ADDITIVE, not
set-membership, so every stored row carries its originating batch id as
a DATA column (``src_batch``) — rows are then unique per
(src_batch, cell)/(src_batch, key), which makes ``distinct()`` exact:
the fold preserves the multiset of per-batch contributions, and the
reader re-applies ``distinct()`` so a crash between compaction's
write and delete steps (duplicate rows in ``__compacted__`` AND the
originals) cannot double-count.  The usual HARD PRECONDITION stands:
batches the checkpoint may replay must be in ``exclude``
(`checkpoint_replayable_ids` derives the list — the q93 drill recipe).

Reporting (:func:`heavy_hitters`) estimates each candidate's global count
as the MIN over its d sketch cells — always >= the true count (one-sided
count-min error, pinned by test) — and returns the top-k by estimate.
``seen_count`` (the sum of the candidate's OWN stored batch counts) rides
along as an exact lower bound: est >= true >= seen.

At 100 TB: per-batch state is <= d*w + m rows past the batch's own
aggregation; the standing store grows by that constant per batch and
compaction folds it back to one constant-size partition.  Reporting joins
the candidate set (bounded by m x uncompacted-batches) against the
broadcast-sized summed sketch.  Nothing anywhere scales with corpus size
— the property that makes a standing "what's hot" view viable on an
unbounded key domain where the exact groupBy state (q112's Zipf-bounded
vocabulary argument) no longer applies.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import spark_hash32, universal_hash
from ..incremental.store import commit_batch_partition, read_store_excluding_batch

logger = logging.getLogger(__name__)

DEFAULT_D = 4  # sketch depth (independent hash rows)
DEFAULT_W = 1024  # sketch width (cells per row)

# A batch id no foreachBatch invocation can produce (Spark batch ids are
# integers): reading "excluding" it reads the WHOLE store.
_READ_ALL_ID = "__reader__"


def _cms_cell(i: int, w: int) -> str:
    """Cell index of hash row ``i`` for base-hash column ``h`` — the same
    universal-hash construction as q87's batch sketch, so a batch sketch
    and a streaming sketch over identical data are identical tables."""
    return f"({universal_hash('h', i)}) % {w}"


def _cell_stack(d: int, w: int) -> str:
    stack_args = ", ".join(f"{i}, {_cms_cell(i, w)}" for i in range(d))
    return f"STACK({d}, {stack_args}) AS (row_idx, cell)"


def batch_sketch(
    batch_df: DataFrame,
    batch_id,
    key_col: str,
    d: int = DEFAULT_D,
    w: int = DEFAULT_W,
) -> DataFrame:
    """One micro-batch's count-min increment table:
    (src_batch, row_idx, cell, c), at most d*w rows.  Additive across
    batches; ``src_batch`` gives each row set-identity (module note)."""
    hashed = batch_df.select(
        F.expr(spark_hash32(key_col, "cms")).alias("h")
    )
    cells = hashed.select(F.expr(_cell_stack(d, w)))
    return (
        cells.groupBy("row_idx", "cell")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(F.lit(str(batch_id)).alias("src_batch"), "*")
    )


def batch_candidates(
    batch_df: DataFrame, batch_id, key_col: str, m: int
) -> DataFrame:
    """The batch's local top-m keys by exact in-batch count:
    (src_batch, key, c).  TakeOrderedAndProject — m rows leave the batch,
    ties broken by key."""
    top = (
        batch_df.groupBy(F.col(key_col).cast("string").alias("key"))
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "key")
        .limit(m)
    )
    return top.select(F.lit(str(batch_id)).alias("src_batch"), "*")


def update_heavy_state(
    spark: SparkSession,
    store_root: str,
    batch_df: DataFrame,
    batch_id,
    key_col: str,
    d: int = DEFAULT_D,
    w: int = DEFAULT_W,
    m: int = 80,
) -> None:
    """Commit one micro-batch's sketch increments and local candidates as
    the ``batch_id`` partition of each sub-store (dynamic overwrite —
    replay rewrites exactly its own partitions)."""
    commit_batch_partition(
        batch_sketch(batch_df, batch_id, key_col, d, w),
        f"{store_root}/sketch",
        batch_id,
    )
    commit_batch_partition(
        batch_candidates(batch_df, batch_id, key_col, m),
        f"{store_root}/cands",
        batch_id,
    )


def heavy_hitters(
    spark: SparkSession,
    store_root: str,
    k: int,
    d: int = DEFAULT_D,
    w: int = DEFAULT_W,
) -> DataFrame | None:
    """The standing top-k: every stored candidate scored by the summed
    sketch's min-cell estimate; (key, est_count, seen_count) with
    est_count >= true count >= seen_count.  ``None`` before any batch.

    ``d``/``w`` must match the values the stream was started with — the
    sketch store has no header row; a mismatched probe would silently
    misaddress cells.
    """
    sketch_rows = read_store_excluding_batch(
        spark, f"{store_root}/sketch", _READ_ALL_ID
    )
    cand_rows = read_store_excluding_batch(
        spark, f"{store_root}/cands", _READ_ALL_ID
    )
    if sketch_rows is None or cand_rows is None:
        return None
    # distinct() first: compaction-crash duplicates (module note) collapse
    # on (src_batch, ...) row identity before the additive sums
    sketch = (
        sketch_rows.select("src_batch", "row_idx", "cell", "c")
        .distinct()
        .groupBy("row_idx", "cell")
        .agg(F.sum("c").alias("c"))
    )
    cands = (
        cand_rows.select("src_batch", "key", "c")
        .distinct()
        .groupBy("key")
        .agg(F.sum("c").alias("seen"))
    )
    probes = cands.withColumn(
        "h", F.expr(spark_hash32("key", "cms"))
    ).select("key", "seen", F.expr(_cell_stack(d, w)))
    return (
        probes.join(F.broadcast(sketch), ["row_idx", "cell"])
        .groupBy("key")
        .agg(
            F.min("c").cast("bigint").alias("est_count"),
            F.max("seen").cast("bigint").alias("seen_count"),
        )
        .orderBy(F.desc("est_count"), "key")
        .limit(k)
    )


def start_heavy_hitters_stream(
    stream_df: DataFrame,
    store_root: str,
    checkpoint_dir: str,
    key_col: str,
    d: int = DEFAULT_D,
    w: int = DEFAULT_W,
    m: int = 80,
    available_now: bool = True,
):
    """foreachBatch heavy-hitter maintenance: after every micro-batch the
    store answers :func:`heavy_hitters` for all rows ingested so far.

    Recovery precondition: the shared incremental-family contract
    (``streaming/cdc_job.py`` module docstring) — restarts must REUSE the
    checkpoint so replayed batches rewrite their own store partitions; on
    a fresh checkpoint, point at a fresh ``store_root`` or delete
    partitions at/after the restart point."""

    def one_batch(batch_df: DataFrame, batch_id: int) -> None:
        update_heavy_state(
            batch_df.sparkSession,
            store_root,
            batch_df,
            batch_id,
            key_col,
            d,
            w,
            m,
        )
        logger.info("heavy hitters: committed batch %d", batch_id)

    writer = (
        stream_df.writeStream.foreachBatch(one_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
