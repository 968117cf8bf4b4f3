"""Slowly-changing-dimension type 2: versioned history maintenance.

The warehouse operator behind "what did this customer's record say when
the order shipped?": instead of overwriting a changed attribute, the open
row is closed (``valid_to`` = the change's effective time) and a new open
row is appended. Point-in-time queries then join with
``valid_from <= t AND (valid_to IS NULL OR t < valid_to)`` — the as-of
join (q25) over the history this operator maintains.

Change detection compares the tracked columns only — a replayed update
batch with identical values is a no-op (idempotent apply), and rows whose
tracked values are unchanged are never rewritten.

Scale shape: one equi-join of the update batch onto the CURRENT slice of
the history on the business key (broadcast when the batch is small — the
common case — shuffle-hash otherwise), one map to emit close/open rows,
and a union with the untouched remainder. History rows already closed are
never read past the ``is_current`` partition filter: store the table
partitioned by ``is_current`` (or bucketed by key) so the apply touches
the open partition only, and compose with
``sinks.writers.merge_upsert_partitioned`` to rewrite only affected
partitions.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_scd2(
    history: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    tracked_cols: Sequence[str],
    effective_col: str = "effective_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Apply one update batch to an SCD2 ``history`` and return the new
    history (same schema: ``key_cols + tracked_cols + valid_from +
    valid_to`` with NULL ``valid_to`` marking the open row).

    ``updates`` carries ``key_cols + tracked_cols + effective_col``. For
    each key in the batch whose tracked values differ from the open row
    (or which has no open row), the open row closes at the effective time
    and a new open row starts there. Ties within one batch are undefined —
    pre-aggregate to one row per key per batch (latest wins) upstream.
    """
    keys = list(key_cols)
    tracked = list(tracked_cols)
    open_rows = history.filter(F.col(valid_to).isNull())
    closed_rows = history.filter(F.col(valid_to).isNotNull())

    up = updates.select(
        *keys,
        *[F.col(c).alias(f"__new_{c}") for c in tracked],
        F.col(effective_col).alias("__eff"),
    )
    joined = open_rows.join(up, keys, "full_outer")

    changed = F.col("__eff").isNotNull() & (
        F.col(valid_from).isNull()  # brand-new key
        | ~F.struct(*[F.col(c) for c in tracked]).eqNullSafe(
            F.struct(*[F.col(f"__new_{c}").alias(c) for c in tracked])
        )
    )

    untouched_open = joined.filter(~changed & F.col(valid_from).isNotNull()).select(
        *keys, *tracked, valid_from, F.lit(None).cast("timestamp").alias(valid_to)
    )
    closing = joined.filter(changed & F.col(valid_from).isNotNull()).select(
        *keys, *tracked, valid_from, F.col("__eff").alias(valid_to)
    )
    opening = joined.filter(changed).select(
        *keys,
        *[F.col(f"__new_{c}").alias(c) for c in tracked],
        F.col("__eff").alias(valid_from),
        F.lit(None).cast("timestamp").alias(valid_to),
    )
    return closed_rows.select(
        *keys, *tracked, valid_from, valid_to
    ).unionByName(untouched_open).unionByName(closing).unionByName(opening)


def as_of(
    history: DataFrame,
    ts,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """The point-in-time slice of an SCD2 history at ``ts`` — pair with
    q25's as-of join for event-time enrichment."""
    t = F.lit(ts).cast("timestamp")
    return history.filter(
        (F.col(valid_from) <= t)
        & (F.col(valid_to).isNull() | (t < F.col(valid_to)))
    )
