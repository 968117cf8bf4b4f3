"""Snapshot diff: what changed between two versions of a keyed table.

The audit operator that pairs with ``SnapshotTable`` time travel — given
any two snapshots (or any two keyed DataFrames), report each key exactly
once as ``added`` / ``removed`` / ``modified``, with modified rows naming
the columns that differ. The CDC-testing primitive: "what did yesterday's
pipeline run actually change?"

Scale shape: ONE full-outer join on the business key (co-locate both
sides by bucketing the key for recurring diffs) and a map emitting the
change row — no collect, no second pass. Column comparison is null-safe
(`eqNullSafe`), so NULL→value and value→NULL count as changes while
NULL→NULL does not, matching SCD2's change detection
(``sinks/scd2.py``).
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Keyed diff of ``new`` against ``old``: one row per key present in
    either side with a change, schema ``key_cols + (change_type string,
    changed_cols string)`` — ``changed_cols`` is a comma-joined sorted
    column list for modified rows, '' otherwise. Unchanged keys are
    omitted. Keys must be unique per side (pre-aggregate otherwise)."""
    keys = list(key_cols)
    cols = list(
        compare_cols
        if compare_cols is not None
        else [c for c in new.columns if c in old.columns and c not in keys]
    )
    o = old.select(
        *keys, F.lit(1).alias("__in_old"), *[F.col(c).alias(f"__o_{c}") for c in cols]
    )
    n = new.select(
        *keys, F.lit(1).alias("__in_new"), *[F.col(c).alias(f"__n_{c}") for c in cols]
    )
    j = o.join(n, keys, "full_outer")
    diff_flags = [
        (~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))).alias(f"__d_{c}")
        for c in cols
    ]
    j = j.select("*", *diff_flags)
    any_diff = (
        reduce(lambda a, b: a | b, [F.col(f"__d_{c}") for c in cols])
        if cols
        else F.lit(False)
    )
    changed_cols = F.array_join(
        F.array_sort(
            F.filter(
                F.array(
                    *[
                        F.when(F.col(f"__d_{c}"), F.lit(c)).otherwise(F.lit(None))
                        for c in cols
                    ]
                )
                if cols
                else F.array().cast("array<string>"),
                lambda x: x.isNotNull(),
            )
        ),
        ",",
    )
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(any_diff, F.lit("modified"))
    )
    return (
        j.select(*keys, change.alias("change_type"), changed_cols.alias("changed_cols"))
        .filter(F.col("change_type").isNotNull())
        .select(
            *keys,
            "change_type",
            F.when(F.col("change_type") == "modified", F.col("changed_cols"))
            .otherwise(F.lit(""))
            .alias("changed_cols"),
        )
    )
