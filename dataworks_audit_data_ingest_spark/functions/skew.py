"""Skew-mitigation helpers.

AQE's skew-join handling (`session.py` enables it) covers sort-merge joins
at runtime; these helpers cover the cases AQE can't: skewed *aggregations*
and skewed broadcast-ineligible joins, via explicit key salting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: list,
    salt_buckets: int = 16,
    salt_col: str = "_salt",
):
    """Two-stage aggregation over a skewed key: aggregate on (key, salt)
    first — spreading one hot key over ``salt_buckets`` reducers — then
    merge per key. ``aggs`` must be decomposable (sum/count/min/max):
    the caller re-aggregates the partial columns in the second stage.

    Returns the stage-1 DataFrame grouped by (key, salt); callers finish
    with ``.groupBy(key).agg(...)`` over the partials.
    """
    salted = df.withColumn(
        salt_col, (F.monotonically_increasing_id() % salt_buckets).cast("int")
    )
    return salted.groupBy(key, salt_col).agg(*aggs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Skewed equi-join: salt the (large, skewed) left side randomly into
    ``salt_buckets`` and replicate the right side once per bucket, so one
    hot key's rows land on ``salt_buckets`` different reducers.

    Right-side replication costs |right|·buckets — use when the right side
    is too big to broadcast but far smaller than the skewed left.
    """
    left_salted = left.withColumn(
        "_salt", (F.rand(seed=7) * salt_buckets).cast("int")
    )
    buckets = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias("_salt")
    right_replicated = right.select("*", buckets)
    joined = left_salted.join(right_replicated, [key, "_salt"])
    return joined.drop("_salt")
