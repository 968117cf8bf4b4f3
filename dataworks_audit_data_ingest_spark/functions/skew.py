"""Skew-mitigation helpers.

AQE's skew-join handling (`session.py` enables it) covers sort-merge joins
at runtime; these helpers cover the cases AQE can't: skewed *aggregations*
and skewed broadcast-ineligible joins, via explicit key salting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Shared by key_skew_report / key_skew_milli and pinned by the overflow
# regression test. Products run in DECIMAL(38,0): `1000 * max_c * n_keys`
# and `c * n_keys` are BIGINT multiplications that silently wrap on
# (non-ANSI) Spark at extreme scale — e.g. a ~1e9-row hot key over ~1e7
# keys pushes 1000·max_c·n_keys past 2^63 and a wrapped-NEGATIVE
# skew_milli would silently disable maybe_salted_join's salting on
# exactly the most-skewed tables it exists to handle. Same idiom as the
# round-6 overflow sweep (q114/q140/...); the q124 oracle uses HUGEINT.
SKEW_MILLI_EXPR = (
    "CAST((CAST(1000 AS DECIMAL(38,0)) * max_c * n_keys)"
    " DIV n_rows AS BIGINT)"
)
HOT_KEY_PRED = (
    "CAST(c AS DECIMAL(38,0)) * n_keys > CAST(3 AS DECIMAL(38,0)) * n_rows"
)


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


def key_skew_report(df: DataFrame, key: str) -> DataFrame:
    """Join-key skew report as a reusable operator: one row of
    ``(n_keys, n_rows, max_rows_per_key, skew_milli, n_hot_keys)`` for
    ``df``'s ``key`` histogram — q124 runs exactly this against the
    DuckDB oracle (`queries/relational.py::q124_skew_report` delegates
    here). skew_milli is max/mean rows-per-key in milli-units (1000 =
    uniform); n_hot_keys counts keys above 3× the mean (pure integer:
    c·n_keys > 3·n_rows).

    Persist it per table/key (``report.write.parquet(path)``) on the
    ingest cadence and feed joins via :func:`load_skew_milli` — the
    production wiring that avoids a per-join histogram scan.

    Scale shape: one partial-aggregated count per key, then
    constant-size moments; the histogram never leaves the cluster and
    the five numbers are the entire result.
    """
    keyed = df.groupBy(F.col(key).alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    )
    stats = keyed.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("c").alias("n_rows"),
        F.max("c").alias("max_c"),
    )
    hot = (
        keyed.join(F.broadcast(stats))
        .filter(F.expr(HOT_KEY_PRED))
        .agg(F.count(F.lit(1)).alias("n_hot_keys"))
    )
    return stats.join(F.broadcast(hot)).select(
        F.col("n_keys").cast("bigint"),
        F.col("n_rows").cast("bigint"),
        F.col("max_c").cast("bigint").alias("max_rows_per_key"),
        F.expr(SKEW_MILLI_EXPR).alias("skew_milli"),
        F.col("n_hot_keys").cast("bigint"),
    )


def load_skew_milli(spark, path: str) -> int:
    """skew_milli from a persisted :func:`key_skew_report` parquet — the
    one number :func:`maybe_salted_join` needs; a missing/empty report
    raises (a silently-defaulted 1000 would quietly disable salting)."""
    rows = spark.read.parquet(path).select("skew_milli").collect()
    if len(rows) != 1 or rows[0]["skew_milli"] is None:
        raise ValueError(
            f"{path}: expected exactly one key_skew_report row with a "
            f"non-null skew_milli, got {len(rows)}"
        )
    return int(rows[0]["skew_milli"])


def key_skew_milli(df: DataFrame, key: str) -> int:
    """Integer skew factor of ``df``'s ``key`` histogram: max rows-per-key
    over mean rows-per-key in milli-units (1000 = perfectly uniform) —
    the same metric q124's skew report computes
    (`queries/relational.py::q124_skew_report`), reduced to the one
    number a salting decision needs.

    Cost: one partial-aggregated count per key plus a constant-size
    moment reduction; the single-row collect is driver-small by
    construction. At scale, compute this once per table/key from the
    standing q124-style report and pass it to :func:`maybe_salted_join`
    via ``skew_milli`` instead of re-scanning per join.
    """
    rows = (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("c").alias("n_rows"),
            F.max("c").alias("max_c"),
        )
        .select(F.expr(SKEW_MILLI_EXPR).alias("skew_milli"))
        .collect()
    )
    # empty input: n_rows = 0 ⇒ DIV yields NULL ⇒ treat as uniform
    if not rows or rows[0]["skew_milli"] is None:
        return 1000
    return int(rows[0]["skew_milli"])


def maybe_salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 16,
    skew_threshold_milli: int = 10_000,
    skew_milli: int | None = None,
) -> DataFrame:
    """Equi-join that salts ONLY when the left side's key histogram says
    it must — the decision loop q124's report describes, closed.

    ``skew_milli`` ≥ ``skew_threshold_milli`` (default 10⁴: one key
    holds ≥ 10× its uniform share, enough to straggle a plain shuffle
    join even with AQE's skew split, which cannot split a single key's
    build side) ⇒ :func:`salted_join`; below it, a plain join so the
    optimizer keeps every strategy (broadcast, sort-merge, AQE) open and
    no replication cost is paid. Pass a precomputed ``skew_milli`` (from
    a standing q124-style report) to skip the histogram scan; otherwise
    :func:`key_skew_milli` computes it from ``left``.

    Both branches return identical rows and column order
    (key, left-cols, right-cols) — pinned by test.
    """
    if skew_milli is None:
        skew_milli = key_skew_milli(left, key)
    if skew_milli >= skew_threshold_milli:
        return salted_join(left, right, key, salt_buckets)
    return left.join(right, key)
