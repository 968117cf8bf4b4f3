"""Window-function operator surface: ranking, offsets, frames, top-k per
group, and the as-of join (SURVEY.md §2.2 "Window functions" / "range & as-of"
rows — absent from the reference, built on Spark Window / union tricks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import table
from .base import q4, q4_col, register


@register(
    "q12_topk_per_customer",
    sql="""
    SELECT c_custkey, o_orderkey, price_rank,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM (
      SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS price_rank
      FROM orders)
    WHERE price_rank <= 3
    ORDER BY c_custkey, price_rank
    """,
    tags=("window", "topk"),
)
def q12_topk_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via ROW_NUMBER — the scalable alternative to a global
    sort: one hash shuffle on the group key, heap per partition."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("price_rank"),
        )
        .filter(F.col("price_rank") <= 3)
        .orderBy("c_custkey", "price_rank")
    )


@register(
    "q13_running_total",
    sql=f"""
    SELECT event_id, user_id,
           {q4('''SUM(CAST(value AS DECIMAL(18,4)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)''')} AS running_value
    FROM events
    ORDER BY user_id, event_id
    """,
    tags=("window", "running"),
)
def q13_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) sum per user over event time."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        q4_col(F.sum(F.col("value").cast("decimal(18,4)")).over(w)).alias(
            "running_value"
        ),
    ).orderBy("user_id", "event_id")


@register(
    "q14_event_gaps",
    sql="""
    SELECT event_id, user_id,
           epoch_us(CAST(ts AS TIMESTAMP))
             - LAG(epoch_us(CAST(ts AS TIMESTAMP)))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us,
           LEAD(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_event_id
    FROM events
    ORDER BY user_id, event_id
    """,
    tags=("window", "lag"),
)
def q14_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD offsets: inter-event gap in microseconds per user."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    return ev.select(
        "event_id",
        "user_id",
        (us - F.lag(us).over(w)).alias("gap_us"),
        F.lead("event_id").over(w).alias("next_event_id"),
    ).orderBy("user_id", "event_id")


@register(
    "q15_moving_average",
    sql=f"""
    SELECT event_id, user_id,
           {q4('''SUM(CAST(value AS DECIMAL(18,4)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)''')}
             / COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS moving_avg
    FROM events
    ORDER BY user_id, event_id
    """,
    tags=("window", "frame"),
)
def q15_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded ROWS frame: 4-event moving average per user (exact decimal
    numerator so results are partition-order independent)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-3, 0)
    return ev.select(
        "event_id",
        "user_id",
        (
            q4_col(F.sum(F.col("value").cast("decimal(18,4)")).over(w))
            / F.count(F.lit(1)).over(w)
        ).alias("moving_avg"),
    ).orderBy("user_id", "event_id")


@register(
    "q16_acctbal_deciles",
    sql="""
    SELECT decile, COUNT(*) AS n_customers,
           CAST(MIN(c_acctbal) AS DOUBLE) AS min_bal,
           CAST(MAX(c_acctbal) AS DOUBLE) AS max_bal
    FROM (
      SELECT c_acctbal,
             NTILE(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile
      FROM customer)
    GROUP BY decile
    ORDER BY decile
    """,
    tags=("window", "ntile"),
)
def q16_acctbal_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE deciles of account balance.

    Note: an unpartitioned NTILE funnels through one task; at 100 TB the
    engine-recommended path is approxQuantile / percentile_approx — this query
    exists to pin exact NTILE semantics.
    """
    c = table(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return (
        c.select("c_acctbal", F.ntile(10).over(w).alias("decile"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
        )
        .orderBy("decile")
    )


@register(
    "q16s_acctbal_deciles_scale",
    sql=None,  # approximate boundaries are engine-specific — rows-only check
    tags=("window", "ntile", "approx", "scale-path"),
)
def q16s_acctbal_deciles_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path twin of q16: bucketed deciles via ``percentile_approx``.

    q16's exact NTILE funnels the whole table through one task
    (unpartitioned window sort). This is the production form at 100 TB:
    pass 1 computes the 9 decile boundaries with a partial-aggregated
    sketch (no global sort, no single-task stage); pass 2 assigns each row
    its bucket with a pure JVM expression over the broadcast 1-row bounds
    and aggregates per bucket. Both passes are embarrassingly parallel.
    ``tests/test_windows_scalepath.py`` pins agreement with exact q16."""
    c = table(spark, sf_dir, "customer")
    bounds = c.agg(
        F.percentile_approx(
            "c_acctbal", [i / 10.0 for i in range(1, 10)], 100_000
        ).alias("bounds")
    )
    bucketed = c.join(F.broadcast(bounds)).select(
        "c_acctbal",
        F.aggregate(
            "bounds",
            F.lit(1),
            lambda acc, b: acc + F.when(F.col("c_acctbal") > b, 1).otherwise(0),
        ).alias("decile"),
    )
    return (
        bucketed.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
        )
        .orderBy("decile")
    )


@register(
    "q17_nation_rank",
    sql="""
    SELECT c_nationkey, c_custkey,
           CAST(c_acctbal AS DOUBLE) AS c_acctbal,
           bal_rank, bal_dense_rank
    FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS bal_rank,
             DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS bal_dense_rank
      FROM customer)
    WHERE bal_rank <= 2
    ORDER BY c_nationkey, bal_rank
    """,
    tags=("window", "rank"),
)
def q17_nation_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK vs DENSE_RANK per nation, keeping the two richest customers."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.select(
            "c_nationkey",
            "c_custkey",
            "c_acctbal",
            F.rank().over(w).alias("bal_rank"),
            F.dense_rank().over(w).alias("bal_dense_rank"),
        )
        .filter(F.col("bal_rank") <= 2)
        .orderBy("c_nationkey", "bal_rank")
    )


@register(
    "q25_asof_join",
    sql="""
    WITH purchases AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MAX(event_id) AS event_id
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, CAST(ts AS TIMESTAMP)
    ), errors AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
      FROM events WHERE event_type = 'error'
    )
    SELECT e.event_id AS error_id, e.user_id,
           p.event_id AS last_purchase_id,
           epoch_us(e.ts) - epoch_us(p.ts) AS staleness_us
    FROM errors e ASOF LEFT JOIN purchases p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    ORDER BY error_id
    """,
    tags=("join", "asof", "window"),
)
def q25_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each error event matched to the user's latest purchase at
    or before it.

    Implemented with the union + last_value(ignore nulls) trick: tag both
    sides, sort within user by (ts, side), and carry the last-seen purchase
    forward. One shuffle on user_id, no range explosion — this is the shape
    that survives 100 TB, unlike an inequality join + max.
    """
    ev = table(spark, sf_dir, "events")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("event_id"))
        .select("user_id", "ts", "event_id", F.lit(0).alias("side"))
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id", F.lit(1).alias("side")
    )
    # purchase rows sort before error rows at equal ts (side 0 < 1), so an
    # equal-timestamp purchase is visible to the error — matching ASOF's >=.
    unioned = purchases.unionByName(errors)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p_id = F.when(F.col("side") == 0, F.col("event_id"))
    p_ts = F.when(F.col("side") == 0, F.col("ts"))
    return (
        unioned.select(
            "user_id",
            "ts",
            "event_id",
            "side",
            F.last(p_id, ignorenulls=True).over(w).alias("last_purchase_id"),
            F.last(p_ts, ignorenulls=True).over(w).alias("last_purchase_ts"),
        )
        .filter(F.col("side") == 1)
        .select(
            F.col("event_id").alias("error_id"),
            "user_id",
            "last_purchase_id",
            (F.unix_micros("ts") - F.unix_micros("last_purchase_ts")).alias(
                "staleness_us"
            ),
        )
        .orderBy("error_id")
    )


@register(
    "q76_asof_join_forward",
    sql="""
    WITH purchases AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MIN(event_id) AS event_id
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, CAST(ts AS TIMESTAMP)
    ), errors AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
      FROM events WHERE event_type = 'error'
    )
    SELECT e.event_id AS error_id, e.user_id,
           (SELECT p.event_id FROM purchases p
            WHERE p.user_id = e.user_id AND p.ts >= e.ts
            ORDER BY p.ts, p.event_id LIMIT 1) AS next_purchase_id
    FROM errors e
    ORDER BY error_id
    """,
    tags=("join", "asof", "window"),
)
def q76_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: each error matched to the user's NEXT purchase at
    or after it (q25's mirror — the direction DuckDB's ASOF can't express,
    so the oracle is a correlated subquery).

    Same union + carry trick as q25 but ordered descending with
    first-upcoming semantics: one shuffle on user, linear in rows.
    """
    ev = table(spark, sf_dir, "events")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.min("event_id").alias("event_id"))
        .select("user_id", "ts", "event_id", F.lit(0).alias("side"))
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id", F.lit(1).alias("side")
    )
    unioned = purchases.unionByName(errors)
    # descending time: the "last seen" purchase while walking backward is the
    # next-upcoming one in forward time; purchase sorts before error at equal
    # ts (side asc within desc ts ordering via secondary key trick)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ts"), F.asc("side"), F.desc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p_id = F.when(F.col("side") == 0, F.col("event_id"))
    return (
        unioned.select(
            "user_id",
            "ts",
            "event_id",
            "side",
            F.last(p_id, ignorenulls=True).over(w).alias("next_purchase_id"),
        )
        .filter(F.col("side") == 1)
        .select(
            F.col("event_id").alias("error_id"),
            "user_id",
            "next_purchase_id",
        )
        .orderBy("error_id")
    )


# ---------------------------------------------------------------------------
# q110 — histogram-quantile sketch (deterministic approximate deciles)
# ---------------------------------------------------------------------------
# q16 pins exact NTILE (single-task global sort — the oracle form); q16s is
# the percentile_approx production form but rows-only (sketch internals are
# engine-specific). This closes the triangle: an approximate-quantile that
# is BOTH parallel at 100 TB AND engine-exact, via fixed-width binning in
# BIGINT cents:
#
#   v    = acctbal in cents;  pass 1: global (vmin, vmax, N)
#   bin  = ((v - vmin) * B) DIV (vmax - vmin + 1)      (B = 1024 bins)
#   decile p boundary = lower edge of the first bin whose cumulative
#                       count satisfies cum * 10 >= p * N
#
# Max error is one bin width ((vmax-vmin)/B); every step is integer
# arithmetic so both engines land on the same bin.
_HQ_BINS = 1024


@register(
    "q110_histogram_quantiles",
    sql=f"""
    WITH v AS (
      SELECT CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS cents FROM customer
    ), bounds AS (
      SELECT MIN(cents) AS vmin, MAX(cents) AS vmax, COUNT(*) AS n FROM v
    ), bins AS (
      SELECT ((cents - vmin) * {_HQ_BINS}) // (vmax - vmin + 1) AS bin,
             COUNT(*) AS cnt
      FROM v CROSS JOIN bounds GROUP BY 1
    ), cum AS (
      SELECT bin, SUM(cnt) OVER (ORDER BY bin) AS cum FROM bins
    ), deciles AS (
      SELECT p.p AS decile, MIN(c.bin) AS bin
      FROM (SELECT UNNEST(RANGE(1, 10)) AS p) p
      CROSS JOIN bounds b
      JOIN cum c ON c.cum * 10 >= p.p * b.n
      GROUP BY p.p
    )
    SELECT d.decile,
           CAST(CAST(b.vmin + (d.bin * (b.vmax - b.vmin + 1)) // {_HQ_BINS}
                     AS DOUBLE) / 100 AS DOUBLE) AS approx_bal
    FROM deciles d CROSS JOIN bounds b
    ORDER BY d.decile
    """,
    tags=("window", "quantile", "sketch", "scale-path", "exact-integer"),
)
def q110_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate acctbal deciles from a fixed-width histogram — the
    engine-exact approximate-quantile (see module comment): parallel like
    q16s, hash-checkable like q16.

    Scale shape: pass 1 (min/max/count) and pass 2 (per-bin counts) are
    both partial-aggregated corpus scans with broadcast 1-row bounds in
    between — no global sort, no single-task data stage. Everything after
    the second agg operates on <= B = 1024 rows (the cumulative window and
    decile probe are sketch-sized, not data-sized). Max quantile error is
    one bin width; tightening it is a B knob, not a plan change. The same
    two-pass shape handles any per-group variant by adding the group key
    to both aggs."""
    c = table(spark, sf_dir, "customer")
    v = c.select(
        # FLOOR(x*100 + 0.5), not a bare double->BIGINT cast: DuckDB's
        # cast ROUNDS while Spark's truncates (954 of 15,000 sf0.1 rows
        # differ, shifting vmax and bin edges) — the portable cents idiom
        F.expr("CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)").alias("cents")
    )
    bounds = v.agg(
        F.min("cents").alias("vmin"),
        F.max("cents").alias("vmax"),
        F.count(F.lit(1)).alias("n"),
    )
    bins = (
        v.join(F.broadcast(bounds))
        .select(
            F.expr(
                f"((cents - vmin) * {_HQ_BINS}) DIV (vmax - vmin + 1)"
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cum = bins.select(
        "bin", F.sum("cnt").over(Window.orderBy("bin")).alias("cum")
    )
    ps = spark.range(1, 10).select(F.col("id").alias("decile"))
    deciles = (
        cum.join(F.broadcast(bounds))
        .join(F.broadcast(ps), F.col("cum") * 10 >= F.col("decile") * F.col("n"))
        .groupBy("decile")
        .agg(F.min("bin").alias("bin"))
    )
    return (
        deciles.join(F.broadcast(bounds))
        .select(
            "decile",
            F.expr(
                f"CAST(CAST(vmin + (bin * (vmax - vmin + 1)) DIV {_HQ_BINS}"
                f" AS DOUBLE) / 100 AS DOUBLE)"
            ).alias("approx_bal"),
        )
        .orderBy("decile")
    )


@register(
    "q127_revenue_share",
    sql="""
    WITH rev AS (
      SELECT n.n_name AS nation, r.r_name AS region,
             CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS revenue
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2
    )
    SELECT nation, region,
           CAST(revenue AS DOUBLE) AS revenue,
           CAST((CAST(10000 AS HUGEINT) * CAST(revenue * 100 AS BIGINT))
                // SUM(CAST(revenue * 100 AS BIGINT)) OVER (PARTITION BY region)
                AS BIGINT) AS region_share_bps,
           CAST((CAST(10000 AS HUGEINT) * CAST(revenue * 100 AS BIGINT))
                // SUM(CAST(revenue * 100 AS BIGINT)) OVER ()
                AS BIGINT) AS global_share_bps
    FROM rev
    ORDER BY region, revenue DESC, nation
    """,
    tags=("window", "ratio-to-report", "share", "bi"),
)
def q127_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each nation\'s revenue as basis points of its
    region\'s total and of the global total — the share-of-whole window
    pattern every BI layer needs, in integer bps over BIGINT cents (the
    exact decimal sum converts to cents first — decimal division itself
    rounds engine-dependently, a pitfall this query exists to pin).

    Scale shape: the star join broadcasts nation/region onto a single
    orders⋈customer exchange; the window partials then run over the
    AGGREGATED nation table (hundreds of rows), so the share computation
    is free no matter the fact volume — the global-total window\'s single
    partition holds |nations| rows, not data. This post-aggregate window
    placement is the same trick as q37s."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(n.n_name.alias("nation"), r.r_name.alias("region"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("decimal(18,4)")
            .alias("revenue")
        )
    )
    cents = rev.withColumn(
        "cents", F.expr("CAST(revenue * 100 AS BIGINT)")
    )
    shares = cents.select(
        "nation",
        "region",
        "revenue",
        "cents",
        F.sum("cents").over(Window.partitionBy("region")).alias("regsum"),
        F.sum("cents").over(Window.partitionBy()).alias("allsum"),
    )
    return shares.select(
        "nation",
        "region",
        F.col("revenue").cast("double").alias("revenue"),
        F.expr(
            "CAST((10000 * CAST(cents AS DECIMAL(38,0))) DIV regsum AS BIGINT)"
        ).alias(
            "region_share_bps"
        ),
        F.expr(
            "CAST((10000 * CAST(cents AS DECIMAL(38,0))) DIV allsum AS BIGINT)"
        ).alias(
            "global_share_bps"
        ),
    ).orderBy("region", F.desc("revenue"), "nation")
