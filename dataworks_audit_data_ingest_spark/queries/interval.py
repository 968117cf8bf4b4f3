"""Interval / theta-join operators expressed scalably.

The naive form of "pairs within Δt" is an inequality join — a per-key cross
product. The scalable form buckets time into Δt-sized cells and equi-joins
each cell to itself and its neighbor, turning the theta join into a keyed
hash join with a residual predicate. The oracle states the naive form; the
engine runs the bucketed form — same result set, different join strategy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import table
from .base import register

_WINDOW_US = 60_000_000  # 60 seconds


@register(
    "q46_interval_self_join",
    sql=f"""
    SELECT a.event_id AS event_a, b.event_id AS event_b, a.user_id,
           epoch_us(CAST(b.ts AS TIMESTAMP)) - epoch_us(CAST(a.ts AS TIMESTAMP)) AS gap_us
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.event_id > a.event_id
     AND epoch_us(CAST(b.ts AS TIMESTAMP)) - epoch_us(CAST(a.ts AS TIMESTAMP))
         BETWEEN 0 AND {_WINDOW_US}
     AND a.event_type = 'error' AND b.event_type = 'error'
    ORDER BY event_a, event_b
    """,
    tags=("join", "interval", "theta"),
)
def q46_interval_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error bursts: pairs of error events of the same user within 60 s.

    Bucketed evaluation: each event lands in its ⌊t/Δt⌋ cell; candidate
    pairs come from an equi-join on (user, cell) with the right side
    expanded to (cell, cell+1), then the exact Δt residual filters. The
    shuffle is keyed on (user, cell) — no per-user cross product, so a
    hot user costs O(events-per-2Δt-window), not O(events²).
    """
    ev = table(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    us = F.unix_micros("ts")
    base = ev.select(
        "event_id", "user_id", us.alias("t"), (us / _WINDOW_US).cast("long").alias("cell")
    )
    # left side indexed by its own cell; right side registered under both its
    # cell and the previous one, so any pair within Δt shares a join key
    left = base.select("user_id", F.col("event_id").alias("event_a"), F.col("t").alias("ta"), "cell")
    right = base.select(
        "user_id",
        F.col("event_id").alias("event_b"),
        F.col("t").alias("tb"),
        F.explode(F.array(F.col("cell"), F.col("cell") - 1)).alias("cell"),
    )
    return (
        left.join(right, ["user_id", "cell"])
        .filter(
            (F.col("event_b") > F.col("event_a"))
            & (F.col("tb") - F.col("ta")).between(0, _WINDOW_US)
        )
        .select(
            "event_a",
            "event_b",
            "user_id",
            (F.col("tb") - F.col("ta")).alias("gap_us"),
        )
        .distinct()
        .orderBy("event_a", "event_b")
    )


@register(
    "q47_histogram",
    sql="""
    WITH bounds AS (
      SELECT MIN(o_totalprice) AS lo FROM orders
    )
    SELECT CAST(FLOOR((o_totalprice - lo) / 25000.0) AS BIGINT) AS bucket,
           COUNT(*) AS n_orders,
           CAST(MIN(o_totalprice) AS DOUBLE) AS bucket_min,
           CAST(MAX(o_totalprice) AS DOUBLE) AS bucket_max
    FROM orders CROSS JOIN bounds
    GROUP BY 1
    ORDER BY bucket
    """,
    tags=("agg", "histogram"),
)
def q47_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram: bucket index from integer floor arithmetic
    (portable), one scan + one agg; the min is a broadcast scalar."""
    o = table(spark, sf_dir, "orders")
    lo = o.agg(F.min("o_totalprice")).first()[0]
    bucket = F.floor((F.col("o_totalprice") - F.lit(lo)) / 25000.0).cast("bigint")
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("bucket_min"),
            F.max("o_totalprice").alias("bucket_max"),
        )
        .orderBy("bucket")
    )


@register(
    "q49_filtered_aggregates",
    sql="""
    SELECT user_id,
           COUNT(*) AS n_events,
           COUNT(*) FILTER (WHERE event_type = 'error') AS n_errors,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
           CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS DOUBLE)
             / COUNT(*) AS error_rate
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("agg", "filter-clause"),
)
def q49_filtered_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER-clause aggregates: several conditional counts in one pass
    (one scan, one agg — not one scan per condition)."""
    ev = table(spark, sf_dir, "events")
    n_err = F.count_if(F.col("event_type") == "error")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            n_err.alias("n_errors"),
            F.count_if(F.col("event_type") == "purchase").alias("n_purchases"),
            (n_err.cast("double") / F.count(F.lit(1))).alias("error_rate"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# q158 — merged interval coverage (union-of-intervals length)
# ---------------------------------------------------------------------------
# Each event opens a 5-minute activity window; the question "how long was
# each user actually active" is the LENGTH OF THE UNION of overlapping
# intervals — the classic SQL problem solved by gaps-and-islands: an
# interval starts a new island iff its start exceeds the running max end
# of everything before it; island id = running count of such starts; then
# coverage = Σ per island (max end − min start). One user-keyed window
# pass, exact integer microseconds.
_ACT_WINDOW_US = 5 * 60 * 1_000_000


@register(
    "q158_interval_coverage",
    sql=f"""
    WITH iv AS (
      SELECT user_id, epoch_us(ts) AS s,
             epoch_us(ts) + {_ACT_WINDOW_US} AS e
      FROM events
    ), marked AS (
      SELECT user_id, s, e,
             CASE WHEN s > COALESCE(MAX(e) OVER
               (PARTITION BY user_id ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               -9223372036854775807) THEN 1 ELSE 0 END AS new_island
      FROM iv
    ), islands AS (
      SELECT user_id, s, e,
             SUM(new_island) OVER (PARTITION BY user_id ORDER BY s, e
                                   ROWS UNBOUNDED PRECEDING) AS island
      FROM marked
    ), merged AS (
      SELECT user_id, island, MIN(s) AS ms, MAX(e) AS me
      FROM islands GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(me - ms) // 1000000 AS BIGINT) AS covered_s,
           CAST(MAX(me - ms) // 1000000 AS BIGINT) AS longest_island_s
    FROM merged
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("interval", "gaps-and-islands", "coverage", "timeseries"),
)
def q158_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-of-intervals activity coverage per user: 5-minute windows
    around each event merged into maximal islands (an interval opens a
    new island iff it starts after the running max end of all earlier
    ones), reporting island count, total covered seconds, and the
    longest stretch — the exact answer to "how much wall-clock was this
    user active", which naive Σ(window lengths) overstates wherever
    windows overlap.

    Scale shape: one user_id exchange; the island detection is two
    window passes over the same sort (running max end, running island
    count) and a per-island rollup. Exact integer microseconds end to
    end."""
    from pyspark.sql import Window

    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + _ACT_WINDOW_US).alias("e"),
    )
    w = Window.partitionBy("user_id").orderBy("s", "e")
    marked = ev.withColumn(
        "new_island",
        F.when(
            F.col("s")
            > F.coalesce(
                F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(-9223372036854775807),
            ),
            1,
        ).otherwise(0),
    )
    islands = marked.withColumn(
        "island",
        F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    merged = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("ms"), F.max("e").alias("me")
    )
    return (
        merged.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_islands"),
            F.expr("CAST(SUM(me - ms) DIV 1000000 AS BIGINT)").alias(
                "covered_s"
            ),
            F.expr("CAST(MAX(me - ms) DIV 1000000 AS BIGINT)").alias(
                "longest_island_s"
            ),
        )
        .orderBy("user_id")
    )
