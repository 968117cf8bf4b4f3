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
