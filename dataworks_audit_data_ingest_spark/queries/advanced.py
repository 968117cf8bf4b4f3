"""Second relational batch: pivot/unpivot, exact percentiles, scalar
subqueries, array/map expressions, value-window functions, distribution
ranks, and sketch aggregates (SURVEY.md §2.2 coverage rows with no reference
analog — all pure Spark built-ins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from ..functions.localrel import local_rows_df

from ..tables import table
from .base import register

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "q34_pivot",
    sql=f"""
    SELECT CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
           {", ".join(f"COUNT(CASE WHEN event_type = '{t}' THEN 1 END) AS n_{t}" for t in _EVENT_TYPES)}
    FROM events
    GROUP BY 1
    ORDER BY day
    """,
    tags=("agg", "pivot"),
)
def q34_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: event_type counts widened to one column per type.

    The value list is explicit, so Spark skips the extra distinct-values job
    — at 100 TB an unlisted pivot would scan the fact table twice.
    """
    ev = table(spark, sf_dir, "events")
    piv = (
        ev.select(F.date_trunc("day", "ts").cast("date").alias("day"), "event_type")
        .groupBy("day")
        .pivot("event_type", _EVENT_TYPES)
        .count()
    )
    return piv.select(
        "day",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in _EVENT_TYPES],
    ).orderBy("day")


@register(
    "q35_unpivot",
    sql="""
    SELECT p_partkey, measure, value FROM (
      SELECT p_partkey, 'size' AS measure, CAST(p_size AS DOUBLE) AS value FROM part
      UNION ALL
      SELECT p_partkey, 'retailprice' AS measure, p_retailprice AS value FROM part
    )
    WHERE p_partkey < 50
    ORDER BY p_partkey, measure
    """,
    tags=("unpivot", "melt"),
)
def q35_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): wide measures to long (measure, value) pairs."""
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") < 50)
    return (
        p.select(
            "p_partkey",
            F.col("p_size").cast("double").alias("size"),
            F.col("p_retailprice").alias("retailprice"),
        )
        .unpivot("p_partkey", ["size", "retailprice"], "measure", "value")
        .orderBy("p_partkey", "measure")
    )


@register(
    "q28_percentiles",
    sql="""
    WITH ranked AS (
      SELECT o_orderstatus, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                ORDER BY o_totalprice, o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
      FROM orders
    )
    SELECT o_orderstatus,
           MAX(CASE WHEN rn = 1 + CAST(FLOOR(0.25 * (n - 1)) AS BIGINT) THEN o_totalprice END) AS p25,
           MAX(CASE WHEN rn = 1 + CAST(FLOOR(0.50 * (n - 1)) AS BIGINT) THEN o_totalprice END) AS p50,
           MAX(CASE WHEN rn = 1 + CAST(FLOOR(0.75 * (n - 1)) AS BIGINT) THEN o_totalprice END) AS p75,
           MAX(n) AS n_orders
    FROM ranked
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tags=("agg", "percentile"),
)
def q28_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group percentiles as order statistics (lower value at
    position 1+⌊q·(n−1)⌋) — engine-portable, no interpolation-rule drift.

    At 100 TB: one shuffle on the group key; for global percentiles prefer
    percentile_approx (t-digest sketch, q42) — this exact form is per-group.
    """
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    wn = Window.partitionBy("o_orderstatus")
    ranked = o.select(
        "o_orderstatus",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    pick = lambda q: F.max(  # noqa: E731
        F.when(
            F.col("rn")
            == 1 + F.floor(F.lit(q) * (F.col("n") - 1)).cast("bigint"),
            F.col("o_totalprice"),
        )
    )
    return (
        ranked.groupBy("o_orderstatus")
        .agg(
            pick(0.25).alias("p25"),
            pick(0.50).alias("p50"),
            pick(0.75).alias("p75"),
            F.max("n").alias("n_orders"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "q29_scalar_subquery",
    sql="""
    SELECT o_orderstatus,
           COUNT(*) AS n_above_avg
    FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tags=("subquery", "filter"),
)
def q29_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate: orders above the global mean.

    The mean's floating rounding could differ across engines, but it only
    thresholds a comparison — safe unless a row sits within 1 ulp of it
    (impossible here: prices have few digits, the mean has many).
    """
    o = table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("q29_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, COUNT(*) AS n_above_avg
        FROM q29_orders
        WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM q29_orders)
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
        """
    )


@register(
    "q27_array_functions",
    sql="""
    SELECT n_nationkey,
           LEN(segs) AS n_segments,
           segs[1] AS first_segment,
           ARRAY_TO_STRING(segs, '|') AS seg_csv,
           LIST_CONTAINS(segs, 'BUILDING') AS has_building
    FROM (
      SELECT c_nationkey AS n_nationkey,
             LIST_SORT(LIST_DISTINCT(LIST(c_mktsegment))) AS segs
      FROM customer
      GROUP BY c_nationkey)
    ORDER BY n_nationkey
    """,
    tags=("array", "agg"),
)
def q27_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation + array expressions: collect_set sorted for
    determinism, then size/index/join/contains."""
    c = table(spark, sf_dir, "customer")
    return (
        c.groupBy(F.col("c_nationkey").alias("n_nationkey"))
        .agg(F.array_sort(F.collect_set("c_mktsegment")).alias("segs"))
        .select(
            "n_nationkey",
            F.size("segs").alias("n_segments"),
            F.element_at("segs", 1).alias("first_segment"),
            F.array_join("segs", "|").alias("seg_csv"),
            F.array_contains("segs", "BUILDING").alias("has_building"),
        )
        .orderBy("n_nationkey")
    )


@register(
    "q36_first_last_window",
    sql="""
    SELECT DISTINCT user_id,
           FIRST_VALUE(event_id) OVER w AS first_event,
           LAST_VALUE(event_id)  OVER w AS last_event,
           FIRST_VALUE(event_type) OVER w AS first_type,
           NTH_VALUE(event_id, 2) OVER w AS second_event
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY user_id
    """,
    tags=("window", "value"),
)
def q36_first_last_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE / LAST_VALUE / NTH_VALUE over an unbounded frame: each
    user's first and last events in one pass."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        ev.select(
            "user_id",
            F.first("event_id").over(w).alias("first_event"),
            F.last("event_id").over(w).alias("last_event"),
            F.first("event_type").over(w).alias("first_type"),
            F.nth_value("event_id", 2).over(w).alias("second_event"),
        )
        .distinct()
        .orderBy("user_id")
    )


@register(
    "q37_distribution_ranks",
    sql="""
    SELECT s_suppkey, s_name,
           PERCENT_RANK() OVER (ORDER BY s_acctbal, s_suppkey) AS bal_pct_rank,
           CUME_DIST()    OVER (ORDER BY s_acctbal, s_suppkey) AS bal_cume_dist
    FROM supplier
    ORDER BY s_suppkey
    """,
    tags=("window", "rank"),
)
def q37_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENT_RANK / CUME_DIST — distribution positions (exact integer-ratio
    doubles, portable)."""
    s = table(spark, sf_dir, "supplier")
    w = Window.orderBy("s_acctbal", "s_suppkey")
    return s.select(
        "s_suppkey",
        "s_name",
        F.percent_rank().over(w).alias("bal_pct_rank"),
        F.cume_dist().over(w).alias("bal_cume_dist"),
    ).orderBy("s_suppkey")


@register(
    "q37s_distribution_ranks_scale",
    sql="""
    SELECT s_suppkey, s_name,
           PERCENT_RANK() OVER (ORDER BY s_acctbal) AS bal_pct_rank,
           CUME_DIST()    OVER (ORDER BY s_acctbal) AS bal_cume_dist
    FROM supplier
    ORDER BY s_suppkey
    """,
    tags=("window", "rank", "scale-path"),
)
def q37s_distribution_ranks_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path twin of q37: exact two-pass PERCENT_RANK / CUME_DIST with
    standard ties semantics, no full-table single-task sort.

    The only ordered window runs over the **distinct-value histogram**
    (|values| rows, not |table| rows): groupBy(value) → cumulative count →
    join ranks back on the value. With standard SQL ties semantics
    (rank = rows strictly below + 1, shared by ties) this is exactly
    PERCENT_RANK/CUME_DIST — and oracle-able, unlike an approximate rank.
    At 100 TB the table never passes through one task; only the bounded
    value domain does. (Single-row table would hit the n-1 = 0 division;
    PERCENT_RANK is defined as 0 there — callers guard if that's live.)"""
    s = table(spark, sf_dir, "supplier")
    hist = s.groupBy("s_acctbal").agg(F.count(F.lit(1)).alias("cnt"))
    wv = Window.orderBy("s_acctbal")
    cum = hist.select(
        "s_acctbal", "cnt", F.sum("cnt").over(wv).alias("cum_n")
    )
    tot = hist.agg(F.sum("cnt").alias("n_total"))
    return (
        s.join(cum, "s_acctbal")
        .join(F.broadcast(tot))
        .select(
            "s_suppkey",
            "s_name",
            (
                (F.col("cum_n") - F.col("cnt")).cast("double")
                / (F.col("n_total") - 1)
            ).alias("bal_pct_rank"),
            (F.col("cum_n").cast("double") / F.col("n_total")).alias(
                "bal_cume_dist"
            ),
        )
        .orderBy("s_suppkey")
    )


@register(
    "q42_approx_distinct_sketch",
    sql=None,  # HLL++ sketch values are engine-specific — rows-only check
    tags=("agg", "sketch", "approx"),
)
def q42_approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) per event_type, with the exact
    count alongside and the relative error surfaced.

    No SQL oracle: sketch estimates are implementation-specific (Spark HLL++
    vs DuckDB HLL differ by design); the query instead self-reports
    |approx−exact|/exact, which the rows-only check records.
    """
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .withColumn(
            "rel_error",
            F.abs(F.col("approx_users") - F.col("exact_users"))
            / F.col("exact_users"),
        )
        .orderBy("event_type")
    )


@register(
    "q38_full_outer_join",
    sql="""
    WITH c AS (
      SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
      FROM customer GROUP BY c_nationkey
    ), s AS (
      SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
      FROM supplier GROUP BY s_nationkey
    )
    SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
           COALESCE(n_customers, 0) AS n_customers,
           COALESCE(n_suppliers, 0) AS n_suppliers,
           CASE WHEN c.nationkey IS NULL THEN 'supplier_only'
                WHEN s.nationkey IS NULL THEN 'customer_only'
                ELSE 'both' END AS presence
    FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
    ORDER BY nationkey
    """,
    tags=("join", "outer", "full"),
)
def q38_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join preserving unmatched rows on both sides, with
    NULL-safe coalescing — completes the outer-join family (left: q07)."""
    c = (
        table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    s = (
        table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    ca, sa = c.alias("c"), s.alias("s")
    return (
        ca.join(sa, F.col("c.nationkey") == F.col("s.nationkey"), "full_outer")
        .select(
            F.coalesce(F.col("c.nationkey"), F.col("s.nationkey")).alias("nationkey"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
            F.when(F.col("c.nationkey").isNull(), "supplier_only")
            .when(F.col("s.nationkey").isNull(), "customer_only")
            .otherwise("both")
            .alias("presence"),
        )
        .orderBy("nationkey")
    )


@register(
    "q39_map_functions",
    sql="""
    SELECT user_id,
           STRING_AGG(event_type || ':' || n, ',' ORDER BY event_type) AS type_counts,
           COUNT(*) AS n_types
    FROM (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events GROUP BY user_id, event_type)
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("map", "agg"),
)
def q39_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed aggregation: per-user event_type→count map built with
    map_from_entries, then serialized to a sorted canonical string (maps
    have no cross-engine wire equality; the canonical form does)."""
    ev = table(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        per_type.groupBy("user_id")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("event_type", "n")))
            ).alias("m")
        )
        .select(
            "user_id",
            F.expr(
                "ARRAY_JOIN(TRANSFORM(MAP_ENTRIES(m), e -> CONCAT(e.key, ':', e.value)), ',')"
            ).alias("type_counts"),
            F.size(F.map_keys("m")).alias("n_types"),
        )
        .orderBy("user_id")
    )


@register(
    "q43_correlated_min",
    sql="""
    SELECT p_brand, p_partkey, p_name,
           CAST(p_retailprice AS DOUBLE) AS p_retailprice
    FROM part p
    WHERE p_retailprice = (SELECT MIN(p2.p_retailprice) FROM part p2
                           WHERE p2.p_brand = p.p_brand)
    ORDER BY p_brand, p_partkey
    """,
    tags=("subquery", "correlated"),
)
def q43_correlated_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q2 shape): rows matching their
    group's minimum. Catalyst de-correlates this into an aggregate + join —
    one shuffle on the correlation key, not a per-row subquery execution.
    """
    p = table(spark, sf_dir, "part")
    p.createOrReplaceTempView("q43_part")
    return spark.sql(
        """
        SELECT p_brand, p_partkey, p_name,
               CAST(p_retailprice AS DOUBLE) AS p_retailprice
        FROM q43_part p
        WHERE p_retailprice = (SELECT MIN(p2.p_retailprice) FROM q43_part p2
                               WHERE p2.p_brand = p.p_brand)
        ORDER BY p_brand, p_partkey
        """
    )


@register(
    "q74_percentile_sketch",
    sql=None,  # t-digest / interpolation sketches are engine-specific — rows-only
    tags=("agg", "sketch", "percentile"),
)
def q74_percentile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (t-digest-style sketch) — the global-percentile
    scale path the exact order-statistics query (q28) points to: mergeable
    partial sketches, no global sort. Self-reports deviation from the exact
    per-group p50 so the rows-only check captures accuracy."""
    o = table(spark, sf_dir, "orders")
    approx = o.groupBy("o_orderstatus").agg(
        F.percentile_approx("o_totalprice", 0.5, 10_000).alias("p50_approx"),
        F.expr("PERCENTILE(o_totalprice, 0.5)").alias("p50_exact"),
    )
    return approx.select(
        "o_orderstatus",
        "p50_approx",
        "p50_exact",
        (F.abs(F.col("p50_approx") - F.col("p50_exact")) / F.col("p50_exact")).alias(
            "rel_dev"
        ),
    ).orderBy("o_orderstatus")


@register(
    "q75_data_profile",
    sql="""
    SELECT 'o_totalprice' AS column_name,
           COUNT(*) AS n_rows,
           COUNT(o_totalprice) AS n_nonnull,
           COUNT(DISTINCT o_totalprice) AS n_distinct,
           CAST(MIN(o_totalprice) AS VARCHAR) AS min_value,
           CAST(MAX(o_totalprice) AS VARCHAR) AS max_value
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*), COUNT(o_orderstatus),
           COUNT(DISTINCT o_orderstatus),
           MIN(o_orderstatus), MAX(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_custkey', COUNT(*), COUNT(o_custkey),
           COUNT(DISTINCT o_custkey),
           CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
    FROM orders
    ORDER BY column_name
    """,
    tags=("profile", "quality"),
)
def q75_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data profiling: per-column row/null/distinct/min/max in one pass per
    column set — the data-quality health check run before any pipeline
    stage. (At 100 TB swap exact distinct for approx_count_distinct.)"""
    o = table(spark, sf_dir, "orders")

    def profile(col: str):
        return o.agg(
            F.lit(col).alias("column_name"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count(col).alias("n_nonnull"),
            F.countDistinct(col).alias("n_distinct"),
            F.min(col).cast("string").alias("min_value"),
            F.max(col).cast("string").alias("max_value"),
        )

    return (
        profile("o_totalprice")
        .unionByName(profile("o_orderstatus"))
        .unionByName(profile("o_custkey"))
        .orderBy("column_name")
    )


@register(
    "q77_schema_evolution_union",
    sql="""
    SELECT src, o_orderkey, o_totalprice, o_orderpriority
    FROM (
      SELECT 'v1' AS src, o_orderkey, o_totalprice,
             CAST(NULL AS VARCHAR) AS o_orderpriority
      FROM orders WHERE o_orderkey < 100
      UNION ALL
      SELECT 'v2', o_orderkey, o_totalprice, o_orderpriority
      FROM orders WHERE o_orderkey >= 100 AND o_orderkey < 200)
    ORDER BY o_orderkey
    """,
    tags=("setop", "schema-evolution"),
)
def q77_schema_evolution_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: an old extract missing a column unions with
    the current shape via unionByName(allowMissingColumns=True) — absent
    fields become NULLs instead of positional mis-binds."""
    o = table(spark, sf_dir, "orders")
    v1 = (
        o.filter(F.col("o_orderkey") < 100)
        .select("o_orderkey", "o_totalprice")
        .withColumn("src", F.lit("v1"))
    )
    v2 = (
        o.filter(F.col("o_orderkey").between(100, 199))
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .withColumn("src", F.lit("v2"))
    )
    return (
        v1.unionByName(v2, allowMissingColumns=True)
        .select("src", "o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey")
    )


_MOMENTS = (
    "CAST(CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 6) * 1000000 AS BIGINT) AS DOUBLE) / 1000000.0",
    "CAST(CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))), 6) * 1000000 AS BIGINT) AS DOUBLE) / 1000000.0",
)


@register(
    "q37b_zscore_outliers",
    sql=f"""
    WITH moments AS (
      SELECT event_type,
             COUNT(*) AS n,
             {_MOMENTS[0]} AS s1,
             {_MOMENTS[1]} AS s2
      FROM events GROUP BY event_type
    ), stats AS (
      SELECT event_type, n,
             s1 / n AS mean,
             SQRT((n * s2 - s1 * s1) / (n * (n - 1.0))) AS std
      FROM moments
    )
    SELECT e.event_type, MAX(s.n) AS n_events,
           MAX(s.mean) AS mean_value,
           MAX(s.std) AS std_value,
           COUNT(CASE WHEN ABS(e.value - s.mean) > 2 * s.std THEN 1 END) AS n_outliers
    FROM events e JOIN stats s ON s.event_type = e.event_type
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
    tags=("agg", "stddev", "outliers"),
)
def q37b_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outlier detection per group: mean/std from exact decimal
    moments (Σx, Σx² — associative, partition-order independent; the final
    formula runs in identical double arithmetic on both engines), then a
    second pass counts |x−μ| > 2σ. Variance via the moments identity is the
    distributed-friendly form — no per-group sort, two scans or one with a
    broadcast of the tiny stats table."""
    ev = table(spark, sf_dir, "events")
    moments = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(f"{_MOMENTS[0]} AS s1"),
        F.expr(f"{_MOMENTS[1]} AS s2"),
    )
    stats = moments.select(
        "event_type",
        "n",
        (F.col("s1") / F.col("n")).alias("mean"),
        F.sqrt(
            (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
            / (F.col("n") * (F.col("n") - F.lit(1.0)))
        ).alias("std"),
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n_events"),
            F.max("mean").alias("mean_value"),
            F.max("std").alias("std_value"),
            F.count(
                F.when(
                    F.abs(F.col("value") - F.col("mean")) > 2 * F.col("std"), 1
                )
            ).alias("n_outliers"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q107 — HyperLogLog registers in exact integer arithmetic
# ---------------------------------------------------------------------------
# q42 demonstrates the built-in HLL++ sketch but is rows-only (engine-
# specific estimates). This sibling builds the sketch from first principles
# in pure BIGINT arithmetic — full spec, constants, and the bit_length /
# BIN() cross-engine argument live in ``functions/sketches.py`` — so the
# whole thing (registers AND estimate) hash-matches a SQL oracle.
from ..functions import sketches as SK  # noqa: E402

_HLL_M = 32


@register(
    "q107_hll_exact_registers",
    sql=f"""
    WITH regs AS (
      SELECT event_type,
             {SK.hll_bucket_sql("CAST(user_id AS VARCHAR)", _HLL_M, "duckdb")} AS bucket,
             MAX({SK.hll_rho_sql("CAST(user_id AS VARCHAR)", _HLL_M, "duckdb")}) AS m_j
      FROM events GROUP BY 1, 2
    ), sums AS (
      SELECT event_type,
             SUM({SK.hll_term_sql("m_j", _HLL_M, "duckdb")}) AS s_present,
             COUNT(*) AS n_present
      FROM regs GROUP BY event_type
    ), exact AS (
      SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
      FROM events GROUP BY event_type
    )
    SELECT s.event_type,
           CAST(e.exact_users AS BIGINT) AS exact_users,
           {SK.hll_estimate_sql("s.s_present", "s.n_present", _HLL_M, "duckdb")} AS hll_users,
           CAST({_HLL_M} - s.n_present AS BIGINT) AS empty_registers
    FROM sums s JOIN exact e USING (event_type)
    ORDER BY s.event_type
    """,
    tags=("agg", "sketch", "hll", "exact-integer"),
)
def q107_hll_exact_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hand-built HyperLogLog distinct-count sketch per event_type, in
    pure BIGINT arithmetic — the oracle-checkable twin of q42's built-in
    HLL++ (whose register encoding is engine-private). Spec and constants:
    ``functions/sketches.py``.

    Scale shape: rho and bucket are map-side string ops on the hash; the
    first aggregation (partial MAX per (group, bucket)) combines map-side,
    so the exchange carries at most m=32 rows per group per task — the
    sketch property that makes HLL the 100 TB cardinality tool. Merging
    two sketches is the same element-wise MAX (q111 demonstrates the
    daily-rollup form). The exact COUNT(DISTINCT) alongside is calibration
    (drop it in production; it is the expensive side of the comparison).
    Raw Flajolet estimator only — the ln()-based linear-counting
    correction is documented out of scope (needs floats);
    empty_registers lets a caller apply it."""
    ev = table(spark, sf_dir, "events")
    regs = ev.groupBy(
        "event_type",
        F.expr(SK.hll_bucket_sql("CAST(user_id AS STRING)", _HLL_M, "spark")).alias(
            "bucket"
        ),
    ).agg(
        F.max(
            F.expr(SK.hll_rho_sql("CAST(user_id AS STRING)", _HLL_M, "spark"))
        ).alias("m_j")
    )
    sums = regs.groupBy("event_type").agg(
        F.sum(F.expr(SK.hll_term_sql("m_j", _HLL_M, "spark"))).alias("s_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_users")
    )
    est = F.expr(SK.hll_estimate_sql("s_present", "n_present", _HLL_M, "spark"))
    return (
        sums.join(exact, "event_type")
        .select(
            "event_type",
            "exact_users",
            est.alias("hll_users"),
            (F.lit(_HLL_M) - F.col("n_present")).cast("bigint").alias(
                "empty_registers"
            ),
        )
        .orderBy("event_type")
    )


@register(
    "q111_hll_daily_rollup",
    sql=f"""
    WITH daily_regs AS (
      SELECT CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
             event_type,
             {SK.hll_bucket_sql("CAST(user_id AS VARCHAR)", _HLL_M, "duckdb")} AS bucket,
             MAX({SK.hll_rho_sql("CAST(user_id AS VARCHAR)", _HLL_M, "duckdb")}) AS m_j
      FROM events GROUP BY 1, 2, 3
    ), daily_sums AS (
      SELECT day, event_type,
             SUM({SK.hll_term_sql("m_j", _HLL_M, "duckdb")}) AS s_present,
             COUNT(*) AS n_present
      FROM daily_regs GROUP BY day, event_type
    ), daily_est AS (
      SELECT day, event_type,
             {SK.hll_estimate_sql("s_present", "n_present", _HLL_M, "duckdb")} AS est
      FROM daily_sums
    ), merged_regs AS (
      SELECT event_type, bucket, MAX(m_j) AS m_j
      FROM daily_regs GROUP BY event_type, bucket
    ), merged_sums AS (
      SELECT event_type,
             SUM({SK.hll_term_sql("m_j", _HLL_M, "duckdb")}) AS s_present,
             COUNT(*) AS n_present
      FROM merged_regs GROUP BY event_type
    )
    SELECT m.event_type,
           {SK.hll_estimate_sql("m.s_present", "m.n_present", _HLL_M, "duckdb")} AS merged_users,
           CAST(d.sum_daily AS BIGINT) AS sum_daily_users,
           CAST(d.n_days AS BIGINT) AS n_days
    FROM merged_sums m
    JOIN (
      SELECT event_type, SUM(est) AS sum_daily, COUNT(*) AS n_days
      FROM daily_est GROUP BY event_type
    ) d USING (event_type)
    ORDER BY m.event_type
    """,
    tags=("agg", "sketch", "hll", "merge", "exact-integer"),
)
def q111_hll_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reason sketches exist: per-day HLL register tables merged into
    a whole-period distinct-user count by element-wise MAX — no second
    pass over raw events — next to the naive SUM of daily estimates
    (which over-counts returning users; the gap between the two columns
    is the cross-day overlap a sketch-less rollup gets wrong).

    Scale shape: the daily register build is q107's map-side-combined
    aggregation with `day` added to the key — exactly what an incremental
    pipeline materializes per partition as it lands (32 rows per group per
    day, the 100 TB artifact is KB-sized). The merge then touches ONLY
    register tables: MAX over m rows per group per day, associative and
    commutative, so any subset of days rolls up in any order — weekly,
    monthly, trailing-28-day — all from the same stored registers.
    Estimates stay in the exact integer form (functions/sketches.py), so
    a register table written by this engine is verifiable by any other."""
    ev = table(spark, sf_dir, "events")
    daily_regs = ev.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day"),
        "event_type",
        F.expr(SK.hll_bucket_sql("CAST(user_id AS STRING)", _HLL_M, "spark")).alias(
            "bucket"
        ),
    ).agg(
        F.max(
            F.expr(SK.hll_rho_sql("CAST(user_id AS STRING)", _HLL_M, "spark"))
        ).alias("m_j")
    )
    term = F.expr(SK.hll_term_sql("m_j", _HLL_M, "spark"))
    daily_sums = daily_regs.groupBy("day", "event_type").agg(
        F.sum(term).alias("s_present"), F.count(F.lit(1)).alias("n_present")
    )
    daily_est = daily_sums.select(
        "day",
        "event_type",
        F.expr(SK.hll_estimate_sql("s_present", "n_present", _HLL_M, "spark")).alias(
            "est"
        ),
    )
    merged_sums = (
        daily_regs.groupBy("event_type", "bucket")
        .agg(F.max("m_j").alias("m_j"))
        .groupBy("event_type")
        .agg(F.sum(term).alias("s_present"), F.count(F.lit(1)).alias("n_present"))
    )
    daily_rollup = daily_est.groupBy("event_type").agg(
        F.sum("est").cast("bigint").alias("sum_daily_users"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )
    return (
        merged_sums.select(
            "event_type",
            F.expr(
                SK.hll_estimate_sql("s_present", "n_present", _HLL_M, "spark")
            ).alias("merged_users"),
        )
        .join(daily_rollup, "event_type")
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q117 — one-pass covariance matrix
# ---------------------------------------------------------------------------
# Feature-correlation screening at corpus scale: every pairwise covariance
# (and each variance, the diagonal) of the lineitem measures from ONE scan
# — the partial-aggregated moment trick (Σx, Σy, Σxy per pair). Values are
# quantized per-measure (FLOOR(x·scale): quantity ×1, price in hundreds of
# dollars, discount ×1000) so every sum is order-independent BIGINT and
#
#   cov_q = (n·Σxy − Σx·Σy) DIV n²     (units: scale_x·scale_y)
#
# is engine-exact. Pearson r is downstream float math over these integers
# (the sqrt leaves integer land — deliberately out of the oracle).
# Headroom: the binding term is n·Σx² < 2^63; at these scales
# (max |q| ≈ 2^10) that holds to ~10⁶ rows — enough for the fixtures'
# largest scale. Bigger corpora coarsen the scale (pure rescaling) or
# switch the accumulators to DECIMAL(38,0) (exact in both engines, ~2×
# slower): the quantization, not the algorithm, is the knob.
_COV_MEASURES = (
    ("qty", "FLOOR(l_quantity)"),
    ("price_h", "FLOOR(l_extendedprice / 100)"),
    ("disc_k", "FLOOR(l_discount * 1000)"),
)


def _cov_sql() -> str:
    quant = ", ".join(
        f"CAST({expr} AS BIGINT) AS {name}" for name, expr in _COV_MEASURES
    )
    pair_rows = []
    for i, (xn, _) in enumerate(_COV_MEASURES):
        for yn, _ in _COV_MEASURES[i:]:
            pair_rows.append(
                f"SELECT '{xn}' AS x_name, '{yn}' AS y_name,"
                f" CAST(COUNT(*) AS BIGINT) AS n,"
                f" CAST((COUNT(*) * SUM({xn} * {yn}) - SUM({xn}) * SUM({yn}))"
                f" // (COUNT(*) * COUNT(*)) AS BIGINT) AS cov_q"
                f" FROM q"
            )
    return (
        f"WITH q AS (SELECT {quant} FROM lineitem)\n    "
        + "\n    UNION ALL ".join(pair_rows)
        + "\n    ORDER BY x_name, y_name"
    )


@register(
    "q117_covariance_matrix",
    sql=_cov_sql(),
    tags=("agg", "statistics", "moments", "exact-integer"),
)
def q117_covariance_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise covariances (upper triangle + diagonal variances) of the
    lineitem measures in order-independent integer arithmetic — the
    feature-screening pass run before any modeling on tabular data (spec
    and headroom in the module comment).

    Scale shape: ONE corpus scan computes every Σx/Σxy counter map-side
    (partial agg) and reduces to a single row; the pair unpivot is
    literal-sized. Adding a measure adds counters, not passes — the same
    shape as the expectation suite (q113) and embedding moments (q114).
    The oracle's UNION ALL per pair re-reads the CTE, but the Spark side
    is a single agg + stack."""
    li = table(spark, sf_dir, "lineitem")
    q = li.select(
        *[
            F.expr(f"CAST({expr} AS BIGINT)").alias(name)
            for name, expr in _COV_MEASURES
        ]
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    pairs = []
    for i, (xn, _) in enumerate(_COV_MEASURES):
        aggs.append(F.sum(xn).alias(f"s_{xn}"))
        for yn, _ in _COV_MEASURES[i:]:
            aggs.append(F.sum(F.col(xn) * F.col(yn)).alias(f"sxy_{xn}_{yn}"))
            pairs.append((xn, yn))
    wide = q.agg(*aggs)
    stack = ", ".join(
        f"'{xn}', '{yn}', CAST((n * sxy_{xn}_{yn} - s_{xn} * s_{yn}) DIV (n * n) AS BIGINT)"
        for xn, yn in pairs
    )
    return (
        wide.select(
            F.col("n").cast("bigint").alias("n"),
            F.expr(
                f"stack({len(pairs)}, {stack}) AS (x_name, y_name, cov_q)"
            ),
        )
        .select("x_name", "y_name", "n", "cov_q")
        .orderBy("x_name", "y_name")
    )


@register(
    "q118_hll_overlap",
    sql=f"""
    WITH regs AS (
      SELECT event_type,
             {SK.hll_bucket_sql("CAST(user_id AS VARCHAR)", _HLL_M, "duckdb")} AS bucket,
             MAX({SK.hll_rho_sql("CAST(user_id AS VARCHAR)", _HLL_M, "duckdb")}) AS m_j
      FROM events GROUP BY 1, 2
    ), per_type AS (
      SELECT event_type,
             {SK.hll_estimate_sql(
                 f"SUM({SK.hll_term_sql('m_j', _HLL_M, 'duckdb')})",
                 "COUNT(*)", _HLL_M, "duckdb")} AS est
      FROM regs GROUP BY event_type
    ), pairs AS (
      SELECT a.event_type AS t1, b.event_type AS t2
      FROM per_type a JOIN per_type b ON a.event_type < b.event_type
    ), union_regs AS (
      SELECT p.t1, p.t2, r.bucket, MAX(r.m_j) AS m_j
      FROM pairs p JOIN regs r ON r.event_type IN (p.t1, p.t2)
      GROUP BY p.t1, p.t2, r.bucket
    ), union_est AS (
      SELECT t1, t2,
             {SK.hll_estimate_sql(
                 f"SUM({SK.hll_term_sql('m_j', _HLL_M, 'duckdb')})",
                 "COUNT(*)", _HLL_M, "duckdb")} AS est_union
      FROM union_regs GROUP BY t1, t2
    ), exact AS (
      SELECT a.event_type AS t1, b.event_type AS t2,
             COUNT(*) AS exact_overlap
      FROM (SELECT DISTINCT event_type, user_id FROM events) a
      JOIN (SELECT DISTINCT event_type, user_id FROM events) b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT u.t1, u.t2,
           CAST(GREATEST(0, p1.est + p2.est - u.est_union) AS BIGINT) AS est_overlap,
           CAST(COALESCE(e.exact_overlap, 0) AS BIGINT) AS exact_overlap
    FROM union_est u
    JOIN per_type p1 ON p1.event_type = u.t1
    JOIN per_type p2 ON p2.event_type = u.t2
    LEFT JOIN exact e ON e.t1 = u.t1 AND e.t2 = u.t2
    ORDER BY u.t1, u.t2
    """,
    tags=("agg", "sketch", "hll", "set-algebra", "exact-integer"),
)
def q118_hll_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap estimation from HLL registers alone: for every
    event-type pair, |A ∩ B| by inclusion-exclusion — est(A) + est(B) −
    est(A ∪ B), where the union sketch is the element-wise MAX of the two
    register tables. The algebra that answers "how many purchase users
    also hit errors?" from stored KB-sized sketches, no raw-event re-read
    (exact counts alongside for calibration; inclusion-exclusion error
    compounds three estimates, so small overlaps drown in sketch noise —
    the documented trade).

    Scale shape: registers build once (q107's map-side-combined agg); the
    pair expansion joins the |types|-row pair list to m×|types| register
    rows — sketch-sized work however large the corpus. The exact
    calibration join is the expensive side (distinct user×type self-join)
    and is dropped in production."""
    ev = table(spark, sf_dir, "events")
    regs = ev.groupBy(
        "event_type",
        F.expr(SK.hll_bucket_sql("CAST(user_id AS STRING)", _HLL_M, "spark")).alias(
            "bucket"
        ),
    ).agg(
        F.max(
            F.expr(SK.hll_rho_sql("CAST(user_id AS STRING)", _HLL_M, "spark"))
        ).alias("m_j")
    )
    term = SK.hll_term_sql("m_j", _HLL_M, "spark")
    est_from = SK.hll_estimate_sql("s_present", "n_present", _HLL_M, "spark")

    def estimates(grouped):
        return grouped.agg(
            F.sum(F.expr(term)).alias("s_present"),
            F.count(F.lit(1)).alias("n_present"),
        ).withColumn("est", F.expr(est_from))

    per_type = estimates(regs.groupBy("event_type")).select("event_type", "est")
    pairs = (
        per_type.select(F.col("event_type").alias("t1"))
        .join(
            per_type.select(F.col("event_type").alias("t2")),
            F.col("t1") < F.col("t2"),
        )
    )
    union_est = estimates(
        F.broadcast(pairs)
        .join(regs, F.col("event_type").isin(F.col("t1"), F.col("t2")))
        .groupBy("t1", "t2", "bucket")
        .agg(F.max("m_j").alias("m_j"))
        .groupBy("t1", "t2")
    ).select("t1", "t2", F.col("est").alias("est_union"))
    du = ev.select("event_type", "user_id").distinct()
    exact = (
        du.alias("a")
        .join(
            du.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("t1"), F.col("b.event_type").alias("t2")
        )
        .agg(F.count(F.lit(1)).alias("exact_overlap"))
    )
    return (
        union_est.join(
            per_type.select(
                F.col("event_type").alias("t1"), F.col("est").alias("e1")
            ),
            "t1",
        )
        .join(
            per_type.select(
                F.col("event_type").alias("t2"), F.col("est").alias("e2")
            ),
            "t2",
        )
        .join(exact, ["t1", "t2"], "left")
        .select(
            "t1",
            "t2",
            F.greatest(
                F.lit(0), F.col("e1") + F.col("e2") - F.col("est_union")
            )
            .cast("bigint")
            .alias("est_overlap"),
            F.coalesce(F.col("exact_overlap"), F.lit(0))
            .cast("bigint")
            .alias("exact_overlap"),
        )
        .orderBy("t1", "t2")
    )


@register(
    "q120_rolling_active_users",
    sql=f"""
    WITH daily_regs AS (
      SELECT CAST(DATE_TRUNC('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
             {SK.hll_bucket_sql("CAST(user_id AS VARCHAR)", _HLL_M, "duckdb")} AS bucket,
             MAX({SK.hll_rho_sql("CAST(user_id AS VARCHAR)", _HLL_M, "duckdb")}) AS m_j
      FROM events GROUP BY 1, 2
    ), days AS (
      SELECT DISTINCT day FROM daily_regs
    ), window_regs AS (
      SELECT d.day, r.bucket, MAX(r.m_j) AS m_j
      FROM days d
      JOIN daily_regs r ON r.day BETWEEN d.day - INTERVAL 2 DAY AND d.day
      GROUP BY d.day, r.bucket
    ), rolling AS (
      SELECT day,
             {SK.hll_estimate_sql(
                 f"SUM({SK.hll_term_sql('m_j', _HLL_M, 'duckdb')})",
                 "COUNT(*)", _HLL_M, "duckdb")} AS rolling3_users
      FROM window_regs GROUP BY day
    ), dau AS (
      SELECT day,
             {SK.hll_estimate_sql(
                 f"SUM({SK.hll_term_sql('m_j', _HLL_M, 'duckdb')})",
                 "COUNT(*)", _HLL_M, "duckdb")} AS dau_users
      FROM daily_regs GROUP BY day
    )
    SELECT r.day, d.dau_users, r.rolling3_users
    FROM rolling r JOIN dau d USING (day)
    ORDER BY r.day
    """,
    tags=("agg", "sketch", "hll", "sliding-window", "exact-integer"),
)
def q120_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily and trailing-3-day active users, both from the SAME stored
    HLL register table — the sliding-window form of q111's rollup: each
    day's window merges that day's registers with the two preceding days'
    by element-wise MAX, so "28-day actives per day", the metric that
    forces a quadratic re-read without sketches, becomes a window-sized
    register merge.

    Scale shape: the register build is q107's aggregation; the sliding
    merge joins the |days|-row day list to register rows within the
    window (a range join over KB-sized sketch tables — at 10 years of
    daily registers that is 3650 × m rows, driver-trivial). Widening the
    window is a predicate change, not a plan change. Raw events are read
    exactly once regardless of how many window widths are reported."""
    ev = table(spark, sf_dir, "events")
    daily_regs = ev.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day"),
        F.expr(SK.hll_bucket_sql("CAST(user_id AS STRING)", _HLL_M, "spark")).alias(
            "bucket"
        ),
    ).agg(
        F.max(
            F.expr(SK.hll_rho_sql("CAST(user_id AS STRING)", _HLL_M, "spark"))
        ).alias("m_j")
    )
    term = SK.hll_term_sql("m_j", _HLL_M, "spark")
    est = SK.hll_estimate_sql("s_present", "n_present", _HLL_M, "spark")

    def estimate(grouped, out_name):
        return (
            grouped.agg(
                F.sum(F.expr(term)).alias("s_present"),
                F.count(F.lit(1)).alias("n_present"),
            )
            .select("day", F.expr(est).alias(out_name))
        )

    days = daily_regs.select("day").distinct()
    window_regs = (
        F.broadcast(days.select(F.col("day").alias("win_day")))
        .join(
            daily_regs,
            (F.col("day") >= F.date_sub(F.col("win_day"), 2))
            & (F.col("day") <= F.col("win_day")),
        )
        .groupBy(F.col("win_day").alias("day"), "bucket")
        .agg(F.max("m_j").alias("m_j"))
    )
    rolling = estimate(window_regs.groupBy("day"), "rolling3_users")
    dau = estimate(daily_regs.groupBy("day"), "dau_users")
    return dau.join(rolling, "day").orderBy("day")


@register(
    "q122_ols_fit",
    sql="""
    WITH q AS (
      SELECT l_returnflag,
             CAST(FLOOR(l_quantity) AS BIGINT) AS x,
             CAST(FLOOR(l_extendedprice / 100) AS BIGINT) AS y
      FROM lineitem
    ), m AS (
      SELECT l_returnflag,
             COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(x * y) AS sxy
      FROM q GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n,
           CAST((1000 * (n * sxy - sx * sy)) // (n * sxx - sx * sx)
                AS BIGINT) AS slope_milli,
           CAST((1000 * sy - ((1000 * (n * sxy - sx * sy)) // (n * sxx - sx * sx)) * sx)
                // (1000 * n) AS BIGINT) AS intercept_q
    FROM m
    ORDER BY l_returnflag
    """,
    tags=("agg", "statistics", "regression", "model-training", "exact-integer"),
)
def q122_ols_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form least-squares fit of price-per-hundred against quantity,
    one model per return flag — distributed MODEL TRAINING in a single
    aggregation pass (the counterpart to q109's inference): slope and
    intercept come from the same five moment counters q117 collects,
    
        slope     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)     [reported ×1000]
        intercept = (Σy − slope·Σx) / n
    
    in pure BIGINT floor arithmetic (x = whole units, y = hundreds of
    dollars — the q117 quantization).

    Scale shape: one corpus scan, map-side partial moments, an exchange of
    five counters per group — adding features generalizes to the normal
    equations (d² counters; driver-side solve like `similarity/pca.py`
    once d > a handful). Headroom: the binding product 1000·n·Σxy stays
    under 2^63 to ~10⁶ rows at these scales; coarser quantization or
    DECIMAL(38,0) accumulators lift it (q117's documented knob)."""
    li = table(spark, sf_dir, "lineitem")
    m = (
        li.select(
            "l_returnflag",
            F.expr("CAST(FLOOR(l_quantity) AS BIGINT)").alias("x"),
            F.expr("CAST(FLOOR(l_extendedprice / 100) AS BIGINT)").alias("y"),
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
        )
    )
    slope = "(1000 * (n * sxy - sx * sy)) DIV (n * sxx - sx * sx)"
    return m.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n"),
        F.expr(f"CAST({slope} AS BIGINT)").alias("slope_milli"),
        F.expr(
            f"CAST((1000 * sy - ({slope}) * sx) DIV (1000 * n) AS BIGINT)"
        ).alias("intercept_q"),
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# q148 — association rules (Apriori-pruned brand affinity)
# ---------------------------------------------------------------------------
# Market-basket mining over orders: which part brands co-occur in the same
# order beyond chance. The Apriori property does the scale work: items
# below the support floor are pruned BEFORE any pair is generated, so the
# pair space is bounded by the frequent-item vocabulary (≤ C(25,2) here),
# never by basket volume. Support/confidence/lift in exact integer bps —
# non-negative numerators keep Spark DIV == DuckDB //.
_AFF_MIN_ITEM = 50  # min orders containing an item to consider it
_AFF_MIN_PAIR = 20  # min orders containing the pair to report it


@register(
    "q148_brand_affinity",
    sql=f"""
    WITH baskets AS (
      SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS item
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ), totals AS (
      SELECT COUNT(DISTINCT okey) AS n_orders FROM baskets
    ), items AS (
      SELECT item, COUNT(*) AS n_item FROM baskets GROUP BY item
      HAVING COUNT(*) >= {_AFF_MIN_ITEM}
    ), pairs AS (
      SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS n_pair
      FROM baskets a
        JOIN baskets b ON a.okey = b.okey AND a.item < b.item
        JOIN items ia ON ia.item = a.item
        JOIN items ib ON ib.item = b.item
      GROUP BY a.item, b.item
      HAVING COUNT(*) >= {_AFF_MIN_PAIR}
    )
    SELECT item_a, item_b,
           CAST(n_pair AS BIGINT) AS n_pair,
           CAST(10000 * n_pair // ia.n_item AS BIGINT) AS conf_a_to_b_bps,
           CAST(10000 * n_pair // ib.n_item AS BIGINT) AS conf_b_to_a_bps,
           CAST(1000 * n_pair * t.n_orders // (ia.n_item * ib.n_item)
                AS BIGINT) AS lift_milli
    FROM pairs
      JOIN items ia ON ia.item = item_a
      JOIN items ib ON ib.item = item_b
      CROSS JOIN totals t
    ORDER BY item_a, item_b
    """,
    tags=("analytics", "association-rules", "basket", "apriori"),
)
def q148_brand_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over order baskets: brand pairs with support ≥
    {min_pair}, their directional confidences and lift (bps/milli,
    integer-exact) — the market-basket query of a BI/recommender
    workload.

    Scale shape: ONE okey-keyed exchange total — each order's brand set
    collects to a sorted array (collect_set dedups in the same shuffle),
    and every downstream quantity rides those arrays map-side: item
    counts by exploding the arrays, pairs by an in-array combination
    explode (≤ C(25, 2) structs per order — never an okey self-join,
    which would re-shuffle the basket table against itself). The Apriori
    prune (items under the support floor) is a broadcast semi-join on
    the exploded pairs BEFORE their vocabulary²-sized count exchange.
    Result-identical to the oracle's self-join formulation."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    arrs = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("l_orderkey").alias("okey"))
        .agg(F.array_sort(F.collect_set("p_brand")).alias("items"))
    )
    totals = arrs.agg(F.count(F.lit(1)).alias("n_orders"))
    items = (
        arrs.select(F.explode("items").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n_item"))
        .filter(F.col("n_item") >= _AFF_MIN_ITEM)
    )
    pair_structs = (
        "FLATTEN(TRANSFORM(items, (x, i) -> "
        "TRANSFORM(SLICE(items, i + 2, SIZE(items)), "
        "y -> STRUCT(x AS item_a, y AS item_b))))"
    )
    exploded = arrs.select(
        F.explode(F.expr(pair_structs)).alias("p")
    ).select("p.item_a", "p.item_b")
    pairs = (
        exploded.join(
            F.broadcast(items.select(F.col("item").alias("item_a"))), "item_a"
        )
        .join(F.broadcast(items.select(F.col("item").alias("item_b"))), "item_b")
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= _AFF_MIN_PAIR)
    )
    ia = items.select(F.col("item").alias("item_a"), F.col("n_item").alias("n_a"))
    ib = items.select(F.col("item").alias("item_b"), F.col("n_item").alias("n_b"))
    return (
        pairs.join(F.broadcast(ia), "item_a")
        .join(F.broadcast(ib), "item_b")
        .crossJoin(F.broadcast(totals))
        .select(
            "item_a",
            "item_b",
            F.col("n_pair").cast("bigint").alias("n_pair"),
            F.expr("CAST(10000 * n_pair DIV n_a AS BIGINT)").alias(
                "conf_a_to_b_bps"
            ),
            F.expr("CAST(10000 * n_pair DIV n_b AS BIGINT)").alias(
                "conf_b_to_a_bps"
            ),
            F.expr(
                "CAST(1000 * n_pair * n_orders DIV (n_a * n_b) AS BIGINT)"
            ).alias("lift_milli"),
        )
        .orderBy("item_a", "item_b")
    )


# ---------------------------------------------------------------------------
# q166 — item-item collaborative-filtering neighbors (co-occurrence Jaccard)
# ---------------------------------------------------------------------------
# The recommender primitive q148's rules don't give: a top-k NEIGHBOR LIST
# per item, ranked by co-occurrence Jaccard |A∩B|/|A∪B| over order
# baskets — "users who bought X also bought" as a similarity join, at part
# (not brand) granularity so the item vocabulary is real (thousands, not
# 25). Exact integer ppm; the pair floor prunes noise pairs before any
# ranking.

_CF_MIN_PAIR = 2  # min co-orders for a candidate neighbor
_CF_TOP = 3  # neighbors reported per item


@register(
    "q166_item_cf_neighbors",
    sql=f"""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey AS okey, l_partkey AS item FROM lineitem
    ), items AS (
      SELECT item, COUNT(*) AS n_item FROM baskets GROUP BY item
    ), pairs AS (
      SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS n_pair
      FROM baskets a JOIN baskets b ON a.okey = b.okey AND a.item < b.item
      GROUP BY a.item, b.item
      HAVING COUNT(*) >= {_CF_MIN_PAIR}
    ), sym AS (
      SELECT item_a, item_b, n_pair FROM pairs
      UNION ALL
      SELECT item_b, item_a, n_pair FROM pairs
    ), scored AS (
      SELECT s.item_a, s.item_b,
             CAST(s.n_pair AS BIGINT) AS n_pair,
             CAST(1000000 * s.n_pair
                  // (ia.n_item + ib.n_item - s.n_pair) AS BIGINT)
               AS jaccard_ppm
      FROM sym s
        JOIN items ia ON ia.item = s.item_a
        JOIN items ib ON ib.item = s.item_b
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY item_a
                                   ORDER BY jaccard_ppm DESC, item_b)
               AS rnk
      FROM scored
    )
    SELECT item_a, item_b, n_pair, jaccard_ppm, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= {_CF_TOP}
    ORDER BY item_a, rnk
    """,
    tags=("analytics", "recommender", "similarity", "basket"),
)
def q166_item_cf_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering: for every part, the top
    {top} co-occurrence neighbors by basket Jaccard (exact integer ppm)
    with the co-order count — the neighbor-list build behind an
    "also bought" recommender, and the item-similarity complement of
    q148's directional rules.

    Scale shape: q148's discipline at item granularity — ONE okey-keyed
    exchange collects each order's part set; pairs come from an in-array
    combination explode (baskets are small — never an okey self-join);
    the pair floor prunes before the vocabulary-sized count exchange;
    ranking is one item_a-keyed window over the surviving pairs.
    Result-identical to the oracle's self-join formulation."""
    from pyspark.sql import Window

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    arrs = li.groupBy(F.col("l_orderkey").alias("okey")).agg(
        F.array_sort(F.collect_set("l_partkey")).alias("items")
    )
    items = (
        arrs.select(F.explode("items").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n_item"))
    )
    pair_structs = (
        "FLATTEN(TRANSFORM(items, (x, i) -> "
        "TRANSFORM(SLICE(items, i + 2, SIZE(items)), "
        "y -> STRUCT(x AS item_a, y AS item_b))))"
    )
    pairs = (
        arrs.select(F.explode(F.expr(pair_structs)).alias("p"))
        .select("p.item_a", "p.item_b")
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= _CF_MIN_PAIR)
    )
    sym = pairs.unionByName(
        pairs.select(
            F.col("item_b").alias("item_a"),
            F.col("item_a").alias("item_b"),
            "n_pair",
        )
    )
    ia = items.select(F.col("item").alias("item_a"), F.col("n_item").alias("n_a"))
    ib = items.select(F.col("item").alias("item_b"), F.col("n_item").alias("n_b"))
    w = Window.partitionBy("item_a").orderBy(
        F.desc("jaccard_ppm"), F.asc("item_b")
    )
    return (
        sym.join(ia, "item_a")
        .join(ib, "item_b")
        .select(
            "item_a",
            "item_b",
            F.col("n_pair").cast("bigint").alias("n_pair"),
            F.expr(
                "CAST(1000000 * n_pair DIV (n_a + n_b - n_pair) AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= _CF_TOP)
        .orderBy("item_a", "rnk")
    )


# ---------------------------------------------------------------------------
# q149 — robust dispersion: median absolute deviation + MAD outliers
# ---------------------------------------------------------------------------
# The robust counterpart to q37b's z-scores: median and MAD ignore the
# heavy tail that drags mean/stddev, so "value > median + 3·MAD" flags
# genuine outliers even when the tail is the thing being measured. Both
# medians are the exact lower order statistic (q28's portable convention —
# no interpolation-rule drift), deviations are exact IEEE |a−b|, so the
# whole report hash-matches.


@register(
    "q149_mad_outliers",
    sql="""
    WITH ranked AS (
      SELECT event_type, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ), med AS (
      SELECT event_type,
             MAX(CASE WHEN rn = 1 + CAST(FLOOR(0.5 * (n - 1)) AS BIGINT)
                      THEN value END) AS median,
             MAX(n) AS n
      FROM ranked GROUP BY event_type
    ), dev AS (
      SELECT r.event_type, r.event_id, r.value, m.median, m.n,
             ABS(r.value - m.median) AS d,
             ROW_NUMBER() OVER (PARTITION BY r.event_type
                                ORDER BY ABS(r.value - m.median), r.event_id)
               AS drn
      FROM ranked r JOIN med m USING (event_type)
    ), mad AS (
      SELECT event_type,
             MAX(CASE WHEN drn = 1 + CAST(FLOOR(0.5 * (n - 1)) AS BIGINT)
                      THEN d END) AS mad,
             MAX(median) AS median, MAX(n) AS n
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           CAST(m.n AS BIGINT) AS n_events,
           m.median, m.mad,
           CAST(COUNT(CASE WHEN d.d > 3 * m.mad THEN 1 END) AS BIGINT)
             AS n_outliers
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type, m.n, m.median, m.mad
    ORDER BY d.event_type
    """,
    tags=("agg", "statistics", "robust", "outliers"),
)
def q149_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per event type with a 3×MAD outlier
    count — the robust dispersion report (median and MAD as exact lower
    order statistics, q28's convention; |value − median| is one IEEE op,
    so every column is engine-exact).

    Scale shape: one exchange on ``event_type`` feeds both ranking
    passes and the final rollup (the second ranking re-sorts within the
    same partitioning — a task-local sort, not a new shuffle). For
    global (ungrouped) MAD at 100 TB use two approx-quantile passes
    instead — this exact form is the per-group path, exactly like
    q28 vs q16s."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "event_id",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    med = ranked.groupBy("event_type").agg(
        F.max(
            F.when(
                F.col("rn")
                == 1 + F.floor(F.lit(0.5) * (F.col("n") - 1)).cast("bigint"),
                F.col("value"),
            )
        ).alias("median"),
        F.max("n").alias("n"),
    )
    dev = ranked.drop("n").join(F.broadcast(med), "event_type").withColumn(
        "d", F.abs(F.col("value") - F.col("median"))
    )
    wd = Window.partitionBy("event_type").orderBy("d", "event_id")
    dev_ranked = dev.withColumn("drn", F.row_number().over(wd))
    mad = dev_ranked.groupBy("event_type").agg(
        F.max(
            F.when(
                F.col("drn")
                == 1 + F.floor(F.lit(0.5) * (F.col("n") - 1)).cast("bigint"),
                F.col("d"),
            )
        ).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").cast("bigint").alias("n_events"),
            F.max("median").alias("median"),
            F.max("mad").alias("mad"),
            F.count(F.when(F.col("d") > 3 * F.col("mad"), 1))
            .cast("bigint")
            .alias("n_outliers"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q150 — semi-structured VARIANT path extraction (Spark 4 surface)
# ---------------------------------------------------------------------------
# The modern semi-structured path: build a nested JSON document per order
# (object + nested object + numeric array), ingest it as a VARIANT
# (`parse_json`), and read it back with typed `variant_get` paths — the
# engine surface a log/event lake uses instead of schema-on-write. The
# oracle never sees the JSON: it computes the same aggregates straight
# from the relational inputs, so a hash match proves the whole
# value → JSON → VARIANT → typed-path round trip is lossless.


@register(
    "q150_variant_extract",
    sql="""
    WITH cents AS (
      SELECT l_orderkey,
             CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS c
      FROM lineitem
    ), lines AS (
      SELECT l_orderkey, MIN(c) AS first_line, COUNT(*) AS n_lines
      FROM cents GROUP BY l_orderkey
    )
    SELECT o.o_orderstatus AS status, c.c_mktsegment AS seg,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(l.first_line) AS BIGINT) AS sum_first_line_cents,
           CAST(SUM(l.n_lines) AS BIGINT) AS sum_lines
    FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN lines l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2
    ORDER BY status, seg
    """,
    tags=("semistructured", "variant", "json", "spark4"),
)
def q150_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT ingestion + typed path reads: each order becomes a nested
    JSON document (id, cust{key, seg}, lines[...], status) via
    ``to_json``, is parsed to a VARIANT, and every downstream value is a
    ``variant_get`` typed path — ``$.status``, the nested
    ``$.cust.seg``, the array index ``$.lines[0]``, and the array pull
    ``$.lines`` — rolled up per (status, segment). The oracle computes
    the same numbers relationally, pinning the round trip lossless.

    Scale shape: document assembly is one lineitem rollup + a broadcast
    customer join; parse/extract are map-side expressions (VARIANT's
    binary encoding decodes paths without re-parsing text per access —
    the reason it beats get_json_object chains at 100 TB)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.expr("CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)").alias("c"),
    )
    lines = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list("c")).alias("lines")
    )
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    docs = (
        o.join(F.broadcast(cust), o.o_custkey == cust.c_custkey)
        .join(lines, o.o_orderkey == lines.l_orderkey)
        .select(
            F.to_json(
                F.struct(
                    F.col("o_orderkey").alias("id"),
                    F.struct(
                        F.col("c_custkey").alias("key"),
                        F.col("c_mktsegment").alias("seg"),
                    ).alias("cust"),
                    F.col("lines"),
                    F.col("o_orderstatus").alias("status"),
                )
            ).alias("j")
        )
    )
    v = docs.select(F.parse_json("j").alias("v"))
    extracted = v.select(
        F.expr("variant_get(v, '$.status', 'string')").alias("status"),
        F.expr("variant_get(v, '$.cust.seg', 'string')").alias("seg"),
        F.expr("variant_get(v, '$.lines[0]', 'bigint')").alias("first_line"),
        F.expr("SIZE(variant_get(v, '$.lines', 'array<bigint>'))").alias(
            "n_lines"
        ),
    )
    return (
        extracted.groupBy("status", "seg")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("first_line").cast("bigint").alias("sum_first_line_cents"),
            F.sum("n_lines").cast("bigint").alias("sum_lines"),
        )
        .orderBy("status", "seg")
    )


# ---------------------------------------------------------------------------
# q151 — Benford's-law first-digit audit
# ---------------------------------------------------------------------------
# The classic anomaly screen for financial columns: organically-generated
# amounts follow log10(1 + 1/d) first-digit frequencies; fabricated or
# clipped data does not. Expected frequencies are fixed constants embedded
# as integer ppm (no runtime log), observed shares are integer ppm, and
# the chi-square-style statistic is exact integer arithmetic — fully
# hash-checkable. Uniformly-generated fixture prices will FAIL the
# conformity check, which is itself the point: the audit's job is to
# flag non-Benford columns, and the oracle pins that verdict exactly.
_BENFORD_PPM = {  # round(log10(1 + 1/d) * 1e6)
    1: 301030, 2: 176091, 3: 124939, 4: 96910,
    5: 79181, 6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


@register(
    "q151_benford_audit",
    sql=f"""
    WITH digits AS (
      SELECT CAST(SUBSTRING(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                            AS VARCHAR), 1, 1) AS BIGINT) AS d
      FROM orders WHERE o_totalprice >= 1
    ), counts AS (
      SELECT d, COUNT(*) AS n FROM digits GROUP BY d
    ), expected(d, exp_ppm) AS (
      VALUES {", ".join(f"({d}, {p})" for d, p in _BENFORD_PPM.items())}
    )
    SELECT e.d AS digit,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS n,
           CAST(CAST(1000000 AS HUGEINT) * COALESCE(c.n, 0) // t.total AS BIGINT) AS obs_ppm,
           CAST(e.exp_ppm AS BIGINT) AS exp_ppm,
           CAST(ABS(CAST(1000000 AS HUGEINT) * COALESCE(c.n, 0) // t.total - e.exp_ppm)
                AS BIGINT) AS abs_dev_ppm
    FROM expected e
      LEFT JOIN counts c ON c.d = e.d
      CROSS JOIN (SELECT SUM(n) AS total FROM counts) t
    ORDER BY digit
    """,
    tags=("audit", "statistics", "benford", "bi"),
)
def q151_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit conformity audit of order totals: observed vs
    expected first-digit shares in integer ppm with absolute deviations —
    the data-forensics screen run over financial columns (synthetic
    uniform prices deviate wildly, and the audit says exactly how much).

    Scale shape: the digit is map-side string arithmetic; the only
    exchange carries 9 counter rows. The expected table is a 9-row
    literal (constants ARE the model — no runtime log10, no float
    drift)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digits = o.select(
        F.expr(
            "CAST(SUBSTRING(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) "
            "AS STRING), 1, 1) AS BIGINT)"
        ).alias("d")
    )
    counts = digits.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("total"))
    expected = local_rows_df(
        spark, [(d, p) for d, p in _BENFORD_PPM.items()], "digit long, exp_ppm long"
    )
    return (
        F.broadcast(expected)
        .join(counts.withColumnRenamed("d", "digit"), "digit", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "digit",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
            F.expr(
                "CAST(1000000 * CAST(COALESCE(n, 0) AS DECIMAL(38,0))"
                " DIV total AS BIGINT)"
            ).alias(
                "obs_ppm"
            ),
            F.col("exp_ppm").cast("bigint").alias("exp_ppm"),
            F.expr(
                "CAST(ABS(1000000 * CAST(COALESCE(n, 0) AS DECIMAL(38,0))"
                " DIV total - exp_ppm) AS BIGINT)"
            ).alias("abs_dev_ppm"),
        )
        .orderBy("digit")
    )


# ---------------------------------------------------------------------------
# q157 — leave-one-out target encoding
# ---------------------------------------------------------------------------
# Categorical feature encoding with the leakage control: a category's
# naive target mean includes each row's OWN label, which leaks it into the
# feature (high-cardinality categories memorize). The leave-one-out form
# (Σ_g − y_i)/(n_g − 1) is one grouped aggregate + map-side arithmetic —
# never a per-row subquery. All integer cents; the rollup reports the
# exact naive-vs-LOO divergence per category, which shrinks as 1/n_g (the
# sanity law the pytest-free oracle makes visible in the result itself).


@register(
    "q157_target_encoding",
    sql="""
    WITH base AS (
      SELECT c.c_mktsegment AS seg,
             CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS y
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), g AS (
      SELECT seg, SUM(y) AS sy, COUNT(*) AS n FROM base GROUP BY seg
    ), loo AS (
      SELECT b.seg, b.y, g.sy, g.n,
             (g.sy - b.y) // NULLIF(g.n - 1, 0) AS enc
      FROM base b JOIN g USING (seg)
    )
    SELECT seg,
           CAST(MIN(n) AS BIGINT) AS n_rows,
           CAST(MIN(sy) // MIN(n) AS BIGINT) AS naive_mean_cents,
           CAST(SUM(enc) // MIN(n) AS BIGINT) AS mean_loo_cents,
           CAST(MIN(enc) AS BIGINT) AS min_loo_cents,
           CAST(MAX(enc) AS BIGINT) AS max_loo_cents,
           CAST(MAX(ABS(enc - sy // n)) AS BIGINT) AS max_abs_leak_cents
    FROM loo
    GROUP BY seg
    ORDER BY seg
    """,
    tags=("ml", "feature-encoding", "target-encoding", "leakage"),
)
def q157_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of market segment against order
    value: each row's encoding excludes its own label,
    ``(Σ_g − y_i)/(n_g − 1)`` — the leakage-controlled form of the
    classic categorical encoder — with a per-segment rollup of the LOO
    range and the exact naive-vs-LOO divergence (the leak magnitude a
    naive encoder would inject, shrinking as 1/n).

    Scale shape: one broadcast dim join, one grouped sum (map-side
    partial), then the LOO value is map-side arithmetic against the
    broadcast |categories|-row aggregate — no per-row subquery at any
    scale. Integer cents throughout."""
    o = table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").alias("y"),
    )
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    base = o.join(F.broadcast(cust), o.o_custkey == cust.c_custkey).select(
        F.col("c_mktsegment").alias("seg"), "y"
    )
    g = base.groupBy("seg").agg(
        F.sum("y").alias("sy"), F.count(F.lit(1)).alias("n")
    )
    # NULLIF guard: a single-row segment would divide by zero — DuckDB //
    # raises while Spark DIV yields NULL (or errors under ANSI), so the
    # engines would diverge on degenerate groups instead of hash-matching.
    # With the guard both emit NULL encodings (and NULL LOO aggregates)
    # for n=1 segments.
    loo = base.join(F.broadcast(g), "seg").withColumn(
        "enc", F.expr("(sy - y) DIV NULLIF(n - 1, 0)")
    )
    return (
        loo.groupBy("seg")
        .agg(
            F.min("n").cast("bigint").alias("n_rows"),
            F.expr("CAST(MIN(sy) DIV MIN(n) AS BIGINT)").alias(
                "naive_mean_cents"
            ),
            F.expr("CAST(SUM(enc) DIV MIN(n) AS BIGINT)").alias(
                "mean_loo_cents"
            ),
            F.min("enc").cast("bigint").alias("min_loo_cents"),
            F.max("enc").cast("bigint").alias("max_loo_cents"),
            F.expr("CAST(MAX(ABS(enc - sy DIV n)) AS BIGINT)").alias(
                "max_abs_leak_cents"
            ),
        )
        .orderBy("seg")
    )


# ---------------------------------------------------------------------------
# q160 — RFM customer segmentation
# ---------------------------------------------------------------------------
# The classic CRM analysis: score every customer 1–5 on Recency (days
# since last order, inverted — recent = 5), Frequency (order count), and
# Monetary (lifetime cents) via NTILE quintiles with fully-deterministic
# tie-breaks (metric, custkey), then roll up the 125 possible segments.
# Quintile boundaries are rank-based, so the whole report is
# integer-exact.


@register(
    "q160_rfm_segmentation",
    sql="""
    WITH per_cust AS (
      SELECT o_custkey AS cust,
             MAX(CAST(o_orderdate AS DATE)) AS last_day,
             COUNT(*) AS freq,
             SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
      FROM orders GROUP BY o_custkey
    ), anchor AS (
      SELECT MAX(last_day) AS maxd FROM per_cust
    ), metrics AS (
      SELECT cust, (maxd - last_day) AS rec_days, freq, cents
      FROM per_cust, anchor
    ), scored AS (
      SELECT cust, rec_days, freq, cents,
             NTILE(5) OVER (ORDER BY rec_days DESC, cust) AS r_score,
             NTILE(5) OVER (ORDER BY freq, cust) AS f_score,
             NTILE(5) OVER (ORDER BY cents, cust) AS m_score
      FROM metrics
    )
    SELECT CAST(r_score AS BIGINT) AS r_score,
           CAST(f_score AS BIGINT) AS f_score,
           CAST(m_score AS BIGINT) AS m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           CAST(MIN(rec_days) AS BIGINT) AS min_rec_days,
           CAST(MAX(rec_days) AS BIGINT) AS max_rec_days
    FROM scored
    GROUP BY r_score, f_score, m_score
    ORDER BY r_score, f_score, m_score
    """,
    tags=("bi", "segmentation", "rfm", "window"),
)
def q160_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: rank-based quintile scores for recency (recent
    buyers score high), frequency, and monetary value with deterministic
    tie-breaks, rolled up to segment counts and revenue — the CRM
    report that routes each (r, f, m) cell to a campaign.

    Scale shape: one customer rollup (map-side partial), then three
    NTILE windows over the |customers|-row metric table. The global
    NTILEs pin exact quintiles; at 100 TB swap them for
    percentile_approx boundary buckets (q16s's documented trade) — the
    rollup is unchanged."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    per_cust = o.groupBy(F.col("o_custkey").alias("cust")).agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_day"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)")).alias(
            "cents"
        ),
    )
    anchor = per_cust.agg(F.max("last_day").alias("maxd"))
    metrics = per_cust.crossJoin(F.broadcast(anchor)).select(
        "cust",
        F.datediff("maxd", "last_day").alias("rec_days"),
        "freq",
        "cents",
    )
    scored = metrics.select(
        "cust",
        "rec_days",
        "freq",
        "cents",
        F.ntile(5)
        .over(Window.orderBy(F.desc("rec_days"), F.asc("cust")))
        .alias("r_score"),
        F.ntile(5).over(Window.orderBy("freq", "cust")).alias("f_score"),
        F.ntile(5).over(Window.orderBy("cents", "cust")).alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("cents").cast("bigint").alias("total_cents"),
            F.min("rec_days").cast("bigint").alias("min_rec_days"),
            F.max("rec_days").cast("bigint").alias("max_rec_days"),
        )
        .select(
            F.col("r_score").cast("bigint").alias("r_score"),
            F.col("f_score").cast("bigint").alias("f_score"),
            F.col("m_score").cast("bigint").alias("m_score"),
            "n_customers",
            "total_cents",
            "min_rec_days",
            "max_rec_days",
        )
        .orderBy("r_score", "f_score", "m_score")
    )


# ---------------------------------------------------------------------------
# q169 — trimmed & winsorized means (robust location report)
# ---------------------------------------------------------------------------
# The third robust-statistics rung after q37b (z-scores) and q149 (MAD):
# the 5 % trimmed mean (drop each tail) and the winsorized mean (clamp
# each tail to the 5th/95th order statistic) of order value per market
# segment — the estimators finance/ops dashboards use when a handful of
# whale orders should not move the location estimate. Exact integer
# cents; tail boundaries use the portable lower-order-statistic rank
# convention, so every cell hash-matches.


@register(
    "q169_trimmed_mean",
    sql="""
    WITH base AS (
      SELECT c.c_mktsegment AS seg,
             CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             o.o_orderkey AS okey
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ), ranked AS (
      SELECT seg, cents,
             ROW_NUMBER() OVER (PARTITION BY seg ORDER BY cents, okey) AS rn,
             COUNT(*) OVER (PARTITION BY seg) AS n
      FROM base
    ), bounds AS (
      SELECT seg,
             MAX(CASE WHEN rn = 1 + CAST(FLOOR(0.05 * (n - 1)) AS BIGINT)
                      THEN cents END) AS lo_cents,
             MAX(CASE WHEN rn = 1 + CAST(FLOOR(0.95 * (n - 1)) AS BIGINT)
                      THEN cents END) AS hi_cents,
             CAST(MAX(n) AS BIGINT) AS n,
             CAST(n // 20 AS BIGINT) AS k
      FROM ranked GROUP BY seg, n
    )
    SELECT r.seg,
           b.n AS n_orders,
           CAST(SUM(r.cents) // b.n AS BIGINT) AS mean_cents,
           CAST(SUM(CASE WHEN r.rn > b.k AND r.rn <= b.n - b.k
                         THEN r.cents ELSE 0 END)
                // NULLIF(b.n - 2 * b.k, 0) AS BIGINT) AS trimmed_mean_cents,
           CAST(SUM(LEAST(GREATEST(r.cents, b.lo_cents), b.hi_cents)) // b.n
                AS BIGINT) AS winsor_mean_cents,
           b.lo_cents, b.hi_cents
    FROM ranked r JOIN bounds b USING (seg)
    GROUP BY r.seg, b.n, b.k, b.lo_cents, b.hi_cents
    ORDER BY r.seg
    """,
    tags=("analytics", "robust-stats", "aggregation"),
)
def q169_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment robust location report: plain, 5 %-trimmed, and
    5 %-winsorized mean order value in exact integer cents, plus the
    winsorization bounds (5th/95th lower order statistics).

    Scale shape: ONE seg-keyed exchange shared by the rank window, the
    count window, and the final aggregate (same partitioning all the
    way down); the bounds table is |segments| rows broadcast back. The
    trim drops rank ranges — no second sort, no per-group collect."""
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderkey").alias("okey"),
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").alias(
            "cents"
        ),
    )
    cust = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    base = o.join(F.broadcast(cust), o.o_custkey == cust.c_custkey).select(
        F.col("c_mktsegment").alias("seg"), "cents", "okey"
    )
    w = Window.partitionBy("seg").orderBy("cents", "okey")
    wn = Window.partitionBy("seg")
    ranked = base.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    bounds = (
        ranked.groupBy("seg", "n")
        .agg(
            F.expr(
                "MAX(CASE WHEN rn = 1 + CAST(FLOOR(0.05 * (n - 1)) AS BIGINT)"
                " THEN cents END)"
            ).alias("lo_cents"),
            F.expr(
                "MAX(CASE WHEN rn = 1 + CAST(FLOOR(0.95 * (n - 1)) AS BIGINT)"
                " THEN cents END)"
            ).alias("hi_cents"),
        )
        .select(
            "seg",
            F.col("n").cast("bigint").alias("n"),
            F.expr("CAST(n DIV 20 AS BIGINT)").alias("k"),
            "lo_cents",
            "hi_cents",
        )
    )
    return (
        ranked.drop("n")
        .join(F.broadcast(bounds), "seg")
        .groupBy("seg", "n", "k", "lo_cents", "hi_cents")
        .agg(
            F.expr("CAST(SUM(cents) DIV n AS BIGINT)").alias("mean_cents"),
            F.expr(
                "CAST(SUM(CASE WHEN rn > k AND rn <= n - k THEN cents"
                " ELSE 0 END) DIV NULLIF(n - 2 * k, 0) AS BIGINT)"
            ).alias("trimmed_mean_cents"),
            F.expr(
                "CAST(SUM(LEAST(GREATEST(cents, lo_cents), hi_cents)) DIV n"
                " AS BIGINT)"
            ).alias("winsor_mean_cents"),
        )
        .select(
            "seg",
            F.col("n").alias("n_orders"),
            "mean_cents",
            "trimmed_mean_cents",
            "winsor_mean_cents",
            "lo_cents",
            "hi_cents",
        )
        .orderBy("seg")
    )


# ---------------------------------------------------------------------------
# q175 — exact two-sample Kolmogorov–Smirnov drift per source
# ---------------------------------------------------------------------------


@register(
    "q175_ks_drift",
    sql="""
    WITH base AS (
      SELECT source, n_chars FROM documents
    ), srcs AS (
      SELECT source, COUNT(*) AS n_s FROM base GROUP BY source
    ), sv AS (
      SELECT source, n_chars AS v, COUNT(*) AS c FROM base GROUP BY 1, 2
    ), gv AS (
      SELECT v, SUM(c) AS c FROM sv GROUP BY v
    ), gcum AS (
      SELECT v, SUM(c) OVER (ORDER BY v) AS cum_all,
             (SELECT COUNT(*) FROM base) AS n_all
      FROM gv
    ), grid AS (
      SELECT s.source, s.n_s, g.v, g.cum_all, g.n_all, COALESCE(sv.c, 0) AS c
      FROM srcs s CROSS JOIN gcum g
      LEFT JOIN sv ON sv.source = s.source AND sv.v = g.v
    ), cums AS (
      SELECT source, n_s, n_all, cum_all,
             SUM(c) OVER (PARTITION BY source ORDER BY v) AS cum_s
      FROM grid
    )
    SELECT source,
           CAST(n_s AS BIGINT) AS n_s,
           -- HUGEINT keeps the cross products and the final integral
           -- division exact (DuckDB's // on DECIMAL degrades to DOUBLE);
           -- the Spark twin uses DECIMAL(38,0) with DIV, also exact
           CAST(1000 * MAX(ABS(CAST(cum_s AS HUGEINT) * (n_all - n_s)
                              - CAST(cum_all - cum_s AS HUGEINT) * n_s))
                // (CAST(n_s AS HUGEINT) * (n_all - n_s))
             AS BIGINT) AS ks_milli
    FROM cums
    GROUP BY source, n_s, n_all
    ORDER BY source
    """,
    tags=("analytics", "drift", "robust-stats", "observability"),
)
def q175_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic per source: each
    source's document-length distribution against the REST of the corpus,
    as max ECDF gap in integer milli-units. Exact arithmetic —
    |cum_s·n_r − cum_r·n_s| maxed over the merged value support, divided
    once at the end — so both engines agree exactly (no float ECDFs).
    The cross products and the final integral division run in wide exact
    types — DECIMAL(38,0) with DIV on the Spark side, HUGEINT with //
    in the oracle (DuckDB's // on DECIMAL degrades to DOUBLE): the gap
    bound is n_s·n_r ≤ (n_all/2)², which exceeds BIGINT past
    n_all ≈ 6×10⁹ rows, where a plain BIGINT Spark product would wrap
    silently while DuckDB promotes — the q92/q93-class divergence; both
    wide forms stay exact to ≥10³⁸ (n_all ≈ 10¹⁹, far past any corpus).
    Complements q163's binned drift score: KS is binning-free and
    detects location/shape shifts a fixed-bin PSI can smear.

    Scale shape: one (source, value) count aggregation, a global
    per-value cumsum (|support| rows), then a |sources|×|support| grid
    with two window cumsums partitioned by source — the exchange is
    keyed by source and the grid never exceeds sources × distinct
    values. The exact form is for bounded-support statistics (lengths,
    scores, quantized features); for unbounded doubles at 100 TB,
    pre-bucket through q110's equi-width histogram and run the same
    pipeline on bucket ids.
    """
    from pyspark.sql import Window

    base = table(spark, sf_dir, "documents").select("source", "n_chars")
    srcs = base.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    sv = base.groupBy(
        "source", F.col("n_chars").alias("v")
    ).agg(F.count(F.lit(1)).alias("c"))
    gv = sv.groupBy("v").agg(F.sum("c").alias("c"))
    n_all_df = base.agg(F.count(F.lit(1)).alias("n_all"))
    gcum = (
        gv.withColumn(
            "cum_all", F.sum("c").over(Window.orderBy("v"))
        )
        .drop("c")
        .crossJoin(F.broadcast(n_all_df))
    )
    grid = (
        srcs.crossJoin(gcum)
        .join(sv, ["source", "v"], "left")
        .withColumn("c", F.coalesce("c", F.lit(0)))
    )
    cums = grid.withColumn(
        "cum_s",
        F.sum("c").over(Window.partitionBy("source").orderBy("v")),
    )
    return (
        cums.groupBy("source", "n_s", "n_all")
        .agg(
            F.max(
                F.abs(
                    F.expr("CAST(cum_s AS DECIMAL(38,0))")
                    * (F.col("n_all") - F.col("n_s"))
                    - F.expr("CAST(cum_all - cum_s AS DECIMAL(38,0))")
                    * F.col("n_s")
                )
            ).alias("max_gap")
        )
        .select(
            "source",
            F.col("n_s").cast("bigint"),
            F.expr(
                "CAST(1000 * max_gap DIV "
                "(CAST(n_s AS DECIMAL(38,0)) * (n_all - n_s)) AS BIGINT)"
            ).alias("ks_milli"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q248 — Spark 4 SQL UDFs (CREATE FUNCTION ... RETURN) under the oracle
# ---------------------------------------------------------------------------
# Spark 4.0 added SQL-defined scalar functions (SPARK-44338 family):
# reusable expression logic DECLARED in SQL, inlined by the analyzer into
# the calling plan — zero Python, zero serialization, fully inside
# whole-stage codegen (the plan sweep asserts no Python eval). The oracle
# twin inlines the same expressions textually, so the UDF bodies sit
# under the value hash.

_Q248_TOK = "SIZE(SPLIT(t, ' '))"           # Spark body (param t)
_Q248_TOK_DUCK = "LEN(STRING_SPLIT(text, ' '))"
_Q248_PPM = "CAST(a * 1000000 DIV b AS BIGINT)"  # integer ppm ratio
_Q248_LONG = 60  # docs with more tokens than this count as long


@register(
    "q248_sql_udf_census",
    sql=f"""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM({_Q248_TOK_DUCK}) AS BIGINT) AS n_tokens,
           CAST(SUM({_Q248_TOK_DUCK}) * 1000000
                // COUNT(*) AS BIGINT) AS tokens_per_doc_ppm,
           CAST(SUM(CASE WHEN {_Q248_TOK_DUCK} > {_Q248_LONG}
                         THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS long_doc_ppm
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
    tags=("sql-udf", "spark4", "text", "agg"),
)
def q248_sql_udf_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token census computed through Spark 4 SQL UDFs: the
    token counter and the integer-ppm ratio are CREATE FUNCTION bodies,
    not inline expressions — declared once, analyzer-inlined into the
    plan (no Python boundary; the registry-wide plan sweep checks).

    Scale shape: identical to writing the expressions inline — SQL UDFs
    vanish at analysis time, so partial aggregation and codegen are
    untouched."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION q248_tok(t STRING)"
        f" RETURNS INT RETURN {_Q248_TOK}"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION q248_ppm(a BIGINT, b BIGINT)"
        f" RETURNS BIGINT RETURN {_Q248_PPM}"
    )
    table(spark, sf_dir, "documents").createOrReplaceTempView(
        "q248_documents"
    )
    return spark.sql(
        f"""
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(q248_tok(text)) AS BIGINT) AS n_tokens,
               q248_ppm(SUM(q248_tok(text)), COUNT(*))
                 AS tokens_per_doc_ppm,
               q248_ppm(
                 SUM(CASE WHEN q248_tok(text) > {_Q248_LONG}
                          THEN 1 ELSE 0 END),
                 COUNT(*)) AS long_doc_ppm
        FROM q248_documents
        GROUP BY source
        ORDER BY source
        """
    )


# ---------------------------------------------------------------------------
# q249 — Spark 4 SQL pipe syntax under the oracle
# ---------------------------------------------------------------------------
# Spark 4.0's pipe syntax (SPARK-49555, `|>`): the query reads as its own
# dataflow — FROM → WHERE → AGGREGATE → ORDER BY — each stage an explicit
# operator. Same Catalyst plan as the nested form (it is pure surface
# syntax), which is exactly what makes it safely oracle-checkable against
# DuckDB's standard SQL.


@register(
    "q249_pipe_syntax_shipping",
    sql="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100
                               + 0.5) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("pipe-syntax", "spark4", "agg"),
)
def q249_pipe_syntax_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1997 shipping summary written END-TO-END in Spark 4 pipe syntax —
    the dataflow reads top-to-bottom and compiles to the identical
    aggregate plan as the classic form (pure surface syntax; the
    filter still pushes to the scan, partial aggregation still applies).
    """
    table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "q249_lineitem"
    )
    return spark.sql(
        """
        FROM q249_lineitem
        |> WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |> AGGREGATE
             CAST(COUNT(*) AS BIGINT) AS n_items,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100
                                 + 0.5) AS BIGINT)) AS BIGINT)
               AS revenue_cents
           GROUP BY l_returnflag, l_linestatus
        |> SELECT l_returnflag, l_linestatus, n_items, sum_qty,
                  revenue_cents
        |> ORDER BY l_returnflag, l_linestatus
        """
    )


# ---------------------------------------------------------------------------
# q252 — Spark 4 listagg / WITHIN GROUP under the oracle
# ---------------------------------------------------------------------------
# listagg (SPARK-42746, 4.0) is the ordered-concat aggregate; DuckDB's twin
# is string_agg(expr, sep ORDER BY ...). Concatenating an UNBOUNDED group
# is an anti-pattern at 100 TB (one string per group grows with the data),
# so the query demonstrates the scale-honest form: bound the group FIRST
# (window top-k per nation), then concatenate the k survivors — the
# output string is O(k), not O(rows).


@register(
    "q252_listagg_top_customers",
    sql="""
    SELECT n_name AS nation,
           string_agg(c_name, ',' ORDER BY c_acctbal DESC, c_custkey)
             AS top_names,
           CAST(COUNT(*) AS BIGINT) AS n_listed
    FROM (
      SELECT n_name, c_name, c_acctbal, c_custkey,
             ROW_NUMBER() OVER (PARTITION BY n_name
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer JOIN nation ON n_nationkey = c_nationkey)
    WHERE rn <= 3
    GROUP BY n_name
    ORDER BY n_name
    """,
    tags=("listagg", "spark4", "window", "agg"),
)
def q252_listagg_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per nation, the ordered comma-roster of its top-3 customers by
    account balance — Spark 4 `listagg(...) WITHIN GROUP (ORDER BY ...)`
    over a window-bounded group (rank first, concatenate the 3 survivors;
    the aggregate's input is O(k · nations) regardless of corpus size).

    The deterministic ORDER BY inside the aggregate (balance desc, key
    tiebreak) is what makes an order-sensitive aggregate oracle-checkable:
    both engines sort the group identically before concatenating."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "n_name", "c_name", "c_acctbal", "c_custkey"
    ).createOrReplaceTempView("q252_cust")
    return spark.sql(
        """
        SELECT n_name AS nation,
               listagg(c_name, ',')
                 WITHIN GROUP (ORDER BY c_acctbal DESC, c_custkey)
                 AS top_names,
               CAST(COUNT(*) AS BIGINT) AS n_listed
        FROM (
          SELECT n_name, c_name, c_acctbal, c_custkey,
                 ROW_NUMBER() OVER (PARTITION BY n_name
                                    ORDER BY c_acctbal DESC, c_custkey)
                   AS rn
          FROM q252_cust)
        WHERE rn <= 3
        GROUP BY n_name
        ORDER BY n_name
        """
    )


# ---------------------------------------------------------------------------
# q253 — GROUP BY ALL / ORDER BY ALL: one statement, both engines verbatim
# ---------------------------------------------------------------------------

_Q253_SQL = """
SELECT source, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS total_chars
FROM {tbl}
GROUP BY ALL
ORDER BY ALL
"""


@register(
    "q253_groupby_all_census",
    sql=_Q253_SQL.format(tbl="documents"),
    tags=("groupby-all", "spark4", "agg", "text"),
)
def q253_groupby_all_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (source, lang) document census written with GROUP BY ALL /
    ORDER BY ALL — the statement text is SHARED VERBATIM with the DuckDB
    oracle (only the table reference differs), so the two engines'
    interpretation of the ALL expansion (non-aggregate select columns;
    full output order) is itself under the hash.

    Pure syntax sugar: Catalyst expands ALL at analysis, the plan is the
    standard partial-agg + exchange on the 2-column key."""
    table(spark, sf_dir, "documents").createOrReplaceTempView("q253_docs")
    return spark.sql(_Q253_SQL.format(tbl="q253_docs"))


# ---------------------------------------------------------------------------
# q256 — Spark 4 string collations (UTF8_LCASE) under the oracle
# ---------------------------------------------------------------------------
# Spark 4.0 made collation a property of the string TYPE (SPARK-46830):
# comparisons, grouping, and DISTINCT under COLLATE UTF8_LCASE are
# case-insensitive with no per-row lower() rewrite. The fixture has no
# case variance, so the query manufactures it deterministically (half
# the rows lowercased by the portable hash) and pins that DISTINCT under
# the collated type merges what raw DISTINCT keeps apart. DuckDB has no
# column collation types, so its twin is the semantic equivalent
# (lower()-projection distinct) — which is exactly the claim: the
# collation IS lower()-equivalence, engine-enforced.

from ..functions.hashing import duckdb_hash32, spark_hash32  # noqa: E402

_Q256_MANGLE_SPARK = (
    "CASE WHEN {h} % 2 = 0 THEN lower(c_mktsegment) ELSE c_mktsegment END"
)


@register(
    "q256_collated_distinct",
    sql=f"""
    SELECT n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(COUNT(DISTINCT mangled) AS BIGINT) AS distinct_raw,
           CAST(COUNT(DISTINCT lower(mangled)) AS BIGINT) AS distinct_ci
    FROM (
      SELECT n_name,
             CASE WHEN {duckdb_hash32("CAST(c_custkey AS VARCHAR)", "case")}
                       % 2 = 0
                  THEN lower(c_mktsegment) ELSE c_mktsegment END AS mangled
      FROM customer JOIN nation ON n_nationkey = c_nationkey)
    GROUP BY n_name
    ORDER BY n_name
    """,
    tags=("collation", "spark4", "distinct", "agg"),
)
def q256_collated_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per nation: distinct market-segment strings counted raw (case
    variants separate) vs under ``COLLATE UTF8_LCASE`` (variants merge) —
    the collated count runs on the TYPE, no lower() in the aggregate.

    Scale note: collation-aware distinct/group-by keeps whole-stage
    codegen and partial aggregation (the collation key is computed
    map-side), unlike a Python normalizer; it is the idiomatic
    case-insensitive path in Spark 4."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    h = spark_hash32("CAST(c_custkey AS STRING)", "case")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.expr(_Q256_MANGLE_SPARK.format(h=h)).alias("mangled"),
        )
        .groupBy("nation")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.countDistinct("mangled").cast("bigint").alias("distinct_raw"),
            F.expr(
                "CAST(COUNT(DISTINCT collate(mangled, 'UTF8_LCASE'))"
                " AS BIGINT)"
            ).alias("distinct_ci"),
        )
        .orderBy("nation")
    )


# ---------------------------------------------------------------------------
# q257 — ANSI-safe arithmetic (try_divide) under the oracle
# ---------------------------------------------------------------------------
# Spark 4 runs ANSI mode ON by default: a plain division by zero THROWS
# mid-job instead of silently returning NULL — at 100 TB that is a
# 6-hour job dying on one bad row. The try_* family (try_divide /
# try_add / try_cast) is the idiomatic guard: NULL on the error case,
# plan stays in codegen. DuckDB has no try_divide; the twin is the
# semantic definition x / NULLIF(y, 0) — which is exactly the claim
# being pinned.

_Q257_CENTS = "CAST(FLOOR(value * 100 + 0.5) AS BIGINT)"


@register(
    "q257_try_divide_rates",
    sql=f"""
    SELECT event_type,
           CAST(COUNT(milli_rate) AS BIGINT) AS n_rates,
           CAST(SUM(CASE WHEN milli_rate IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_unrateable,
           CAST(SUM(milli_rate) AS BIGINT) AS sum_milli_rate
    FROM (
      SELECT event_type,
             CAST(FLOOR((cents * 1000.0) /
                        NULLIF(gap_days, 0)) AS BIGINT) AS milli_rate
      FROM (
        SELECT event_type,
               {_Q257_CENTS} AS cents,
               datediff('day',
                        LAG(CAST(ts AS TIMESTAMP)) OVER (
                          PARTITION BY user_id
                          ORDER BY ts, event_id),
                        CAST(ts AS TIMESTAMP)) AS gap_days
        FROM events))
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("try-functions", "ansi", "spark4", "window"),
)
def q257_try_divide_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: value-per-day rates between a user's consecutive
    events, where same-day gaps (divide-by-zero) and first events (NULL
    lag) are UNRATEABLE rather than fatal — Spark-side via `try_divide`
    (ANSI mode stays on; zero → NULL, no job kill), oracle-side via the
    defining rewrite x / NULLIF(y, 0).

    Scale shape: one user-keyed window pass (the lag), then a map-side
    milli-integer fold to |event_type| rows; try_divide stays inside
    whole-stage codegen — no Python, no ANSI-off session flag."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id").orderBy("ts", "event_id")
    )
    gap = F.datediff(F.col("ts"), F.lag("ts").over(w))
    return (
        ev.select(
            "event_type",
            F.expr(_Q257_CENTS).alias("cents"),
            gap.alias("gap_days"),
        )
        .select(
            "event_type",
            F.expr(
                "CAST(FLOOR(try_divide(cents * 1000.0, gap_days))"
                " AS BIGINT)"
            ).alias("milli_rate"),
        )
        .groupBy("event_type")
        .agg(
            F.count("milli_rate").cast("bigint").alias("n_rates"),
            F.sum(
                F.when(F.col("milli_rate").isNull(), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_unrateable"),
            F.sum("milli_rate").cast("bigint").alias("sum_milli_rate"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q258 — SQL:2016 inverse-distribution functions (percentile_cont/_disc
# WITHIN GROUP) — Spark 4 surface, statement shared verbatim with DuckDB
# ---------------------------------------------------------------------------
# percentile_disc returns an actual data value (exact on both engines);
# percentile_cont interpolates, and the two engines may form the
# interpolation differently in the last ulp — so the cont result goes
# through the q4 quantization like every cross-engine double.

_Q258_SQL = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       (CAST(CAST(ROUND(
          percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice), 4)
          * 10000 AS BIGINT) AS DOUBLE) / 10000.0) AS median_price,
       percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)
         AS p90_price_disc
FROM {tbl}
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register(
    "q258_percentile_within_group",
    sql=_Q258_SQL.format(tbl="orders"),
    tags=("percentile", "within-group", "spark4", "agg"),
)
def q258_percentile_within_group(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per order priority: the interpolated median (percentile_cont) and
    the discrete p90 (percentile_disc — an actual order's price, exact by
    construction) of order value, written as SQL:2016 inverse-distribution
    aggregates WITHIN GROUP — one statement, both engines verbatim.

    Scale note: exact inverse-distribution aggregates materialize each
    group's sorted values — fine for bounded groups (5 priorities);
    unbounded-cardinality percentiles at 100 TB take the sketch path
    (q74's t-digest / approx_percentile)."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("q258_orders")
    return spark.sql(_Q258_SQL.format(tbl="q258_orders"))


# ---------------------------------------------------------------------------
# q259 — lateral column aliases: a derivation CHAIN in one SELECT,
# statement shared verbatim by both engines
# ---------------------------------------------------------------------------
# Spark 3.4+ lets a SELECT item reference an alias defined earlier in the
# SAME select list — the pipeline-of-derivations idiom that otherwise
# forces nested subqueries or repeated expressions. Analyzer-inlined:
# the plan is identical to writing the full expressions out, so codegen
# and pushdown are untouched.

_Q259_SQL = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS total_cents,
       total_cents / n_orders AS cents_per_order,
       cents_per_order / 100 AS dollars_per_order
FROM {tbl}
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register(
    "q259_lateral_column_alias",
    sql=_Q259_SQL.format(tbl="orders"),
    tags=("lateral-alias", "spark4", "agg"),
)
def q259_lateral_column_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-value census whose derived columns CHAIN through lateral
    column aliases (total_cents → cents_per_order → dollars_per_order)
    in one SELECT — shared verbatim with the DuckDB oracle, so both
    engines' alias resolution and the integer-division semantics of the
    chain sit under the hash."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("q259_orders")
    return spark.sql(_Q259_SQL.format(tbl="q259_orders"))
