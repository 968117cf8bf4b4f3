"""Relational operator surface: scans, filters, aggregations, joins, set ops,
scalar functions (SURVEY.md §2.2 build targets — the reference implements only
scan + partition-range filter, `audit_data_ingest.py:26-33,129-150`; everything
else here is the north-star extension expressed on Spark built-ins so Catalyst
handles pushdown, pruning, join selection and whole-stage codegen).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from ..functions.localrel import local_rows_df

from ..tables import spread, table
from .base import davg, dsum, q4, q4_col, register

# Shared portable expressions (identical text runs in Spark SQL and DuckDB).
_DISC_PRICE = q4(
    "SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4)))"
)
_CHARGE = q4(
    "SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))"
    " * CAST(1 + l_tax AS DECIMAL(18,4)))"
)
_DISC_REVENUE = q4(
    "SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4)))"
)

# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------


@register(
    "q01_pricing_summary",
    sql=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum('l_quantity', 'sum_qty')},
           {dsum('l_extendedprice', 'sum_base_price')},
           {_DISC_PRICE} AS sum_disc_price,
           {_CHARGE} AS sum_charge,
           {davg('l_quantity', 'avg_qty')},
           {davg('l_extendedprice', 'avg_price')},
           {davg('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("agg", "flagship"),
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: scan → filter → hash agg → sort.

    Pure built-ins: the shipdate predicate is pushed into the parquet scan and
    the aggregation is a partial+final hash aggregate (map-side combine), so
    at 100 TB the only shuffle is the tiny post-combine exchange on the
    low-cardinality (returnflag, linestatus) key.
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        # spread: the 9 decimal-exact aggregates are the per-row cost here
        # (measured 6× the scan); on the unsplittable fixture they must not
        # run in the single scan task. Decimal sums are exact/associative,
        # so the result is partition-invariant. No-op on splittable input.
        # Keyed on a column the aggregation already reads (l_extendedprice,
        # high-cardinality) so the spread does not widen the pruned scan.
        spread(
            li.filter(
                F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp_ntz")
            ),
            sf_dir,
            "l_extendedprice",
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr(dsum("l_quantity", "sum_qty")),
            F.expr(dsum("l_extendedprice", "sum_base_price")),
            F.expr(f"{_DISC_PRICE} AS sum_disc_price"),
            F.expr(f"{_CHARGE} AS sum_charge"),
            F.expr(davg("l_quantity", "avg_qty")),
            F.expr(davg("l_extendedprice", "avg_price")),
            F.expr(davg("l_discount", "avg_disc")),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q04_revenue_forecast",
    sql=f"""
    SELECT {_DISC_REVENUE} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.04 AND 0.08
      AND l_quantity < 24
    """,
    tags=("agg", "filter"),
)
def q04_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped single-row aggregate over a multi-predicate filter.

    All four predicates push to the parquet scan (PushedFilters); the global
    agg is a two-stage partial/final sum with no keyed shuffle at all.
    """
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & F.col("l_discount").between(0.04, 0.08)
        & (F.col("l_quantity") < 24)
    ).agg(F.expr(f"{_DISC_REVENUE} AS revenue"))


@register(
    "q08_distinct_agg",
    sql=f"""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders,
           {dsum('o_totalprice', 'total_price')},
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tags=("agg", "distinct"),
)
def q08_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregate alongside plain aggregates (expand-based plan)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            F.expr(dsum("o_totalprice", "total_price")),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "q09_rollup",
    sql=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items,
           {dsum('l_quantity', 'sum_qty')}
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    tags=("agg", "rollup"),
)
def q09_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals: (flag, status), (flag), ()."""
    li = table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.expr(dsum("l_quantity", "sum_qty")),
    )


@register(
    "q10_cube",
    sql="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("agg", "cube"),
)
def q10_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over status × priority — all 4 grouping sets."""
    o = table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@register(
    "q11_grouping_sets",
    sql=f"""
    SELECT c_mktsegment, c_nationkey, COUNT(*) AS n_customers,
           {dsum('c_acctbal', 'sum_acctbal')}
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
    """,
    tags=("agg", "grouping-sets"),
)
def q11_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — two independent rollup dimensions in one pass."""
    c = table(spark, sf_dir, "customer")
    c.createOrReplaceTempView("q11_customer")
    return spark.sql(
        f"""
        SELECT c_mktsegment, c_nationkey, COUNT(*) AS n_customers,
               {dsum('c_acctbal', 'sum_acctbal')}
        FROM q11_customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
        """
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@register(
    "q02_top_orders_by_revenue",
    sql=f"""
    SELECT l_orderkey,
           {_DISC_PRICE} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1999-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk"),
)
def q02_top_orders_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: filtered 3-way equi-join → agg → top-k.

    customer is tiny relative to lineitem, so it broadcasts (AQE picks this
    up from stats; the explicit hint makes it deterministic at 100 TB where
    orders⋈lineitem remains the single shuffle on orderkey).
    """
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1999-03-15 00:00:00").cast("timestamp_ntz")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp_ntz")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.expr(f"{_DISC_PRICE} AS revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q03_regional_revenue",
    sql=f"""
    SELECT n_name,
           {_DISC_PRICE} AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    tags=("join", "agg", "broadcast"),
)
def q03_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 6-way star join with broadcast dimensions.

    region/nation/supplier are broadcast (no shuffle); the only shuffles are
    the fact-fact orders⋈lineitem exchange and the final small agg — the
    right shape for a 1000-executor run.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.expr(f"{_DISC_PRICE} AS revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@register(
    "q05_order_priority_semi",
    sql="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("join", "semi"),
)
def q05_order_priority_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped LEFT SEMI join (EXISTS) with a non-equi residual."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@register(
    "q06_customers_without_orders",
    sql="""
    SELECT c_mktsegment, COUNT(*) AS n_customers, MIN(c_custkey) AS min_custkey
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("join", "anti"),
)
def q06_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers that never ordered."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("c_custkey").alias("min_custkey"),
        )
        .orderBy("c_mktsegment")
    )


_TOTAL_SPENT = q4("COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 0)")


@register(
    "q07_customer_order_stats",
    sql=f"""
    SELECT c_custkey, c_mktsegment,
           COUNT(o_orderkey) AS n_orders,
           {_TOTAL_SPENT} AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_mktsegment
    ORDER BY c_custkey
    """,
    tags=("join", "outer"),
)
def q07_customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving order-less customers, with NULL-safe totals."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.expr(f"{_TOTAL_SPENT} AS total_spent"),
        )
        .orderBy("c_custkey")
    )


@register(
    "q24_price_band_join",
    sql=f"""
    WITH bands(band, lo, hi) AS (
      VALUES ('low', 0.0, 50000.0), ('mid', 50000.0, 150000.0),
             ('high', 150000.0, 300000.0), ('lux', 300000.0, 1e18)
    )
    SELECT band, COUNT(*) AS n_orders,
           {dsum('o_totalprice', 'band_total')}
    FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band
    ORDER BY band
    """,
    tags=("join", "range"),
)
def q24_price_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (band) join: fact rows against broadcast interval dimension.

    Non-equi join → BroadcastNestedLoopJoin over a 4-row side: zero shuffle;
    at 100 TB this stays a map-only pass over orders.
    """
    o = table(spark, sf_dir, "orders")
    bands = local_rows_df(
        spark,
        [
            ("low", 0.0, 50_000.0),
            ("mid", 50_000.0, 150_000.0),
            ("high", 150_000.0, 300_000.0),
            ("lux", 300_000.0, 1e18),
        ],
        "band string, lo double, hi double",
    )
    return (
        o.join(
            F.broadcast(bands),
            (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.expr(dsum("o_totalprice", "band_total")),
        )
        .orderBy("band")
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@register(
    "q18_set_operations",
    sql="""
    SELECT 'both' AS tag, n_nationkey FROM (
        SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
        INTERSECT
        SELECT DISTINCT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'cust_only' AS tag, n_nationkey FROM (
        SELECT DISTINCT c_nationkey AS n_nationkey FROM customer
        EXCEPT
        SELECT DISTINCT s_nationkey FROM supplier)
    ORDER BY tag, n_nationkey
    """,
    tags=("setop",),
)
def q18_set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL over nation-key domains."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("n_nationkey")
    ).distinct()
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("n_nationkey")
    ).distinct()
    both = c.intersect(s).select(F.lit("both").alias("tag"), "n_nationkey")
    cust_only = c.exceptAll(s).select(F.lit("cust_only").alias("tag"), "n_nationkey")
    return both.unionByName(cust_only).orderBy("tag", "n_nationkey")


# ---------------------------------------------------------------------------
# Sorts / limits
# ---------------------------------------------------------------------------


@register(
    "q26_top_parts_global",
    sql="""
    SELECT p_partkey, p_name, p_brand, CAST(p_retailprice AS DOUBLE) AS p_retailprice
    FROM part
    ORDER BY p_retailprice DESC, p_partkey
    LIMIT 15
    """,
    tags=("sort", "limit", "topk"),
)
def q26_top_parts_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition heap
    then driver merge of k rows, never a full sort at 100 TB."""
    p = table(spark, sf_dir, "part")
    return (
        p.select("p_partkey", "p_name", "p_brand", "p_retailprice")
        .orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
        .limit(15)
    )


# ---------------------------------------------------------------------------
# Scalar functions
# ---------------------------------------------------------------------------


@register(
    "q19_string_functions",
    sql="""
    SELECT p_partkey,
           UPPER(p_brand) AS brand_upper,
           SUBSTRING(p_name, 1, 8) AS name_prefix,
           LENGTH(p_name) AS name_len,
           CONCAT(p_brand, ':', p_type) AS brand_type,
           REPLACE(p_type, ' ', '_') AS type_snake,
           LENGTH(p_name) - LENGTH(REPLACE(p_name, ' ', '')) + 1 AS n_words,
           REGEXP_EXTRACT(p_name, '([a-z]+)', 1) AS first_word,
           LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           TRIM(CONCAT('  ', p_brand, '  ')) AS brand_trim
    FROM part
    ORDER BY p_partkey
    """,
    tags=("scalar", "string"),
)
def q19_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery: case, substring, concat, regexp, pad, trim."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.regexp_replace("p_type", " ", "_").alias("type_snake"),
        (
            F.length("p_name") - F.length(F.regexp_replace("p_name", " ", "")) + F.lit(1)
        ).alias("n_words"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias("brand_trim"),
    ).orderBy("p_partkey")


@register(
    "q20_date_functions",
    sql="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT) AS order_year,
           CAST(MONTH(o_orderdate) AS INT) AS order_month,
           CAST(QUARTER(o_orderdate) AS INT) AS order_quarter,
           CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 90 DAY AS DATE) AS due_date,
           DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS order_date_str
    FROM orders
    ORDER BY o_orderkey
    """,
    tags=("scalar", "date"),
)
def q20_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function battery: parts, trunc, arithmetic, formatting."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 90).alias("due_date"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_2002"
        ),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date_str"),
    ).orderBy("o_orderkey")


@register(
    "q21_json_functions",
    sql="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("scalar", "json"),
)
def q21_json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the events.props payload column."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


@register(
    "q22_case_and_nulls",
    sql="""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 200000 THEN 'medium'
                ELSE 'large' END AS size_class,
           NULLIF(o_orderstatus, 'O') AS status_or_null,
           COUNT(*) AS n_orders,
           COUNT(NULLIF(o_orderstatus, 'O')) AS n_nonopen,
           COALESCE(NULLIF(o_orderstatus, 'O'), '-') AS status_filled
    FROM orders
    GROUP BY 1, 2
    ORDER BY size_class, status_or_null NULLS FIRST
    """,
    tags=("scalar", "conditional"),
)
def q22_case_and_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN buckets + NULLIF/COALESCE null semantics."""
    o = table(spark, sf_dir, "orders")
    size_class = (
        F.when(F.col("o_totalprice") < 50_000, "small")
        .when(F.col("o_totalprice") < 200_000, "medium")
        .otherwise("large")
        .alias("size_class")
    )
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_or_null")
    return (
        o.select(size_class, status_or_null)
        .groupBy("size_class", "status_or_null")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count("status_or_null").alias("n_nonopen"),
            F.coalesce(F.col("status_or_null"), F.lit("-")).alias("status_filled"),
        )
        .orderBy(F.col("size_class"), F.col("status_or_null").asc_nulls_first())
    )


@register(
    "q23_math_functions",
    sql="""
    SELECT l_orderkey, l_linenumber,
           ABS(l_extendedprice - 50000) AS price_dev,
           CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(FLOOR(l_quantity / 7) AS BIGINT) AS qty_bucket,
           CAST(l_orderkey % 97 AS BIGINT) AS key_mod,
           GREATEST(l_tax, l_discount) AS max_rate,
           LEAST(l_tax, l_discount) AS min_rate,
           CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS disc_sign,
           SQRT(l_quantity) AS qty_sqrt
    FROM lineitem
    WHERE l_orderkey < 500
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("scalar", "math"),
)
def q23_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function battery (only IEEE-exact ops, so doubles match bit-wise)."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 50_000).alias("price_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor(F.col("l_quantity") / 7).alias("qty_bucket"),
        (F.col("l_orderkey") % 97).alias("key_mod"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "q45_cross_join",
    sql="""
    SELECT a.r_name AS region_a, b.r_name AS region_b,
           CASE WHEN a.r_regionkey = b.r_regionkey THEN 1 ELSE 0 END AS is_same
    FROM region a CROSS JOIN region b
    ORDER BY region_a, region_b
    """,
    tags=("join", "cross"),
)
def q45_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit CROSS JOIN (tiny×tiny): all region pairs.

    Legitimate only when at least one side is broadcast-small — Spark plans
    BroadcastNestedLoopJoin here; the no-cartesian plan test exempts this
    query by design.
    """
    r = table(spark, sf_dir, "region")
    a = r.select(F.col("r_name").alias("region_a"), F.col("r_regionkey").alias("ka"))
    b = r.select(F.col("r_name").alias("region_b"), F.col("r_regionkey").alias("kb"))
    return (
        a.crossJoin(F.broadcast(b))
        .select(
            "region_a",
            "region_b",
            F.when(F.col("ka") == F.col("kb"), 1).otherwise(0).alias("is_same"),
        )
        .orderBy("region_a", "region_b")
    )


@register(
    "q94_salted_join",
    sql=f"""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_orders,
           {dsum('o.o_totalprice', 'total_price')}
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
    tags=("join", "skew", "salted"),
)
def q94_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted equi-join (``functions.skew.salted_join``): the fact side
    is salted into 8 buckets and the dimension replicated once per bucket,
    so one hot customer's orders land on 8 different reducers instead of
    one. Output is provably identical to the plain join — the oracle IS the
    plain join — which is the salting contract: a pure physical rewrite.

    Scale shape: replication costs |dim|·8 (used when the dim exceeds the
    broadcast threshold but is far smaller than the skewed fact side); the
    join shuffles on (custkey, salt), spreading any hot key. On this
    fixture Spark still picks broadcast-hash for the replicated dim — the
    salted SMJ shape under a disabled broadcast threshold is pinned in
    ``tests/test_skew_guards.py``.
    """
    from ..functions.skew import salted_join

    orders = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_totalprice"
    )
    cust = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    joined = salted_join(orders, cust, "custkey", salt_buckets=8)
    return (
        joined.groupBy(F.col("c_mktsegment"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            q4_col(F.sum(F.col("o_totalprice").cast("decimal(18,4)"))).alias(
                "total_price"
            ),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# q115 — SCD2 versioned-history apply
# ---------------------------------------------------------------------------
# The slowly-changing-dimension operator (sinks/scd2.py::apply_scd2) pinned
# against a SQL oracle on a deterministic scenario: the customer table is
# an all-open SCD2 history (one version per key since 2025-01-01), and an
# update batch re-segments every 7th customer effective 2026-06-01. The
# oracle writes the expected history directly: changed keys close at the
# effective time and gain a new open 'REMAPPED' version; the rest stay
# open and untouched.
_SCD2_T0 = "TIMESTAMP '2025-01-01 00:00:00'"
_SCD2_T1 = "TIMESTAMP '2026-06-01 00:00:00'"


@register(
    "q115_scd2_apply",
    sql=f"""
    SELECT c_custkey, c_mktsegment AS segment,
           {_SCD2_T0} AS valid_from,
           CASE WHEN c_custkey % 7 = 0 THEN {_SCD2_T1} END AS valid_to
    FROM customer
    UNION ALL
    SELECT c_custkey, 'REMAPPED' AS segment,
           {_SCD2_T1} AS valid_from, NULL AS valid_to
    FROM customer WHERE c_custkey % 7 = 0
    ORDER BY c_custkey, valid_from
    """,
    tags=("relational", "scd2", "warehouse", "cdc"),
)
def q115_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One SCD2 update batch applied to the customer dimension via the
    real operator (``sinks.scd2.apply_scd2``) — history rows for changed
    keys close at the batch's effective time and a new open version
    appends; unchanged keys pass through untouched (scenario in the
    module comment).

    Scale shape: the apply is ONE equi-join of the update batch onto the
    OPEN slice of the history on the business key (Spark broadcasts the
    batch when it is dimension-sized, as here) plus a map emitting
    close/open rows — closed history is never read past its partition
    filter. Compose with ``merge_upsert_partitioned`` to rewrite only the
    partitions holding touched keys, and with ``as_of`` / q25 for
    point-in-time reads of the result."""
    from ..sinks.scd2 import apply_scd2

    c = table(spark, sf_dir, "customer")
    history = c.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.expr(_SCD2_T0).alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    updates = c.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        F.lit("REMAPPED").alias("segment"),
        F.expr(_SCD2_T1).alias("effective_ts"),
    )
    return apply_scd2(
        history, updates, ["c_custkey"], ["segment"]
    ).orderBy("c_custkey", "valid_from")


@register(
    "q124_skew_report",
    sql="""
    WITH keyed AS (
      SELECT l_orderkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1
    ), stats AS (
      SELECT COUNT(*) AS n_keys, SUM(c) AS n_rows, MAX(c) AS max_c
      FROM keyed
    )
    SELECT CAST(s.n_keys AS BIGINT) AS n_keys,
           CAST(s.n_rows AS BIGINT) AS n_rows,
           CAST(s.max_c AS BIGINT) AS max_rows_per_key,
           CAST((CAST(1000 AS HUGEINT) * s.max_c * s.n_keys) // s.n_rows
             AS BIGINT) AS skew_milli,
           CAST((SELECT COUNT(*) FROM keyed k, stats s2
                 WHERE CAST(k.c AS HUGEINT) * s2.n_keys
                       > CAST(3 AS HUGEINT) * s2.n_rows) AS BIGINT)
             AS n_hot_keys
    FROM stats s
    """,
    tags=("relational", "skew", "diagnostics", "observability"),
)
def q124_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic for the engine's biggest fact-fact join
    (orders⋈lineitem on orderkey): key count, max rows per key, the skew
    factor max/mean in milli-units, and how many keys carry more than 3×
    the mean (c·n_keys > 3·n_rows ⇔ c > 3·mean — pure integer, no
    division). The report that decides, BEFORE a production
    run, whether a key needs `functions/skew.py::salted_join` (q94) or
    AQE's skew split is enough: skew_milli ≈ 1000 means uniform; ≥ 10⁴
    means one key holds 10× its share and the plain shuffle join will
    straggle.

    Scale shape: one partial-aggregated count per key, then constant-size
    moments — the histogram itself never leaves the cluster, and the five
    output numbers are the entire result. Run it per partition (add `day`
    to the key) to watch skew drift over time. The computation is
    `functions/skew.py::key_skew_report`, the reusable operator whose
    persisted output feeds `maybe_salted_join` via `load_skew_milli`."""
    from ..functions.skew import key_skew_report

    return key_skew_report(table(spark, sf_dir, "lineitem"), "l_orderkey")


@register(
    "q131_referential_audit",
    sql="""
    WITH o_keys AS (SELECT DISTINCT o_orderkey FROM orders),
         l_keys AS (SELECT DISTINCT l_orderkey FROM lineitem),
         c_keys AS (SELECT DISTINCT c_custkey FROM customer)
    SELECT 'lineitem_orphans' AS rule,
           CAST((SELECT COUNT(*) FROM l_keys
                 WHERE l_orderkey NOT IN (SELECT o_orderkey FROM o_keys))
             AS BIGINT) AS n_violations
    UNION ALL
    SELECT 'orders_without_lineitems',
           CAST((SELECT COUNT(*) FROM o_keys
                 WHERE o_orderkey NOT IN (SELECT l_orderkey FROM l_keys))
             AS BIGINT)
    UNION ALL
    SELECT 'orders_orphan_customers',
           CAST((SELECT COUNT(*) FROM (SELECT DISTINCT o_custkey FROM orders)
                 WHERE o_custkey NOT IN (SELECT c_custkey FROM c_keys))
             AS BIGINT)
    ORDER BY rule
    """,
    tags=("relational", "contract", "referential-integrity", "audit"),
)
def q131_referential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table referential integrity: orphan lineitems (no parent
    order), childless orders, and orders pointing at missing customers —
    the foreign-key contract q113's single-table suite can't express,
    run as three left-anti joins over DISTINCT key projections.

    Scale shape: each rule is distinct-project → anti-join on the key —
    column-pruned scans (keys only reach the exchange), partial-distinct
    combine, and Spark picks broadcast for the smaller key set. At
    100 TB the key projections are the natural thing to bucket, making
    every audit co-located. Counts-only output: the audit names the rule,
    a follow-up query fetches offenders."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    c = table(spark, sf_dir, "customer")
    o_keys = o.select("o_orderkey").distinct()
    l_keys = li.select("l_orderkey").distinct()
    c_keys = c.select("c_custkey").distinct()

    def count_anti(left, right, lk, rk, rule):
        return (
            left.join(right, F.col(lk) == F.col(rk), "left_anti")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_violations"))
            .select(F.lit(rule).alias("rule"), "n_violations")
        )

    out = (
        count_anti(l_keys, o_keys, "l_orderkey", "o_orderkey", "lineitem_orphans")
        .unionByName(
            count_anti(
                o_keys, l_keys, "o_orderkey", "l_orderkey",
                "orders_without_lineitems",
            )
        )
        .unionByName(
            count_anti(
                o.select("o_custkey").distinct(), c_keys, "o_custkey", "c_custkey",
                "orders_orphan_customers",
            )
        )
    )
    return out.orderBy("rule")


@register(
    "q132_weekly_growth",
    sql="""
    WITH weekly AS (
      SELECT CAST(DATE_TRUNC('week', CAST(o_orderdate AS TIMESTAMP)) AS DATE) AS week,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS gmv_cents,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders
      WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1998-01-01'
      GROUP BY 1
    )
    SELECT week, gmv_cents, n_orders,
           CAST(CASE WHEN LAG(gmv_cents) OVER (ORDER BY week) IS NULL THEN NULL
                ELSE (CAST(10000 AS HUGEINT) * gmv_cents) // LAG(gmv_cents) OVER (ORDER BY week) - 10000
                END AS BIGINT) AS wow_growth_bps
    FROM weekly
    ORDER BY week
    """,
    tags=("relational", "bi", "time-series", "growth"),
)
def q132_weekly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly GMV with week-over-week growth in basis points — the
    period-over-period trend every revenue dashboard leads with, growth
    as BIGINT-cents integer division (q127's rounding-pitfall policy).

    Scale shape: the pushed date filter + week rollup collapse the fact
    table to ≤53 rows before the lag window touches anything — the
    ordered window runs over the aggregated series (q37s placement), so
    the single-partition sort it needs is 53 rows, not orders. Per-
    segment trends add the segment to both the groupBy and the window
    partition — the window then parallelizes too."""
    o = table(spark, sf_dir, "orders")
    weekly = (
        o.filter(
            (F.col("o_orderdate") >= "1997-01-01")
            & (F.col("o_orderdate") < "1998-01-01")
        )
        .groupBy(
            F.to_date(F.date_trunc("week", "o_orderdate")).alias("week")
        )
        .agg(
            F.sum(F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"))
            .cast("bigint")
            .alias("gmv_cents"),
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy("week")
    prev = F.lag("gmv_cents").over(w)
    return weekly.select(
        "week",
        "gmv_cents",
        "n_orders",
        F.when(prev.isNull(), F.lit(None).cast("bigint"))
        .otherwise(
            F.expr(
                "(10000 * CAST(gmv_cents AS DECIMAL(38,0)))"
                " DIV LAG(gmv_cents) OVER (ORDER BY week) - 10000"
            )
        )
        .cast("bigint")
        .alias("wow_growth_bps"),
    ).orderBy("week")


@register(
    "q134_snapshot_diff",
    sql="""
    WITH old AS (
      SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
      WHERE c_custkey % 13 <> 0
    ), new AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 7 = 0 THEN 'REMAPPED' ELSE c_mktsegment END
               AS c_mktsegment,
             c_acctbal
      FROM customer
      WHERE c_custkey % 11 <> 0
    ), j AS (
      SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
             o.c_custkey IS NULL AS is_added,
             n.c_custkey IS NULL AS is_removed,
             o.c_custkey IS NOT NULL AND n.c_custkey IS NOT NULL
               AND o.c_mktsegment <> n.c_mktsegment AS seg_changed
      FROM old o FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey
    )
    SELECT c_custkey,
           CASE WHEN is_added THEN 'added'
                WHEN is_removed THEN 'removed'
                ELSE 'modified' END AS change_type,
           CASE WHEN NOT is_added AND NOT is_removed
                THEN 'c_mktsegment' ELSE '' END AS changed_cols
    FROM j
    WHERE is_added OR is_removed OR seg_changed
    ORDER BY c_custkey
    """,
    tags=("relational", "cdc", "diff", "snapshot"),
)
def q134_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff via the real operator (``sinks.diff.table_diff``) on
    a deterministic two-version scenario: version B drops every 11th
    customer, restores every 13th (absent from A), and re-segments every
    7th — the audit a pipeline runs between two `SnapshotTable` commits
    to answer "what did that run change?".

    Scale shape: one full-outer join on the business key plus a map —
    the kernel's only exchange; bucketed storage of recurring snapshots
    makes it co-located. Null-safe column compare, changed columns named
    per row, unchanged keys never emitted (so the diff's output size is
    the CHANGE volume, not the table)."""
    from ..sinks.diff import table_diff

    c = table(spark, sf_dir, "customer")
    old = c.filter(F.col("c_custkey") % 13 != 0).select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    new = c.filter(F.col("c_custkey") % 11 != 0).select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 0, "REMAPPED")
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
        "c_acctbal",
    )
    return table_diff(old, new, ["c_custkey"]).orderBy("c_custkey")


@register(
    "q140_join_size_audit",
    sql="""
    WITH ok AS (
      SELECT o_orderkey AS k, COUNT(*) AS c FROM orders GROUP BY 1
    ), lk AS (
      SELECT l_orderkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1
    )
    SELECT CAST((SELECT SUM(ok.c * lk.c) FROM ok JOIN lk USING (k)) AS BIGINT)
             AS join_rows,
           CAST((SELECT COUNT(*) FROM ok) AS BIGINT) AS n_left_keys,
           CAST((SELECT COUNT(*) FROM lk) AS BIGINT) AS n_right_keys,
           CAST((SELECT MAX(ok.c * lk.c) FROM ok JOIN lk USING (k)) AS BIGINT)
             AS max_key_contribution
    """,
    tags=("relational", "diagnostics", "join-size", "planning"),
)
def q140_join_size_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT output size of orders⋈lineitem computed WITHOUT running the
    join: per-key count histograms joined on the key, Σ c_left·c_right —
    the counting identity q130 uses for pair matrices, standalone. The
    pre-flight a pipeline runs before an expensive fact-fact join: the
    total says whether the output fits the budget, max_key_contribution
    says whether one key will dominate a task (q124's skew verdict in
    output-row units).

    Scale shape: two partial-aggregated key histograms and a count-only
    join — the shuffle carries one row per distinct key instead of one
    per data row, typically 10-1000× less than the audited join. This is
    exact for inner equi-joins; theta-join estimates need sampling (out
    of scope, documented)."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    ok = o.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("c_l")
    )
    lk = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("c_r")
    )
    # DECIMAL(38,0) from the per-row product up: the whole point of this
    # audit is catching pathological joins — a single degenerate hot key
    # with ~3e9 rows per side already overflows the BIGINT product, and a
    # wrapped per-row contrib would be summed "exactly" into garbage. The
    # oracle errors loudly on the same product (DuckDB BIGINT×BIGINT);
    # decimal keeps the Spark side exact to 10³⁸.
    joined = ok.join(lk, "k").select(
        F.expr("CAST(c_l AS DECIMAL(38,0)) * c_r").alias("contrib")
    )
    # output boundary SATURATES at BIGINT max instead of casting through:
    # a bare decimal→bigint cast yields null (non-ANSI) exactly in the
    # pathological regime the audit must flag loudly — a reported
    # 9223372036854775807 reads unambiguously as "off the scale, veto".
    # The null guard matters: Spark's LEAST SKIPS nulls, so without it an
    # EMPTY key intersection (SUM/MAX = NULL, oracle reports NULL) would
    # saturate to the max — the opposite audit verdict.
    _sat = (
        "IF({0} IS NULL, NULL,"
        " LEAST({0}, CAST(9223372036854775807 AS DECIMAL(38,0))))"
    )
    contrib = joined.agg(
        F.expr(
            f"CAST({_sat.format('SUM(contrib)')} AS BIGINT)"
        ).alias("join_rows"),
        F.expr(
            f"CAST({_sat.format('MAX(contrib)')} AS BIGINT)"
        ).alias("max_key_contribution"),
    )
    sides = ok.agg(F.count(F.lit(1)).cast("bigint").alias("n_left_keys")).crossJoin(
        lk.agg(F.count(F.lit(1)).cast("bigint").alias("n_right_keys"))
    )
    return contrib.crossJoin(F.broadcast(sides)).select(
        "join_rows", "n_left_keys", "n_right_keys", "max_key_contribution"
    )


# ---------------------------------------------------------------------------
# q173 — histogram-driven salting decision, end to end
# ---------------------------------------------------------------------------


@register(
    "q173_skew_aware_join",
    sql="""
    WITH fact AS (
      SELECT CASE WHEN l_orderkey % 10 < 9 THEN -1
                  ELSE l_orderkey % 1000 END AS k,
             CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
      FROM lineitem
    ), dim AS (
      SELECT k, CAST(ABS(k) % 7 + 1 AS BIGINT) AS w
      FROM (SELECT DISTINCT k FROM fact)
    )
    SELECT d.w,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(f.cents * d.w) AS BIGINT) AS weighted_cents
    FROM fact f JOIN dim d USING (k)
    GROUP BY d.w
    ORDER BY d.w
    """,
    tags=("join", "skew", "salted", "diagnostics"),
)
def q173_skew_aware_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The q124→salting loop closed end to end: a fact table with a
    genuinely hot key (~90 % of lineitem rows map to one derived key)
    joins a per-key weight dim through
    ``functions.skew.maybe_salted_join``, whose histogram probe
    (``key_skew_milli`` ≈ 9×10⁵ here) crosses the 10⁴ threshold and
    engages the salted rewrite — the driver row proves the DECIDED
    salted join equals the plain join the oracle runs. Contrast q94,
    which pins ``salted_join`` unconditionally.

    Scale shape: the decision probe is one partial-aggregated count per
    key + a constant-size reduction (at 100 TB you'd feed a standing
    q124 report via ``skew_milli=`` instead); the engaged join shuffles
    on (k, salt) so the hot key spreads over 16 reducers; weighted sums
    are exact integer cents.
    """
    from ..functions.skew import maybe_salted_join

    li = table(spark, sf_dir, "lineitem")
    fact = li.select(
        F.expr(
            "CASE WHEN l_orderkey % 10 < 9 THEN -1 ELSE l_orderkey % 1000 END"
        ).alias("k"),
        F.expr("CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)").alias(
            "cents"
        ),
    )
    dim = fact.select("k").distinct().select(
        "k", F.expr("CAST(ABS(k) % 7 + 1 AS BIGINT)").alias("w")
    )
    joined = maybe_salted_join(fact, dim, "k")
    return (
        joined.groupBy("w")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            # DECIMAL(38,0) sum: a BIGINT sum of cents*w (~7e7/row) wraps
            # silently past ~1.3e11 rows while the oracle's SUM promotes
            # to HUGEINT — the q92/q93 divergence class; decimal is exact
            F.sum(F.expr("CAST(cents * w AS DECIMAL(38,0))"))
            .cast("bigint")
            .alias("weighted_cents"),
        )
        .orderBy("w")
    )


# ---------------------------------------------------------------------------
# q189 — salted two-stage aggregation, end to end
# ---------------------------------------------------------------------------


@register(
    "q189_salted_agg",
    sql="""
    WITH fact AS (
      SELECT CASE WHEN l_orderkey % 10 < 9 THEN 'HOT'
                  ELSE 'k' || CAST(l_orderkey % 97 AS VARCHAR) END AS k,
             CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
      FROM lineitem
    )
    SELECT k,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           CAST(MIN(cents) AS BIGINT) AS min_cents,
           CAST(MAX(cents) AS BIGINT) AS max_cents
    FROM fact
    GROUP BY k
    ORDER BY k
    """,
    tags=("aggregation", "skew", "salted", "diagnostics"),
)
def q189_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-stage aggregation driven end to end under the oracle —
    the aggregation twin of q173's join proof: ~90 % of lineitem rows
    collapse onto one derived key, stage 1 aggregates on (k, salt) so
    the hot key's reduction spreads over 16 reducers, and the stage-2
    merge per key must equal the oracle's plain GROUP BY exactly
    (count/sum are re-summed, min/max re-extremed — the decomposable
    merge rule ``functions.skew.salted_agg`` documents).

    Scale note: for algebraic aggregates Spark's map-side partial
    aggregation already shrinks a hot key to one row per task, so
    salting buys little; the salted rewrite earns its keep when the
    per-key aggregation state is too big to combine map-side (exact
    collect-set/sketch states, ObjectHashAggregate sort fallback) or
    when stage 2 feeds a differently-keyed consumer. This query pins
    the merge-law correctness that makes that rewrite safe to reach for.
    """
    from ..functions.skew import salted_agg

    li = table(spark, sf_dir, "lineitem")
    fact = li.select(
        F.expr(
            "CASE WHEN l_orderkey % 10 < 9 THEN 'HOT'"
            " ELSE CONCAT('k', CAST(l_orderkey % 97 AS STRING)) END"
        ).alias("k"),
        F.expr("CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)").alias(
            "cents"
        ),
    )
    partials = salted_agg(
        fact,
        "k",
        [
            F.count(F.lit(1)).alias("pc"),
            # DECIMAL(38,0) partial sums: BIGINT cents (~1e7/row) wraps a
            # plain BIGINT sum past ~9e11 rows; the oracle promotes to
            # HUGEINT — the q92/q93 divergence class
            F.sum(F.expr("CAST(cents AS DECIMAL(38,0))")).alias("ps"),
            F.min("cents").alias("pmin"),
            F.max("cents").alias("pmax"),
        ],
        salt_buckets=16,
    )
    return (
        partials.groupBy("k")
        .agg(
            F.sum("pc").cast("bigint").alias("n_rows"),
            F.sum("ps").cast("bigint").alias("sum_cents"),
            F.min("pmin").cast("bigint").alias("min_cents"),
            F.max("pmax").cast("bigint").alias("max_cents"),
        )
        .orderBy("k")
    )


# ---------------------------------------------------------------------------
# q239 — correlated LATERAL subquery (per-group top-k without a window)
# ---------------------------------------------------------------------------
# The one classical join form not yet registered: a correlated LATERAL
# derived table — "for each outer row, run this subquery" — here the
# canonical per-group top-k (each nation's two largest account
# balances). Both engines execute the IDENTICAL statement text (q228's
# device: the fixture views carry the same names on both sides), so
# Spark's DecorrelateInnerQuery planning of LATERAL ... ORDER BY/LIMIT
# is pinned against DuckDB's lateral join. Catalyst decorrelates it to
# the same partitioned rank the window form (q12) plans — asserted by a
# drill that cross-pins the two forms row-for-row.


def _q239_sql() -> str:
    return """
    SELECT n.n_name AS nation, t.c_name AS customer_name,
           CAST(FLOOR(t.c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_cents
    FROM nation n,
    LATERAL (
      SELECT c_name, c_acctbal FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey
      LIMIT 2
    ) t
    ORDER BY nation, acctbal_cents DESC, customer_name
    """


@register(
    "q239_lateral_topk_per_nation",
    sql=_q239_sql(),
    tags=("join", "lateral", "correlated", "topk"),
)
def q239_lateral_topk_per_nation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Each nation's two largest customer balances via a correlated
    LATERAL subquery — identical statement text on both engines (module
    comment). Scale shape: Catalyst decorrelates the lateral into a
    per-nation rank over ONE customer shuffle (the q12 window plan) —
    no per-outer-row re-execution survives planning; the nation dim
    broadcasts."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(_q239_sql())


# ---------------------------------------------------------------------------
# q240 — null-safe equality join (<=> / IS NOT DISTINCT FROM)
# ---------------------------------------------------------------------------
# The record-linkage join predicate for keys with MISSING values: plain
# `=` silently drops every NULL-keyed row (NULL = NULL is NULL), while
# the null-safe form matches NULL with NULL — the correct semantics when
# "field absent" is itself a linkage value. Shape: two derived customer
# feeds with NULLIF-injected missing segments, joined null-safely on
# (segment, nation), with the NULL-bucket rows counted separately so the
# census proves the NULL-NULL matches actually happened.


@register(
    "q240_nullsafe_linkage_join",
    sql="""
    WITH a AS (
      SELECT c_custkey, c_nationkey,
             NULLIF(c_mktsegment, 'BUILDING') AS seg
      FROM customer WHERE c_custkey % 2 = 0
    ), b AS (
      SELECT c_custkey, c_nationkey,
             NULLIF(c_mktsegment, 'BUILDING') AS seg
      FROM customer WHERE c_custkey % 2 = 1
    ), joined AS (
      SELECT a.c_nationkey AS nationkey, a.seg,
             COUNT(*) AS n_pairs
      FROM a JOIN b
        ON a.seg IS NOT DISTINCT FROM b.seg
       AND a.c_nationkey = b.c_nationkey
      GROUP BY a.c_nationkey, a.seg
    )
    SELECT CAST(nationkey AS BIGINT) AS nationkey,
           COALESCE(seg, '(missing)') AS segment,
           CAST(n_pairs AS BIGINT) AS n_pairs
    FROM joined
    ORDER BY nationkey, segment
    """,
    tags=("join", "nullsafe", "linkage"),
)
def q240_nullsafe_linkage_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Null-safe equality join census (module comment): even/odd customer
    halves linked on (segment, nation) where segment uses Spark's
    ``<=>`` (DuckDB's IS NOT DISTINCT FROM) so rows whose segment was
    NULLed out still pair inside the '(missing)' bucket — plain ``=``
    would return zero rows for it (drilled).

    Scale shape: the null-safe predicate plans as an ordinary hash join
    (null-safe keys hash like values, no skew surprise beyond the NULL
    bucket itself — salt that key upstream if missingness dominates);
    one exchange per side, census re-aggregate on top."""
    c = table(spark, sf_dir, "customer")
    a = c.filter("c_custkey % 2 = 0").select(
        "c_custkey",
        "c_nationkey",
        F.expr("NULLIF(c_mktsegment, 'BUILDING')").alias("seg"),
    )
    b = c.filter("c_custkey % 2 = 1").select(
        F.col("c_custkey").alias("b_custkey"),
        F.col("c_nationkey").alias("b_nationkey"),
        F.expr("NULLIF(c_mktsegment, 'BUILDING')").alias("b_seg"),
    )
    return (
        a.join(
            b,
            F.expr("seg <=> b_seg")
            & (F.col("c_nationkey") == F.col("b_nationkey")),
        )
        .groupBy("c_nationkey", "seg")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .select(
            F.col("c_nationkey").cast("bigint").alias("nationkey"),
            F.coalesce("seg", F.lit("(missing)")).alias("segment"),
            "n_pairs",
        )
        .orderBy("nationkey", "segment")
    )


# ---------------------------------------------------------------------------
# q261 — anti-entropy table checksum: order-insensitive per-month content
# fingerprints for replica/migration verification without moving rows.
# ---------------------------------------------------------------------------

# canonical row serialization: ids and EXACT cents (a double would not
# round-trip identically through string formatting across engines); the
# field list is shared with functions/checksum.py's INJECTIVE builder
# (␛-escaped ``|`` joiner, bare-␀ NULL) so query and API cannot drift
def _q261_row(str_type: str) -> str:
    from ..functions.checksum import canonical_row_sql

    fields = [
        f"CAST(o_orderkey AS {str_type})",
        f"CAST(o_custkey AS {str_type})",
        "o_orderstatus",
        f"CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"
        f" AS {str_type})",
        f"CAST(o_orderdate AS {str_type})",
        "o_orderpriority",
    ]
    return canonical_row_sql(fields)


def _q261_sql() -> str:
    from ..functions.hashing import duckdb_hash32

    h = duckdb_hash32(_q261_row("VARCHAR"))
    return f"""
    SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST({h} AS DECIMAL(38,0))) AS VARCHAR) AS checksum
    FROM orders
    GROUP BY 1
    ORDER BY month
    """


@register(
    "q261_table_checksum",
    sql=_q261_sql(),
    tags=("audit", "checksum", "agg", "portable-hash"),
)
def q261_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-entropy fingerprint of the orders table: per month, the row
    count and an ORDER-INSENSITIVE content checksum (SUM of the portable
    32-bit MD5 row hash over a canonical serialization). Two replicas —
    or a table before and after a migration/compaction/engine swap —
    agree iff every month's (n_rows, checksum) pair agrees, without
    shipping a single row; a mismatch localizes the divergence to a
    month. The same shape Cassandra/Dynamo anti-entropy uses
    (Merkle-tree leaves), flattened to one level because partitions are
    the natural exchange unit here.

    SUM (not XOR) so a row present TWICE is caught (XOR self-cancels);
    the sum accumulates in DECIMAL(38,0) — EXACT at any group size (a
    BIGINT accumulator wraps past ~2^31 rows per group: 2^32·2^31
    exceeds BIGINT max, and Spark's silent non-ANSI wrap differs from
    DuckDB's HUGEINT promotion) — and is rendered as a STRING so
    neither engine's pandas bridge can coerce it lossily. The row
    serialization is the shared INJECTIVE builder
    (functions/checksum.py::canonical_row_sql): delimiter characters in
    data are ␛-escaped, so field boundaries cannot shift.

    Scale shape: one map-side partial agg over the scan (hash computed
    in-codegen, no Python), one exchange on ~|months| keys; at 100 TB
    this is the cheapest full-content audit there is — every byte is
    touched exactly once, nothing is shuffled but (month, count, sum)
    partials."""
    o = table(spark, sf_dir, "orders")
    from ..functions.hashing import spark_hash32

    h = spark_hash32(_q261_row("STRING"))
    return (
        o.groupBy(F.trunc("o_orderdate", "month").alias("month"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.expr(h).cast("decimal(38,0)"))
            .cast("string")
            .alias("checksum"),
        )
        .orderBy("month")
    )
