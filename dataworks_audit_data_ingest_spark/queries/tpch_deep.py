"""Deeper TPC-H-shaped workloads: multi-fact joins with conditional
aggregation (Q7/Q8/Q10 shapes) — the benchmark-grade relational depth on top
of the operator-by-operator coverage in relational.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import table
from .base import q4, register

_VOLUME = q4(
    "SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4)))"
)
_COND_VOLUME_ASIA = q4(
    "SUM(CASE WHEN r_name = 'ASIA' THEN CAST(l_extendedprice AS DECIMAL(18,4)) "
    "* CAST(1 - l_discount AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END)"
)


@register(
    "q71_nation_trade_volume",
    sql=f"""
    SELECT supp_nation, cust_nation, order_year,
           {_VOLUME} AS volume,
           COUNT(*) AS n_items
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(YEAR(o_orderdate) AS INT) AS order_year,
             l_extendedprice, l_discount
      FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON n1.n_nationkey = s_nationkey
        JOIN nation n2 ON n2.n_nationkey = c_nationkey
      WHERE n1.n_name IN ('NATION_0', 'NATION_1')
        AND n2.n_name IN ('NATION_0', 'NATION_1')
        AND n1.n_name != n2.n_name)
    GROUP BY supp_nation, cust_nation, order_year
    ORDER BY supp_nation, cust_nation, order_year
    """,
    tags=("join", "agg", "tpch"),
)
def q71_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped: bilateral trade volume by year between two nations.

    Five-way join with two roles of the same dimension (nation n1/n2) —
    both broadcast; the only large exchange is orders⋈lineitem.
    """
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    nations = ("NATION_0", "NATION_1")
    n1 = n.select(F.col("n_nationkey").alias("k1"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("k2"), F.col("n_name").alias("cust_nation"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("k1"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("k2"))
        .filter(
            F.col("supp_nation").isin(*nations)
            & F.col("cust_nation").isin(*nations)
            & (F.col("supp_nation") != F.col("cust_nation"))
        )
        .select(
            "supp_nation",
            "cust_nation",
            F.year("o_orderdate").alias("order_year"),
            "l_extendedprice",
            "l_discount",
        )
        .groupBy("supp_nation", "cust_nation", "order_year")
        .agg(
            F.expr(f"{_VOLUME} AS volume"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("supp_nation", "cust_nation", "order_year")
    )


@register(
    "q72_region_market_share",
    sql=f"""
    SELECT order_year,
           {_COND_VOLUME_ASIA} / {_VOLUME} AS asia_share,
           {_VOLUME} AS total_volume
    FROM (
      SELECT CAST(YEAR(o_orderdate) AS INT) AS order_year,
             r_name, l_extendedprice, l_discount
      FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        JOIN region   ON r_regionkey = n_regionkey)
    GROUP BY order_year
    ORDER BY order_year
    """,
    tags=("join", "agg", "tpch", "share"),
)
def q72_region_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped market share: conditional volume over total volume
    per year — the numerator is a CASE inside the same aggregate pass, so
    share needs no self-join."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            F.year("o_orderdate").alias("order_year"),
            "r_name",
            "l_extendedprice",
            "l_discount",
        )
        .groupBy("order_year")
        .agg(
            F.expr(f"{_COND_VOLUME_ASIA} / {_VOLUME} AS asia_share"),
            F.expr(f"{_VOLUME} AS total_volume"),
        )
        .orderBy("order_year")
    )


@register(
    "q73_returned_item_customers",
    sql=f"""
    SELECT c_custkey, c_name, c_mktsegment,
           {_VOLUME} AS revenue_lost,
           COUNT(*) AS n_returned_items
    FROM customer
      JOIN orders   ON o_custkey = c_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY c_custkey, c_name, c_mktsegment
    ORDER BY revenue_lost DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "agg", "tpch", "topk"),
)
def q73_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped: customers who returned the most revenue in a year —
    filtered fact join, per-customer agg, top-k."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg(
            F.expr(f"{_VOLUME} AS revenue_lost"),
            F.count(F.lit(1)).alias("n_returned_items"),
        )
        .orderBy(F.desc("revenue_lost"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q201_waiting_supplier",
    sql="""
    WITH late AS (
      SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R'
    )
    SELECT s.s_suppkey AS suppkey, s.s_name AS supplier_name,
           CAST(COUNT(*) AS BIGINT) AS numwait
    FROM late l1
      JOIN orders o ON o.o_orderkey = l1.l_orderkey
                    AND o.o_orderstatus = 'F'
      JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey != l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM late l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey != l1.l_suppkey
      )
    GROUP BY s.s_suppkey, s.s_name
    ORDER BY numwait DESC, suppkey
    LIMIT 20
    """,
    tags=("tpch", "join", "exists", "anti"),
)
def q201_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21's shape on the available columns: suppliers who were the
    SOLE late supplier ('R'-flagged line) on a finished multi-supplier
    order — a correlated EXISTS (another supplier participated) plus a
    correlated NOT EXISTS (no OTHER supplier was late) against the same
    fact table, the classic optimizer stress for semi/anti join
    planning. (The reference fixture carries no l_receiptdate/
    l_commitdate, so 'late' is the return flag.)

    Spark-side the correlations are explicit LEFT SEMI and LEFT ANTI
    joins keyed on l_orderkey with the suppkey inequality INSIDE the
    join condition — each is one shuffle on the natural key, no
    row-explosion (the semi/anti probe stops at first match), and the
    supplier dim broadcasts. Top-20 plans as TakeOrderedAndProject.
    """
    li = table(spark, sf_dir, "lineitem")
    late = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    sup = table(spark, sf_dir, "supplier")
    l1 = late.join(
        orders.select(F.col("o_orderkey").alias("l_orderkey")), "l_orderkey"
    )
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    qualified = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("k2"))
            & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("k3"))
            & (F.col("l_suppkey") != F.col("s3")),
            "left_anti",
        )
    )
    return (
        qualified.join(
            F.broadcast(sup.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("supplier_name"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("suppkey"))
        .limit(20)
    )


@register(
    "q202_idle_rich_customers",
    sql="""
    WITH thresh AS (
      SELECT AVG(c_acctbal) AS avg_bal FROM customer WHERE c_acctbal > 0.0
    )
    SELECT CAST(c.c_nationkey AS BIGINT) AS nation_key,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(FLOOR(c.c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS totacctbal_cents
    FROM customer c CROSS JOIN thresh t
    WHERE c.c_acctbal > t.avg_bal
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderpriority LIKE '1%'
      )
    GROUP BY c.c_nationkey
    ORDER BY nation_key
    """,
    tags=("tpch", "subquery", "anti", "rollup"),
)
def q202_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22's shape on the available columns: customers holding an
    above-average positive balance who never placed an URGENT-priority
    order, rolled up per nation — a GLOBAL scalar aggregate subquery
    feeding the filter, a NOT EXISTS anti join against the FILTERED fact
    table, and a dimension rollup (the fixture has no phone column, so
    the country code is the nation key, and balances total in exact
    integer cents; plain never-ordered is degenerate on this fixture —
    every customer has orders — so the anti side filters on priority).

    Spark-side the scalar threshold is a broadcast 1-row cross join (no
    collect — the threshold stays in the plan), the NOT EXISTS is one
    LEFT ANTI shuffle keyed on custkey, and the rollup partial-aggregates
    per nation. The float comparison against AVG is identical IEEE
    arithmetic on both engines (same sum order irrelevance does NOT hold
    for doubles — so the average rides the oracle comparison only
    through the FILTER it feeds, never as an output column).
    """
    c = table(spark, sf_dir, "customer")
    thresh = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").like("1%"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        c.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, "c_custkey", "left_anti")
        .groupBy(F.col("c_nationkey").cast("bigint").alias("nation_key"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            F.sum(F.expr("CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)"))
            .cast("bigint")
            .alias("totacctbal_cents"),
        )
        .orderBy("nation_key")
    )


@register(
    "q205_small_quantity_revenue",
    sql="""
    WITH li AS (
      SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
             CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_cents
      FROM lineitem
    ), thresh AS (
      SELECT l_partkey, SUM(qty) AS sum_qty, COUNT(*) AS cnt
      FROM li GROUP BY l_partkey
    )
    SELECT p.p_brand AS brand,
           CAST(COUNT(*) AS BIGINT) AS n_small,
           CAST(SUM(li.price_cents) AS BIGINT) AS revenue_cents
    FROM li
      JOIN thresh t ON li.l_partkey = t.l_partkey
      JOIN part p ON p.p_partkey = li.l_partkey
    WHERE 5 * li.qty * t.cnt < t.sum_qty
    GROUP BY p.p_brand
    ORDER BY brand
    """,
    tags=("tpch", "subquery", "correlated-scalar", "join"),
)
def q205_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17's shape on the available columns: revenue sitting in
    "small" line items — those whose quantity is below 20 % of the
    per-part average — rolled up per brand. The correlated scalar
    subquery (AVG over the same fact table keyed by the outer row's
    part) is the avg-threshold form; q43 covers the per-key MIN form.
    The 0.2·AVG comparison is exact integers: qty < 0.2·(sum/cnt) ⇔
    5·qty·cnt < sum (quantities are integral; 5·50·cnt stays far inside
    BIGINT at any scale), and revenue totals in cents via the
    repo-standard FLOOR(x·100 + 0.5).

    Scale shape: the per-part threshold is ONE partial-aggregated
    shuffle of the fact table on its natural key; the threshold join is
    fact-to-aggregate on that same key (co-located — AQE reuses the
    partitioning, no second full exchange of the fact side); the part
    dim broadcasts; the final brand rollup is a 25-row aggregate. No
    row-at-a-time correlation — the subquery decorrelates into the
    keyed join, which is exactly how Catalyst plans TPC-H Q17.
    """
    li = table(spark, sf_dir, "lineitem").selectExpr(
        "l_partkey",
        "CAST(l_quantity AS BIGINT) AS qty",
        "CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_cents",
    )
    thresh = li.groupBy("l_partkey").agg(
        F.sum("qty").alias("sum_qty"), F.count(F.lit(1)).alias("cnt")
    )
    p = table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    return (
        li.join(thresh, "l_partkey")
        .filter(F.lit(5) * F.col("qty") * F.col("cnt") < F.col("sum_qty"))
        .join(F.broadcast(p), "l_partkey")
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_small"),
            F.sum("price_cents").cast("bigint").alias("revenue_cents"),
        )
        .orderBy("brand")
    )


@register(
    "q206_large_volume_customers",
    sql="""
    WITH big AS (
      SELECT l_orderkey, SUM(CAST(l_quantity AS BIGINT)) AS total_qty
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS BIGINT)) > 300
    )
    SELECT c.c_custkey AS custkey, c.c_name AS cust_name,
           o.o_orderkey AS orderkey,
           CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS totalprice_cents,
           CAST(b.total_qty AS BIGINT) AS total_qty
    FROM big b
      JOIN orders o ON o.o_orderkey = b.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY total_qty DESC, orderkey
    LIMIT 100
    """,
    tags=("tpch", "having", "join", "topk"),
)
def q206_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers behind orders totalling more than 300 units —
    a HAVING threshold on the grouped fact table feeding a join back to
    the order and customer dimensions, top-100 by quantity.

    Scale shape: ONE partial-aggregated shuffle of lineitem on its
    natural key; the HAVING filter leaves a rare-event row set that
    BROADCASTS to the orders join (no second fact-sized exchange — the
    big-order set is small by the threshold's construction at any
    scale), customer joins broadcast off that, and the top-100 plans as
    TakeOrderedAndProject. Quantities sum as BIGINT (integral by
    fixture), money in repo-standard cents.
    """
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("cust_name"),
            F.col("o_orderkey").alias("orderkey"),
            F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").alias(
                "totalprice_cents"
            ),
            F.col("total_qty").cast("bigint").alias("total_qty"),
        )
        .orderBy(F.desc("total_qty"), F.asc("orderkey"))
        .limit(100)
    )


_Q207_BRANCHES = (
    ("Brand#12", 1, 5, 1, 11),
    ("Brand#23", 1, 10, 10, 20),
    ("Brand#5", 1, 15, 20, 30),
)
_Q207_CASE_SQL = "CASE " + " ".join(
    f"WHEN p_brand = '{b}' AND p_size BETWEEN {s0} AND {s1}"
    f" AND qty BETWEEN {q0} AND {q1} THEN '{b}'"
    for b, s0, s1, q0, q1 in _Q207_BRANCHES
) + " END"


@register(
    "q207_brand_promo_revenue",
    sql=f"""
    WITH joined AS (
      SELECT p.p_brand, p.p_size,
             CAST(l.l_quantity AS BIGINT) AS qty,
             CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                  AS BIGINT) AS rev_cents
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ), labeled AS (
      SELECT {_Q207_CASE_SQL} AS branch, rev_cents FROM joined
    )
    SELECT branch,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(rev_cents) AS BIGINT) AS revenue_cents
    FROM labeled
    WHERE branch IS NOT NULL
    GROUP BY branch
    ORDER BY branch
    """,
    tags=("tpch", "disjunction", "join", "agg"),
)
def q207_brand_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19's shape on the available columns: revenue from three
    brand-specific promotion windows, each an AND-conjunction of brand,
    part-size range, and quantity range, OR-ed together — the classic
    disjunctive multi-table predicate, reported per branch instead of
    one opaque total so each conjunct is independently checkable.

    Scale shape: part dim broadcasts; the disjunction evaluates
    map-side (whole-stage codegen CASE) with the quantity bounds
    pushable to the lineitem scan (qty 1..30 covers all branches) and
    the brand/size bounds prunable on the part side; the final
    aggregate is three rows. Revenue uses the discounted price in
    cents: the double product l_extendedprice·(1−l_discount) is
    IDENTICAL IEEE arithmetic on both engines, floored to cents with
    the repo-standard idiom AFTER the product — no decimal divergence
    (same pattern as q110's fix).
    """
    li = table(spark, sf_dir, "lineitem").selectExpr(
        "l_partkey",
        "CAST(l_quantity AS BIGINT) AS qty",
        "CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)"
        " AS BIGINT) AS rev_cents",
    )
    p = table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand", "p_size"
    )
    return (
        li.join(F.broadcast(p), "l_partkey")
        .withColumn("branch", F.expr(_Q207_CASE_SQL))
        .filter(F.col("branch").isNotNull())
        .groupBy("branch")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum("rev_cents").cast("bigint").alias("revenue_cents"),
        )
        .orderBy("branch")
    )


@register(
    "q208_order_count_distribution",
    sql="""
    WITH per_cust AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                           AND o.o_orderpriority NOT LIKE '4%'
      GROUP BY c.c_custkey
    )
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(COUNT(*) AS BIGINT) AS custdist
    FROM per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("tpch", "outer-join", "distribution", "agg"),
)
def q208_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: the customer order-count distribution — how many
    customers placed 0, 1, 2, … qualifying orders (the join predicate
    excludes one priority class, so the LEFT JOIN's preserved zeros are
    meaningful: customers whose every order was excluded count at 0,
    exactly the rows an inner join would silently drop).

    Scale shape: the filter sits INSIDE the join condition (evaluated on
    the orders side before preservation semantics apply); one shuffle of
    the filtered fact on custkey meets the customer side; COUNT(col)
    counts only matched rows (null-skipping — the outer-join zero
    behavior the shape exists to test); the count-of-counts re-aggregate
    is distribution-sized (tens of rows), a second tiny exchange.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (~F.col("o_orderpriority").like("4%")),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
        .select(F.col("c_count").cast("bigint").alias("c_count"), "custdist")
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# q234 — TPC-H Q2 shape: cheapest supplier per part within a region
# ---------------------------------------------------------------------------
# The last classic correlated-subquery shape missing from the deep set:
# Q2's "supplier achieving the MINIMUM cost for this part, restricted to
# one region" — a correlated scalar MIN that decorrelates into a keyed
# aggregate plus an equality join-back (the argmin idiom), stacked on a
# region-filtered dimension chain. The fixture has no partsupp table, so
# the per-(part, supplier) unit price derives from lineitem: integral
# milli-cents per unit via BIGINT DIV — exact, portable.


@register(
    "q234_cheapest_regional_supplier",
    sql="""
    WITH eu_supp AS (
      SELECT s_suppkey
      FROM supplier s
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    ), ps AS (
      SELECT l_partkey, l_suppkey,
             CAST((1000 * SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount)
                                          * 100 + 0.5) AS BIGINT)))
                  // SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS unit_milli
      FROM lineitem
        SEMI JOIN eu_supp e ON e.s_suppkey = l_suppkey
      GROUP BY l_partkey, l_suppkey
    ), best AS (
      SELECT l_partkey, MIN(unit_milli) AS unit_price_milli
      FROM ps GROUP BY l_partkey
    ), arg AS (
      SELECT p.l_partkey,
             MIN(p.l_suppkey) AS best_suppkey,
             CAST(COUNT(*) AS BIGINT) AS n_tied
      FROM ps p JOIN best b
        ON b.l_partkey = p.l_partkey AND p.unit_milli = b.unit_price_milli
      GROUP BY p.l_partkey
    )
    SELECT a.l_partkey AS partkey, pt.p_brand AS brand,
           a.best_suppkey, b.unit_price_milli, a.n_tied
    FROM arg a
      JOIN best b ON b.l_partkey = a.l_partkey
      JOIN part pt ON pt.p_partkey = a.l_partkey
    ORDER BY b.unit_price_milli, a.l_partkey
    LIMIT 100
    """,
    tags=("tpch", "join", "correlated", "argmin"),
)
def q234_cheapest_regional_supplier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q2's shape on the available columns: for every part, the
    EUROPE-region supplier with the minimum exact unit price
    (milli-cents per unit, BIGINT DIV), ties resolved to the lowest
    suppkey with the tie count reported; cheapest 100 parts returned.

    Scale shape: the region chain folds to a broadcast suppkey set
    (semi-join prunes the fact scan before any aggregate); the per-
    (part, supplier) rollup is ONE partial-aggregated shuffle of
    lineitem on its natural key; the correlated MIN decorrelates into a
    per-part re-aggregate co-located on the same key, and the argmin is
    the equality join-back — Catalyst's standard Q2 plan. Final order is
    a 100-row TakeOrderedAndProject."""
    li = table(spark, sf_dir, "lineitem").selectExpr(
        "l_partkey",
        "l_suppkey",
        "CAST(l_quantity AS BIGINT) AS qty",
        "CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)"
        " AS BIGINT) AS disc_cents",
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    ps = (
        li.join(F.broadcast(eu), "l_suppkey", "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum("disc_cents").alias("sum_cents"),
            F.sum("qty").alias("sum_qty"),
        )
        .withColumn(
            "unit_milli", F.expr("(1000 * sum_cents) DIV sum_qty")
        )
    )
    best = ps.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.min("unit_milli").alias("unit_price_milli")
    )
    arg = (
        ps.join(
            best,
            (ps.l_partkey == best.pk)
            & (ps.unit_milli == best.unit_price_milli),
        )
        .groupBy("pk", "unit_price_milli")
        .agg(
            F.min("l_suppkey").alias("best_suppkey"),
            F.count(F.lit(1)).cast("bigint").alias("n_tied"),
        )
    )
    p = table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("pk"), "p_brand"
    )
    return (
        arg.join(F.broadcast(p), "pk")
        .select(
            F.col("pk").alias("partkey"),
            F.col("p_brand").alias("brand"),
            "best_suppkey",
            "unit_price_milli",
            "n_tied",
        )
        .orderBy("unit_price_milli", "partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q235 — TPC-H Q15 shape: top-revenue supplier via derived view + global max
# ---------------------------------------------------------------------------


@register(
    "q235_top_revenue_supplier",
    sql="""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100
                                 + 0.5) AS BIGINT)) AS BIGINT)
               AS revenue_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    ), mx AS (
      SELECT MAX(revenue_cents) AS max_rev FROM rev
    )
    SELECT r.l_suppkey AS suppkey, s.s_name AS supplier_name,
           r.revenue_cents
    FROM rev r
      JOIN mx ON r.revenue_cents = mx.max_rev
      JOIN supplier s ON s.s_suppkey = r.l_suppkey
    ORDER BY suppkey
    """,
    tags=("tpch", "aggregation", "scalar-subquery"),
)
def q235_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) with the maximum quarterly revenue —
    the derived-rollup + global-scalar-MAX shape, all ties returned
    (Q15's spec point: the filter is equality against the max, not a
    LIMIT 1 that would drop co-leaders). Revenue in exact cents.

    Scale shape: one pushed date filter into the fact scan, one
    partial-aggregated shuffle to |suppliers| rows, a 1-row MAX
    broadcast-cross-joined back (no second fact scan), and a broadcast
    dim join for the name."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
    ).selectExpr(
        "l_suppkey",
        "CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)"
        " AS BIGINT) AS disc_cents",
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum("disc_cents").alias("revenue_cents")
    )
    mx = rev.agg(F.max("revenue_cents").alias("max_rev"))
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("revenue_cents") == F.col("max_rev"))
        .join(F.broadcast(s), "l_suppkey")
        .select(
            F.col("l_suppkey").alias("suppkey"),
            F.col("s_name").alias("supplier_name"),
            "revenue_cents",
        )
        .orderBy("suppkey")
    )


# ---------------------------------------------------------------------------
# q238 — market-basket pair lift over order baskets
# ---------------------------------------------------------------------------
# q186's collocation miner on the RETAIL side: which parts are bought
# together beyond chance. lift_ppm = 1e6·n_ab·n_orders / (n_a·n_b) over
# part pairs inside an order basket — the classic association-rule
# screen, exact integers end to end (the log of PMI is dropped as
# monotone; DECIMAL/HUGEINT products per the overflow idiom).

_Q238_MIN_SUPPORT = 3   # orders containing the pair
_Q238_MIN_PART = 5      # orders containing each part alone
_Q238_TOP = 20


@register(
    "q238_basket_pair_lift",
    sql=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), pf AS (
      SELECT l_partkey, COUNT(*) AS n_p FROM items GROUP BY l_partkey
      HAVING COUNT(*) >= {_Q238_MIN_PART}
    ), iq AS (
      SELECT l_orderkey, l_partkey FROM items
      SEMI JOIN pf USING (l_partkey)
    ), total AS (
      SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM lineitem
    ), pc AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             COUNT(*) AS n_ab
      FROM iq a JOIN iq b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
      HAVING COUNT(*) >= {_Q238_MIN_SUPPORT}
    )
    SELECT part_a, part_b,
           CAST(n_ab AS BIGINT) AS n_ab,
           CAST(fa.n_p AS BIGINT) AS n_a,
           CAST(fb.n_p AS BIGINT) AS n_b,
           CAST(CAST(n_ab AS HUGEINT) * n_orders * 1000000
                // (CAST(fa.n_p AS HUGEINT) * fb.n_p) AS BIGINT) AS lift_ppm
    FROM pc
      JOIN pf fa ON fa.l_partkey = pc.part_a
      JOIN pf fb ON fb.l_partkey = pc.part_b
      CROSS JOIN total
    ORDER BY lift_ppm DESC, part_a, part_b
    LIMIT {_Q238_TOP}
    """,
    tags=("tpch", "basket", "association", "mining", "exact-integer"),
)
def q238_basket_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top part pairs bought together beyond chance (module comment).

    Scale shape: the basket distinct is one (order, part)-keyed partial
    agg; part frequencies are item-keyed and broadcast back as the
    qualification filter, so the within-order pair join fans out only
    over qualifying items (per-order O(k²), k = basket size — bounded by
    order shape, not corpus); pair counts combine map-side; the lift
    arithmetic runs on the aggregated pair table with DECIMAL(38,0)
    products (n_ab·n_orders·1e6 wraps BIGINT near 1e12 orders). Top-k is
    TakeOrderedAndProject."""
    li = table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    pf = (
        items.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_p"))
        .filter(F.col("n_p") >= _Q238_MIN_PART)
    )
    iq = items.join(F.broadcast(pf.select("l_partkey")), "l_partkey")
    total = li.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    pc = (
        iq.select("l_orderkey", F.col("l_partkey").alias("part_a"))
        .join(
            iq.select("l_orderkey", F.col("l_partkey").alias("part_b")),
            "l_orderkey",
        )
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= _Q238_MIN_SUPPORT)
    )
    return (
        pc.join(
            F.broadcast(
                pf.select(F.col("l_partkey").alias("part_a"), F.col("n_p").alias("_na"))
            ),
            "part_a",
        )
        .join(
            F.broadcast(
                pf.select(F.col("l_partkey").alias("part_b"), F.col("n_p").alias("_nb"))
            ),
            "part_b",
        )
        .crossJoin(F.broadcast(total))
        .select(
            "part_a",
            "part_b",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.col("_na").cast("bigint").alias("n_a"),
            F.col("_nb").cast("bigint").alias("n_b"),
            F.expr(
                "CAST(CAST(n_ab AS DECIMAL(38,0)) * n_orders * 1000000"
                " DIV (CAST(_na AS DECIMAL(38,0)) * _nb) AS BIGINT)"
            ).alias("lift_ppm"),
        )
        .orderBy(F.desc("lift_ppm"), "part_a", "part_b")
        .limit(_Q238_TOP)
    )


# ---------------------------------------------------------------------------
# Synthetic partsupp + the three partsupp-shaped TPC-H analogs (Q9/Q11/Q20)
# ---------------------------------------------------------------------------
# The fixture set ships no partsupp table; the three remaining TPC-H
# shapes that need one (Q9 profit, Q11 important stock, Q20 excess
# inventory) were fixture-blocked through r07-r09. The r09 Python-data-
# source precedent (q237: DuckDB regenerates identical rows, so a
# synthesized input sits UNDER the oracle) unblocks them: partsupp is
# DERIVED deterministically from lineitem — its key set is the distinct
# (l_partkey, l_suppkey) pairs (guaranteeing the Q9 triple-key join
# matches, exactly as dbgen draws lineitem pairs from partsupp), and its
# attributes are pure functions of the key through the portable MD5
# hash, so Spark and DuckDB materialize the identical table from the
# same fixture with no new file.
#
#   ps_availqty          = h32('av', "pk|sk") % 9999 + 1      (1..9999)
#   ps_supplycost_cents  = h32('sc', "pk|sk") % 99900 + 100   ($1..$999.99)

from ..functions.hashing import duckdb_hash32, spark_hash32  # noqa: E402

_PS_KEY_SPARK = (
    "CONCAT(CAST(l_partkey AS STRING), '|', CAST(l_suppkey AS STRING))"
)
_PS_KEY_DUCK = (
    "CONCAT(CAST(l_partkey AS VARCHAR), '|', CAST(l_suppkey AS VARCHAR))"
)

_PARTSUPP_SQL = f"""
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             {duckdb_hash32(_PS_KEY_DUCK, "av")} % 9999 + 1 AS ps_availqty,
             {duckdb_hash32(_PS_KEY_DUCK, "sc")} % 99900 + 100
               AS ps_supplycost_cents
      FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
"""


def synthetic_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived partsupp table (module comment above): one row per
    distinct (l_partkey, l_suppkey) pair in lineitem, attributes hashed
    from the key — identical rows in Spark and DuckDB by construction.

    Scale shape: one distinct over a slim two-column projection of
    lineitem (map-side partial dedup), then per-row hash arithmetic —
    no joins, no driver state; |partsupp| ≪ |lineitem|."""
    li = (
        table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    return li.selectExpr(
        "l_partkey AS ps_partkey",
        "l_suppkey AS ps_suppkey",
        f"{spark_hash32(_PS_KEY_SPARK, 'av')} % 9999 + 1 AS ps_availqty",
        f"{spark_hash32(_PS_KEY_SPARK, 'sc')} % 99900 + 100"
        " AS ps_supplycost_cents",
    )


@register(
    "q241_product_type_profit",
    sql=f"""
    WITH partsupp AS ({_PARTSUPP_SQL})
    SELECT n_name AS nation,
           CAST(YEAR(o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100
                               + 0.5) AS BIGINT)
                    - ps_supplycost_cents * CAST(l_quantity AS BIGINT))
                AS BIGINT) AS sum_profit_cents,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
      JOIN part     ON p_partkey  = l_partkey
      JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
      JOIN supplier ON s_suppkey  = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, YEAR(o_orderdate)
    ORDER BY nation, o_year DESC
    """,
    tags=("tpch", "join", "partsupp", "agg"),
)
def q241_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: profit on a product line ('red' parts) by supplier
    nation and order year — the six-way join through the synthesized
    partsupp, profit = discounted revenue minus supply cost, exact cents.

    Scale shape: the part-name filter folds to a broadcast key set that
    prunes lineitem FIRST; partsupp derives from the same slim lineitem
    projection and joins on the fact's natural (partkey, suppkey) key;
    orders joins on orderkey (the one unavoidable big exchange);
    supplier/nation broadcast. Catalyst's standard Q9 plan."""
    li = table(spark, sf_dir, "lineitem").selectExpr(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "CAST(l_quantity AS BIGINT) AS qty",
        "CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)"
        " AS BIGINT) AS disc_cents",
    )
    red = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select(F.col("p_partkey").alias("l_partkey"))
    )
    ps = synthetic_partsupp(spark, sf_dir).select(
        F.col("ps_partkey").alias("l_partkey"),
        F.col("ps_suppkey").alias("l_suppkey"),
        "ps_supplycost_cents",
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(F.broadcast(red), "l_partkey", "left_semi")
        .join(ps, ["l_partkey", "l_suppkey"])
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            (
                F.col("disc_cents")
                - F.col("ps_supplycost_cents") * F.col("qty")
            ).alias("amount_cents"),
        )
        .groupBy("nation", "o_year")
        .agg(
            F.sum("amount_cents").cast("bigint").alias("sum_profit_cents"),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
        )
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "q242_important_stock",
    sql=f"""
    WITH partsupp AS ({_PARTSUPP_SQL}),
    natps AS (
      SELECT ps_partkey,
             ps_supplycost_cents * ps_availqty AS value_cents
      FROM partsupp
        JOIN supplier ON s_suppkey = ps_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
      WHERE n_name = 'NATION_3'
    ),
    tot AS (
      SELECT SUM(value_cents) AS total_cents,
             COUNT(DISTINCT ps_partkey) AS n_parts
      FROM natps
    )
    SELECT ps_partkey AS partkey,
           CAST(SUM(value_cents) AS BIGINT) AS value_cents
    FROM natps
    GROUP BY ps_partkey
    HAVING SUM(value_cents) * (SELECT n_parts FROM tot)
           > 2 * (SELECT total_cents FROM tot)
    ORDER BY value_cents DESC, partkey
    """,
    tags=("tpch", "partsupp", "having", "scalar-subquery"),
)
def q242_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: parts whose stock value held by one nation's suppliers
    exceeds TWICE the average part's value there — the global-scalar
    HAVING shape, exact integer cents (value = supplycost × availqty).
    Q11's published threshold (fraction/SF) is scale-dependent by
    design; the 2×-average form keeps the identical plan shape while
    returning a non-degenerate row set at every scale (integer-exact:
    value × n_parts > 2 × total).

    Scale shape: nation chain folds to a broadcast supplier set pruning
    partsupp map-side; one groupBy(partkey) shuffle; the global total is
    a 1-row broadcast joined back (the sanctioned scalar pattern) — no
    second pass over partsupp."""
    ps = synthetic_partsupp(spark, sf_dir)
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = (
        table(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_3")
        .select("n_nationkey")
    )
    nat_supp = s.join(F.broadcast(n), s.s_nationkey == F.col("n_nationkey")).select(
        F.col("s_suppkey").alias("ps_suppkey")
    )
    natps = ps.join(F.broadcast(nat_supp), "ps_suppkey", "left_semi").select(
        "ps_partkey",
        (F.col("ps_supplycost_cents") * F.col("ps_availqty")).alias(
            "value_cents"
        ),
    )
    per_part = natps.groupBy("ps_partkey").agg(
        F.sum("value_cents").alias("value_cents")
    )
    total = natps.agg(
        F.sum("value_cents").alias("total_cents"),
        F.countDistinct("ps_partkey").alias("n_parts"),
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("value_cents") * F.col("n_parts")
            > 2 * F.col("total_cents")
        )
        .select(
            F.col("ps_partkey").alias("partkey"),
            F.col("value_cents").cast("bigint").alias("value_cents"),
        )
        .orderBy(F.desc("value_cents"), "partkey")
    )


@register(
    "q243_excess_inventory_suppliers",
    sql=f"""
    WITH partsupp AS ({_PARTSUPP_SQL}),
    blue AS (SELECT p_partkey FROM part WHERE p_name LIKE 'blue%'),
    shipped AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(l_quantity AS BIGINT)) AS shipped_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey
    ),
    excess AS (
      SELECT ps_suppkey,
             CAST(COUNT(*) AS BIGINT) AS n_excess_parts
      FROM partsupp
        SEMI JOIN blue b ON b.p_partkey = ps_partkey
        JOIN shipped sh ON sh.l_partkey = ps_partkey
                       AND sh.l_suppkey = ps_suppkey
      WHERE ps_availqty * 2 > sh.shipped_qty
      GROUP BY ps_suppkey
    )
    SELECT s_suppkey AS suppkey, s_name, n_name AS nation, n_excess_parts
    FROM excess
      JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
    ORDER BY s_name
    """,
    tags=("tpch", "partsupp", "correlated", "semi-join"),
)
def q243_excess_inventory_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q20: suppliers holding EXCESS stock of 'blue' parts —
    availqty exceeding half of what they actually shipped in 1998
    (integer form: availqty × 2 > shipped). Q20's correlated scalar
    subquery decorrelated into a keyed aggregate + equality join, the
    nested-IN chain as semi-joins.

    Scale shape: the part-name filter broadcasts and prunes partsupp
    BEFORE the shipped-quantity join; shipped is one partial-aggregated
    shuffle of the date-pruned lineitem on its natural key (the filter
    pushes to the parquet scan); supplier/nation broadcast at the end —
    per-key state only, no correlated re-execution."""
    ps = synthetic_partsupp(spark, sf_dir)
    blue = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("blue%"))
        .select(F.col("p_partkey").alias("ps_partkey"))
    )
    shipped = (
        table(spark, sf_dir, "lineitem")
        .filter(
            (
                F.col("l_shipdate")
                >= F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
            )
            & (
                F.col("l_shipdate")
                < F.lit("1999-01-01 00:00:00").cast("timestamp_ntz")
            )
        )
        .groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("shipped_qty"))
    )
    excess = (
        ps.join(F.broadcast(blue), "ps_partkey", "left_semi")
        .join(shipped, ["ps_partkey", "ps_suppkey"])
        .filter(F.col("ps_availqty") * 2 > F.col("shipped_qty"))
        .groupBy("ps_suppkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_excess_parts"))
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey"), "s_name", "s_nationkey"
    )
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        excess.join(
            F.broadcast(s), excess.ps_suppkey == s.s_suppkey
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("s_suppkey").alias("suppkey"),
            "s_name",
            F.col("n_name").alias("nation"),
            "n_excess_parts",
        )
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# q247 — TPC-H Q16: supplier count by part attributes, complainers excluded
# ---------------------------------------------------------------------------
# The last partsupp-dependent TPC-H shape: COUNT(DISTINCT ps_suppkey) per
# part attribute group, with suppliers on a complaint list removed by the
# NOT IN anti-join. The fixture supplier table has no comment column, so
# the complaint flag derives from the portable hash of the supplier key
# (~1/8 of suppliers), deterministic on both engines — same device as the
# partsupp attributes.

_Q16_BRANDS = ("Brand#1", "Brand#2")  # Q16's p_brand <> exclusion, x2


@register(
    "q247_supplier_count_by_part",
    sql=f"""
    WITH partsupp AS ({_PARTSUPP_SQL}),
    complainers AS (
      SELECT s_suppkey FROM supplier
      WHERE {duckdb_hash32("CAST(s_suppkey AS VARCHAR)", "complaint")} % 8 = 0
    )
    SELECT p_brand, p_type,
           CAST(p_size // 10 AS INT) AS size_bucket,
           CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM partsupp
      JOIN part ON p_partkey = ps_partkey
    WHERE p_brand NOT IN ('{_Q16_BRANDS[0]}', '{_Q16_BRANDS[1]}')
      AND ps_suppkey NOT IN (SELECT s_suppkey FROM complainers)
    GROUP BY p_brand, p_type, size_bucket
    ORDER BY supplier_cnt DESC, p_brand, p_type, size_bucket
    """,
    tags=("tpch", "partsupp", "distinct", "anti-join"),
)
def q247_supplier_count_by_part(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q16: how many distinct suppliers can deliver each part
    profile (brand × type × size bucket), excluding two brands and every
    supplier on the hash-derived complaint list.

    Scale shape: the complaint list folds to a broadcast anti-join that
    prunes partsupp before the part join; part broadcasts onto
    partsupp's natural key; one distinct-aggregate shuffle on the
    (brand, type, bucket) group key — Catalyst's standard Q16 plan with
    partial aggregation on the distinct."""
    ps = synthetic_partsupp(spark, sf_dir).select(
        "ps_partkey", "ps_suppkey"
    )
    complainers = (
        table(spark, sf_dir, "supplier")
        .filter(
            F.expr(
                f"{spark_hash32('CAST(s_suppkey AS STRING)', 'complaint')} % 8 = 0"
            )
        )
        .select(F.col("s_suppkey").alias("ps_suppkey"))
    )
    p = table(spark, sf_dir, "part").filter(
        ~F.col("p_brand").isin(*_Q16_BRANDS)
    ).select(
        F.col("p_partkey").alias("ps_partkey"),
        "p_brand",
        "p_type",
        F.expr("CAST(p_size DIV 10 AS INT)").alias("size_bucket"),
    )
    return (
        ps.join(F.broadcast(complainers), "ps_suppkey", "left_anti")
        .join(F.broadcast(p), "ps_partkey")
        .groupBy("p_brand", "p_type", "size_bucket")
        .agg(
            F.countDistinct("ps_suppkey")
            .cast("bigint")
            .alias("supplier_cnt")
        )
        .orderBy(
            F.desc("supplier_cnt"), "p_brand", "p_type", "size_bucket"
        )
    )


# ---------------------------------------------------------------------------
# q250 — TPC-H Q12: shipping-lag bands with priority-conditional counts
# ---------------------------------------------------------------------------
# Q12 counts urgent vs non-urgent orders per ship mode among late lines.
# The fixture lineitem has no l_shipmode/l_receiptdate, so the grouping key
# is the shipping LAG band (days between order date and ship date) — the
# same join + CASE-conditional-count shape over existing columns.

_Q12_URGENT = "o_orderpriority IN ('1-URGENT', '2-HIGH')"


@register(
    "q250_ship_lag_priority",
    sql=f"""
    SELECT lag_band,
           CAST(SUM(CASE WHEN {_Q12_URGENT} THEN 1 ELSE 0 END) AS BIGINT)
             AS high_line_count,
           CAST(SUM(CASE WHEN {_Q12_URGENT} THEN 0 ELSE 1 END) AS BIGINT)
             AS low_line_count
    FROM (
      SELECT o_orderpriority,
             CASE WHEN datediff('day', o_orderdate, l_shipdate) < 0
                    THEN 'pre-order'
                  WHEN datediff('day', o_orderdate, l_shipdate) <= 30
                    THEN '00-30'
                  WHEN datediff('day', o_orderdate, l_shipdate) <= 90
                    THEN '31-90'
                  ELSE '90+' END AS lag_band
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey)
    GROUP BY lag_band
    ORDER BY lag_band
    """,
    tags=("tpch", "join", "agg", "conditional"),
)
def q250_ship_lag_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped: per shipping-lag band, how many lines belong to
    high-priority orders vs the rest — both counts from ONE conditional
    aggregation pass (no per-priority re-scan).

    Scale shape: the only exchange is orders⋈lineitem on orderkey (the
    fact-fact join every Q12 run pays), then a 4-group-row aggregate with
    map-side partials; the CASE band derives from already-joined columns
    so no second shuffle. Reference analog: dwp/dataworks-audit-data-ingest
    has no relational surface (313-line ingest script); this extends the
    TPC-H family q71/q72/q241-q247."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    band = (
        F.when(lag < 0, "pre-order")
        .when(lag <= 30, "00-30")
        .when(lag <= 90, "31-90")
        .otherwise("90+")
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(band.alias("lag_band"), urgent.alias("is_urgent"))
        .groupBy("lag_band")
        .agg(
            F.sum(F.when(F.col("is_urgent"), 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(F.col("is_urgent"), 0).otherwise(1))
            .cast("bigint")
            .alias("low_line_count"),
        )
        .orderBy("lag_band")
    )


# ---------------------------------------------------------------------------
# q251 — TPC-H Q19: disjunctive bracket predicates over a join
# ---------------------------------------------------------------------------
# Q19's signature is the OR-of-ANDs predicate referencing BOTH join sides
# (brand/size from part, quantity from lineitem) — the classic case where
# the filter cannot be pushed below the join and must run on joined rows.
# Brackets are brand-disjoint, so each line matches at most one and the
# per-bracket breakdown is a plain GROUP BY.

_Q19_BRACKETS = (
    ("Brand#1", 1, 15, 1, 20),
    ("Brand#2", 1, 25, 5, 30),
    ("Brand#3", 1, 35, 10, 40),
)


def _q19_cond_sql(b) -> str:
    brand, s_lo, s_hi, q_lo, q_hi = b
    return (
        f"(p_brand = '{brand}' AND p_size BETWEEN {s_lo} AND {s_hi} "
        f"AND l_quantity BETWEEN {q_lo} AND {q_hi})"
    )


@register(
    "q251_bracket_revenue",
    sql=f"""
    SELECT p_brand,
           {_VOLUME} AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE {' OR '.join(_q19_cond_sql(b) for b in _Q19_BRACKETS)}
    GROUP BY p_brand
    ORDER BY p_brand
    """,
    tags=("tpch", "join", "disjunctive-predicate"),
)
def q251_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped: discounted revenue from lines matching any of
    three (brand, size-range, quantity-range) brackets — a disjunction
    that references both join sides, broken down per brand (brackets are
    brand-disjoint so the rows partition cleanly).

    Scale shape: part is broadcast onto lineitem (dimension ≪ fact); the
    OR-of-ANDs runs as one post-join filter inside the same codegen stage;
    the brand-only residue (p_brand IN (...)) IS pushable and prunes the
    broadcast side before the join. One small-key aggregate after."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_brand").isin(*[b[0] for b in _Q19_BRACKETS]))
        .select("p_partkey", "p_brand", "p_size")
    )
    cond = None
    for brand, s_lo, s_hi, q_lo, q_hi in _Q19_BRACKETS:
        c = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(s_lo, s_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )
        cond = c if cond is None else (cond | c)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .groupBy("p_brand")
        .agg(
            F.expr(f"{_VOLUME} AS revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("p_brand")
    )
