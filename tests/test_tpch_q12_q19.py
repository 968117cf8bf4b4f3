"""Drills for the TPC-H Q12/Q19 analog queries (q250/q251): partition
invariance, independent semantic recomputation, and the plan properties
that make each shape scale (single fact-fact exchange for Q12; broadcast
dimension + pushable brand residue for Q19's disjunction).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.queries.tpch_deep import (
    _Q19_BRACKETS,
    q250_ship_lag_priority,
    q251_bracket_revenue,
)
from dataworks_audit_data_ingest_spark.tables import table

SF = "/root/testdata/sf0.001"


def test_q250_q251_partition_invariant(spark):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        rows = {}
        for n in ("7", before):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            rows[n] = {
                "q250": [tuple(r) for r in q250_ship_lag_priority(spark, SF).collect()],
                "q251": [tuple(r) for r in q251_bracket_revenue(spark, SF).collect()],
            }
        assert rows["7"] == rows[before]
        assert all(rows[before][k] for k in rows[before])
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)


def test_q250_counts_recomputed_independently(spark):
    """Every band's (high, low) pair recomputed per-priority-value and
    re-summed; the two conditional counts must also total the join size."""
    out = {r.lag_band: (r.high_line_count, r.low_line_count)
           for r in q250_ship_lag_priority(spark, SF).collect()}
    assert out
    li = table(spark, SF, "lineitem").select("l_orderkey", "l_shipdate")
    o = table(spark, SF, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey).withColumn(
        "lag", F.datediff("l_shipdate", "o_orderdate")
    )
    per_prio = {
        (r.lag_band, r.o_orderpriority): r["count"]
        for r in j.withColumn(
            "lag_band",
            F.when(F.col("lag") < 0, "pre-order")
            .when(F.col("lag") <= 30, "00-30")
            .when(F.col("lag") <= 90, "31-90")
            .otherwise("90+"),
        )
        .groupBy("lag_band", "o_orderpriority")
        .count()
        .collect()
    }
    urgent = {"1-URGENT", "2-HIGH"}
    for band, (hi, lo) in out.items():
        want_hi = sum(c for (b, p), c in per_prio.items() if b == band and p in urgent)
        want_lo = sum(c for (b, p), c in per_prio.items() if b == band and p not in urgent)
        assert (hi, lo) == (want_hi, want_lo)
    assert sum(h + l for h, l in out.values()) == j.count()


def test_q251_brackets_brand_disjoint_and_rows_recomputed(spark):
    """Brackets are brand-disjoint (each line matches at most one), and
    each brand row equals a standalone single-bracket run."""
    brands = [b[0] for b in _Q19_BRACKETS]
    assert len(set(brands)) == len(brands)
    out = {r.p_brand: (r.revenue, r.n_items)
           for r in q251_bracket_revenue(spark, SF).collect()}
    assert out
    li = table(spark, SF, "lineitem")
    p = table(spark, SF, "part")
    for brand, s_lo, s_hi, q_lo, q_hi in _Q19_BRACKETS:
        n = (
            li.join(p, li.l_partkey == p.p_partkey)
            .filter(
                (F.col("p_brand") == brand)
                & F.col("p_size").between(s_lo, s_hi)
                & F.col("l_quantity").between(q_lo, q_hi)
            )
            .count()
        )
        if brand in out:
            assert out[brand][1] == n
        else:
            assert n == 0


def test_q251_plan_broadcasts_part_no_cartesian(spark):
    """The Q19 disjunction must NOT degrade the join: part broadcasts,
    the OR runs as a post-join filter, and the brand-only residue is
    pushed into the part scan (visible as PushedFilters In(p_brand...))."""
    plan = q251_bracket_revenue(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    optimized = (
        q251_bracket_revenue(spark, SF)._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "p_brand" in optimized  # brand residue survives as a part-side filter


def test_q250_single_shuffle_for_fact_fact_join(spark):
    """Q12's only exchanges are the orderkey co-partitioning of the two
    facts plus the 4-row band aggregate — no extra repartition sneaks in."""
    plan = q250_ship_lag_priority(spark, SF)._jdf.queryExecution().executedPlan().toString()
    import re

    n_exchanges = len(re.findall(r"Exchange (?:hash|range|SinglePartition)", plan))
    # 2 hash exchanges for the sort-merge join sides (or fewer if one side
    # broadcasts at this scale), 1 for the groupBy, 1 range for the orderBy
    assert n_exchanges <= 4
    assert "CartesianProduct" not in plan
