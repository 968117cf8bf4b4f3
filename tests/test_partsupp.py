"""Synthetic partsupp (`queries/tpch_deep.py::synthetic_partsupp`) and
the three partsupp-shaped TPC-H analogs (q241 Q9 / q242 Q11 / q243 Q20).
The oracle gate covers value equality; these drills pin the TABLE's
construction properties the oracle pin relies on."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.queries.tpch_deep import (
    synthetic_partsupp,
)
from dataworks_audit_data_ingest_spark.tables import table

SF = "/root/testdata/sf0.001"


def test_partsupp_keys_cover_lineitem_pairs_exactly(spark):
    """One row per distinct (l_partkey, l_suppkey) pair — the property
    that makes the Q9 triple-key join total (every lineitem row finds
    its partsupp row, as in dbgen)."""
    ps = synthetic_partsupp(spark, SF)
    pairs = (
        table(spark, SF, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    assert ps.count() == pairs.count()
    # no lineitem pair misses partsupp
    missing = pairs.join(
        ps,
        (pairs.l_partkey == ps.ps_partkey)
        & (pairs.l_suppkey == ps.ps_suppkey),
        "left_anti",
    )
    assert missing.count() == 0
    # keys are unique (it IS a key)
    assert (
        ps.groupBy("ps_partkey", "ps_suppkey").count().filter("count > 1").count()
        == 0
    )


def test_partsupp_attributes_deterministic_and_in_range(spark):
    ps1 = sorted(tuple(r) for r in synthetic_partsupp(spark, SF).collect())
    ps2 = sorted(
        tuple(r) for r in synthetic_partsupp(spark, SF).collect()
    )
    assert ps1 == ps2
    lo_q = min(r[2] for r in ps1)
    hi_q = max(r[2] for r in ps1)
    lo_c = min(r[3] for r in ps1)
    hi_c = max(r[3] for r in ps1)
    assert 1 <= lo_q and hi_q <= 9999
    assert 100 <= lo_c and hi_c <= 99999


def test_partsupp_queries_partition_invariant(spark):
    """q241/q242/q243 results are identical under a different shuffle
    width (group keys and order keys are unique, arithmetic integer)."""
    from dataworks_audit_data_ingest_spark.queries.tpch_deep import (
        q241_product_type_profit,
        q242_important_stock,
        q243_excess_inventory_suppliers,
        q247_supplier_count_by_part,
    )

    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        rows = {}
        for n in ("7", before):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            rows[n] = {
                "q241": [tuple(r) for r in q241_product_type_profit(spark, SF).collect()],
                "q242": [tuple(r) for r in q242_important_stock(spark, SF).collect()],
                "q243": [tuple(r) for r in q243_excess_inventory_suppliers(spark, SF).collect()],
                "q247": [tuple(r) for r in q247_supplier_count_by_part(spark, SF).collect()],
            }
        assert rows["7"] == rows[before]
        assert all(rows[before][k] for k in rows[before])
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)


def test_q243_excess_semantics_hand_check(spark):
    """Spot-verify Q20's decorrelated predicate on one supplier: every
    reported (supplier) has at least one blue part with availqty*2 >
    shipped 1998 quantity, recomputed independently row-by-row."""
    from dataworks_audit_data_ingest_spark.queries.tpch_deep import (
        q243_excess_inventory_suppliers,
    )

    out = {r.suppkey: r.n_excess_parts for r in
           q243_excess_inventory_suppliers(spark, SF).collect()}
    assert out
    ps = synthetic_partsupp(spark, SF)
    blue = table(spark, SF, "part").filter(
        F.col("p_name").like("blue%")
    ).select(F.col("p_partkey").alias("ps_partkey"))
    li = table(spark, SF, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1999-01-01 00:00:00").cast("timestamp_ntz"))
    )
    shipped = (
        li.groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        ).agg(F.sum(F.col("l_quantity").cast("bigint")).alias("sq"))
    )
    recomputed = (
        ps.join(blue, "ps_partkey", "left_semi")
        .join(shipped, ["ps_partkey", "ps_suppkey"])
        .filter(F.col("ps_availqty") * 2 > F.col("sq"))
        .groupBy("ps_suppkey").count()
    )
    want = {r.ps_suppkey: r["count"] for r in recomputed.collect()}
    assert out == want
