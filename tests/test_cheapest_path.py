"""Drills for the weighted cheapest-path recursive CTE (q263): seed
cost is zero, multi-hop never beats physics (each reported cost is <=
the direct edge where one exists, and >= 0), and the statement is
partition-invariant."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dataworks_audit_data_ingest_spark.queries.graph_shaped import (
    _Q263_SEED,
    q263_cheapest_journey_path,
)
from dataworks_audit_data_ingest_spark.tables import table

SF = "/root/testdata/sf0.001"


def _direct_edges(spark):
    e = table(spark, SF, "events").select(
        "user_id", "event_type", "event_id", "ts"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = e.select(
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.lag("event_type").over(w).alias("prev_type"),
        F.lag(F.unix_micros(F.col("ts").cast("timestamp")))
        .over(w)
        .alias("prev_us"),
    ).filter(F.col("prev_type").isNotNull())
    return {
        (r.prev_type, r.next_type): r.w
        for r in o.groupBy(
            "prev_type", F.col("event_type").alias("next_type")
        )
        .agg(F.min(F.expr("us - prev_us")).alias("w"))
        .collect()
    }


def test_costs_bounded_by_direct_edges(spark):
    got = {
        r.event_type: r.min_cost_us
        for r in q263_cheapest_journey_path(spark, SF).collect()
    }
    assert got[_Q263_SEED] == 0
    assert all(v >= 0 for v in got.values())
    edges = _direct_edges(spark)
    for (src, dst), w in edges.items():
        if src == _Q263_SEED and dst in got:
            # a <=4-hop minimum can only improve on the direct edge
            assert got[dst] <= w, (dst, got[dst], w)


def test_q263_partition_invariant(spark):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        rows = {}
        for n in ("7", before):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            rows[n] = [
                tuple(r)
                for r in q263_cheapest_journey_path(spark, SF).collect()
            ]
        assert rows["7"] == rows[before]
        assert rows[before]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
