"""Bucketed tables (`sinks/bucketed.py`): the write-once-shuffle-never
layout. Pins the claims that matter at 100 TB: a co-bucketed join plans
with ZERO shuffle exchanges (and zero sorts when buckets are single-file
and sorted), misaligned specs are a loud error, results equal the plain
shuffled join, and bucket pruning reads a subset of files for key
equality filters."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.plans.inspect import physical_plan
from dataworks_audit_data_ingest_spark.sinks.bucketed import (
    aligned,
    bucket_join,
    bucket_spec,
    exchange_count,
    write_bucketed,
)
from dataworks_audit_data_ingest_spark.tables import table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    """orders + customer co-bucketed on the customer key, 4 buckets."""
    base = tmp_path_factory.mktemp("buckets")
    o = table(spark, SF, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    c = table(spark, SF, "customer").select("c_custkey", "c_name", "c_acctbal")
    for name in ("t_orders_b", "t_customer_b", "t_customer_b8", "t_orders_plain"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    write_bucketed(
        o.withColumnRenamed("o_custkey", "custkey"),
        "t_orders_b",
        ["custkey"],
        4,
        str(base / "orders_b"),
    )
    write_bucketed(
        c.withColumnRenamed("c_custkey", "custkey"),
        "t_customer_b",
        ["custkey"],
        4,
        str(base / "customer_b"),
    )
    write_bucketed(
        c.withColumnRenamed("c_custkey", "custkey"),
        "t_customer_b8",
        ["custkey"],
        8,
        str(base / "customer_b8"),
    )
    yield o, c
    for name in ("t_orders_b", "t_customer_b", "t_customer_b8", "t_orders_plain"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucket_spec_roundtrip(spark, bucketed_pair):
    assert bucket_spec(spark, "t_orders_b") == (("custkey",), 4)
    assert bucket_spec(spark, "t_customer_b8") == (("custkey",), 8)
    assert aligned(spark, "t_orders_b", "t_customer_b")
    assert not aligned(spark, "t_orders_b", "t_customer_b8")


def test_cobucketed_join_is_exchange_free(spark, bucketed_pair):
    """THE claim: equal specs ⇒ the join plans as SortMergeJoin with no
    shuffle Exchange on either side — the write-time shuffle is reused
    forever after. (Local per-bucket Sorts remain by default; they are
    in-task, not a shuffle.)"""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucket_join(spark, "t_orders_b", "t_customer_b", ["custkey"])
        j.collect()
        plan = physical_plan(j)
        assert exchange_count(j) == 0, plan
        assert "SortMergeJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_sorted_single_file_buckets_also_skip_the_sort(spark, bucketed_pair):
    """With one sorted file per bucket AND
    ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` (Spark 3+
    moved scan-order trust behind this flag), SortMergeJoin drops its
    Sort operators too — the join becomes a pure streamed merge of
    pre-sorted files."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try:
        j = bucket_join(spark, "t_orders_b", "t_customer_b", ["custkey"])
        j.collect()
        plan = physical_plan(j)
        assert exchange_count(j) == 0, plan
        assert "SortMergeJoin" in plan, plan
        assert not re.search(r"\bSort \[", plan), plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "false"
        )


def test_bucketed_join_matches_plain_join(spark, bucketed_pair):
    o, c = bucketed_pair
    got = sorted(
        (r.custkey, r.o_orderkey, r.c_name)
        for r in bucket_join(spark, "t_orders_b", "t_customer_b", ["custkey"])
        .select("custkey", "o_orderkey", "c_name")
        .collect()
    )
    want = sorted(
        (r.o_custkey, r.o_orderkey, r.c_name)
        for r in o.join(c, o.o_custkey == c.c_custkey)
        .select("o_custkey", "o_orderkey", "c_name")
        .collect()
    )
    assert got == want


def test_misaligned_specs_raise(spark, bucketed_pair):
    with pytest.raises(ValueError, match="different bucket specs"):
        bucket_join(spark, "t_orders_b", "t_customer_b8", ["custkey"])


def test_bucketed_groupby_is_exchange_free(spark, bucketed_pair):
    """Aggregation on the bucket key also reuses the stored hash layout:
    no exchange before the final agg."""
    agg = (
        spark.table("t_orders_b")
        .groupBy("custkey")
        .agg(F.sum("o_totalprice").alias("total"))
    )
    agg.collect()
    assert exchange_count(agg) == 0, physical_plan(agg)


def test_bucket_pruning_on_key_equality(spark, bucketed_pair):
    """WHERE custkey = x scans only the matching bucket: the data-filters
    list carries the pruned-bucket scan and the result is exact."""
    o, _ = bucketed_pair
    key = o.select("o_custkey").first().o_custkey
    # auto-bucketed-scan drops the bucketed layout for join-free plans
    # (no exchange to save); force it so the filter can prune buckets
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        q = spark.table("t_orders_b").filter(F.col("custkey") == key)
        got = q.count()
        want = o.filter(F.col("o_custkey") == key).count()
        assert got == want and got > 0
        plan = physical_plan(q)
        assert re.search(r"SelectedBucketsCount: 1 out of 4", plan), plan
    finally:
        spark.conf.set(
            "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true"
        )
