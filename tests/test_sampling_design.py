"""Drills for the Neyman stratified-allocation query (q262): the
allocation must follow the design (∝ N_h·S_h), respect the budget, and
be partition-invariant."""

from __future__ import annotations

from dataworks_audit_data_ingest_spark.queries.curation import (
    _Q262_BUDGET,
    q262_neyman_allocation,
)

SF = "/root/testdata/sf0.001"


def test_allocation_follows_design_and_budget(spark):
    rows = q262_neyman_allocation(spark, SF).collect()
    assert rows
    # floor division never over-allocates; the remainder lost to
    # flooring is < one doc per stratum
    total = sum(r.alloc_docs for r in rows)
    assert _Q262_BUDGET - len(rows) <= total <= _Q262_BUDGET
    assert all(r.alloc_docs >= 0 for r in rows)
    # Neyman ordering: allocation ranks exactly as the N_h * S_h weight
    by_weight = sorted(rows, key=lambda r: r.n_docs * r.s_milli)
    allocs = [r.alloc_docs for r in by_weight]
    assert allocs == sorted(allocs)


def test_q262_partition_invariant(spark):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        rows = {}
        for n in ("7", before):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            rows[n] = [
                tuple(r) for r in q262_neyman_allocation(spark, SF).collect()
            ]
        assert rows["7"] == rows[before]
        assert rows[before]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
