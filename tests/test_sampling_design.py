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


def test_zero_spread_edge_matches_oracle(spark, tmp_path):
    """If EVERY stratum has zero spread the allocation weight sums to 0.
    Unguarded, Spark's DIV yields NULL while DuckDB's // raises — the
    r10 ADVICE divergence. Both engines must now return NULL allocs
    (NULLIF guard) on the same rows."""
    import duckdb

    from dataworks_audit_data_ingest_spark.queries import REGISTRY

    rows = [(f"src{i % 3}", 100) for i in range(30)]
    docs = spark.createDataFrame(rows, "source string, n_chars int")
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = q262_neyman_allocation(spark, str(tmp_path)).collect()
    assert len(got) == 3
    assert all(r.s_milli == 0 for r in got)
    assert all(r.alloc_docs is None for r in got)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"parquet_scan('{tmp_path}/documents.parquet/*.parquet')"
    )
    oracle = con.execute(REGISTRY["q262_neyman_allocation"].sql).fetchall()
    assert sorted(tuple(r) for r in oracle) == sorted(
        (r.source, r.n_docs, r.s_milli, r.alloc_docs) for r in got
    )


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
