"""functions/sketches.py — HLL kernel properties, engine-independent.

Runs the SQL builders on DuckDB (fast, no Spark session): the same
strings feed the Spark side of q107/q111, and the oracle tests already
pin cross-engine equality, so what needs covering here is the algebra —
merge associativity and the estimator's error bound.
"""

from __future__ import annotations

import duckdb
import pytest

from dataworks_audit_data_ingest_spark.functions import sketches as SK

M = 32
RSD = 1.04 / (M**0.5)  # published HLL relative standard deviation


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        "CREATE TABLE keys AS SELECT 'key-' || CAST(i AS VARCHAR) AS k, "
        "i % 2 AS half FROM RANGE(0, 5000) t(i)"
    )
    yield c
    c.close()


def _registers(con, where="TRUE"):
    rows = con.execute(
        f"SELECT {SK.hll_bucket_sql('k', M, 'duckdb')} AS b, "
        f"MAX({SK.hll_rho_sql('k', M, 'duckdb')}) AS m_j "
        f"FROM keys WHERE {where} GROUP BY 1"
    ).fetchall()
    return dict(rows)


def _estimate(con, regs):
    s = sum(1 << (SK.hll_shift(M) - mj) for mj in regs.values())
    return con.execute(
        f"SELECT {SK.hll_estimate_sql(str(s), str(len(regs)), M, 'duckdb')}"
    ).fetchone()[0]


def test_merge_of_halves_equals_whole(con):
    whole = _registers(con)
    h0, h1 = _registers(con, "half = 0"), _registers(con, "half = 1")
    merged = {b: max(h0.get(b, 0), h1.get(b, 0)) for b in set(h0) | set(h1)}
    assert merged == whole


def test_estimate_within_error_bound(con):
    est = _estimate(con, _registers(con))
    assert abs(est - 5000) / 5000 < 3 * RSD, est


def test_dialects_agree_on_spark_free_pieces():
    """The two dialects differ only in hash casting and DIV spelling; the
    shift/alpha constants must be shared."""
    assert SK.hll_shift(M) == 28
    assert SK.ALPHA_PPM[32] == 697_000
    with pytest.raises(AssertionError):
        SK.hll_shift(33)


# ---------------------------------------------------------------------------
# KMV — merge algebra and estimator sanity (the query itself is fully
# oracle-checked as q143; these pin the sketch-level properties the query
# doesn't exercise)
# ---------------------------------------------------------------------------


def test_kmv_union_merge_equals_rebuild(spark):
    """k-smallest of (k-set(A) ∪ k-set(B)) == k-set(A ∪ B): the KMV merge
    is lossless for the union estimate — per-partition sketches roll up
    to the global sketch without touching raw values again."""
    import hashlib

    k = 32
    a_vals = {f"a{i}" for i in range(500)}
    b_vals = {f"b{i}" for i in range(300)} | {f"a{i}" for i in range(100)}

    def h(v: str) -> int:
        return int(hashlib.md5(f"kmv|{v}".encode()).hexdigest()[:8], 16)

    def kset(vals):
        return sorted({h(v) for v in vals})[:k]

    merged = sorted(set(kset(a_vals)) | set(kset(b_vals)))[:k]
    rebuilt = kset(a_vals | b_vals)
    assert merged == rebuilt


def test_kmv_estimate_within_theory_bound(spark):
    """(k-1)·2³²/U_k on 2000 uniform-hashed values lands within 3/sqrt(k)
    relative error (≈ 3 sigma)."""
    import hashlib

    from dataworks_audit_data_ingest_spark.functions.sketches import KMV_DOMAIN

    k, n = 64, 2000
    hashes = sorted(
        int(hashlib.md5(f"kmv|v{i}".encode()).hexdigest()[:8], 16)
        for i in range(n)
    )
    est = (k - 1) * KMV_DOMAIN // hashes[k - 1]
    assert abs(est - n) / n < 3 / (k ** 0.5), est


def test_kmv_small_group_is_exact(spark):
    """Groups holding fewer than k values report their exact count."""
    from dataworks_audit_data_ingest_spark.functions.sketches import (
        kmv_estimate_sql,
    )

    import duckdb

    expr = kmv_estimate_sql("kth", "n", 64, dialect="duckdb")
    got = duckdb.sql(f"SELECT {expr} AS e FROM (SELECT 12 AS n, 999 AS kth)").fetchone()[0]
    assert got == 12
