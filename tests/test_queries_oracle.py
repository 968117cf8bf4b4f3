"""The correctness gate as a pytest: every registered query with an oracle
must match DuckDB exactly (row count, sorted columns, order-insensitive
values) — the same comparison the external driver performs at sf0.01
(run here at sf0.001 for speed; tools/check_oracle.py covers sf0.01).
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from check_oracle import (  # noqa: E402
    _canon,
    dtype_class_diffs,
    duck_connection,
)

from dataworks_audit_data_ingest_spark.queries import all_queries  # noqa: E402

SF = "/root/testdata/sf0.001"
REGISTRY = all_queries()


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck):
    q = REGISTRY[name]
    sdf = q.fn(spark, SF)
    s_rows = [tuple(r) for r in sdf.collect()]
    if q.sql is None:
        assert len(s_rows) >= 0  # rows-only check (non-SQL-expressible op)
        return
    cur = duck.execute(q.sql)
    d_cols = [c[0] for c in cur.description]
    d_rows = cur.fetchall()
    s_cols, s_vals = _canon(sdf.columns, s_rows)
    d_cols, d_vals = _canon(d_cols, d_rows)
    assert s_cols == d_cols
    assert len(s_vals) == len(d_vals)
    assert s_vals == d_vals


def test_entry_contract(spark):
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __spark_entry__ as E

    df = E.entry(spark)
    assert len(df.collect()) > 0
    assert set(E.oracle_sql()) <= set(E.queries())


@pytest.mark.parametrize(
    "name", sorted(n for n, q in REGISTRY.items() if q.sql is not None)
)
def test_oracle_output_types_are_hashable(name, spark):
    """Invariant 5 (STATUS.md), codified: an oracle-backed query's output
    must contain no array/map/struct/binary, no decimal, no float32 —
    types the driver's pandas canonicalizer either crashes on (round-1
    q27: unhashable list) or hashes engine-dependently. Serialize
    (array_join / cast) instead."""
    schema = REGISTRY[name].fn(spark, SF).schema
    banned = ("array", "map", "struct", "binary", "decimal", "float")
    for f in schema.fields:
        t = f.dataType.simpleString()
        assert not t.startswith(banned), (
            f"{name}.{f.name} has driver-unhashable type {t}"
        )


@pytest.mark.parametrize(
    "name", sorted(n for n, q in REGISTRY.items() if q.sql is not None)
)
def test_oracle_dtype_classes_match(name, spark, duck):
    """The r04 q92/q93 failure class, turned off permanently: DuckDB promotes
    SUM(integer) and // over it to HUGEINT, which pandas renders float64
    while Spark emits int64 — values identical, driver hash mismatch, and
    the str()-based value compare above cannot see it. Compare plan-time
    type CLASSES (Spark analyzed schema vs DuckDB DESCRIBE — no execution):
    int-vs-float, int-vs-hugeint, object-vs-numeric fail; the driver-proven
    benign diffs (int32/int64, ns/us) share a class and pass."""
    q = REGISTRY[name]
    diffs = dtype_class_diffs(q.fn(spark, SF).schema, duck, q.sql)
    assert not diffs, (
        f"{name}: pandas-dtype class mismatch (spark, duckdb): {diffs} — "
        "CAST the DuckDB side (usually CAST(SUM(...) AS BIGINT))"
    )
