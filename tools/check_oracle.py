"""Self-check harness mimicking the driver's correctness gate.

For every registered query: run the Spark builder and the DuckDB oracle on
the same sf dir, then compare row count, sorted column names, and
order-insensitive values. Run:

    python tools/check_oracle.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from datetime import date, datetime
from decimal import Decimal
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

from dataworks_audit_data_ingest_spark.queries import all_queries  # noqa: E402
from dataworks_audit_data_ingest_spark.session import get_spark  # noqa: E402
from dataworks_audit_data_ingest_spark.tables import TABLE_NAMES  # noqa: E402


def _norm(v):
    """Normalize a cell to a comparable token (mirrors a hash-style compare)."""
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)  # exact: bit-level equality required
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def duck_type_class(t: str) -> str:
    """Collapse a DuckDB logical type name (from ``DESCRIBE <sql>``) to the
    pandas-dtype class the driver's canonicalizer would see. HUGEINT is its
    own class on purpose: pandas renders it float64/object while Spark's
    BIGINT stays int64 — the exact r04 q92/q93 hash-mismatch."""
    u = t.upper()
    if u in ("HUGEINT", "UHUGEINT"):
        return "hugeint"
    if u.startswith("DECIMAL"):
        return "decimal"
    if u in (
        "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
        "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
    ):
        return "int"
    if u in ("FLOAT", "REAL"):
        return "float32"
    if u == "DOUBLE":
        return "float"
    if u in ("VARCHAR", "TEXT", "STRING"):
        return "str"
    if u == "DATE":
        return "date"
    if u.startswith("TIMESTAMP"):
        return "datetime"
    if u == "BOOLEAN":
        return "bool"
    return f"other:{u}"


def spark_type_class(t: str) -> str:
    """Same classes for a Spark ``dataType.simpleString()``. int32-vs-int64
    and ns-vs-us land in the same class (the driver-proven-benign diffs);
    int-vs-float / int-vs-hugeint / object-vs-numeric land in different
    classes and fail the gate."""
    if t in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if t == "float":
        return "float32"
    if t == "double":
        return "float"
    if t.startswith("decimal"):
        return "decimal"
    if t == "string":
        return "str"
    if t == "date":
        return "date"
    if t.startswith("timestamp"):
        return "datetime"
    if t == "boolean":
        return "bool"
    return f"other:{t}"


def dtype_class_diffs(sdf_schema, con, sql) -> dict[str, tuple[str, str]]:
    """{col: (spark_class, duck_class)} for every column whose pandas dtype
    class differs between engines — computed from plan-time metadata only
    (Spark analyzed schema + DuckDB DESCRIBE), no execution."""
    s_cls = {f.name: spark_type_class(f.dataType.simpleString())
             for f in sdf_schema.fields}
    d_cls = {row[0]: duck_type_class(row[1])
             for row in con.execute(f"DESCRIBE {sql}").fetchall()}
    return {
        c: (s_cls[c], d_cls[c])
        for c in s_cls
        if c in d_cls and s_cls[c] != d_cls[c]
    }


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = get_spark("oracle-check")
    con = duck_connection(args.sf)
    registry = all_queries()
    names = args.names or sorted(registry)
    failures = []
    for name in names:
        q = registry[name]
        t0 = time.time()
        try:
            sdf = q.fn(spark, args.sf)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:400]}")
            continue
        if q.sql is None:
            print(f"rows  {name}: {len(s_rows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            cur = con.execute(q.sql)
            d_cols = [c[0] for c in cur.description]
            d_rows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {str(e)[:400]}")
            continue
        try:
            cls_diffs = dtype_class_diffs(sdf.schema, con, q.sql)
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: DESCRIBE error: {type(e).__name__}: {str(e)[:200]}")
            continue
        if cls_diffs:
            failures.append(name)
            print(f"FAIL  {name}: dtype class mismatch (spark, duckdb): {cls_diffs}")
            continue
        sc, sv = _canon(s_cols, s_rows)
        dc, dv = _canon(d_cols, d_rows)
        dt = time.time() - t0
        if sc != dc:
            failures.append(name)
            print(f"FAIL  {name}: columns differ: spark={sc} duckdb={dc}")
        elif len(sv) != len(dv):
            failures.append(name)
            print(f"FAIL  {name}: rowcount spark={len(sv)} duckdb={len(dv)}")
        elif sv != dv:
            failures.append(name)
            diffs = [(a, b) for a, b in zip(sv, dv) if a != b][:3]
            print(f"FAIL  {name}: {len(sv)} rows, values differ; first diffs:")
            for a, b in diffs:
                print(f"      spark : {a}\n      duckdb: {b}")
        else:
            print(f"OK    {name}: {len(sv)} rows [{dt:.1f}s]")
    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
