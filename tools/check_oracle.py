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
