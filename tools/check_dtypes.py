"""Sweep every oracle-backed query for pandas-dtype mismatches.

The driver canonicalizes both result sets through pandas before hashing, so a
value-identical result can still hash-mismatch when the engines disagree on
the physical type (observed: DuckDB SUM(BIGINT) -> HUGEINT -> object/float64
while Spark SUM(bigint) -> int64; round-1 q21). This tool reproduces that
comparison path: run the Spark builder via ``toPandas()`` and the DuckDB
oracle via ``.df()`` and diff the per-column dtypes.

    python tools/check_dtypes.py [--sf /root/testdata/sf0.001] [names...]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

from dataworks_audit_data_ingest_spark.queries import all_queries  # noqa: E402
from dataworks_audit_data_ingest_spark.session import get_spark  # noqa: E402
from dataworks_audit_data_ingest_spark.tables import TABLE_NAMES  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    spark = get_spark()
    bad = []
    qs = all_queries()
    names = args.names or [n for n, q in qs.items() if q.sql is not None]
    for name in names:
        q = qs[name]
        if q.sql is None:
            continue
        try:
            spdf = q.fn(spark, args.sf).toPandas()
            dpdf = con.execute(q.sql).df()
        except Exception as exc:  # surface, keep sweeping
            bad.append((name, f"ERR {type(exc).__name__}: {exc}"))
            print(f"ERR   {name}: {exc}")
            continue
        sp = {c: str(t) for c, t in spdf.dtypes.items()}
        dp = {c: str(t) for c, t in dpdf.dtypes.items()}
        if set(sp) != set(dp):
            bad.append((name, f"columns {sorted(sp)} vs {sorted(dp)}"))
            print(f"COLS  {name}: {sorted(sp)} vs {sorted(dp)}")
            continue
        diffs = {c: (sp[c], dp[c]) for c in sp if sp[c] != dp[c]}
        if diffs:
            bad.append((name, str(diffs)))
            print(f"DTYPE {name}: {diffs}")
        else:
            print(f"ok    {name}")
    print(f"\n{len(bad)} queries with dtype mismatches / errors")
    for name, msg in bad:
        print(f"  {name}: {msg}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
