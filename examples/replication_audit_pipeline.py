"""Replication-audit demo: anti-entropy fingerprints localize replica
divergence, a keyed diff explains it, and a partition-scoped repair
fixes it — without ever comparing the tables row-by-row globally.

The journey a 100 TB replica audit actually runs:

  1. write the ``orders`` fixture as the PRIMARY and a month-partitioned
     REPLICA, then corrupt the replica three ways in three different
     months — mutate one row's priority, drop one row, duplicate one
     row (the duplicate is exactly the case XOR checksums self-cancel
     on; `functions/checksum.py` sums for that reason),
  2. fingerprint both sides per month (`table_fingerprint`: one scan
     each, (month, n_rows, checksum) partials — no rows move) and take
     `fingerprint_diff`: exactly the three planted months surface,
  3. explain ONE diverged month with the row-level `table_diff`
     (`sinks/diff.py`) over that month's rows only — the expensive
     keyed comparison runs on 1/84th of the table, which is the entire
     point of localizing first,
  4. repair by overwriting ONLY the diverged months' partitions with
     the primary's rows (dynamic partition overwrite), re-audit, and
     require ZERO diverging months.

Built-in ground truth: the diff names the planted order key as
modified; untouched months never appear in any diff; the repair
rewrites exactly 3 of 84 month partitions.

Run:  python examples/replication_audit_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from dataworks_audit_data_ingest_spark.functions.checksum import (  # noqa: E402
    fingerprint_diff,
    table_fingerprint,
)
from dataworks_audit_data_ingest_spark.session import get_spark  # noqa: E402
from dataworks_audit_data_ingest_spark.sinks.diff import table_diff  # noqa: E402
from dataworks_audit_data_ingest_spark.tables import table  # noqa: E402

CONTENT = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "cents",
    "o_orderpriority",
]


def _canonical_orders(df):
    """Month key + exact-integer cents (floats are rejected by the
    fingerprint on purpose)."""
    return df.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_orderpriority",
        F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").alias(
            "cents"
        ),
        F.trunc("o_orderdate", "month").alias("month"),
    )


def _fingerprints(spark, path):
    return table_fingerprint(
        spark.read.parquet(path), ["month"], CONTENT
    )


def main(sf_dir: str = "/root/testdata/sf0.001") -> int:
    spark = get_spark("replication-audit-example")
    base = tempfile.mkdtemp(prefix="replaudit_")
    primary_path, replica_path = f"{base}/primary", f"{base}/replica"

    orders = _canonical_orders(table(spark, sf_dir, "orders"))
    orders.write.mode("overwrite").partitionBy("month").parquet(primary_path)

    # three victims in three DIFFERENT months, chosen deterministically
    k_mut, k_drop, k_dup = [
        r.o_orderkey
        for r in orders.groupBy("month")
        .agg(F.min("o_orderkey").alias("o_orderkey"))
        .orderBy("month")
        .limit(3)
        .collect()
    ]
    corrupted = (
        orders.withColumn(
            "o_orderpriority",
            F.when(
                F.col("o_orderkey") == k_mut, F.lit("9-TAMPERED")
            ).otherwise(F.col("o_orderpriority")),
        )
        .filter(F.col("o_orderkey") != k_drop)
        .unionByName(orders.filter(F.col("o_orderkey") == k_dup))
    )
    corrupted.write.mode("overwrite").partitionBy("month").parquet(
        replica_path
    )

    # -- audit: two scans, (month, count, checksum) partials, no rows move
    diverged = fingerprint_diff(
        _fingerprints(spark, primary_path), _fingerprints(spark, replica_path)
    ).orderBy("month")
    bad_months = [r.month for r in diverged.collect()]
    n_months = orders.select("month").distinct().count()
    print(f"diverged months: {len(bad_months)}/{n_months} -> {bad_months}")
    victims = {k_mut, k_drop, k_dup}
    planted = {
        r.month
        for r in orders.filter(
            F.col("o_orderkey").isin(list(victims))
        )
        .select("month")
        .distinct()
        .collect()
    }
    assert set(bad_months) == planted, (bad_months, planted)

    # -- explain the mutated month row-by-row, on that month ONLY
    mut_month = sorted(planted)[0]
    pm = spark.read.parquet(primary_path).filter(F.col("month") == mut_month)
    rm = spark.read.parquet(replica_path).filter(F.col("month") == mut_month)
    diff_rows = table_diff(pm, rm, ["o_orderkey"]).collect()
    assert any(
        r.o_orderkey == k_mut and r.change_type == "modified"
        for r in diff_rows
    ), diff_rows
    print(f"month {mut_month} diff: {sorted(r.change_type for r in diff_rows)}")

    # -- repair: overwrite ONLY the diverged partitions from the primary
    repair = spark.read.parquet(primary_path).filter(
        F.col("month").isin(bad_months)
    )
    (
        repair.write.mode("overwrite")
        .partitionBy("month")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(replica_path)
    )
    print(f"repaired {len(bad_months)} partitions from primary")

    # -- re-audit: clean
    still = fingerprint_diff(
        _fingerprints(spark, primary_path), _fingerprints(spark, replica_path)
    ).count()
    assert still == 0, f"{still} months still diverged after repair"
    print("re-audit clean: replica == primary on every month fingerprint")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(*sys.argv[1:]))
