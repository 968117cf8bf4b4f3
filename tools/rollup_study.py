"""Measured study: incremental rollup maintenance vs per-refresh full
recompute as event history grows — the evidence behind
`incremental/rollup.py`'s O(batch) update claim.

    python tools/rollup_study.py [n_batches]

Slices the sf0.1 events fixture into hash batches and, at every step,
times (a) `update_rollup_store` + `read_rollup` (what the maintained
store pays: a batch-sized fold, then a merge over grain rows) against
(b) a full aggregate recompute over the UNION of all events so far (what
a pipeline without the store pays per refresh). Report equality is
asserted at every step. Also reports the store's grain-row count — the
read-side input, which saturates at distinct (day, type, user) keys
while the union keeps growing.
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from dataworks_audit_data_ingest_spark.incremental.rollup import (  # noqa: E402
    read_rollup,
    read_rollup_grain,
    update_rollup_store,
)
from dataworks_audit_data_ingest_spark.session import tune  # noqa: E402
from dataworks_audit_data_ingest_spark.tables import table  # noqa: E402

SF = "/root/testdata/sf0.1"


def _report_rows(spark, store):
    return sorted(tuple(r) for r in read_rollup(spark, store).collect())


def _recompute_rows(df):
    cents = F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)")
    return sorted(
        tuple(r)
        for r in df.select(
            F.to_date("ts").alias("day"),
            "event_type",
            "user_id",
            cents.alias("cents"),
        )
        .groupBy("day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum("cents").alias("sum_cents"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
        .collect()
    )


def main() -> int:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .appName("rollup-study")
        .getOrCreate()
    )
    tune(spark)
    ev = table(spark, SF, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    total = ev.count()
    print(f"events: {total} at {SF}")
    store = tempfile.mkdtemp(prefix="rollup_study_") + "/store"
    union = None
    print(
        "| batch | new events | union events | store grain rows "
        "| update+read s | full recompute s |"
    )
    print("|---|---|---|---|---|---|")
    for b in range(n_batches):
        batch = ev.filter(
            F.pmod(F.xxhash64("event_id"), F.lit(n_batches)) == b
        ).localCheckpoint(eager=True)
        n_new = batch.count()
        union = batch if union is None else union.unionByName(batch)
        union = union.localCheckpoint(eager=True)
        n_union = union.count()

        t0 = time.monotonic()
        update_rollup_store(spark, store, batch, str(b))
        inc_rows = _report_rows(spark, store)
        t_inc = time.monotonic() - t0

        t0 = time.monotonic()
        full_rows = _recompute_rows(union)
        t_full = time.monotonic() - t0

        assert inc_rows == full_rows, f"divergence at batch {b}"
        grain = read_rollup_grain(spark, store).count()
        print(
            f"| {b} | {n_new} | {n_union} | {grain} "
            f"| {t_inc:.2f} | {t_full:.2f} |"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
