"""Measured study: parquet row-group statistics pruning (zone maps) —
what sorting a fact table by its hot filter column is worth at scan time.

    python tools/zonemap_study.py

Writes the sf0.1 events fixture twice — clustered (sorted by user_id,
so each row group covers a narrow user range) and scattered (sorted by
a hash, so every row group spans the full user domain) — then runs the
same selective filter over both and reports the bytes the scan actually
read (executor inputMetrics via the status API). Parquet keeps min/max
per row group; a predicate outside a group's [min, max] skips the group
without decoding it. The effect needs NO engine code: it is purely a
LAYOUT decision, which is why the sinks expose sorted/Z-ordered writes —
at 100 TB the difference is reading ~one row group vs the whole table.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from dataworks_audit_data_ingest_spark.session import tune  # noqa: E402
from dataworks_audit_data_ingest_spark.tables import table  # noqa: E402

SF = "/root/testdata/sf0.1"


def _input_bytes(ui: str) -> int:
    """Total stage inputBytes, polled until STABLE: the status store is
    fed by an async listener queue, so a read immediately after an
    action can miss the final stage's metrics — two consecutive equal
    readings means the queue has drained for our purposes."""
    def once() -> int:
        apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
        app = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages")
        )
        return sum(s.get("inputBytes", 0) for s in stages)

    prev = once()
    for _ in range(50):
        time.sleep(0.1)
        cur = once()
        if cur == prev:
            return cur
        prev = cur
    return prev


def main() -> int:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        # small row groups so the 100k-row fixture has enough groups to
        # make pruning visible (production files have many groups/file)
        .config("spark.hadoop.parquet.block.size", str(64 * 1024))
        .appName("zonemap-study")
        .getOrCreate()
    )
    tune(spark)
    ui = spark.sparkContext.uiWebUrl
    ev = table(spark, SF, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    tmp = tempfile.mkdtemp(prefix="zonemap_")
    # clustered: row groups cover narrow user ranges
    ev.orderBy("user_id").coalesce(4).write.parquet(f"{tmp}/clustered")
    # scattered: every row group spans the full user domain
    ev.orderBy(F.xxhash64("event_id")).coalesce(4).write.parquet(
        f"{tmp}/scattered"
    )
    hot_user = ev.select("user_id").orderBy("user_id").limit(1).collect()[0][0]

    # warm both layouts first (footer caches, codegen) so the measured
    # pass isolates the row-group pruning effect
    for layout in ("clustered", "scattered"):
        spark.read.parquet(f"{tmp}/{layout}").filter(
            F.col("user_id") == hot_user
        ).count()

    print("| layout | filter rows | scan bytes read | wall s |")
    print("|---|---|---|---|")
    for layout in ("clustered", "scattered"):
        before = _input_bytes(ui)
        t0 = time.monotonic()
        n = (
            spark.read.parquet(f"{tmp}/{layout}")
            .filter(F.col("user_id") == hot_user)
            .count()
        )
        wall = time.monotonic() - t0
        read = _input_bytes(ui) - before
        print(f"| {layout} | {n} | {read/1024:.0f} KB | {wall:.2f} |")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
