"""Measured scaling study: run representative queries at every fixture
scale and report wall time + shuffle bytes side by side — the hard
evidence behind PERF.md's "this plan survives a scale-up" claims. A plan
that degenerates (quadratic candidate growth, a shuffle growing faster
than input) shows up as a super-linear column, not an argument.

    python tools/scale_study.py [names...]

Fixture input ratios (rows): lineitem/orders/events scale 1:10:100
across sf0.001/0.01/0.1; documents and embeddings scale 1:1:10 and
1:1:4 (the text/vector fixtures only grow at sf0.1) — interpret those
columns accordingly.
"""

from __future__ import annotations

import sys
import time
import urllib.request
import json
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession  # noqa: E402

from dataworks_audit_data_ingest_spark.queries import all_queries  # noqa: E402
from dataworks_audit_data_ingest_spark.session import tune  # noqa: E402

SFS = ("0.001", "0.01", "0.1")
DEFAULT = [
    "q01_pricing_summary",
    "q02_top_orders_by_revenue",
    "q32_session_windows",
    "q51_dedup_minhash_lsh",
    "q56_ann_ivf_topk",
    "q82_decontamination",
    "q93_cdc_chunk_dedup",
    "q193_boilerplate_lines",
    "q198_contribution_cap",
]


def _shuffle_bytes(ui: str, group: str) -> int:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app = apps[0]["id"]
    total = 0
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages")
    )
    for st in stages:
        if group in (st.get("description") or "") or group in str(
            st.get("jobGroup") or ""
        ):
            total += st.get("shuffleWriteBytes", 0)
    return total


def main() -> int:
    names = sys.argv[1:] or DEFAULT
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .appName("scale-study")
        .getOrCreate()
    )
    tune(spark)
    ui = spark.sparkContext.uiWebUrl
    registry = all_queries()
    print("| query | " + " | ".join(f"sf{s} wall / shuffle" for s in SFS) + " |")
    print("|---|" + "---|" * len(SFS))
    for name in names:
        cells = []
        for sf in SFS:
            group = f"{name}@{sf}"
            sc = spark.sparkContext
            sc.setJobGroup(group, group)
            sc.setLocalProperty("spark.jobGroup.id", group)
            t0 = time.monotonic()
            registry[name].fn(spark, f"/root/testdata/sf{sf}").collect()
            wall = time.monotonic() - t0
            sh = _shuffle_bytes(ui, group) if ui else 0
            unit = (
                f"{sh / 1048576:.1f} MB" if sh > 1048576 else f"{sh // 1024} KB"
            )
            cells.append(f"{wall:.2f}s / {unit}")
            sc.setJobGroup("", "")
        print(f"| {name} | " + " | ".join(cells) + " |")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
