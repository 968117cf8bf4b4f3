"""Measure per-query shuffle volume: run each headline query with the Spark
UI enabled and sum stage-level shuffle read/write + spill from the REST
metrics API, scoped to the query's job group.

    python tools/shuffle_audit.py [--sf /root/testdata/sf0.1] [names...]

This is the hard evidence behind PERF.md's "shuffle budget" table: a query
whose plan degenerates (all-pairs join, lost broadcast, accidental global
sort) shows up immediately as shuffle bytes out of proportion to its input.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession  # noqa: E402

from dataworks_audit_data_ingest_spark.queries import all_queries  # noqa: E402
from dataworks_audit_data_ingest_spark.session import tune  # noqa: E402

DEFAULT = [
    "q01_pricing_summary",
    "q02_top_orders_by_revenue",
    "q03_regional_revenue",
    "q12_topk_per_customer",
    "q25_asof_join",
    "q51_dedup_minhash_lsh",
    "q52b_simhash_hamming",
    "q53_dedup_ngram_jaccard",
    "q55_ann_bruteforce_topk",
    "q56_ann_ivf_topk",
    "q66_fuzzy_brand_match",
    "q37s_distribution_ranks_scale",
    "q81_repetition_quality",
    "q82_decontamination",
]


def _rest(base: str, path: str):
    with urllib.request.urlopen(f"{base}{path}", timeout=10) as r:
        return json.loads(r.read())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("shuffle-audit")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4057")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    base = "http://localhost:4057/api/v1"
    app_id = spark.sparkContext.applicationId
    registry = all_queries()
    names = args.names or [n for n in DEFAULT if n in registry]

    print(f"| query | wall s | shuffle write | shuffle read | spill (disk) |")
    print(f"|---|---|---|---|---|")
    rows = []
    for name in names:
        sc = spark.sparkContext
        sc.setJobGroup(name, name)
        before = {s["stageId"] for s in _rest(base, f"/applications/{app_id}/stages")}
        t0 = time.time()
        registry[name].fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        time.sleep(0.5)  # let the UI ingest the final stage metrics
        stages = _rest(base, f"/applications/{app_id}/stages")
        new = [s for s in stages if s["stageId"] not in before]
        sw = sum(s.get("shuffleWriteBytes", 0) for s in new)
        sr = sum(s.get("shuffleReadBytes", 0) for s in new)
        sp = sum(s.get("diskBytesSpilled", 0) for s in new)
        fmt = lambda b: (
            f"{b / 1e6:.1f} MB" if b >= 1e6 else (f"{b / 1e3:.0f} KB" if b else "0")
        )
        print(f"| {name} | {wall:.2f} | {fmt(sw)} | {fmt(sr)} | {fmt(sp)} |")
        rows.append((name, wall, sw, sr, sp))
    total_sw = sum(r[2] for r in rows)
    print(f"\ntotal shuffle write: {total_sw / 1e6:.1f} MB across {len(rows)} queries")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
