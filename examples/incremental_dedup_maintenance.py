"""Incremental corpus maintenance demo: day batches → CDC chunk dedup
against a persistent store → novelty-driven keep decisions → periodic
store compaction → a skew-report-driven join.

The shape a long-lived crawl pipeline runs on a schedule:

  1. each day's documents are chunked at content-defined boundaries and
     deduplicated at CHUNK granularity against everything already
     ingested (`text/cdc.py::incremental_cdc_batch`) — a re-crawl with
     one edited paragraph stores only the edited chunks;
  2. per-document novelty stats decide what enters the curated corpus
     (re-crawled boilerplate scores ~0 novel chars);
  3. once the old batches are beyond any replay horizon, the store's
     batch partitions fold into one (`incremental/store.py::
     compact_store`) so the per-batch store read stays O(1) partitions;
  4. a persisted join-key skew report (`functions/skew.py`) feeds the
     salt-or-not decision when the curated corpus joins a metadata dim.

Run:  python examples/incremental_dedup_maintenance.py
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.incremental.store import compact_store
from dataworks_audit_data_ingest_spark.functions.skew import (
    key_skew_report,
    load_skew_milli,
    maybe_salted_join,
)
from dataworks_audit_data_ingest_spark.tables import table
from dataworks_audit_data_ingest_spark.text.cdc import incremental_cdc_batch

SF = "/root/testdata/sf0.001"


def run(spark, workdir: str) -> dict:
    """Drive three day-batches, compact, and join; returns audit counts."""
    store = f"{workdir}/chunk_store"
    docs = table(spark, SF, "documents").select("doc_id", "text")
    audit: dict = {"days": []}

    # -- 1+2: daily batches; day 3 re-crawls day 1 (novelty ~0) --------
    batches = [
        ("2026-08-11", docs.filter(F.col("doc_id") < 60)),
        ("2026-08-12", docs.filter((F.col("doc_id") >= 60) & (F.col("doc_id") < 120))),
        ("2026-08-13", docs.filter(F.col("doc_id") < 60)),  # re-crawl
    ]
    for day, batch in batches:
        novel, stats = incremental_cdc_batch(spark, store, batch, day)
        kept = stats.filter(F.col("n_novel") > 0)
        audit["days"].append(
            {
                "day": day,
                "docs": stats.count(),
                "kept_novel_docs": kept.count(),
                "novel_chunks": novel.count(),
            }
        )

    # -- 3: fold everything before the replay horizon (the newest day
    # could still be replayed by the scheduler -> excluded) ------------
    audit["folded_partitions"] = compact_store(
        spark, store, exclude=("2026-08-13",)
    )

    # -- 4: persisted skew report feeds the join decision --------------
    fact = docs.select(
        # ~90% of rows on one hot key, the tail spread over unique keys
        F.expr(
            "CASE WHEN doc_id % 10 < 9 THEN -1 ELSE doc_id END"
        ).alias("k"),
        "doc_id",
    )
    report_path = f"{workdir}/skew_report"
    key_skew_report(fact, "k").write.parquet(report_path)
    milli = load_skew_milli(spark, report_path)
    dim = fact.select("k").distinct().withColumn("w", F.abs(F.col("k")) % 7)
    joined = maybe_salted_join(fact, dim, "k", skew_milli=milli)
    audit["skew_milli"] = milli
    audit["salted"] = "_salt" in (
        joined._jdf.queryExecution().optimizedPlan().toString()
    )
    audit["joined_rows"] = joined.count()
    return audit


if __name__ == "__main__":
    from dataworks_audit_data_ingest_spark.session import get_spark

    spark = get_spark("incremental-maintenance-demo")
    with tempfile.TemporaryDirectory() as tmp:
        out = run(spark, tmp)
    for day in out["days"]:
        print(day)
    print(
        f"folded={out['folded_partitions']} skew_milli={out['skew_milli']} "
        f"salted={out['salted']} joined_rows={out['joined_rows']}"
    )
    spark.stop()
