"""The 100 TB-shaped curation pipeline in one runnable file:

  1. **Skew-aware enrichment** — day batches of documents join a source
     metadata dimension through `incremental.enrich.run_enriched_incremental`:
     the salt-or-not decision comes from the PERSISTED skew report the
     previous run wrote (no per-join histogram scan; the report refreshes
     on the job's own cadence).
  2. **Curation with the composed containment policy** — blocked sources
     out, keep-best near-dup copies (`drop_near_duplicates(keep="longest")`),
     then `drop_contained_duplicates(survivors=...)`: a fragment drops
     ONLY when its containing document survived curation; a fragment
     whose every container died is rescued as the sole remaining copy
     (q176's composition).
  3. **Training shards** — the curated corpus lands as deterministic,
     balanced, manifest-verified shards (`sinks/shards.py`) ready for a
     data loader, with per-epoch reordering that never rewrites files.

Every step is the at-scale shape: the enrichment join decision is one
number from disk, curation is gram/band-keyed joins under DF caps, and
the shard write is the single intentional global shuffle.

Run:  python examples/skew_aware_curation_pipeline.py
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.incremental import (
    EnrichmentJoinJob,
    run_enriched_incremental,
)
from dataworks_audit_data_ingest_spark.functions.skew import load_skew_milli
from dataworks_audit_data_ingest_spark.sinks import (
    read_shard,
    verify_shards,
    write_training_shards,
)
from dataworks_audit_data_ingest_spark.tables import table
from dataworks_audit_data_ingest_spark.text import (
    drop_contained_duplicates,
    drop_near_duplicates,
)

SF = "/root/testdata/sf0.001"
BLOCKED_SOURCES = ("src0",)  # stand-in for a real source blocklist
N_SHARDS = 4


def run(spark, workdir: str) -> dict:
    audit: dict = {}

    # ------------------------------------------------------------------
    # 1. skew-aware enrichment on the ingest cadence
    # ------------------------------------------------------------------
    docs = table(spark, SF, "documents").select(
        "doc_id", "text", "source", "n_chars"
    )
    # two "days" of arrivals; the source key is organically skewed enough
    # for the demo only if we plant it — ~60% of day-2 rows on one source
    day1 = docs.filter(F.col("doc_id") % 2 == 0).withColumn(
        "ts", F.to_timestamp(F.lit("2026-08-11 08:00:00"))
    )
    day2 = (
        docs.filter(F.col("doc_id") % 2 == 1)
        .withColumn(
            "source",
            F.when(F.col("doc_id") % 5 < 3, F.lit("src1")).otherwise(
                F.col("source")
            ),
        )
        .withColumn("ts", F.to_timestamp(F.lit("2026-08-12 08:00:00")))
    )
    fact_path = f"{workdir}/arrivals"
    day1.unionByName(day2).write.parquet(fact_path)

    dim_path = f"{workdir}/source_dim"
    docs.select("source").distinct().withColumn(
        "source_weight", F.length("source").cast("bigint")
    ).write.parquet(dim_path)

    job = EnrichmentJoinJob(
        source_path=fact_path,
        ts_col="ts",
        dim_path=dim_path,
        key="source",
        output_path=f"{workdir}/enriched",
        progress_file=f"{workdir}/progress",
        skew_report_path=f"{workdir}/skew_report",
        skew_threshold_milli=5_000,
    )
    committed = run_enriched_incremental(spark, job)
    audit["days_committed"] = [d.isoformat() for d in committed]
    audit["skew_milli"] = load_skew_milli(spark, job.skew_report_path)

    enriched = spark.read.parquet(job.output_path)
    audit["enriched_rows"] = audit["n_input"] = enriched.count()

    # ------------------------------------------------------------------
    # 2. curation: blocklist -> keep-best near-dup -> curated containment
    # ------------------------------------------------------------------
    candidates = enriched.filter(~F.col("source").isin(*BLOCKED_SOURCES))
    survivors = drop_near_duplicates(candidates, keep="longest")
    # persist: the curated plan (simhash window + containment join) feeds
    # the count below AND the shard write — one evaluation, not two
    curated = drop_contained_duplicates(enriched, survivors=survivors).persist()
    audit["n_blocked"] = audit["n_input"] - candidates.count()
    audit["n_survivors"] = survivors.count()
    audit["n_curated"] = curated.count()

    # ------------------------------------------------------------------
    # 3. training shards: one global shuffle, manifest-verified
    # ------------------------------------------------------------------
    shard_path = f"{workdir}/shards"
    manifest = write_training_shards(
        curated.select("doc_id", "text", "source", "n_chars"),
        shard_path,
        N_SHARDS,
        id_col="doc_id",
        size_col="n_chars",
    )
    audit["shard_rows"] = manifest["total_rows"]
    audit["shards_verified"] = verify_shards(spark, shard_path)
    audit["epoch1_first_ids"] = [
        r.doc_id for r in read_shard(spark, shard_path, 0, epoch=1).limit(3).collect()
    ]
    curated.unpersist()
    return audit


if __name__ == "__main__":
    from dataworks_audit_data_ingest_spark.session import get_spark

    spark = get_spark("skew-aware-curation-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    with tempfile.TemporaryDirectory() as tmp:
        out = run(spark, tmp)
    for k, v in out.items():
        print(f"{k}: {v}")
    spark.stop()
