"""Streaming enrichment pipeline demo: fact stream → skew-aware dimension
join fed by the PERSISTED skew report → batch_id-partitioned curated
output → standing weighted reservoir of everything enriched so far.

Composes the round's streaming rungs end-to-end on one checkpoint:

  1. facts arrive as JSON files (Kafka stand-in; one file per drain so
     micro-batch slicing is deterministic across invocations),
  2. `start_enriched_stream` joins each micro-batch to the dimension
     with the salting decision loaded from the standing skew report the
     PREVIOUS batch wrote (batch 0 bootstraps; no histogram scan ever
     runs in the decision path),
  3. a second stream (`start_weighted_sample_stream`) maintains an exact
     k-row weighted sample of every enriched row ever landed — bottom-k
     integer priorities, so replays merge to an identical reservoir,
  4. the audit reads the reservoir with the CONSUMER-safe
     `read_reservoir` (never mutates swap state under a running owner).

The demo drains three waves — uniform, hot-keyed (~90 % of rows on one
key), uniform — and prints the skew_milli the report carried into each
wave: wave 2 still joins plain (decision came from wave 1's uniform
report), wave 3 salts (wave 2's hot histogram is now the standing
report). That one-cadence lag is the design: freshest information
available without paying a probe before any join.

Run:  python examples/streaming_enrichment_pipeline.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.functions.skew import load_skew_milli
from dataworks_audit_data_ingest_spark.session import get_spark
from dataworks_audit_data_ingest_spark.streaming.enrich_job import (
    start_enriched_stream,
)
from dataworks_audit_data_ingest_spark.streaming.sample_job import (
    read_reservoir,
    start_weighted_sample_stream,
)

FACT_SCHEMA = "k long, v long"
RESERVOIR_K = 40


def _write_wave(src: Path, name: str, hot: bool, v0: int, n: int = 200) -> None:
    rows = [
        {"k": 0 if hot and i < n * 9 // 10 else i % 20, "v": v0 + i}
        for i in range(n)
    ]
    (src / name).write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def run(spark, workdir: str) -> dict:
    work = Path(workdir)
    src = work / "facts_src"
    src.mkdir(parents=True, exist_ok=True)
    enriched_dir = str(work / "enriched")
    report = str(work / "skew_report")
    reservoir = str(work / "reservoir")

    spark.range(20).select(
        F.col("id").alias("k"),
        (F.col("id") * 11 % 7).alias("dim_weight"),
        F.concat(F.lit("dim_"), F.col("id")).alias("name"),
    ).write.mode("overwrite").parquet(str(work / "dim"))

    audit: dict = {"waves": []}

    def drain_enrich() -> None:
        stream = (
            spark.readStream.schema(FACT_SCHEMA).format("json").load(str(src))
        )
        q = start_enriched_stream(
            stream,
            str(work / "dim"),
            "k",
            enriched_dir,
            report,
            str(work / "ckpt_enrich"),
        )
        q.awaitTermination(300)

    def drain_reservoir() -> None:
        enriched_stream = (
            spark.readStream.schema(
                "k long, v long, dim_weight long, name string"
            )
            .format("parquet")
            .load(enriched_dir)
        )
        # weight = 1 + v % 100: a stand-in for a per-row quality score
        q = start_weighted_sample_stream(
            enriched_stream.withColumn(
                "weight", F.lit(1) + F.col("v") % 100
            ),
            reservoir,
            str(work / "ckpt_reservoir"),
            k=RESERVOIR_K,
            id_col="v",
        )
        q.awaitTermination(300)

    waves = [("uniform", False, 0), ("hot", True, 10_000), ("uniform", False, 20_000)]
    for i, (label, hot, v0) in enumerate(waves):
        _write_wave(src, f"wave{i}.json", hot, v0)
        drain_enrich()
        audit["waves"].append(
            {"label": label, "skew_milli_after": load_skew_milli(spark, report)}
        )
        drain_reservoir()

    enriched = spark.read.parquet(enriched_dir)
    audit["enriched_rows"] = enriched.count()
    audit["join_correct"] = (
        enriched.filter(
            F.col("name") != F.concat(F.lit("dim_"), "k")
        ).count()
        == 0
    )
    sample = read_reservoir(spark, reservoir)
    audit["reservoir_rows"] = sample.count()
    audit["reservoir_mean_weight"] = float(
        sample.agg(F.avg("weight")).collect()[0][0]
    )
    audit["corpus_mean_weight"] = float(
        enriched.select((F.lit(1) + F.col("v") % 100).alias("w"))
        .agg(F.avg("w"))
        .collect()[0][0]
    )
    return audit


def main() -> None:
    import tempfile

    spark = get_spark("streaming-enrichment-demo")
    spark.sparkContext.setLogLevel("ERROR")
    with tempfile.TemporaryDirectory() as workdir:
        audit = run(spark, workdir)
    print(json.dumps(audit, indent=2))


if __name__ == "__main__":
    main()
