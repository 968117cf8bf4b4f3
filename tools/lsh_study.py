"""MinHash-LSH parameter study: recall/precision/candidate volume across
(bands × rows) configurations on the fixture corpus with planted near-dups.

    python tools/lsh_study.py [--sf /root/testdata/sf0.01]

Ground truth: 50 planted variants (drop last 5 words). Also reports how many
candidate pairs each config generates — the cost axis (candidates drive the
verify-stage join size at 100 TB).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from dataworks_audit_data_ingest_spark.functions.hashing import (  # noqa: E402
    spark_hash32,
    universal_hash,
)
from dataworks_audit_data_ingest_spark.session import get_spark  # noqa: E402
from dataworks_audit_data_ingest_spark.tables import table  # noqa: E402

VARIANT_OFFSET = 1_000_000
N_VARIANTS = 50


def build_sigs(spark, sf_dir: str, n_seeds: int):
    d = table(spark, sf_dir, "documents")
    variants = d.filter(F.col("doc_id") < N_VARIANTS).select(
        (F.col("doc_id") + VARIANT_OFFSET).alias("doc_id"),
        F.expr(
            "ARRAY_JOIN(SLICE(SPLIT(text, ' '), 1, SIZE(SPLIT(text, ' ')) - 5), ' ')"
        ).alias("text"),
    )
    corpus = d.select("doc_id", "text").unionByName(variants)
    shingled = (
        corpus.withColumn("words", F.split("text", " "))
        .filter(F.size("words") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "TRANSFORM(SEQUENCE(1, SIZE(words) - 2), i -> ARRAY_JOIN(SLICE(words, i, 3), ' '))"
                )
            ).alias("shingle"),
        )
        .select("doc_id", F.expr(spark_hash32("shingle", "mh")).alias("h"))
    )
    return shingled.groupBy("doc_id").agg(
        *[
            F.expr(f"MIN({universal_hash('h', i)})").alias(f"mh_{i}")
            for i in range(n_seeds)
        ]
    ).cache()


def candidates(sigs, bands: int, rows: int):
    stack_args = ", ".join(
        "{b}, MD5(CONCAT_WS(',', {cols}))".format(
            b=b,
            cols=", ".join(f"CAST(mh_{b * rows + r} AS STRING)" for r in range(rows)),
        )
        for b in range(bands)
    )
    banded = sigs.select(
        "doc_id", F.expr(f"STACK({bands}, {stack_args}) AS (band_idx, band_hash)")
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()
    spark = get_spark("lsh-study")
    spark.sparkContext.setLogLevel("ERROR")

    configs = [(2, 6), (3, 4), (4, 3), (6, 2), (12, 1)]
    n_seeds = 12
    sigs = build_sigs(spark, args.sf, n_seeds)
    planted = {(d, d + VARIANT_OFFSET) for d in range(N_VARIANTS)}
    print(f"{'bands x rows':>12} | {'candidates':>10} | {'recall':>7} | note")
    for bands, rows in configs:
        cand = candidates(sigs, bands, rows)
        pairs = {(r.doc_a, r.doc_b) for r in cand.collect()}
        hits = len(pairs & planted)
        print(
            f"{bands:>5} x {rows:<4} | {len(pairs):>10} | {hits:>4}/{N_VARIANTS} | "
            f"{'high precision' if rows >= 4 else 'high recall' if rows <= 2 else 'balanced'}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
