"""The tokenizer-publish example (examples/tokenizer_publish_pipeline.py)
as a test: two tokenizer generations published atomically, the coarser
one strictly shrinking token counts, and both snapshots time-travelable
with token round-trip integrity."""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from examples.tokenizer_publish_pipeline import build_and_publish  # noqa: E402
from dataworks_audit_data_ingest_spark.sinks.snapshots import (  # noqa: E402
    SnapshotTable,
)
from dataworks_audit_data_ingest_spark.tables import table  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def test_tokenizer_publish_pipeline(spark, tmp_path):
    path = str(tmp_path / "tokenized")
    build_and_publish(spark, SF_DIR, path, merge_schedule=(4, 16))

    t = SnapshotTable(path)
    snaps = t.snapshots()
    assert [m["properties"]["n_merges"] for m in snaps] == ["4", "16"]

    v1 = t.read(spark, snaps[0]["snapshot_id"])
    v2 = t.read(spark, snaps[1]["snapshot_id"])
    assert v1.count() == v2.count() > 0

    # more merges => strictly coarser tokenization corpus-wide
    tok1 = v1.agg(F.sum("n_tokens")).first()[0]
    tok2 = v2.agg(F.sum("n_tokens")).first()[0]
    assert tok2 < tok1

    # round trip: tokens concatenate back to the whitespace-stripped text
    texts = {
        r.doc_id: r.text.replace(" ", "")
        for r in table(spark, SF_DIR, "documents").limit(25).collect()
    }
    got = {
        r.doc_id: "".join(r.tokens)
        for r in v2.filter(F.col("doc_id").isin(list(texts))).collect()
    }
    for doc_id, joined in got.items():
        assert joined == texts[doc_id]
    assert got  # quality gate kept at least some probed docs
