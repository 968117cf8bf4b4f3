"""The contract-gated publish example as a test: clean batches commit,
corrupted batches are refused with the offending rules named, and the
published snapshot is untouched by a refusal."""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from examples.contract_gated_publish import gated_commit  # noqa: E402
from dataworks_audit_data_ingest_spark.sinks.snapshots import (  # noqa: E402
    SnapshotTable,
)
from dataworks_audit_data_ingest_spark.tables import table  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def test_gate_commits_clean_and_refuses_corrupt(spark, tmp_path):
    good = table(spark, SF_DIR, "documents")
    t = SnapshotTable(str(tmp_path / "published"))

    ok, failed = gated_commit(t, good)
    assert ok and failed == []
    head = t.current_snapshot_id()
    n_good = t.read(spark).count()

    bad = good.unionByName(good.limit(1)).unionByName(
        good.limit(1).select(
            F.lit(None).cast("bigint").alias("doc_id"),
            "text",
            "lang",
            "source",
            (F.col("n_chars") + 7).alias("n_chars"),
        )
    )
    ok, failed = gated_commit(t, bad)
    assert not ok
    assert sorted(r.expectation for r in failed) == [
        "chars_match_text",
        "not_null(doc_id)",
        "unique(doc_id)",
    ]
    assert t.current_snapshot_id() == head
    assert t.read(spark).count() == n_good
