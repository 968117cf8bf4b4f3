"""End-to-end drill of examples/streaming_enrichment_pipeline.py: the
fact stream enriches through the persisted skew report, the reservoir
tracks everything enriched, and the one-cadence report lag shows up in
the per-wave skew_milli audit."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from examples.streaming_enrichment_pipeline import RESERVOIR_K, run


def test_streaming_enrichment_pipeline(spark, tmp_path):
    audit = run(spark, str(tmp_path))

    # three waves of 200 facts, each joined exactly once and correctly
    assert audit["enriched_rows"] == 600
    assert audit["join_correct"] is True

    # the one-cadence report lag: after the uniform wave the report is
    # uniform; after the hot wave it is hot; wave 3's refresh makes it
    # uniform again
    milli = [w["skew_milli_after"] for w in audit["waves"]]
    assert milli[0] < 10_000
    assert milli[1] > 10_000
    assert milli[2] < 10_000

    # the reservoir holds exactly k rows and is weight-biased (heavier
    # rows oversampled relative to the corpus mean)
    assert audit["reservoir_rows"] == RESERVOIR_K
    assert audit["reservoir_mean_weight"] > audit["corpus_mean_weight"]
