"""The skew-aware curation pipeline example run end to end: persisted
skew report feeds the enrichment join, the q176 containment composition
curates, and the curated corpus lands as verified training shards."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from examples.skew_aware_curation_pipeline import N_SHARDS, run  # noqa: E402


def test_example_runs_and_audits_correctly(spark, tmp_path):
    out = run(spark, str(tmp_path))
    assert out["days_committed"] == ["2026-08-11", "2026-08-12"]
    # the report standing at the end reflects the last (hot-keyed) day
    assert out["skew_milli"] > 1000
    # enrichment is row-preserving (every arrival matched a dim row)
    assert out["enriched_rows"] == out["n_input"] > 0
    # curation monotonically narrows: blocked <= survivors <= curated
    assert out["n_blocked"] > 0
    assert out["n_survivors"] <= out["n_input"] - out["n_blocked"]
    assert 0 < out["n_curated"] <= out["n_survivors"]
    # shards hold exactly the curated corpus and verify against manifest
    assert out["shard_rows"] == out["n_curated"]
    assert out["shards_verified"]
    assert len(out["epoch1_first_ids"]) == 3
    assert N_SHARDS == 4
