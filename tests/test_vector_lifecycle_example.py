"""The vector-index lifecycle example run end to end: quiet on
in-distribution traffic, fires on drift, retrains into a new generation
that is quiet again, and both generations answer IVF queries."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from examples.vector_index_lifecycle import TOP_K, run  # noqa: E402


def test_lifecycle_example(spark, tmp_path):
    out = run(spark, str(tmp_path))
    assert out["baseline1_milli"] > 0
    assert out["quiet_in_distribution"]
    assert out["fired_on_drift"]
    # both the fresh half and the drifted batch were indexed under gen 1
    assert out["gen1_rows"] > 0
    assert out["gen1_hits"] == TOP_K * TOP_K
    # gen 2 absorbed the drift: quiet under its own baseline
    assert out["quiet_after_retrain"]
    assert out["gen2_hits"] == TOP_K * TOP_K
