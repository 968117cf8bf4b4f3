"""The feature→split→fit→readout example as a test: leakage-free inputs,
hash-stable split, train-only fit, and a sane held-out readout."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from examples.feature_model_pipeline import run  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def test_feature_model_journey(spark):
    out = run(spark, SF_DIR)
    assert out["n"] == out["n_train"] + out["n_test"]
    assert 0 < out["n_test"] < out["n_train"]  # ~80/20 hash split
    assert out["mae_cents"] >= 0
    assert sum(r.n for r in out["calibration"]) == out["n_test"]
    # rerun: identical fit (pure function of the fixtures)
    out2 = run(spark, SF_DIR)
    assert (out2["slope_milli"], out2["intercept_cents"]) == (
        out["slope_milli"],
        out["intercept_cents"],
    )
