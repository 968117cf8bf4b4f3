"""The CDC-mirror example must run green end to end: four audited
change waves, invisible compaction, and a physical GDPR erasure."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from examples.cdc_mirror_pipeline import run_example

SF_DIR = "/root/testdata/sf0.001"


def test_cdc_mirror_example_end_to_end(spark):
    assert run_example(SF_DIR) == 0
