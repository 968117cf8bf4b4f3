"""The CDC-replication example must run green end to end: shipped
signed feeds, a lost-partition corruption localized and repaired with
z-set corrections, and a crash-interrupted GDPR erasure recovered from
the durable intent then propagated to the replica."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from examples.cdc_replication_pipeline import run_example

SF_DIR = "/root/testdata/sf0.001"


def test_cdc_replication_example_end_to_end(spark):
    assert run_example(SF_DIR) == 0
