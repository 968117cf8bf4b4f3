"""The incremental-maintenance example (examples/
incremental_dedup_maintenance.py) run end to end: daily CDC dedup with a
re-crawl day, store compaction past the replay horizon, and the
skew-report-fed join decision."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from examples.incremental_dedup_maintenance import run  # noqa: E402


def test_example_runs_and_audits_correctly(spark, tmp_path):
    out = run(spark, str(tmp_path))
    d1, d2, d3 = out["days"]
    # fresh days keep everything; the re-crawl day keeps nothing
    assert d1["kept_novel_docs"] == d1["docs"] > 0
    assert d2["kept_novel_docs"] == d2["docs"] > 0
    assert d3["docs"] == d1["docs"] and d3["kept_novel_docs"] == 0
    assert d3["novel_chunks"] == 0
    # the two pre-horizon days folded; the newest stayed replayable
    assert out["folded_partitions"] == 2
    # the 90%-hot key engaged salting through the persisted report
    assert out["skew_milli"] > 10_000 and out["salted"]
    assert out["joined_rows"] > 0
