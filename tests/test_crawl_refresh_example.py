"""The crawl-refresh example: boilerplate crosses its threshold
mid-history, re-crawls are caught cross-batch, stores compact, and the
cluster-inherited split leaks nothing."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

from crawl_refresh_pipeline import BP_MIN_DOCS, N_SHARDS, run


def test_crawl_refresh_pipeline(spark, tmp_path):
    out = run(spark, str(tmp_path))
    # day 1 is below the df threshold (42 < 60) so the template survives;
    # day 2's accumulated evidence (84) convicts it from then on
    day1, day2, day3 = out["template_kept_per_day"]
    assert day1 > 0 and day2 == 0 and day3 == 0
    assert BP_MIN_DOCS == 60
    # every re-crawled page (fresh id, truncated tail) is flagged against
    # the signature store without re-reading day-1 text
    assert out["recrawl_dups_caught"] == 30
    assert out["n_unique"] > 0
    # the retroactive pass scrubs day 1's shipped template copies: the
    # archive converges even though the live batches couldn't convict yet
    assert out["recurated_docs"] > 0
    assert out["template_in_archive"] == 0
    # compaction folds the two closed days; the replayable day stays
    assert out["bp_partitions_folded"] == 2
    assert out["sig_partitions_folded"] == 2
    # cluster-inherited split: non-degenerate and leak-free by construction
    assert out["n_train"] > 0 and out["n_eval"] > 0
    assert out["n_train"] + out["n_eval"] == out["n_unique"]
    assert out["split_leaked_pairs"] == 0
    assert out["shard_rows"] == out["n_train"]
    assert out["shards_verified"]
    assert N_SHARDS == 4
