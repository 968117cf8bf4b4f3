"""The analytics-dashboard example as a test: all five panels build, and
the example's own invariants (funnel monotone, PageRank mass bound,
rolling >= daily actives) hold at fixture scale."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from examples.event_analytics_dashboard import build_dashboard  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def test_dashboard_panels_and_invariants(spark):
    panels = build_dashboard(spark, SF_DIR)
    assert set(panels) == {
        "funnel", "transitions", "pagerank", "actives", "anomalies",
    }
    [funnel] = panels["funnel"]
    assert (
        funnel.n_view
        >= funnel.n_click_after_view
        >= funnel.n_purchase_after_click
    )
    total = sum(r.rank_scaled for r in panels["pagerank"])
    assert 10**11 < total <= 10**12
    for r in panels["actives"]:
        assert r.rolling3_users >= r.dau_users * 0.9
    assert len(panels["transitions"]) > 0
