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
        "volume",
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


def test_volume_panel_from_rollup_store_matches_direct(spark, tmp_path):
    """The store-served volume panel is row-identical to the direct
    one-pass aggregate (the refresh never re-scans the event history)."""
    from pyspark.sql import functions as F

    from dataworks_audit_data_ingest_spark.incremental.rollup import (
        update_rollup_store,
    )
    from dataworks_audit_data_ingest_spark.tables import table
    from examples.event_analytics_dashboard import build_volume_panel

    store = str(tmp_path / "rollup")
    ev = table(spark, SF_DIR, "events")
    for i in range(2):
        update_rollup_store(
            spark,
            store,
            ev.filter(F.pmod(F.xxhash64("event_id"), F.lit(2)) == i),
            str(i),
        )
    direct = build_volume_panel(spark, SF_DIR)
    served = build_volume_panel(spark, SF_DIR, rollup_store=store)
    assert [tuple(r) for r in served] == [tuple(r) for r in direct]
    assert direct
