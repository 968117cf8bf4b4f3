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


def build_volume_panel(spark, sf_dir: str, rollup_store: str | None = None):
    """Day × type volume (events, exact users, cents): served FROM the
    maintained rollup store when one is passed — the dashboard refresh
    then reads grain rows instead of re-scanning the event history (the
    whole point of `incremental/rollup.py` at 100 TB); without a store it
    falls back to the direct one-pass aggregate. Both forms return the
    same rows (the example's test pins it; q254 pins the store path
    against the DuckDB oracle)."""
    from pyspark.sql import functions as F

    from dataworks_audit_data_ingest_spark.incremental.rollup import (
        read_rollup,
    )
    from dataworks_audit_data_ingest_spark.tables import table

    if rollup_store is not None:
        rep = read_rollup(spark, rollup_store)
        if rep is not None:
            return rep.orderBy("day", "event_type").collect()
    cents = F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)")
    return (
        table(spark, sf_dir, "events")
        .select(
            F.to_date("ts").alias("day"),
            "event_type",
            "user_id",
            cents.alias("cents"),
        )
        .groupBy("day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum("cents").alias("sum_cents"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
        .orderBy("day", "event_type")
        .collect()
    )


def build_dashboard(spark, sf_dir: str, rollup_store: str | None = None) -> dict:
    """Materialize the panels; returns {panel: rows}. Pass the path of a
    maintained rollup store to serve the volume panel from it."""
    run = lambda name: REGISTRY[name].fn(spark, sf_dir).collect()
    return {
        "funnel": run("q101_funnel"),
        "transitions": run("q102_event_transitions"),
        "pagerank": run("q106_event_pagerank"),
        "actives": run("q120_rolling_active_users"),
        "anomalies": run("q116_traffic_anomaly"),
        "volume": build_volume_panel(spark, sf_dir, rollup_store),
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
    print(f"volume panel: {len(panels['volume'])} day×type rows "
          "(pass a rollup-store path to serve this panel from "
          "maintained state instead of an event-history scan)")


if __name__ == "__main__":
    main()
