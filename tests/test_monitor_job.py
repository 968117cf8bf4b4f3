"""Streaming traffic monitor: cell store accumulates per batch, alerts
fire against prior-batch baselines only, replays are idempotent, and an
engineered volume spike raises a volume_anomaly."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.streaming.monitor_job import (
    batch_cells,
    monitor_microbatch,
)


def _events(spark, day, n, event_type="click", hour=9):
    rows = [
        (i, datetime(2026, 3, day, hour, i % 60), event_type) for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, event_type string"
    )


def test_first_batch_alerts_new_cells_and_seeds_store(spark, tmp_path):
    store, alerts = str(tmp_path / "cells"), str(tmp_path / "alerts")
    monitor_microbatch(_events(spark, 1, 50), 0, store, alerts)
    a = spark.read.parquet(alerts).collect()
    assert {r.alert for r in a} == {"new_cell"}
    cells = spark.read.parquet(store).collect()
    assert len(cells) == 1 and cells[0].n_events == 50


def test_steady_traffic_is_quiet_and_spike_alerts(spark, tmp_path):
    store, alerts = str(tmp_path / "cells"), str(tmp_path / "alerts")
    monitor_microbatch(_events(spark, 1, 50), 0, store, alerts)
    # same cell shape, similar volume: inside the ±50 % band -> no alert
    monitor_microbatch(_events(spark, 2, 55), 1, store, alerts)
    quiet = (
        spark.read.parquet(alerts).filter(F.col("batch_id") == "1").collect()
    )
    assert quiet == []
    # 4x spike -> volume_anomaly with the deviation recorded
    monitor_microbatch(_events(spark, 3, 200), 2, store, alerts)
    spike = (
        spark.read.parquet(alerts).filter(F.col("batch_id") == "2").collect()
    )
    assert len(spike) == 1
    assert spike[0].alert == "volume_anomaly"
    assert spike[0].dev_pct > 50

    # the store holds every batch's cells exactly once
    assert spark.read.parquet(store).count() == 3


def test_replay_is_idempotent_and_baseline_excludes_self(spark, tmp_path):
    store, alerts = str(tmp_path / "cells"), str(tmp_path / "alerts")
    monitor_microbatch(_events(spark, 1, 50), 0, store, alerts)
    monitor_microbatch(_events(spark, 3, 200), 1, store, alerts)
    first = sorted(map(tuple, spark.read.parquet(alerts).collect()))
    # replay batch 1: its own first-run cells are in the store, but the
    # baseline read excludes batch_id=1, so the alert decision repeats
    monitor_microbatch(_events(spark, 3, 200), 1, store, alerts)
    again = sorted(map(tuple, spark.read.parquet(alerts).collect()))
    assert first == again
    assert spark.read.parquet(store).count() == 2


def test_batch_cells_collapse(spark):
    df = _events(spark, 1, 30).union(_events(spark, 1, 10, hour=10))
    got = {(r.hr, r.n_events) for r in batch_cells(df).collect()}
    assert got == {(9, 30), (10, 10)}


# ---------------------------------------------------------------------------
# q155 CUSUM — closed-form window identity vs the sequential recursion
# ---------------------------------------------------------------------------


def test_cusum_closed_form_equals_recursion(spark):
    """The query computes S_t = RS_t − min(0, min_{j≤t} RS_j); the textbook
    definition is the recursion S_t = max(0, S_{t-1} + x_t − μ − κ).
    Recompute the recursion in Python from the same daily series and
    compare the per-type maxima and alarm counts the query reports."""
    import math

    from pyspark.sql import functions as F

    from dataworks_audit_data_ingest_spark.queries import REGISTRY
    from dataworks_audit_data_ingest_spark.tables import table

    sf = "/root/testdata/sf0.001"
    ev = table(spark, sf, "events")
    daily = (
        ev.groupBy(
            "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
        )
        .agg(
            F.sum(F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)")).alias(
                "cents"
            )
        )
        .collect()
    )
    series = {}
    for r in daily:
        series.setdefault(r.event_type, []).append((r.day, r.cents))
    want = {}
    for t, pts in series.items():
        pts.sort()
        mu = sum(c for _, c in pts) // len(pts)
        k, h = mu // 20, mu // 4
        s, mx, alarms, first = 0, 0, 0, None
        for day, c in pts:
            s = max(0, s + c - mu - k)
            mx = max(mx, s)
            if s > h:
                alarms += 1
                first = first or day
        want[t] = (len(pts), mx, alarms, first)
    got = {
        r.event_type: (r.n_days, r.max_cusum_cents, r.n_alarm_days, r.first_alarm_day)
        for r in REGISTRY["q155_cusum_drift"].fn(spark, sf).collect()
    }
    assert got == want


def test_cusum_detects_planted_drift(spark):
    """A level shift half-way through the series must alarm after the
    shift and not before — the property the stationary fixture cannot
    exhibit. Runs the same closed-form window expressions on an
    engineered daily table."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = [("m", f"2024-01-{d:02d}", 1000 if d <= 15 else 1400) for d in range(1, 31)]
    daily = spark.createDataFrame(rows, "event_type string, day string, cents long")
    mu = daily.groupBy("event_type").agg(
        F.expr("SUM(cents) DIV COUNT(*)").alias("mu_cents")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    rs = daily.join(F.broadcast(mu), "event_type").withColumn(
        "run_sum",
        F.sum(
            F.col("cents") - F.col("mu_cents") - F.expr("mu_cents DIV 20")
        ).over(w),
    )
    cusum = rs.withColumn(
        "s", F.col("run_sum") - F.least(F.min("run_sum").over(w), F.lit(0))
    ).withColumn("alarm", F.col("s") > F.expr("mu_cents DIV 4"))
    out = {r.day: r.alarm for r in cusum.collect()}
    assert not any(out[d] for d in sorted(out)[:15])  # quiet before the shift
    assert any(out[d] for d in sorted(out)[16:])      # alarms after it
