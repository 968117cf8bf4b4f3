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
