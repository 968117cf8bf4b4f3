"""Incremental analytics runner: strict-> resume, per-day idempotent
append, arriving-data pickup."""

from __future__ import annotations

from datetime import date

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.incremental import (
    IncrementalJob,
    run_incremental,
)
from dataworks_audit_data_ingest_spark.tables import table

SF = "/root/testdata/sf0.001"


def _daily_rollup(day_df):
    return day_df.groupBy("day", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
    )


def test_incremental_processes_then_resumes(spark, tmp_path):
    ev = table(spark, SF, "events")
    src = str(tmp_path / "src")
    # first arrival: days 1-10 of January
    ev.filter(F.dayofmonth("ts") <= 10).write.parquet(src)
    job = IncrementalJob(
        source_path=src,
        ts_col="ts",
        output_path=str(tmp_path / "rollup"),
        progress_file=str(tmp_path / "wm.txt"),
        transform=_daily_rollup,
    )
    first = run_incremental(spark, job)
    assert first and first[-1] == date(2024, 1, 10)
    out1 = spark.read.parquet(job.output_path)
    days1 = {r.day for r in out1.select("day").distinct().collect()}
    assert max(days1) == date(2024, 1, 10)

    # nothing new ⇒ no work
    assert run_incremental(spark, job) == []

    # late arrival of days 11-12 ⇒ exactly those are processed and appended
    ev.filter(F.dayofmonth("ts").between(11, 12)).write.mode("append").parquet(src)
    second = run_incremental(spark, job)
    assert second == [date(2024, 1, 11), date(2024, 1, 12)]
    out2 = spark.read.parquet(job.output_path)
    days2 = {r.day for r in out2.select("day").distinct().collect()}
    assert days2 == days1 | {date(2024, 1, 11), date(2024, 1, 12)}

    # totals equal the one-shot batch rollup over the same horizon
    want = (
        ev.filter(F.dayofmonth("ts") <= 12)
        .withColumn("day", F.date_trunc("day", "ts").cast("date"))
        .groupBy("day", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    got = {(r.day, r.event_type): r.n_events for r in out2.collect()}
    for r in want.collect():
        assert got[(r.day, r.event_type)] == r.n_events
