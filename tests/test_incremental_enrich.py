"""Skew-aware incremental enrichment (`incremental/enrich.py`): the
standing path that feeds `maybe_salted_join` from a PERSISTED q124-style
report — decision-from-disk (no per-join histogram scan), cadence
refresh, bootstrap, crash-freshness semantics."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.functions import skew as skew_mod
from dataworks_audit_data_ingest_spark.incremental import (
    EnrichmentJoinJob,
    refresh_skew_report,
    run_enriched_incremental,
)
from dataworks_audit_data_ingest_spark.functions.skew import load_skew_milli


def _fixture(spark, tmp_path, hot_day2: bool = True):
    """Two days of fact rows keyed by `k`: day 1 uniform, day 2 with ~90%
    of rows on one hot key (or uniform too when hot_day2=False)."""
    day1 = spark.range(200).select(
        (F.col("id") % 20).alias("k"),
        F.to_timestamp(F.lit("2024-01-01 10:00:00")).alias("ts"),
        F.col("id").alias("v"),
    )
    if hot_day2:
        k2 = F.when(F.col("id") < 180, F.lit(0)).otherwise(F.col("id") % 20)
    else:
        k2 = F.col("id") % 20
    day2 = spark.range(200).select(
        k2.alias("k"),
        F.to_timestamp(F.lit("2024-01-02 10:00:00")).alias("ts"),
        F.col("id").alias("v"),
    )
    src = str(tmp_path / "fact")
    day1.unionByName(day2).write.parquet(src)
    dim = str(tmp_path / "dim")
    spark.range(20).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("weight")
    ).write.parquet(dim)
    return src, dim


def _job(tmp_path, src, dim, **kw):
    return EnrichmentJoinJob(
        source_path=src,
        ts_col="ts",
        dim_path=dim,
        key="k",
        output_path=str(tmp_path / "out"),
        progress_file=str(tmp_path / "progress"),
        skew_report_path=str(tmp_path / "skew_report"),
        **kw,
    )


def test_enrich_joins_correctly_and_commits_days(spark, tmp_path):
    src, dim = _fixture(spark, tmp_path)
    job = _job(tmp_path, src, dim)
    committed = run_enriched_incremental(spark, job)
    assert [d.isoformat() for d in committed] == ["2024-01-01", "2024-01-02"]
    out = spark.read.parquet(job.output_path)
    # every fact row enriched exactly once, values correct
    assert out.count() == 400
    assert out.filter(F.col("weight") != F.col("k") * 10).count() == 0
    # rerun: watermark says nothing new
    assert run_enriched_incremental(spark, job) == []


def test_decision_comes_from_the_persisted_report_not_a_probe(
    spark, tmp_path, monkeypatch
):
    """The whole point of the standing report: after bootstrap, NO run
    ever probes the fact histogram. key_skew_milli (the probe) is
    patched to explode — the job must still run, because
    maybe_salted_join receives the persisted number explicitly."""
    src, dim = _fixture(spark, tmp_path)
    job = _job(tmp_path, src, dim)

    def boom(*a, **kw):  # pragma: no cover - failing is the assertion
        raise AssertionError("histogram probe called — decision not from disk")

    monkeypatch.setattr(skew_mod, "key_skew_milli", boom)
    committed = run_enriched_incremental(spark, job)
    assert len(committed) == 2
    # and the report now standing reflects the LAST processed day (hot)
    assert load_skew_milli(spark, job.skew_report_path) > 10_000


def test_salting_engages_from_yesterdays_report(spark, tmp_path):
    """Day-by-day cadence: run day 1 (uniform report persisted), then the
    hot day 2 arrives. Day 2's decision uses day 1's report (plain join);
    after day 2 commits, the standing report is hot — the NEXT batch
    would salt. Then a day 3 batch must actually produce the salted plan
    from the persisted number."""
    src, dim = _fixture(spark, tmp_path)
    job = _job(tmp_path, src, dim)
    run_enriched_incremental(spark, job)
    assert load_skew_milli(spark, job.skew_report_path) > 10_000  # hot day 2

    # day 3 arrives, uniform rows — but yesterday's (hot) report decides
    spark.range(100).select(
        (F.col("id") % 20).alias("k"),
        F.to_timestamp(F.lit("2024-01-03 10:00:00")).alias("ts"),
        F.col("id").alias("v"),
    ).write.mode("append").parquet(src)

    # capture the join plan the run builds: wrap maybe_salted_join
    plans: list[str] = []
    import dataworks_audit_data_ingest_spark.incremental.enrich as enrich_mod

    real = enrich_mod.maybe_salted_join

    def spy(*a, **kw):
        out = real(*a, **kw)
        plans.append(out._jdf.queryExecution().optimizedPlan().toString())
        return out

    enrich_mod.maybe_salted_join = spy
    try:
        committed = run_enriched_incremental(spark, job)
    finally:
        enrich_mod.maybe_salted_join = real
    assert [d.isoformat() for d in committed] == ["2024-01-03"]
    assert len(plans) == 1 and "_salt" in plans[0]
    # rows still correct under the salted shape
    out = spark.read.parquet(job.output_path)
    assert out.filter(F.col("day") == "2024-01-03").count() == 100
    # and after the uniform day 3, the refreshed report is cool again
    assert load_skew_milli(spark, job.skew_report_path) == 1000


def test_bootstrap_probes_exactly_once_then_persists(spark, tmp_path):
    src, dim = _fixture(spark, tmp_path, hot_day2=False)
    job = _job(tmp_path, src, dim)
    assert not os.path.exists(job.skew_report_path)
    run_enriched_incremental(spark, job)
    assert os.path.exists(job.skew_report_path)
    assert load_skew_milli(spark, job.skew_report_path) == 1000


def test_refresh_is_staged_and_loud_on_missing(spark, tmp_path):
    """refresh_skew_report swaps atomically enough that a reader sees the
    old or the new report; a vanished report raises instead of defaulting
    to 'uniform'."""
    df = spark.range(100).select((F.col("id") % 10).alias("k"))
    path = str(tmp_path / "rep")
    refresh_skew_report(df, "k", path)
    first = load_skew_milli(spark, path)
    hot = spark.range(100).select(
        F.when(F.col("id") < 91, F.lit(0)).otherwise(F.col("id")).alias("k")
    )
    refresh_skew_report(hot, "k", path)
    assert load_skew_milli(spark, path) > first
    # no staged/aside debris
    assert not os.path.exists(path + ".staged")
    assert not os.path.exists(path + ".old")
    with pytest.raises(Exception):
        load_skew_milli(spark, str(tmp_path / "missing"))


def test_swap_crash_windows_are_recoverable(spark, tmp_path):
    """Crash between the two swap renames leaves no report standing;
    recover_skew_report must finish the swap forward when a COMPLETE
    staged report survived, else roll back to the aside copy — and the
    consuming job runs the recovery before every read."""
    import shutil

    from dataworks_audit_data_ingest_spark.incremental import (
        recover_skew_report,
    )

    df = spark.range(100).select((F.col("id") % 10).alias("k"))
    path = str(tmp_path / "rep")
    refresh_skew_report(df, "k", path)
    good = load_skew_milli(spark, path)

    # crash after path->aside, before staged->path, with a COMPLETE stage
    hot = spark.range(100).select(
        F.when(F.col("id") < 91, F.lit(0)).otherwise(F.col("id")).alias("k")
    )
    from dataworks_audit_data_ingest_spark.functions.skew import (
        key_skew_report,
    )

    key_skew_report(hot, "k").coalesce(1).write.parquet(path + ".staged")
    os.rename(path, path + ".old")
    assert recover_skew_report(spark, path)  # completes FORWARD
    assert load_skew_milli(spark, path) > good
    assert not os.path.exists(path + ".staged")
    assert not os.path.exists(path + ".old")

    # crash with an INCOMPLETE stage (no _SUCCESS): roll back to aside
    os.rename(path, path + ".old")
    os.makedirs(path + ".staged")
    assert recover_skew_report(spark, path)  # rolls BACK
    assert load_skew_milli(spark, path) > good  # the previous report
    assert not os.path.exists(path + ".staged")

    # nothing survived at all: recovery reports False (fresh deployment)
    shutil.rmtree(path)
    assert not recover_skew_report(spark, str(tmp_path / "rep"))


def test_enrich_recovers_report_before_reading(spark, tmp_path):
    """A crash-shaped report state at job start (aside only) must not
    silently re-bootstrap: the run restores the previous report and its
    decision comes from it."""
    src, dim = _fixture(spark, tmp_path)
    job = _job(tmp_path, src, dim)
    run_enriched_incremental(spark, job)
    before = load_skew_milli(spark, job.skew_report_path)
    # simulate the crash window, then a new day arrives
    os.rename(job.skew_report_path, job.skew_report_path + ".old")
    spark.range(40).select(
        (F.col("id") % 20).alias("k"),
        F.to_timestamp(F.lit("2024-01-03 10:00:00")).alias("ts"),
        F.col("id").alias("v"),
    ).write.mode("append").parquet(src)
    committed = run_enriched_incremental(spark, job)
    assert len(committed) == 1
    # recovery restored the old report; after the uniform day 3 the
    # refresh has replaced it
    assert load_skew_milli(spark, job.skew_report_path) == 1000
    assert before > 10_000


def test_hook_failure_does_not_abort_remaining_days(spark, tmp_path):
    """run_incremental's post-commit hook is advisory: a raising hook is
    logged and the remaining backlog still processes, with every
    committed day reported to the caller."""
    from dataworks_audit_data_ingest_spark.incremental import (
        IncrementalJob,
        run_incremental,
    )

    src, _ = _fixture(spark, tmp_path)
    out = str(tmp_path / "out_hook")
    calls = []

    def bad_hook(day, day_df):
        calls.append(day)
        raise RuntimeError("transient FS error")

    committed = run_incremental(
        spark,
        IncrementalJob(
            source_path=src,
            ts_col="ts",
            output_path=out,
            progress_file=str(tmp_path / "wm_hook"),
            transform=lambda df: df,
            on_day_committed=bad_hook,
        ),
    )
    assert len(committed) == 2  # both fixture days, despite hook failures
    assert len(calls) == 2
    assert spark.read.parquet(out).count() == 400


def test_noop_run_does_not_touch_dim(spark, tmp_path):
    """A run with nothing past the watermark must neither read nor
    require the dimension path."""
    import shutil

    src, dim = _fixture(spark, tmp_path)
    job = _job(tmp_path, src, dim)
    run_enriched_incremental(spark, job)
    shutil.rmtree(dim)  # dim gone; the no-op run must not care
    assert run_enriched_incremental(spark, job) == []
