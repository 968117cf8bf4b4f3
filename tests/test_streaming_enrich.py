"""Streaming skew-aware enrichment (`streaming/enrich_job.py`): the
foreachBatch twin of the incremental rung — decision from the PERSISTED
report (no per-batch histogram scan), per-batch refresh, bootstrap,
batch_id-partitioned exactly-once output, crash-window recovery."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.functions import skew as skew_mod
from dataworks_audit_data_ingest_spark.incremental.enrich import (
    recover_skew_report,
    refresh_skew_report,
)
from dataworks_audit_data_ingest_spark.functions.skew import load_skew_milli
from dataworks_audit_data_ingest_spark.streaming.enrich_job import (
    start_enriched_stream,
)

FACT_SCHEMA = "k long, v long"


def _write_facts(src_dir, name: str, rows) -> None:
    (src_dir / name).write_text(
        "\n".join(json.dumps(r) for r in rows) + "\n"
    )


def _uniform(n=60, keys=20, v0=0):
    return [{"k": i % keys, "v": v0 + i} for i in range(n)]


def _hot(n=200, v0=10_000):
    # ~90% of rows on key 0
    return [
        {"k": 0 if i < 180 else i % 20, "v": v0 + i} for i in range(n)
    ]


def _setup(spark, tmp_path):
    src = tmp_path / "facts_src"
    src.mkdir()
    dim_path = str(tmp_path / "dim")
    spark.range(20).select(
        F.col("id").alias("k"),
        F.concat(F.lit("name_"), F.col("id")).alias("name"),
    ).write.parquet(dim_path)
    return src, dim_path


def _run_once(spark, src, dim_path, tmp_path, **kw):
    stream = (
        spark.readStream.schema(FACT_SCHEMA).format("json").load(str(src))
    )
    q = start_enriched_stream(
        stream,
        dim_path,
        "k",
        str(tmp_path / "out"),
        str(tmp_path / "skew_report"),
        str(tmp_path / "ckpt"),
        **kw,
    )
    q.awaitTermination(300)


def test_stream_enrich_decides_from_persisted_report(spark, tmp_path):
    """Three single-file invocations against one checkpoint:

    - batch 0 (uniform) bootstraps the report and joins plain;
    - batch 1 (hot) still joins plain — its decision comes from batch 0's
      UNIFORM persisted report, proving decision-from-disk;
    - batch 2 (uniform) joins SALTED — batch 1's hot histogram is now the
      standing report.

    The per-batch probe function is patched to raise, so any histogram
    scan in the decision path fails the test outright; salted_join is
    wrapped with a recorder to observe which branch engaged."""
    src, dim_path = _setup(spark, tmp_path)

    probes = []
    real_salted = skew_mod.salted_join
    orig_milli = skew_mod.key_skew_milli
    try:
        skew_mod.key_skew_milli = lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("histogram probe in the streaming decision path")
        )

        def recording_salted(*a, **k):
            probes.append("salted")
            return real_salted(*a, **k)

        skew_mod.salted_join = recording_salted

        _write_facts(src, "f0.json", _uniform(v0=0))
        _run_once(spark, src, dim_path, tmp_path)
        assert probes == []  # uniform report -> plain join
        report = str(tmp_path / "skew_report")
        assert load_skew_milli(spark, report) < 10_000

        _write_facts(src, "f1.json", _hot())
        _run_once(spark, src, dim_path, tmp_path)
        assert probes == []  # decision used batch 0's UNIFORM report
        assert load_skew_milli(spark, report) > 10_000  # refreshed hot

        _write_facts(src, "f2.json", _uniform(v0=20_000))
        _run_once(spark, src, dim_path, tmp_path)
        assert probes == ["salted"]  # batch 1's hot report salted batch 2
    finally:
        skew_mod.salted_join = real_salted
        skew_mod.key_skew_milli = orig_milli

    out = spark.read.parquet(str(tmp_path / "out"))
    # every fact row joined exactly once, correctly, across all branches
    assert out.count() == 60 + 200 + 60
    assert out.filter(F.col("name") != F.concat(F.lit("name_"), "k")).count() == 0
    # three batch partitions landed
    # (a raw root read type-infers the partition value as int — fine for a
    # test assertion; production readers select partition dirs by path)
    batches = {
        int(r["batch_id"]) for r in out.select("batch_id").distinct().collect()
    }
    assert batches == {0, 1, 2}


def test_stream_enrich_recovers_crashed_swap_and_replays_idempotently(
    spark, tmp_path
):
    """An aside-only report state (crash inside the swap window) at stream
    start is repaired, not re-bootstrapped; and re-running the stream on
    the same checkpoint with no new files changes nothing."""
    src, dim_path = _setup(spark, tmp_path)
    report = str(tmp_path / "skew_report")

    _write_facts(src, "f0.json", _hot())
    _run_once(spark, src, dim_path, tmp_path)
    hot_milli = load_skew_milli(spark, report)
    assert hot_milli > 10_000

    # simulate the crash window: report renamed aside, no staged copy
    import os

    os.rename(report, report + ".old")
    assert recover_skew_report(spark, report)
    assert load_skew_milli(spark, report) == hot_milli

    # idempotent replay: same checkpoint, no new data -> output unchanged
    before = spark.read.parquet(str(tmp_path / "out")).count()
    _run_once(spark, src, dim_path, tmp_path)
    assert spark.read.parquet(str(tmp_path / "out")).count() == before


def test_stream_enrich_transform_applies_per_batch(spark, tmp_path):
    """The optional transform runs on the joined frame before landing."""
    src, dim_path = _setup(spark, tmp_path)
    _write_facts(src, "f0.json", _uniform())
    _run_once(
        spark,
        src,
        dim_path,
        tmp_path,
        transform=lambda df: df.filter(F.col("k") < 5),
    )
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 60 * 5 // 20
    assert out.agg(F.max("k")).collect()[0][0] == 4


def test_refresh_skew_report_survives_missing_seed(spark, tmp_path):
    """refresh + reload round-trips through the shared report helpers the
    stream relies on (guards the import surface of report_exists)."""
    from dataworks_audit_data_ingest_spark.incremental import report_exists

    path = str(tmp_path / "rep")
    assert not report_exists(spark, path)
    df = spark.range(50).select((F.col("id") % 5).alias("k"))
    refresh_skew_report(df, "k", path)
    assert report_exists(spark, path)
    assert load_skew_milli(spark, path) == 1000
