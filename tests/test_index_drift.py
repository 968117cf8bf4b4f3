"""Index drift monitor (`streaming/index_job.py::should_retrain`): quality
records land per batch and replay-idempotently, the retrain decision
consumes only the persisted store, stays quiet on in-distribution
traffic, and fires on a genuinely shifted distribution."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.similarity.kmeans import (
    assign_cells,
    train_cells,
)
from dataworks_audit_data_ingest_spark.streaming import index_job
from dataworks_audit_data_ingest_spark.streaming.index_job import (
    index_microbatch,
    quality_milli,
    should_retrain,
)
from dataworks_audit_data_ingest_spark.tables import table

SF = "/root/testdata/sf0.001"


def _pts(df):
    return df.select(
        F.col("vec_id").alias("id"),
        F.expr("TRANSFORM(embedding, x -> CAST(x AS DOUBLE))").alias("vec"),
    )


def _shifted(df, offset: float):
    return df.select(
        "vec_id",
        F.expr(
            f"TRANSFORM(embedding, x -> CAST(x AS DOUBLE) + {offset})"
        ).alias("embedding"),
    )


@pytest.fixture(scope="module")
def trained(spark):
    emb = table(spark, SF, "embeddings").select(
        "vec_id", F.expr("TRANSFORM(embedding, x -> CAST(x AS DOUBLE))").alias("embedding")
    )
    _, centroids = train_cells(emb, k=4, n_iter=2)
    baseline = quality_milli(assign_cells(_pts(emb), centroids))
    return emb, centroids, baseline


def _drive(spark, emb, centroids, root, batches, quality=True):
    per = 20
    for i, b in enumerate(batches):
        index_microbatch(
            b.limit(per * 100),
            i,
            centroids,
            f"{root}/index",
            quality_dir=f"{root}/quality" if quality else None,
        )


def test_in_distribution_traffic_does_not_fire(spark, tmp_path, trained):
    emb, centroids, baseline = trained
    root = str(tmp_path / "idx")
    halves = [
        emb.filter(F.col("vec_id") % 2 == 0),
        emb.filter(F.col("vec_id") % 2 == 1),
    ]
    _drive(spark, emb, centroids, root, halves)
    assert baseline > 0
    assert not should_retrain(spark, f"{root}/quality", baseline)


def test_shifted_distribution_fires(spark, tmp_path, trained):
    emb, centroids, baseline = trained
    root = str(tmp_path / "idx")
    _drive(
        spark,
        emb,
        centroids,
        root,
        [emb.filter(F.col("vec_id") % 2 == 0), _shifted(emb, 5.0)],
    )
    assert should_retrain(spark, f"{root}/quality", baseline, window=1)


def test_decision_consumes_only_the_persisted_store(
    spark, tmp_path, trained, monkeypatch
):
    """should_retrain must never re-assign or rescan: with assign_cells
    broken after the records are written, the decision still runs."""
    emb, centroids, baseline = trained
    root = str(tmp_path / "idx")
    _drive(spark, emb, centroids, root, [emb])

    def boom(*a, **k):  # pragma: no cover - called == test failure
        raise AssertionError("decision path re-assigned vectors")

    monkeypatch.setattr(index_job, "assign_cells", boom)
    assert not should_retrain(spark, f"{root}/quality", baseline)


def test_quality_record_replay_is_idempotent(spark, tmp_path, trained):
    emb, centroids, baseline = trained
    root = str(tmp_path / "idx")
    _drive(spark, emb, centroids, root, [emb, _shifted(emb, 5.0)])
    before = sorted(
        map(tuple, spark.read.parquet(f"{root}/quality").collect())
    )
    # replay batch 1 with identical contents
    index_microbatch(
        _shifted(emb, 5.0).limit(2000),
        1,
        centroids,
        f"{root}/index",
        quality_dir=f"{root}/quality",
    )
    after = sorted(
        map(tuple, spark.read.parquet(f"{root}/quality").collect())
    )
    assert after == before


def test_missing_store_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="no quality records"):
        should_retrain(spark, str(tmp_path / "missing"), 100)
