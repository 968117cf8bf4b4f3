"""Incremental near-dup detection against the persistent signature store."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.tables import table
from dataworks_audit_data_ingest_spark.text.incremental_dedup import (
    incremental_dedup_batch,
)

SF = "/root/testdata/sf0.001"


def _doc(i, text):
    return (i, text)


def test_cross_batch_near_dup_detected_without_rereading_text(spark, tmp_path):
    store = str(tmp_path / "sigstore")
    docs = table(spark, SF, "documents").filter(F.size(F.split("text", " ")) > 8)

    batch1 = docs.filter(F.col("doc_id") < 40).select("doc_id", "text")
    n1 = batch1.count()
    uniq1, dups1 = incremental_dedup_batch(spark, store, batch1, "b1")
    # the fixture has organic near-dup pairs; uniques = batch minus dropped
    n_dropped1 = dups1.select("doc_b").distinct().count()
    assert uniq1.count() == n1 - n_dropped1

    # batch 2: brand-new docs + a trailing-words variant of a batch-1 doc
    variant = batch1.limit(1).select(
        (F.col("doc_id") + 5000).alias("doc_id"),
        F.expr(
            "ARRAY_JOIN(SLICE(SPLIT(text, ' '), 1, SIZE(SPLIT(text, ' ')) - 3), ' ')"
        ).alias("text"),
    )
    fresh = docs.filter(
        (F.col("doc_id") >= 40) & (F.col("doc_id") < 60)
    ).select("doc_id", "text")
    batch2 = fresh.unionByName(variant)
    orig_id = batch1.limit(1).first().doc_id

    uniq2, dups2 = incremental_dedup_batch(spark, store, batch2, "b2")
    pairs = {(r.doc_a, r.doc_b) for r in dups2.collect()}
    assert (orig_id, orig_id + 5000) in pairs
    uniq_ids = {r.doc_id for r in uniq2.select("doc_id").collect()}
    assert orig_id + 5000 not in uniq_ids

    # store now holds both batches' bands, partitioned by batch_id
    stored = spark.read.parquet(store)
    assert set(r.batch_id for r in stored.select("batch_id").distinct().collect()) == {
        "b1",
        "b2",
    }


def test_batch_rerun_is_idempotent(spark, tmp_path):
    store = str(tmp_path / "sigstore2")
    docs = (
        table(spark, SF, "documents")
        .filter((F.col("doc_id") < 30) & (F.size(F.split("text", " ")) > 8))
        .select("doc_id", "text")
    )
    incremental_dedup_batch(spark, store, docs, "b1")
    n_after_first = spark.read.parquet(store).count()
    # crash-and-retry: the same batch id runs again — no duplicate bands
    incremental_dedup_batch(spark, store, docs, "b1")
    assert spark.read.parquet(store).count() == n_after_first
