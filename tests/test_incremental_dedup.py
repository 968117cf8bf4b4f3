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
    uniq1, _ = incremental_dedup_batch(spark, store, docs, "b1")
    ids_first = {r.doc_id for r in uniq1.select("doc_id").collect()}
    n_after_first = spark.read.parquet(store).count()
    # crash-and-retry: the same batch id runs again after its store write
    # already succeeded. The replay must NOT self-match against its own
    # stored bands — unique_docs is identical, and the store row count is
    # unchanged (partition overwrite, no duplicate bands).
    uniq2, _ = incremental_dedup_batch(spark, store, docs, "b1")
    ids_replay = {r.doc_id for r in uniq2.select("doc_id").collect()}
    assert ids_replay == ids_first
    assert len(ids_replay) > 0
    assert spark.read.parquet(store).count() == n_after_first


def test_batch_rerun_after_partial_failure_still_drops_cross_batch_dups(
    spark, tmp_path
):
    """Replay of b2 (store write succeeded, sink write did not) must still
    detect b2's duplicates against b1 — excluding b2's own partition from
    the store read must not exclude anyone else's."""
    store = str(tmp_path / "sigstore3")
    docs = table(spark, SF, "documents").filter(F.size(F.split("text", " ")) > 8)
    batch1 = docs.filter(F.col("doc_id") < 40).select("doc_id", "text")
    incremental_dedup_batch(spark, store, batch1, "b1")

    variant = batch1.limit(1).select(
        (F.col("doc_id") + 5000).alias("doc_id"),
        F.expr(
            "ARRAY_JOIN(SLICE(SPLIT(text, ' '), 1, SIZE(SPLIT(text, ' ')) - 3), ' ')"
        ).alias("text"),
    )
    orig_id = batch1.limit(1).first().doc_id
    fresh = docs.filter(
        (F.col("doc_id") >= 40) & (F.col("doc_id") < 60)
    ).select("doc_id", "text")
    batch2 = fresh.unionByName(variant)

    uniq_first, dups_first = incremental_dedup_batch(spark, store, batch2, "b2")
    ids_first = {r.doc_id for r in uniq_first.select("doc_id").collect()}
    pairs_first = {(r.doc_a, r.doc_b) for r in dups_first.collect()}
    assert (orig_id, orig_id + 5000) in pairs_first

    # replay: same result, cross-batch dup still caught
    uniq_replay, dups_replay = incremental_dedup_batch(spark, store, batch2, "b2")
    assert {r.doc_id for r in uniq_replay.select("doc_id").collect()} == ids_first
    assert {(r.doc_a, r.doc_b) for r in dups_replay.collect()} == pairs_first


def test_streaming_curation_dedups_across_microbatches(spark, tmp_path):
    """Two files x maxFilesPerTrigger=1 => two micro-batches; a near-dup of
    a batch-1 doc arriving in batch 2 must be dropped by the signature
    store even though Spark's own state never saw batch 1."""
    import json

    from dataworks_audit_data_ingest_spark.streaming.curation_job import (
        start_curation_stream,
        stream_documents_json,
    )

    src = tmp_path / "stream_src"
    src.mkdir()
    out = str(tmp_path / "curated")
    store = str(tmp_path / "sigstore")
    ckpt = str(tmp_path / "ckpt")

    # texts need a stopword or two: the quality gate requires a stopword
    # ratio in [0.01, 0.5] (annotate_quality)
    base_text = (
        "the alpha beta gamma of delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    b1 = [
        {"doc_id": 1, "text": base_text, "lang": "en", "source": "s"},
        {
            "doc_id": 2,
            "text": "the one two three four of five six seven eight nine ten "
            "eleven twelve thirteen fourteen fifteen sixteen",
            "lang": "en",
            "source": "s",
        },
    ]
    # batch 2: a trailing-truncation near-dup of doc 1 + a fresh doc
    # (drop 2 words: J ~ 0.9 -> 3 of 4 LSH bands collide for this text;
    # dropping 3 happens to miss all bands with these fixed hashes)
    b2 = [
        {
            "doc_id": 10,
            "text": " ".join(base_text.split()[:-2]),
            "lang": "en",
            "source": "s",
        },
        {
            "doc_id": 11,
            "text": "the red orange yellow green of blue indigo violet cyan "
            "magenta white black brown silver golden copper bronze",
            "lang": "en",
            "source": "s",
        },
    ]
    (src / "b1.json").write_text("\n".join(json.dumps(r) for r in b1))
    (src / "b2.json").write_text("\n".join(json.dumps(r) for r in b2))

    stream = stream_documents_json(spark, str(src), max_files_per_trigger=1)
    q = start_curation_stream(stream, out, store, ckpt, min_tokens=10)
    q.awaitTermination(300)

    curated = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert 1 in curated and 2 in curated and 11 in curated
    assert 10 not in curated  # cross-micro-batch near-dup dropped


def test_missing_store_is_first_batch_but_corrupt_store_raises(spark, tmp_path):
    """The store read treats ONLY path-missing as 'first batch'. A corrupt
    store (or any real read error) must propagate — the old bare except
    silently skipped cross-batch dedup and admitted duplicates."""
    import pytest

    from dataworks_audit_data_ingest_spark.sources.readers import (
        read_parquet_store_or_none,
    )

    # missing path -> None (first batch)
    assert read_parquet_store_or_none(spark, str(tmp_path / "absent")) is None

    # corrupt store -> the error surfaces
    corrupt = tmp_path / "corrupt"
    corrupt.mkdir()
    (corrupt / "part-00000.parquet").write_bytes(b"this is not parquet")
    with pytest.raises(Exception, match="[Pp]arquet|PAR1|[Ff]ooter"):
        read_parquet_store_or_none(spark, str(corrupt)).collect()

    # and the incremental job inherits both behaviors
    docs = table(spark, SF, "documents").filter(
        F.size(F.split("text", " ")) > 8
    )
    batch = docs.filter(F.col("doc_id") < 10).select("doc_id", "text")
    with pytest.raises(Exception, match="[Pp]arquet|PAR1|[Ff]ooter"):
        uniq, dups = incremental_dedup_batch(spark, str(corrupt), batch, "b1")
        uniq.count()
