"""Perceptual-hash media dedup (`multimodal/ops.py`): planted re-encode
recall, exact-duplicate degenerate case, and signature determinism.
The full pipeline is also oracle-checked as q145."""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Perceptual-hash dedup (extract_pixels → average_hash_bands →
# phash_near_duplicates)
# ---------------------------------------------------------------------------


def test_phash_finds_planted_reencodes(spark):
    """Length-preserving overlay 're-encodes' are found with high recall
    at Hamming ≤ 6, and every reported pair is within the threshold."""
    from pyspark.sql import functions as F

    from dataworks_audit_data_ingest_spark.multimodal.ops import (
        extract_pixels,
        phash_near_duplicates,
        with_media_payload,
    )
    from dataworks_audit_data_ingest_spark.tables import table

    d = table(spark, "/root/testdata/sf0.001", "documents").select("doc_id", "text")
    clones = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.expr("CONCAT(SUBSTRING(text, 1, 4), 'ZZZ', SUBSTRING(text, 8))").alias(
            "text"
        ),
    )
    n_planted = clones.count()
    px = extract_pixels(with_media_payload(d.unionByName(clones)))
    pairs = phash_near_duplicates(px).collect()
    found = {
        (a, b - 10_000_000)
        for a, b, _ in ((r.id_a, r.id_b, r.hamming) for r in pairs)
        if b >= 10_000_000 and a == b - 10_000_000
    }
    assert len(found) / n_planted >= 0.7, (len(found), n_planted)
    assert all(r.hamming <= 6 for r in pairs)


def test_phash_identical_payloads_are_distance_zero(spark):
    """Byte-identical payloads under different ids: hamming == 0 (the
    exact-dup degenerate case rides the same pipeline)."""
    from pyspark.sql import functions as F

    from dataworks_audit_data_ingest_spark.multimodal.ops import (
        extract_pixels,
        phash_near_duplicates,
        with_media_payload,
    )
    from dataworks_audit_data_ingest_spark.tables import table

    d = (
        table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text")
        .limit(20)
    )
    twin = d.select((F.col("doc_id") + 1000).alias("doc_id"), "text")
    px = extract_pixels(with_media_payload(d.unionByName(twin)))
    pairs = phash_near_duplicates(px).collect()
    exact = [r for r in pairs if r.id_b == r.id_a + 1000]
    assert len(exact) == 20
    assert all(r.hamming == 0 for r in exact)


def test_phash_bands_deterministic_across_partitionings(spark):
    from dataworks_audit_data_ingest_spark.multimodal.ops import (
        average_hash_bands,
        extract_pixels,
        with_media_payload,
    )
    from dataworks_audit_data_ingest_spark.tables import table

    d = table(spark, "/root/testdata/sf0.001", "documents").select("doc_id", "text")
    b1 = average_hash_bands(extract_pixels(with_media_payload(d)))
    b2 = average_hash_bands(extract_pixels(with_media_payload(d.repartition(7))))
    assert sorted(map(tuple, b1.collect())) == sorted(map(tuple, b2.collect()))
