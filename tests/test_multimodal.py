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


# ---------------------------------------------------------------------------
# Incremental perceptual store (multimodal/incremental_phash.py)
# ---------------------------------------------------------------------------


def test_incremental_phash_cross_batch_and_replay(spark, tmp_path):
    """Batch 2 re-encodes of batch-1 payloads are caught against the
    store; within-batch twins are caught; replaying batch 2 after a lost
    downstream write changes nothing (idempotent)."""
    from pyspark.sql import functions as F

    from dataworks_audit_data_ingest_spark.multimodal.incremental_phash import (
        incremental_phash_batch,
    )
    from dataworks_audit_data_ingest_spark.tables import table

    store = str(tmp_path / "phash_store")
    d = table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    b1 = d.filter(F.col("doc_id") < 60)
    u1, p1 = incremental_phash_batch(spark, store, b1, "b1")
    n1 = u1.count()
    assert n1 > 0

    # batch 2: re-encodes of batch-1 docs (length-preserving overlay) +
    # fresh docs + one within-batch twin pair
    reenc = b1.filter(F.col("doc_id") % 15 == 0).select(
        (F.col("doc_id") + 500_000).alias("doc_id"),
        F.expr("CONCAT(SUBSTRING(text, 1, 4), 'ZZZ', SUBSTRING(text, 8))").alias(
            "text"
        ),
    )
    fresh = d.filter((F.col("doc_id") >= 60) & (F.col("doc_id") < 90))
    twin = fresh.limit(1).select(
        (F.col("doc_id") + 900_000).alias("doc_id"), "text"
    )
    b2 = reenc.unionByName(fresh).unionByName(twin)
    u2, p2 = incremental_phash_batch(spark, store, b2, "b2")

    pair_rows = p2.collect()
    cross = {(r.doc_a, r.doc_b) for r in pair_rows if r.doc_b >= 500_000 and r.doc_b < 900_000}
    n_reenc = reenc.count()
    # most planted re-encodes link back to their stored original
    hits = {b - 500_000 for _, b in cross} & {
        r.doc_id for r in b1.collect()
    }
    assert len(hits) >= max(1, int(0.7 * n_reenc))
    # the exact twin is caught within-batch (hamming 0)
    twin_id = twin.first().doc_id
    assert any(r.doc_b == twin_id and r.hamming == 0 for r in pair_rows)
    # caught docs are not in the unique set
    u2_ids = {r.doc_id for r in u2.collect()}
    assert not ({r.doc_b for r in pair_rows} & u2_ids)

    # replay batch 2: same result, store unchanged
    u2r, p2r = incremental_phash_batch(spark, store, b2, "b2")
    assert sorted(r.doc_id for r in u2r.collect()) == sorted(u2_ids)
    assert sorted(map(tuple, p2r.collect())) == sorted(map(tuple, pair_rows))


def test_arrow_decode_path_row_identical_to_pandas_path(spark):
    """mapInArrow decode == mapInPandas decode, row for row — the cheaper
    Python boundary changes nothing but the conversion cost."""
    from dataworks_audit_data_ingest_spark.multimodal.ops import (
        decode_media_batches,
        decode_media_batches_arrow,
        with_media_payload,
    )
    from dataworks_audit_data_ingest_spark.tables import table

    docs = with_media_payload(
        table(spark, "/root/testdata/sf0.001", "documents")
    )
    pandas_rows = sorted(
        tuple(r) for r in decode_media_batches(docs).collect()
    )
    arrow_rows = sorted(
        tuple(r) for r in decode_media_batches_arrow(docs).collect()
    )
    assert arrow_rows == pandas_rows
    assert arrow_rows


def test_chunked_reassembly_equals_whole_payload_decode(spark):
    """Chunk every payload into 3 parts, reassemble via applyInArrow,
    and pin the result row-identical to decoding the whole payloads."""
    from dataworks_audit_data_ingest_spark.multimodal.ops import (
        decode_media_batches,
        reassemble_chunked_media,
        with_media_payload,
    )
    from dataworks_audit_data_ingest_spark.tables import table
    from pyspark.sql import functions as F

    docs = with_media_payload(
        table(spark, "/root/testdata/sf0.001", "documents")
    ).select("doc_id", "payload")
    # chunk rows via substring slicing on the binary payload
    chunks = (
        docs.select(
            "doc_id",
            F.lit(0).alias("part_idx"),
            F.expr("substring(payload, 1, CAST(length(payload)/3 AS INT))").alias("part"),
        )
        .unionByName(
            docs.select(
                "doc_id",
                F.lit(1).alias("part_idx"),
                F.expr(
                    "substring(payload, CAST(length(payload)/3 AS INT)+1,"
                    " CAST(length(payload)/3 AS INT))"
                ).alias("part"),
            )
        )
        .unionByName(
            docs.select(
                "doc_id",
                F.lit(2).alias("part_idx"),
                F.expr(
                    "substring(payload, 2*CAST(length(payload)/3 AS INT)+1,"
                    " length(payload))"
                ).alias("part"),
            )
        )
    )
    got = sorted(
        tuple(r) for r in reassemble_chunked_media(chunks).collect()
    )
    want = sorted(
        tuple(r)
        for r in decode_media_batches(docs).collect()
    )
    assert got == want
    assert got
