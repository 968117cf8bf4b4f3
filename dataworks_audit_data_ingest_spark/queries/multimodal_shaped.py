"""Multimodal pipeline as an oracle-checked query: the binary payload +
mapInPandas decode path of ``multimodal.ops`` feeding a relational rollup.
The fake decoder is pure byte arithmetic, so DuckDB can mirror it exactly —
which makes the whole Arrow round-trip (Spark → pandas batches → Spark)
value-checked, not just smoke-tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..multimodal.ops import decode_media_batches, with_media_payload
from ..tables import table
from .base import register


@register(
    "q70_multimodal_decode",
    sql="""
    WITH media AS (
      SELECT doc_id, source,
             OCTET_LENGTH(ENCODE(text)) AS n_bytes,
             ASCII(SUBSTRING(text, 1, 1)) + 1 AS width,
             ASCII(SUBSTRING(text, 2, 1)) + 1 AS height,
             OCTET_LENGTH(ENCODE(text)) % 7 AS n_frames,
             MD5(text) AS checksum
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_media,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           CAST(SUM(width * height) AS BIGINT) AS total_pixels,
           CAST(SUM(n_frames) AS BIGINT) AS total_frames,
           COUNT(DISTINCT checksum) AS n_distinct
    FROM media
    GROUP BY source
    ORDER BY source
    """,
    tags=("multimodal", "mapinpandas"),
)
def q70_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary media pipeline: payload attach → Arrow-batched decode
    (mapInPandas) → metadata rollup per source.

    The fixture text bytes stand in for image blobs (ASCII text ⇒ the first
    two UTF-8 bytes equal the first two characters' codepoints, which is what
    the oracle's ASCII() mirrors).
    """
    d = table(spark, sf_dir, "documents")
    # source rides THROUGH the Arrow kernel (passthrough) instead of being
    # re-attached by a join against a second scan of the same table —
    # guide §4: the kernel already holds the row, so shipping one small
    # string column beats a join exchange plus a duplicate scan (low-steal
    # interleaved A/B med 0.64 s vs 0.87 s). Deliberately NOT spread: a
    # pre-decode repartition shuffles the payload bytes themselves and
    # measured ~2x slower than the single-task decode at fixture scale.
    media = decode_media_batches(with_media_payload(d), passthrough=("source",))
    return (
        media.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.sum(F.col("width").cast("long") * F.col("height")).alias("total_pixels"),
            F.sum("n_frames").alias("total_frames"),
            F.countDistinct("checksum").alias("n_distinct"),
        )
        .orderBy("source")
    )


@register(
    "q121_frame_sample_plan",
    sql="""
    WITH media AS (
      SELECT doc_id, source,
             ASCII(SUBSTRING(text, 1, 1)) + 1 AS width,
             ASCII(SUBSTRING(text, 2, 1)) + 1 AS height,
             OCTET_LENGTH(ENCODE(text)) % 7 AS n_frames
      FROM documents
    ), planned AS (
      SELECT source,
             CASE WHEN n_frames > 0 THEN (n_frames + 1) // 2 ELSE 0 END AS n_sampled,
             CAST(FLOOR(width * LEAST(1.0, LEAST(224.0 / width, 224.0 / height)))
                  AS BIGINT) AS tw,
             CAST(FLOOR(height * LEAST(1.0, LEAST(224.0 / width, 224.0 / height)))
                  AS BIGINT) AS th,
             n_frames
      FROM media
    )
    SELECT source,
           CAST(COUNT(CASE WHEN n_frames > 0 THEN 1 END) AS BIGINT) AS n_videos,
           CAST(SUM(n_sampled) AS BIGINT) AS total_sampled_frames,
           CAST(SUM(tw * th) AS BIGINT) AS total_target_pixels
    FROM planned
    GROUP BY source
    ORDER BY source
    """,
    tags=("multimodal", "frames", "resize"),
)
def q121_frame_sample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling and resize planning over decoded media, rolled up
    per source — the scheduling pass a video/image feature-extraction job
    runs to size its work (how many frames at what target resolution)
    BEFORE touching pixels. Runs the real operators
    (``multimodal.ops.sample_frames`` every_k=2,
    ``multimodal.ops.resize_media`` 224×224) on the fake-decoded
    metadata, so the whole chain — Arrow decode round-trip included — is
    value-checked against the oracle's closed-form mirror
    ((n_frames+1) DIV 2 sampled frames; FLOOR(dim·min(1, 224/w, 224/h))
    targets, IEEE-identical in both engines).

    Scale shape: everything after decode is map-side JVM arithmetic
    (SEQUENCE/FILTER explode for frames, scalar math for resize); the
    only exchange is the per-source rollup. The frame explode multiplies
    rows by frames-per-video BEFORE its partial agg — at 100 TB the
    per-frame rows feed the extractor directly and never shuffle raw."""
    d = table(spark, sf_dir, "documents")
    media = decode_media_batches(with_media_payload(d))
    from ..multimodal.ops import resize_media, sample_frames

    src = d.select("doc_id", "source")
    sampled = (
        sample_frames(media, every_k=2)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
    planned = (
        resize_media(media)
        .join(sampled, "doc_id", "left")
        .join(src, "doc_id")
        .select(
            "source",
            "n_frames",
            F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
            (
                F.col("target_width").cast("long")
                * F.col("target_height").cast("long")
            ).alias("target_pixels"),
        )
    )
    return (
        planned.groupBy("source")
        .agg(
            F.count(F.when(F.col("n_frames") > 0, 1))
            .cast("bigint")
            .alias("n_videos"),
            F.sum("n_sampled").cast("bigint").alias("total_sampled_frames"),
            F.sum("target_pixels").cast("bigint").alias("total_target_pixels"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q145 — perceptual-hash media dedup (aHash + banding + Hamming verify)
# ---------------------------------------------------------------------------
# `multimodal/ops.py::extract_pixels → average_hash_bands →
# phash_near_duplicates` end-to-end: re-encoded copies of an image differ
# byte-wise (checksum dedup misses them) but share the luminance
# signature. The corpus plants re-encodes in-query (every 25th document's
# payload with a fixed 3-byte overlay — length-preserving, so it perturbs
# ≤4 resampled pixels plus the mean, the way a lossy re-encode perturbs a
# few blocks; a length CHANGE would shift every sampled position and
# defeat any pixel-grid hash, the documented aHash limitation),
# and the fake decoder's byte arithmetic keeps the whole pipeline — pixel
# plane, integer aHash threshold, band values, Hamming distances —
# bit-identical in DuckDB.
_PHASH_PIXELS = 64
_PHASH_BANDS = 4
_PHASH_MAXHAM = 6


def _phash_oracle() -> str:
    bits = _PHASH_PIXELS // _PHASH_BANDS
    band_terms = " + ".join(
        f"(CASE WHEN 64 * MAX(CASE WHEN j % {bits} = {r} THEN p END) "
        f">= MIN(sump) THEN {1 << r} ELSE 0 END)"
        for r in range(bits)
    )
    return f"""
    WITH media AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 10000000 AS doc_id,
             SUBSTRING(text, 1, 4) || 'ZZZ' || SUBSTRING(text, 8) AS text
      FROM documents WHERE doc_id % 25 = 0
    ), px AS (
      SELECT doc_id,
             j,
             ASCII(SUBSTRING(text, (j * LENGTH(text)) // {_PHASH_PIXELS} + 1, 1))
               AS p
      FROM media, UNNEST(RANGE(0, {_PHASH_PIXELS})) AS t(j)
    ), sums AS (
      SELECT doc_id, SUM(p) AS sump FROM px GROUP BY doc_id
    ), bands AS (
      SELECT px.doc_id, j // {bits} AS band,
             {band_terms} AS bval
      FROM px JOIN sums USING (doc_id)
      GROUP BY px.doc_id, j // {bits}
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id
    ), ham AS (
      SELECT c.id_a, c.id_b, SUM(BIT_COUNT(XOR(CAST(xa.bval AS BIGINT),
                                               CAST(xb.bval AS BIGINT)))) AS hamming
      FROM cand c
        JOIN bands xa ON xa.doc_id = c.id_a
        JOIN bands xb ON xb.doc_id = c.id_b AND xb.band = xa.band
      GROUP BY c.id_a, c.id_b
    )
    SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming
    FROM ham WHERE hamming <= {_PHASH_MAXHAM}
    ORDER BY id_a, id_b
    """


@register(
    "q145_media_phash_dedup",
    sql=_phash_oracle(),
    tags=("multimodal", "dedup", "phash", "mapinpandas"),
)
def q145_media_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-duplicate detection for media payloads: Arrow
    decode to a 64-value luminance plane (`extract_pixels`), integer
    aHash (bit = pixel above image mean), 4×16-bit LSH banding for
    candidates, exact band-wise Hamming verify ≤ {max_hamming} — the
    re-encode dedup that byte checksums (q70's n_distinct) cannot see.

    Scale shape: pixels and signatures are map-side per payload; the
    only corpus-wide exchange carries (id, band, bval) triples — the
    minhash/simhash banding discipline with the signature derived from
    pixels instead of tokens. Band collisions gate the quadratic term
    exactly as in q51/q52."""
    from ..multimodal.ops import extract_pixels, phash_near_duplicates, with_media_payload

    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    clones = d.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 10000000).alias("doc_id"),
        F.expr(
            "CONCAT(SUBSTRING(text, 1, 4), 'ZZZ', SUBSTRING(text, 8))"
        ).alias("text"),
    )
    media = with_media_payload(d.unionByName(clones))
    px = extract_pixels(media, n_pixels=_PHASH_PIXELS)
    return phash_near_duplicates(
        px,
        max_hamming=_PHASH_MAXHAM,
        n_pixels=_PHASH_PIXELS,
        n_bands=_PHASH_BANDS,
    ).orderBy("id_a", "id_b")
