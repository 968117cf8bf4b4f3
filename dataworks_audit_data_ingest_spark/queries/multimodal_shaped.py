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
    media = decode_media_batches(with_media_payload(d))
    src = d.select("doc_id", "source")
    return (
        media.join(src, "doc_id")
        .groupBy("source")
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
