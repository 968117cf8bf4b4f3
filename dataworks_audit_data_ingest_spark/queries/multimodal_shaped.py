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
