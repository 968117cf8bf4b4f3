"""Int8 scalar quantization for embedding columns — the storage/bandwidth
compression step of a large-scale vector pipeline (4× smaller than float32,
8× smaller than the double working form; integer dot products).

Per-vector affine quantization: ``q[i] = round((v[i] - mn) / scale)`` with
``scale = (mx - mn) / 255``, stored as an ``array<smallint>`` of levels in
[0, 255] plus the two reconstruction scalars. Everything is JVM-side
higher-order expressions — no Python, no shuffle; quantization composes
with any scan or write.

Why per-vector (not per-dimension or global) ranges: it needs no second
corpus pass and no trained statistics, and reconstruction error is bounded
by ``scale/2`` per element regardless of outliers elsewhere in the corpus.
The trade-off (cross-vector dot products need the affine correction, done
in :func:`quantized_knn` via the expanded form) is standard scalar
quantization; the next compression rung — trained-codebook product
quantization with ADC lookup search — lives in `similarity/pq.py`
(4× smaller index than these int8 levels at m=16, d=64).

Degenerate vectors (mx == mn, including all-zero) quantize to level 0
everywhere with ``scale = 0`` and reconstruct exactly to the constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DEC = "DECIMAL(28,18)"


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", out_prefix: str = "q"
) -> DataFrame:
    """Add ``{p}_levels: array<smallint>``, ``{p}_min: double``,
    ``{p}_scale: double`` columns (p = ``out_prefix``); drops nothing."""
    p = out_prefix
    v = f"TRANSFORM({vec_col}, x -> CAST(x AS DOUBLE))"
    mn, mx = f"ARRAY_MIN({v})", f"ARRAY_MAX({v})"
    return (
        df.withColumn(f"{p}_min", F.expr(mn))
        .withColumn(
            f"{p}_scale",
            F.expr(f"CASE WHEN {mx} = {mn} THEN CAST(0 AS DOUBLE) "
                   f"ELSE ({mx} - {mn}) / 255.0 END"),
        )
        .withColumn(
            f"{p}_levels",
            F.expr(
                f"TRANSFORM({v}, x -> CAST(CASE WHEN {p}_scale = 0 THEN 0 "
                f"ELSE ROUND((x - {p}_min) / {p}_scale) END AS SMALLINT))"
            ),
        )
    )


def dequantize(
    df: DataFrame, out_col: str = "deq_embedding", prefix: str = "q"
) -> DataFrame:
    """Reconstruct ``array<double>`` from the quantized columns; per-element
    error is bounded by ``scale / 2``."""
    p = prefix
    return df.withColumn(
        out_col,
        F.expr(f"TRANSFORM({p}_levels, l -> {p}_min + CAST(l AS DOUBLE) * {p}_scale)"),
    )


def quantized_knn(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    rerank: int = 0,
) -> DataFrame:
    """Brute-force top-k by cosine over the QUANTIZED forms: the integer
    level dot product plus affine correction terms, so the heavy per-pair
    work is a pure int32 multiply-add stream (what survives memory
    bandwidth at corpus scale). With ``rerank = c > 0``, the top ``c``
    quantized candidates per query are re-scored with exact full-precision
    cosine before the final top-k cut — the standard two-stage shape.

    Expanded dot product, with a = mn_q, s = scale_q per vector:
    ``dot(va, vb) = s_a*s_b*Σl_a·l_b + s_a*a_b*Σl_a + s_b*a_a*Σl_b + d*a_a*a_b``
    — Σl per vector is precomputed once, so a pair costs ONE integer
    zip-fold plus four scalar multiplies."""
    if rerank:
        # a rerank cushion below k would silently truncate the result set
        rerank = max(rerank, k)
    qd = quantize_int8(
        queries.select(F.col(query_id).alias("query_id"), vec_col), vec_col
    )
    cd = quantize_int8(
        corpus.select(F.col(corpus_id).alias("neighbor_id"), vec_col), vec_col
    )

    def prep(df: DataFrame, side: str) -> DataFrame:
        # Σl, Σl², and the reconstructed norm are all per-vector constants:
        # computed ONCE here so the per-pair work is exactly one integer
        # zip-fold plus scalar arithmetic (the docstring's contract).
        lsum = (
            "AGGREGATE(q_levels, CAST(0 AS BIGINT), "
            "(acc, l) -> acc + CAST(l AS BIGINT))"
        )
        lsq = (
            "AGGREGATE(q_levels, CAST(0 AS BIGINT), "
            "(acc, l) -> acc + CAST(l AS BIGINT) * CAST(l AS BIGINT))"
        )
        norm = (
            f"SQRT(q_scale * q_scale * CAST({lsq} AS DOUBLE)"
            f" + 2 * q_scale * q_min * CAST({lsum} AS DOUBLE)"
            f" + CAST(SIZE(q_levels) AS DOUBLE) * q_min * q_min)"
        )
        return (
            df.withColumn(f"_{side}lsum", F.expr(lsum))
            .withColumn(f"_{side}n", F.expr(norm))
            .withColumn("_d", F.expr("SIZE(q_levels)"))
            .select(
                F.col("query_id" if side == "q" else "neighbor_id"),
                F.col("q_levels").alias(f"_{side}lv"),
                F.col("q_min").alias(f"_{side}a"),
                F.col("q_scale").alias(f"_{side}s"),
                f"_{side}lsum",
                f"_{side}n",
                "_d",
            )
        )

    q = prep(qd, "q")
    c = prep(cd, "c").drop("_d")
    ldot = (
        "AGGREGATE(ZIP_WITH(_qlv, _clv, (a, b) -> CAST(a AS BIGINT) * "
        "CAST(b AS BIGINT)), CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )
    dot = (
        f"_qs * _cs * CAST({ldot} AS DOUBLE)"
        " + _qs * _ca * CAST(_qlsum AS DOUBLE)"
        " + _cs * _qa * CAST(_clsum AS DOUBLE)"
        " + CAST(_d AS DOUBLE) * _qa * _ca"
    )

    pairs = (
        F.broadcast(q)
        .join(c, F.col("neighbor_id") != F.col("query_id"))
        .withColumn("qcos", F.expr(f"({dot}) / (_qn * _cn)"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qcos"), F.asc("neighbor_id"))
    if not rerank:
        return (
            pairs.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("query_id", "neighbor_id", "rnk", F.col("qcos").alias("cosine"))
        )
    from .knn import cosine_expr

    def sqnorm(col: str) -> str:
        return (
            f"SQRT(CAST(AGGREGATE(TRANSFORM({col}, x -> CAST(x * x AS {_DEC})), "
            f"CAST(0 AS {_DEC}), (acc, v) -> CAST(acc + v AS {_DEC})) AS DOUBLE))"
        )

    cand = (
        pairs.withColumn("_cr", F.row_number().over(w))
        .filter(F.col("_cr") <= rerank)
        .select("query_id", "neighbor_id")
    )
    # exact rerank: rejoin full-precision vectors for the surviving pairs
    qv = queries.select(
        F.col(query_id).alias("query_id"),
        F.expr(f"TRANSFORM({vec_col}, x -> CAST(x AS DOUBLE))").alias("_qv"),
    ).withColumn("_qn", F.expr(sqnorm("_qv")))
    cv = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.expr(f"TRANSFORM({vec_col}, x -> CAST(x AS DOUBLE))").alias("_cv"),
    ).withColumn("_cn", F.expr(sqnorm("_cv")))
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .withColumn("cosine", F.expr(cosine_expr("_qv", "_cv", "_qn", "_cn")))
        .withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", "cosine")
    )
