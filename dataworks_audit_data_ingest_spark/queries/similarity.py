"""Similarity search over the ``embeddings`` table: brute-force cosine top-k
baseline and an IVF-style (centroid-routed) variant — the scale path
(north-star extension; no analog in the reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import table
from .base import register
from .dedup import _DOT_DEC, spark_cosine

_N_QUERIES = 5  # vec_id < 5 act as query vectors
_TOP_K = 5


@register(
    "q55_ann_bruteforce_topk",
    sql=f"""
    WITH base0 AS (
      SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ), norm_terms AS (
      SELECT vec_id, emb, UNNEST(RANGE(1, LEN(emb) + 1)) AS i FROM base0
    ), base AS (
      SELECT vec_id, ANY_VALUE(emb) AS emb,
             SQRT(CAST(SUM(CAST(emb[i] * emb[i] AS {_DOT_DEC})) AS DOUBLE)) AS nrm
      FROM norm_terms GROUP BY vec_id
    ), pairs AS (
      SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
             q.emb AS eq, t.emb AS et, q.nrm AS nq, t.nrm AS nt
      FROM base q JOIN base t ON t.vec_id != q.vec_id
      WHERE q.vec_id < {_N_QUERIES}
    ), indexed AS (
      SELECT query_id, neighbor_id, eq, et, nq, nt,
             UNNEST(RANGE(1, LEN(eq) + 1)) AS i
      FROM pairs
    ), scored AS (
      SELECT query_id, neighbor_id,
             CAST(SUM(CAST(eq[i] * et[i] AS {_DOT_DEC})) AS DOUBLE)
               / (ANY_VALUE(nq) * ANY_VALUE(nt)) AS cosine
      FROM indexed
      GROUP BY query_id, neighbor_id
    ), ranked AS (
      SELECT query_id, neighbor_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM scored
    )
    SELECT query_id, neighbor_id, rnk, ROUND(cosine, 6) AS score
    FROM ranked WHERE rnk <= {_TOP_K}
    ORDER BY query_id, rnk
    """,
    tags=("similarity", "ann", "bruteforce"),
)
def q55_ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: every query vector scored against the full
    corpus, ranked per query.

    The cosine is a JVM-side ZIP_WITH/AGGREGATE expression (no Python UDF,
    stays in whole-stage codegen); queries broadcast against the corpus so
    the corpus is scanned exactly once, and each vector's norm is computed
    once up front — the pair stage does a single dot product. This is the
    exact baseline the IVF/LSH variants (q56, q51) are measured against.
    """
    e = table(spark, sf_dir, "embeddings")
    norm = (
        f"SQRT(CAST(AGGREGATE(TRANSFORM(emb, x -> CAST(x * x AS {_DOT_DEC})), "
        f"CAST(0 AS {_DOT_DEC}), (acc, v) -> CAST(acc + v AS {_DOT_DEC})) AS DOUBLE))"
    )
    base = e.select(
        "vec_id",
        F.expr("TRANSFORM(embedding, x -> CAST(x AS DOUBLE))").alias("emb"),
    ).withColumn("nrm", F.expr(norm))
    q = base.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("emb").alias("eq"),
        F.col("nrm").alias("nq"),
    )
    t = base.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("emb").alias("et"),
        F.col("nrm").alias("nt"),
    )
    dot = (
        f"AGGREGATE(ZIP_WITH(eq, et, (p, v) -> CAST(p * v AS {_DOT_DEC})), "
        f"CAST(0 AS {_DOT_DEC}), (acc, v) -> CAST(acc + v AS {_DOT_DEC}))"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        F.broadcast(q)
        .join(t, F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (F.expr(f"CAST({dot} AS DOUBLE)") / (F.col("nq") * F.col("nt"))).alias(
                "cosine"
            ),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "rnk",
            F.round("cosine", 6).alias("score"),
        )
        .orderBy("query_id", "rnk")
    )


@register(
    "q56_ann_ivf_topk",
    sql=f"""
    WITH indexed AS (
      SELECT vec_id, label, embedding,
             UNNEST(RANGE(1, LEN(embedding) + 1)) AS i
      FROM embeddings
    ), elems AS (
      SELECT vec_id, label, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS v
      FROM indexed
    ), centroids AS (
      SELECT label, pos,
             CAST(SUM(CAST(v AS DECIMAL(28,18))) AS DOUBLE) / COUNT(*) AS cv
      FROM elems GROUP BY label, pos
    ), queries AS (
      SELECT vec_id AS query_id, pos, v FROM elems WHERE vec_id < {_N_QUERIES}
    ), routing AS (
      SELECT query_id, label,
             CAST(SUM(CAST(q.v * c.cv AS {_DOT_DEC})) AS DOUBLE)
               / (SQRT(CAST(SUM(CAST(q.v * q.v AS {_DOT_DEC})) AS DOUBLE))
                  * SQRT(CAST(SUM(CAST(c.cv * c.cv AS {_DOT_DEC})) AS DOUBLE))) AS cosine
      FROM queries q JOIN centroids c USING (pos)
      GROUP BY query_id, label
    ), best_cell AS (
      SELECT query_id, label FROM (
        SELECT query_id, label,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, label) AS rnk
        FROM routing) WHERE rnk = 1
    ), candidates AS (
      SELECT b.query_id, e.vec_id AS neighbor_id, e.pos, e.v AS tv, q.v AS qv
      FROM best_cell b
        JOIN elems e ON e.label = b.label AND e.vec_id != b.query_id
        JOIN queries q ON q.query_id = b.query_id AND q.pos = e.pos
    ), scored AS (
      SELECT query_id, neighbor_id,
             CAST(SUM(CAST(qv * tv AS {_DOT_DEC})) AS DOUBLE)
               / (SQRT(CAST(SUM(CAST(qv * qv AS {_DOT_DEC})) AS DOUBLE))
                  * SQRT(CAST(SUM(CAST(tv * tv AS {_DOT_DEC})) AS DOUBLE))) AS cosine
      FROM candidates
      GROUP BY query_id, neighbor_id
    )
    SELECT query_id, neighbor_id, rnk, ROUND(cosine, 6) AS score
    FROM (
      SELECT query_id, neighbor_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM scored)
    WHERE rnk <= 3
    ORDER BY query_id, rnk
    """,
    tags=("similarity", "ann", "ivf"),
)
def q56_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: route each query to its nearest cell centroid, then
    search only that cell — the 100 TB scale path (probes a fixed fraction of
    the corpus instead of all of it).

    Cells here are the fixture ``label`` clusters; centroids are exact
    decimal-mean vectors kept in long (label, pos, value) form so every dot
    product is a pos-equijoin + exact decimal sum — deterministic under any
    partitioning, and the centroid table stays broadcast-sized.
    """
    e = table(spark, sf_dir, "embeddings")
    elems = e.select(
        "vec_id",
        "label",
        F.posexplode(F.expr("TRANSFORM(embedding, x -> CAST(x AS DOUBLE))")).alias(
            "pos", "v"
        ),
    )
    centroids = elems.groupBy("label", "pos").agg(
        (
            F.sum(F.col("v").cast("decimal(28,18)")).cast("double")
            / F.count(F.lit(1))
        ).alias("cv")
    )
    queries = elems.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "pos", "v"
    )

    def _dec_sum(prod: str) -> F.Column:
        return F.sum(F.expr(f"CAST({prod} AS {_DOT_DEC})")).cast("double")

    routing = (
        queries.join(F.broadcast(centroids), "pos")
        .groupBy("query_id", "label")
        .agg(
            (
                _dec_sum("v * cv")
                / (F.sqrt(_dec_sum("v * v")) * F.sqrt(_dec_sum("cv * cv")))
            ).alias("cosine")
        )
    )
    w_route = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("label"))
    best_cell = (
        routing.withColumn("rnk", F.row_number().over(w_route))
        .filter(F.col("rnk") == 1)
        .select("query_id", "label")
    )
    candidates = (
        F.broadcast(best_cell)
        .join(elems, "label")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "pos", F.col("v").alias("tv"))
        .join(
            F.broadcast(queries.withColumnRenamed("v", "qv")),
            ["query_id", "pos"],
        )
    )
    scored = candidates.groupBy("query_id", "neighbor_id").agg(
        (
            _dec_sum("qv * tv")
            / (F.sqrt(_dec_sum("qv * qv")) * F.sqrt(_dec_sum("tv * tv")))
        ).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("query_id", "neighbor_id", "rnk", F.round("cosine", 6).alias("score"))
        .orderBy("query_id", "rnk")
    )


@register(
    "q59_ivf_kmeans_cells",
    sql=None,  # iterative algorithm — rows-only check (like q58's clustering)
    tags=("similarity", "kmeans", "iterative", "scale-path"),
)
def q59_ivf_kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell training via DataFrame-native Lloyd's k-means
    (`similarity/kmeans.py`): deterministic farthest-point init, broadcast
    assignment + argmin window, decimal-exact mean update, localCheckpoint
    per round — O(n_iter) shuffles, never more. Output: per-cell population
    and mean within-cell squared distance, the cell profile an IVF index
    build would persist alongside the partitioned corpus."""
    from ..similarity.kmeans import train_cells

    emb = table(spark, sf_dir, "embeddings")
    assigned, _ = train_cells(emb, k=4, n_iter=2)
    return (
        assigned.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            (
                (F.sum(F.col("sq_dist").cast("decimal(28,12)")) / F.count(F.lit(1)))
                .cast("double")
            ).alias("mean_sq_dist"),
        )
        .orderBy("cell")
    )
