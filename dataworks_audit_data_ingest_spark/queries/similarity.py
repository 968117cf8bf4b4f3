"""Similarity search over the ``embeddings`` table: brute-force cosine top-k
baseline and an IVF-style (centroid-routed) variant — the scale path
(north-star extension; no analog in the reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import duckdb_hash32, spark_hash32
from ..tables import spread, table
from .base import register
from .dedup import _DOT_DEC, spark_cosine

_N_QUERIES = 5  # vec_id < 5 act as query vectors
_TOP_K = 5


def _brute_ranked_ctes(extra_pair_pred: str = "") -> str:
    """CTE chain ``base0 -> ... -> ranked``: exact cosine of every
    (query, other-vector) pair, ranked per query (queries = vec_id <
    _N_QUERIES). ONE text shared by q55, q182's exact leg, and q209's
    hard-negative pool (which adds a label-disagreement pair predicate
    via ``extra_pair_pred`` — SQL over aliases q/t), so the recall audit
    and the mining query can never drift from the query they audit."""
    extra = f" AND ({extra_pair_pred})" if extra_pair_pred else ""
    return f"""base0 AS (
      SELECT vec_id, label,
             LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ), norm_terms AS (
      SELECT vec_id, label, emb, UNNEST(RANGE(1, LEN(emb) + 1)) AS i
      FROM base0
    ), base AS (
      SELECT vec_id, ANY_VALUE(label) AS label, ANY_VALUE(emb) AS emb,
             SQRT(CAST(SUM(CAST(emb[i] * emb[i] AS {_DOT_DEC})) AS DOUBLE)) AS nrm
      FROM norm_terms GROUP BY vec_id
    ), pairs AS (
      SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
             q.label AS ql, t.label AS tl,
             q.emb AS eq, t.emb AS et, q.nrm AS nq, t.nrm AS nt
      FROM base q JOIN base t ON t.vec_id != q.vec_id{extra}
      WHERE q.vec_id < {_N_QUERIES}
    ), indexed AS (
      SELECT query_id, neighbor_id, ql, tl, eq, et, nq, nt,
             UNNEST(RANGE(1, LEN(eq) + 1)) AS i
      FROM pairs
    ), scored AS (
      SELECT query_id, neighbor_id,
             ANY_VALUE(ql) AS ql, ANY_VALUE(tl) AS tl,
             CAST(SUM(CAST(eq[i] * et[i] AS {_DOT_DEC})) AS DOUBLE)
               / (ANY_VALUE(nq) * ANY_VALUE(nt)) AS cosine
      FROM indexed
      GROUP BY query_id, neighbor_id
    ), ranked AS (
      SELECT query_id, neighbor_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM scored
    )"""


def _ivf_ranked_ctes(queries_pred: str) -> str:
    """CTE chain ``e_indexed -> ... -> ivf_ranked``: q56's IVF route
    (exact decimal-mean centroids over the ``label`` cells, one probed
    cell per query, exact cosine within the cell), ranked per query.
    ``queries_pred`` selects the query vectors. ONE text shared by q56,
    q179's vector leg, and q182's IVF leg — a routing/tie-break/precision
    change edits every consumer at once instead of silently diverging
    the audits from the index they audit."""
    return f"""e_indexed AS (
      SELECT vec_id, label, embedding,
             UNNEST(RANGE(1, LEN(embedding) + 1)) AS i
      FROM embeddings
    ), elems AS (
      SELECT vec_id, label, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS v
      FROM e_indexed
    ), centroids AS (
      SELECT label, pos,
             CAST(SUM(CAST(v AS DECIMAL(28,18))) AS DOUBLE) / COUNT(*) AS cv
      FROM elems GROUP BY label, pos
    ), ivf_queries AS (
      SELECT vec_id AS query_id, pos, v FROM elems WHERE {queries_pred}
    ), routing AS (
      SELECT query_id, label,
             CAST(SUM(CAST(q.v * c.cv AS {_DOT_DEC})) AS DOUBLE)
               / (SQRT(CAST(SUM(CAST(q.v * q.v AS {_DOT_DEC})) AS DOUBLE))
                  * SQRT(CAST(SUM(CAST(c.cv * c.cv AS {_DOT_DEC})) AS DOUBLE))) AS cosine
      FROM ivf_queries q JOIN centroids c USING (pos)
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
        JOIN ivf_queries q ON q.query_id = b.query_id AND q.pos = e.pos
    ), ivf_scored AS (
      SELECT query_id, neighbor_id,
             CAST(SUM(CAST(qv * tv AS {_DOT_DEC})) AS DOUBLE)
               / (SQRT(CAST(SUM(CAST(qv * qv AS {_DOT_DEC})) AS DOUBLE))
                  * SQRT(CAST(SUM(CAST(tv * tv AS {_DOT_DEC})) AS DOUBLE))) AS cosine
      FROM candidates
      GROUP BY query_id, neighbor_id
    ), ivf_ranked AS (
      SELECT query_id, neighbor_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM ivf_scored
    )"""


@register(
    "q55_ann_bruteforce_topk",
    sql=f"""
    WITH {_brute_ranked_ctes()}
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
    # spread: the |q|x|corpus| interpreted ZIP_WITH/AGGREGATE dot products
    # run in the corpus-side stage; on the unsplittable fixture that stage
    # is one task. Spread the corpus so pair scoring parallelizes.
    # Round 13: the round-12 lazy checkpoint ("neutral, kept") removed —
    # an 8-sample interleaved A/B shows it losing outright (med 0.77 s
    # with vs 0.61 s without; same mechanism as the q89/q51 driver
    # regressions: materializing full embedding arrays costs more than
    # the broadcast side's recompute).
    base = (
        spread(e, sf_dir, "vec_id")
        .select(
            "vec_id",
            F.expr("TRANSFORM(embedding, x -> CAST(x AS DOUBLE))").alias("emb"),
        )
        .withColumn("nrm", F.expr(norm))
    )
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
    WITH {_ivf_ranked_ctes(f"vec_id < {_N_QUERIES}")}
    SELECT query_id, neighbor_id, rnk, ROUND(cosine, 6) AS score
    FROM ivf_ranked
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
    # Deliberately NOT spread and NOT checkpointed: a low-steal interleaved
    # A/B (6 samples each) measured the plain pipeline fastest (min 1.34 s
    # vs 1.42 spread vs 2.04 spread+checkpoint at sf0.1) — the explode's
    # consumers all sit behind partial aggregation or broadcast builds, so
    # repartitioning or materializing the |dim|x|vectors| rows costs more
    # than recomputing them from the 10 MB scan.
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


# ---------------------------------------------------------------------------
# Sign-random-projection LSH ANN — the bucketed retrieval alternative to IVF
# ---------------------------------------------------------------------------

_SRP_BITS = 16  # hyperplanes per vector
_SRP_BAND_BITS = 4  # bits per band -> 4 bands of 4 bits
_SRP_TOP_K = 3


# Projection terms are quantized to integers — FLOOR(v * h * SRP_SCALE) —
# and summed as BIGINT: a pure-integer sign decision that is (a)
# deterministic under any partitioning/engine (integer addition is exact; a
# double sum is order-dependent, a decimal sum costs ~5× in the agg), and
# (b) still a valid SRP family — quantization error is < 1 per term against
# term magnitudes ~|v|·|h|·2^20 ≈ 1e8, i.e. it perturbs only projections
# within ~1e-6 of the hyperplane. The scale constant lives in
# functions/hashing.py, shared with knn_join(method="srp") and the study
# tool so every SRP signature in the repo stays join-compatible.
from ..functions.hashing import SRP_SCALE as _SRP_SCALE  # noqa: E402


def _srp_h(j_expr: str, pos_expr: str, dialect: str) -> str:
    """Deterministic integer hyperplane component in [-500, 500]: a
    portable-hash transform of (j, pos) — no RNG, bit-identical across
    engines (the /1000 normalization is a positive scale factor, so it
    cannot change any sign and is dropped entirely)."""
    concat = f"CONCAT(CAST({j_expr} AS VARCHAR), ':', CAST({pos_expr} AS VARCHAR))"
    if dialect == "spark":
        concat = f"CONCAT(CAST({j_expr} AS STRING), ':', CAST({pos_expr} AS STRING))"
        return f"({spark_hash32(concat, 'srp')} % 1001) - 500"
    return f"({duckdb_hash32(concat, 'srp')} % 1001) - 500"


def _srp_bands_ctes() -> str:
    """The elems→hyper→proj→bands CTE chain producing each vector's banded
    SRP signature (vec_id, band, bval) — shared by q89 (retrieval) and
    q187 (bucket-purity audit) so the audit can never drift from the
    signature construction it audits."""
    return f"""elems AS (
      SELECT vec_id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS v
      FROM (SELECT vec_id, embedding,
                   UNNEST(RANGE(1, LEN(embedding) + 1)) AS i
            FROM embeddings)
    ), hyper AS (
      SELECT j, pos, {_srp_h("j", "pos", "duckdb")} AS h
      FROM (SELECT UNNEST(RANGE(0, {_SRP_BITS})) AS j)
      CROSS JOIN (SELECT DISTINCT pos FROM elems)
    ), proj AS (
      SELECT vec_id, j,
             SUM(CAST(FLOOR(v * h * {_SRP_SCALE}) AS BIGINT)) AS proj
      FROM elems JOIN hyper USING (pos)
      GROUP BY vec_id, j
    ), bands AS (
      SELECT vec_id, CAST(j // {_SRP_BAND_BITS} AS INT) AS band,
             SUM((CASE WHEN proj >= 0 THEN 1 ELSE 0 END)
                 << CAST(j % {_SRP_BAND_BITS} AS INT)) AS bval
      FROM proj GROUP BY vec_id, band
    )"""


def _srp_bands(e: DataFrame) -> DataFrame:
    """Spark twin of :func:`_srp_bands_ctes`: embeddings → one banded SRP
    signature row (vec_id, band, bval) per vector per band.  Signatures
    are fully map-side — 16 projections per vector from one broadcast
    join against the per-position hyperplane table, then a single
    groupBy(vec_id) carrying 16 BIGINT partials."""
    elems = e.select(
        "vec_id",
        F.posexplode(F.expr("TRANSFORM(embedding, x -> CAST(x AS DOUBLE))")).alias(
            "pos", "v"
        ),
    )
    # dimension axis from ONE row — never a corpus-wide distinct just to
    # learn the embedding width; harr[pos] = the 16 hyperplane components
    # at this position, so the broadcast side is dim rows, not dim×bits
    dims = e.limit(1).select(
        F.posexplode(F.col("embedding")).alias("pos", "_v")
    ).select("pos")
    hyper = dims.select(
        "pos",
        F.expr(
            f"TRANSFORM(SEQUENCE(0, {_SRP_BITS - 1}), "
            f"j -> {_srp_h('j', 'pos', 'spark')})"
        ).alias("harr"),
    )
    proj = (
        elems.join(F.broadcast(hyper), "pos")
        .groupBy("vec_id")
        .agg(
            *[
                F.sum(
                    F.expr(
                        f"CAST(FLOOR(v * harr[{j}] * {_SRP_SCALE}) AS BIGINT)"
                    )
                ).alias(f"p{j}")
                for j in range(_SRP_BITS)
            ]
        )
    )
    bval_exprs = []
    for band in range(_SRP_BITS // _SRP_BAND_BITS):
        bits = " + ".join(
            f"SHIFTLEFT(CASE WHEN p{band * _SRP_BAND_BITS + r} >= 0 "
            f"THEN 1 ELSE 0 END, {r})"
            for r in range(_SRP_BAND_BITS)
        )
        bval_exprs += [str(band), f"({bits})"]
    stack = (
        f"STACK({_SRP_BITS // _SRP_BAND_BITS}, {', '.join(bval_exprs)}) "
        "AS (band, bval)"
    )
    return proj.select("vec_id", F.expr(stack))


@register(
    "q89_ann_srp_lsh",
    sql=f"""
    WITH {_srp_bands_ctes()}, cands AS (
      SELECT DISTINCT q.vec_id AS query_id, t.vec_id AS neighbor_id
      FROM bands q JOIN bands t USING (band, bval)
      WHERE q.vec_id < {_N_QUERIES} AND t.vec_id != q.vec_id
    ), base0 AS (
      SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ), norm_terms AS (
      SELECT vec_id, emb, UNNEST(RANGE(1, LEN(emb) + 1)) AS i FROM base0
    ), base AS (
      SELECT vec_id, ANY_VALUE(emb) AS emb,
             SQRT(CAST(SUM(CAST(emb[i] * emb[i] AS {_DOT_DEC})) AS DOUBLE)) AS nrm
      FROM norm_terms GROUP BY vec_id
    ), pairs AS (
      SELECT c.query_id, c.neighbor_id,
             q.emb AS eq, t.emb AS et, q.nrm AS nq, t.nrm AS nt
      FROM cands c
        JOIN base q ON q.vec_id = c.query_id
        JOIN base t ON t.vec_id = c.neighbor_id
    ), indexed AS (
      SELECT query_id, neighbor_id, eq, et, nq, nt,
             UNNEST(RANGE(1, LEN(eq) + 1)) AS i
      FROM pairs
    ), scored AS (
      SELECT query_id, neighbor_id,
             CAST(SUM(CAST(eq[i] * et[i] AS {_DOT_DEC})) AS DOUBLE)
               / (ANY_VALUE(nq) * ANY_VALUE(nt)) AS cosine
      FROM indexed GROUP BY query_id, neighbor_id
    )
    SELECT query_id, neighbor_id, rnk, ROUND(cosine, 6) AS score
    FROM (
      SELECT query_id, neighbor_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM scored)
    WHERE rnk <= {_SRP_TOP_K}
    ORDER BY query_id, rnk
    """,
    tags=("similarity", "ann", "lsh", "srp", "scale-path"),
)
def q89_ann_srp_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-random-projection LSH ANN: each vector gets a {_SRP_BITS}-bit
    signature (bit j = sign of the dot product with deterministic
    hyperplane j), banded 4×4; a query retrieves exactly the vectors
    sharing at least one band (equi-join on (band, bval)), then ranks the
    candidates by exact cosine.

    This is the data-independent bucketed retrieval path, complementing
    q56's IVF (which needs trained centroids): no training pass, new
    vectors index in one map, and the probe cost is the bucket hit-list
    rather than a cell. The same banding trade-off as text LSH (q51)
    applies — more/narrower bands raise recall and candidate count;
    PERF.md's LSH study quantifies it.

    Scale shape: signatures are fully map-side — each vector's 16
    projections come from one broadcast join against the 64-row
    per-position hyperplane-vector table and a single groupBy(vec_id)
    carrying 16 BIGINT partials (one shuffled row per vector, with
    map-side partial aggregation); band values and the (band, bval)
    stack are then computed without any further shuffle. Retrieval
    shuffles only (band, bval) keys. No all-pairs product anywhere; hot
    buckets (near-duplicate pile-ups) take the q51 bucket-cap guard
    unchanged since the join key has the same shape."""
    e = table(spark, sf_dir, "embeddings")
    # Round 13: the round-12 bands localCheckpoint was a driver-measured
    # 0.82× regression (BENCH_r12: 1.25 → 1.52 s). Re-adjudicated with an
    # 8-sample interleaved A/B: plain med 1.17 s (min 0.91) vs 1.57 s
    # (min 1.24) with the checkpoint — recomputing the signature pipeline
    # on the second join side is cheaper than materializing the bands
    # (guide §5: materialize only when recomputation provably exceeds
    # materialization). Removed; back to the r11 shape.
    bands = _srp_bands(e)
    cands = (
        bands.filter(F.col("vec_id") < _N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), "band", "bval")
        .join(
            bands.select(F.col("vec_id").alias("neighbor_id"), "band", "bval"),
            ["band", "bval"],
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    norm = (
        f"SQRT(CAST(AGGREGATE(TRANSFORM(emb, x -> CAST(x * x AS {_DOT_DEC})), "
        f"CAST(0 AS {_DOT_DEC}), (acc, v) -> CAST(acc + v AS {_DOT_DEC})) AS DOUBLE))"
    )
    # base is NOT checkpointed: the two broadcast builds each recompute the
    # norm, but interleaved A/Bs (rounds 12 and 13) measured every
    # checkpoint variant slower — materializing the full embedding arrays
    # costs more than the duplicate norm fold.
    base = e.select(
        "vec_id",
        F.expr("TRANSFORM(embedding, x -> CAST(x AS DOUBLE))").alias("emb"),
    ).withColumn("nrm", F.expr(norm))
    dot = (
        f"AGGREGATE(ZIP_WITH(eq, et, (p, v) -> CAST(p * v AS {_DOT_DEC})), "
        f"CAST(0 AS {_DOT_DEC}), (acc, v) -> CAST(acc + v AS {_DOT_DEC}))"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        cands.join(
            base.select(
                F.col("vec_id").alias("query_id"),
                F.col("emb").alias("eq"),
                F.col("nrm").alias("nq"),
            ),
            "query_id",
        )
        .join(
            base.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("emb").alias("et"),
                F.col("nrm").alias("nt"),
            ),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            (F.expr(f"CAST({dot} AS DOUBLE)") / (F.col("nq") * F.col("nt"))).alias(
                "cosine"
            ),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _SRP_TOP_K)
        .select(
            "query_id", "neighbor_id", "rnk", F.round("cosine", 6).alias("score")
        )
        .orderBy("query_id", "rnk")
    )


# ---------------------------------------------------------------------------
# Diversity sampling: SRP-direction buckets × per-bucket quota
# ---------------------------------------------------------------------------

_DIV_BITS = 8  # SRP sign bits per bucket -> up to 256 direction buckets
_DIV_CAP = 2  # vectors kept per bucket


@register(
    "q95_diverse_sample",
    sql=f"""
    WITH elems AS (
      SELECT vec_id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS v
      FROM (SELECT vec_id, embedding,
                   UNNEST(RANGE(1, LEN(embedding) + 1)) AS i
            FROM embeddings)
    ), hyper AS (
      SELECT j, pos, {_srp_h("j", "pos", "duckdb")} AS h
      FROM (SELECT UNNEST(RANGE(0, {_DIV_BITS})) AS j)
      CROSS JOIN (SELECT DISTINCT pos FROM elems)
    ), proj AS (
      SELECT vec_id, j,
             SUM(CAST(FLOOR(v * h * {_SRP_SCALE}) AS BIGINT)) AS proj
      FROM elems JOIN hyper USING (pos)
      GROUP BY vec_id, j
    ), buckets AS (
      SELECT vec_id,
             SUM((CASE WHEN proj >= 0 THEN 1 ELSE 0 END) << CAST(j AS INT))
               AS bucket
      FROM proj GROUP BY vec_id
    ), sized AS (
      SELECT vec_id, bucket,
             COUNT(*) OVER (PARTITION BY bucket) AS n_in_bucket,
             ROW_NUMBER() OVER (
               PARTITION BY bucket
               ORDER BY {duckdb_hash32("CAST(vec_id AS VARCHAR)", "divsample")},
                        vec_id) AS rnk
      FROM buckets
    )
    SELECT CAST(bucket AS BIGINT) AS bucket, vec_id,
           CAST(rnk AS BIGINT) AS rnk, n_in_bucket
    FROM sized WHERE rnk <= {_DIV_CAP}
    ORDER BY bucket, rnk
    """,
    tags=("similarity", "sampling", "diversity", "srp"),
)
def q95_diverse_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity sampling over the embedding corpus: bucket vectors by an
    8-bit SRP direction signature (same integer-quantized hyperplane
    machinery as q89, so buckets ≈ directions on the unit sphere), then
    keep a deterministic hash-rank quota of 2 per bucket — the embedding
    analog of q88's per-source quota. The sample covers every occupied
    direction cell instead of oversampling dense regions, which is the
    point of diversity sampling for training-data curation (cf. q59's
    k-means cells — this is the training-free variant).

    Scale shape: signatures are fully map-side (broadcast hyperplane
    table + one combine-enabled groupBy carrying 8 BIGINT partials per
    vector); the quota is one (bucket)-keyed window. At a production cap,
    the q88 hash-threshold pre-thin applies unchanged since the rank key
    is the same portable hash.
    """
    e = table(spark, sf_dir, "embeddings")
    elems = e.select(
        "vec_id",
        F.posexplode(F.expr("TRANSFORM(embedding, x -> CAST(x AS DOUBLE))")).alias(
            "pos", "v"
        ),
    )
    dims = e.limit(1).select(
        F.posexplode(F.col("embedding")).alias("pos", "_v")
    ).select("pos")
    hyper = dims.select(
        "pos",
        F.expr(
            f"TRANSFORM(SEQUENCE(0, {_DIV_BITS - 1}), "
            f"j -> {_srp_h('j', 'pos', 'spark')})"
        ).alias("harr"),
    )
    proj = (
        elems.join(F.broadcast(hyper), "pos")
        .groupBy("vec_id")
        .agg(
            *[
                F.sum(
                    F.expr(
                        f"CAST(FLOOR(v * harr[{j}] * {_SRP_SCALE}) AS BIGINT)"
                    )
                ).alias(f"p{j}")
                for j in range(_DIV_BITS)
            ]
        )
    )
    bucket = " + ".join(
        f"SHIFTLEFT(CASE WHEN p{j} >= 0 THEN 1 ELSE 0 END, {j})"
        for j in range(_DIV_BITS)
    )
    buckets = proj.select(
        "vec_id", F.expr(f"CAST(({bucket}) AS BIGINT)").alias("bucket")
    )
    w_size = Window.partitionBy("bucket")
    w_rank = Window.partitionBy("bucket").orderBy(
        F.expr(spark_hash32("CAST(vec_id AS STRING)", "divsample")), F.asc("vec_id")
    )
    return (
        buckets.withColumn("n_in_bucket", F.count(F.lit(1)).over(w_size))
        .withColumn("rnk", F.row_number().over(w_rank).cast("bigint"))
        .filter(F.col("rnk") <= _DIV_CAP)
        .select("bucket", "vec_id", "rnk", "n_in_bucket")
        .orderBy("bucket", "rnk")
    )


# ---------------------------------------------------------------------------
# q114 — embedding-store health statistics
# ---------------------------------------------------------------------------
# Vector-store QA: per-dimension moment/range stats over the whole corpus,
# the drift check run before trusting an ANN index or a PCA basis (a dim
# whose mean wanders or whose range collapses signals an upstream encoder
# change). Values are float32; both engines widen each element to the
# SAME double, and every statistic is computed on q = FLOOR(x * 2^20)
# BIGINTs (the SRP_SCALE policy) so sums are order-independent and
# engine-exact:
#
#   mean_q = Σq DIV n          var_q = (n·Σq² − (Σq)²) DIV n²
#
# Headroom: |q| < 2^21 ⇒ q² < 2^42 per element; the Σq/Σq² accumulators
# and the n·Σq² product run in DECIMAL(38,0) on the Spark side (matching
# the oracle's HUGEINT promotion), exact to 10³⁸ — no scale-dropping or
# sum-sharding is needed at any corpus size. var_q is in q² units
# (2^40 per unit²) and always fits BIGINT (bounded by range²/4).
@register(
    "q114_embedding_health",
    sql=f"""
    WITH elems AS (
      SELECT generate_subscripts(embedding, 1) AS dim,
             CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * {1 << 20}) AS BIGINT) AS q
      FROM embeddings
    )
    SELECT dim,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(q) // COUNT(*) AS BIGINT) AS mean_q,
           CAST((COUNT(*) * SUM(q * q) - SUM(q) * SUM(q))
                // (COUNT(*) * COUNT(*)) AS BIGINT) AS var_q,
           MIN(q) AS min_q,
           MAX(q) AS max_q
    FROM elems
    GROUP BY dim
    ORDER BY dim
    """,
    tags=("similarity", "embeddings", "quality", "exact-integer"),
)
def q114_embedding_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean/variance/range of the embedding corpus in
    order-independent integer arithmetic — the store-level health report
    (spec and headroom in the module comment).

    Scale shape: posexplode is map-side (64 rows per vector, no data
    crosses the wire un-aggregated); the single exchange carries one
    partial-moment row per (dim, task) — 64 × tasks rows with five BIGINT
    counters, independent of corpus size. The same pass extends to any
    moment (skew/kurtosis) by adding Σq³/Σq⁴ counters. A per-day variant
    (add the day to the key) turns this into the drift time series that
    alerts on encoder regressions."""
    emb = table(spark, sf_dir, "embeddings")
    elems = emb.select(
        F.posexplode("embedding").alias("pos", "x")
    ).select(
        (F.col("pos") + 1).alias("dim"),
        F.expr(f"CAST(FLOOR(CAST(x AS DOUBLE) * {1 << 20}) AS BIGINT)").alias("q"),
    )
    # Moment accumulators in DECIMAL(38,0): |q| ≤ 2^20·max|x|, so a plain
    # BIGINT SUM(q·q) wraps past ~10⁷ vectors and n·Σq² past ~10⁵, where
    # Spark (non-ANSI) wraps silently while the oracle's SUM promotes to
    # HUGEINT — the q92/q93 divergence class. Decimal keeps the moments
    # exact to 10³⁸; the final var_q always fits BIGINT (≤ range²/4).
    return (
        elems.groupBy("dim")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.expr(
                "SUM(CAST(q AS DECIMAL(38,0))) DIV COUNT(*)"
            ).cast("bigint").alias("mean_q"),
            F.expr(
                "(COUNT(*) * SUM(CAST(q AS DECIMAL(38,0))"
                " * CAST(q AS DECIMAL(38,0)))"
                " - SUM(CAST(q AS DECIMAL(38,0)))"
                " * SUM(CAST(q AS DECIMAL(38,0))))"
                " DIV (CAST(COUNT(*) AS DECIMAL(38,0)) * COUNT(*))"
            )
            .cast("bigint")
            .alias("var_q"),
            F.min("q").alias("min_q"),
            F.max("q").alias("max_q"),
        )
        .orderBy("dim")
    )


@register(
    "q138_vector_contract",
    sql=f"""
    WITH norms AS (
      SELECT vec_id,
             LEN(embedding) AS dim,
             LEN(LIST_FILTER(embedding, x -> ISNAN(CAST(x AS DOUBLE)))) AS n_nan,
             CAST(LIST_SUM(LIST_TRANSFORM(embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * {1 << 20}) AS BIGINT)
                        * CAST(FLOOR(CAST(x AS DOUBLE) * {1 << 20}) AS BIGINT)))
               AS BIGINT) AS sq_norm_q
      FROM embeddings
    )
    SELECT CASE WHEN sq_norm_q = 0 THEN -1
                ELSE LENGTH(BIN(sq_norm_q)) END AS norm_band,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(COUNT(CASE WHEN dim <> 64 THEN 1 END) AS BIGINT) AS n_bad_dim,
           CAST(COUNT(CASE WHEN n_nan > 0 THEN 1 END) AS BIGINT) AS n_with_nan
    FROM norms
    GROUP BY norm_band
    ORDER BY norm_band
    """,
    tags=("similarity", "embeddings", "contract", "quality", "exact-integer"),
)
def q138_vector_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vector-level contract audit complementing q114's per-dimension
    moments: every embedding bucketed by the bit-length band of its
    quantized squared norm (band -1 = exact zero vector — dead input that
    poisons cosine), with dimension-mismatch and NaN counts per band —
    the checks an ANN index build runs before trusting a vector batch.

    Scale shape: entirely map-side per-vector arithmetic (higher-order
    TRANSFORM/AGGREGATE over the array, quantized to BIGINT so both
    engines agree bit-for-bit) followed by one ≤ ~45-band rollup. At
    100 TB the audit rides whatever scan ingests the vectors — zero
    extra passes. Gate writes on `n_bad_dim = 0 AND n_with_nan = 0`
    like q113 gates documents."""
    emb = table(spark, sf_dir, "embeddings")
    q = f"CAST(FLOOR(CAST(x AS DOUBLE) * {1 << 20}) AS BIGINT)"
    norms = emb.select(
        F.size("embedding").alias("dim"),
        F.expr(
            "SIZE(FILTER(embedding, x -> ISNAN(CAST(x AS DOUBLE))))"
        ).alias("n_nan"),
        F.expr(
            f"AGGREGATE(embedding, CAST(0 AS BIGINT),"
            f" (acc, x) -> acc + {q} * {q})"
        ).alias("sq_norm_q"),
    )
    return (
        norms.groupBy(
            F.expr(
                "CASE WHEN sq_norm_q = 0 THEN -1"
                " ELSE LENGTH(BIN(sq_norm_q)) END"
            ).alias("norm_band")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
            F.count(F.when(F.col("dim") != 64, 1)).cast("bigint").alias(
                "n_bad_dim"
            ),
            F.count(F.when(F.col("n_nan") > 0, 1)).cast("bigint").alias(
                "n_with_nan"
            ),
        )
        .orderBy("norm_band")
    )


@register(
    "q139_label_balance",
    sql="""
    WITH counts AS (
      SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label
    ), stats AS (
      SELECT COUNT(*) AS k, SUM(n) AS total FROM counts
    )
    SELECT c.label,
           CAST(c.n AS BIGINT) AS n_vectors,
           CAST((10000 * c.n) // s.total AS BIGINT) AS share_bps,
           CAST((10000 * c.n * s.k) // s.total - 10000 AS BIGINT)
             AS dev_from_uniform_bps
    FROM counts c CROSS JOIN stats s
    ORDER BY c.label
    """,
    tags=("similarity", "labels", "class-balance", "ml-data"),
)
def q139_label_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balance audit of the embedding labels: each class's share in
    basis points and its deviation from the uniform share — the
    imbalance check run before training or evaluating any classifier on
    the vectors (a class at dev −9000 bps is 10× under-represented and
    needs reweighting or resampling; q88's quota capping is the fix on
    the document side).

    Scale shape: one partial-aggregated count per label, then integer
    arithmetic against a broadcast 1-row total — the audit is free at
    any scale. Grouped variants (balance per source, per day) add keys
    to the first agg only."""
    emb = table(spark, sf_dir, "embeddings")
    counts = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    stats = counts.agg(
        F.count(F.lit(1)).alias("k"), F.sum("n").alias("total")
    )
    return (
        counts.crossJoin(F.broadcast(stats))
        .select(
            "label",
            F.col("n").cast("bigint").alias("n_vectors"),
            F.expr("CAST((10000 * n) DIV total AS BIGINT)").alias("share_bps"),
            F.expr(
                "CAST((10000 * n * k) DIV total - 10000 AS BIGINT)"
            ).alias("dev_from_uniform_bps"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# IVF-PQ — the composed two-level index (similarity/ivfpq.py) under the
# oracle. Training loops are not SQL-expressible (q59's rows-only reason),
# so the registered query runs the RETRIEVAL machinery on a deterministic,
# training-free instance: cells = the fixture label clusters (q56's device),
# codebooks = the init-only state of train_pq (the ksub lowest-portable-hash
# residual sub-vectors — pure hashing + ranking, fully SQL-expressible).
# Lloyd-trained cells/codebooks keep their pytest evidence (test_ivfpq.py);
# what the oracle pins is everything that runs per-query at serve time:
# residual encode, argmin code assignment, exact reconstruction norms,
# cell routing, the ⟨q,c⟩ + Σ LUT ADC identity, candidate top-c, and the
# exact-cosine rerank.

_IVFPQ_M = 8  # subspaces (d=64 → 8-dim sub-vectors)
_IVFPQ_KSUB = 16  # codewords per subspace
_IVFPQ_PROBE = 2  # cells probed per query
_IVFPQ_RERANK = 10  # ADC candidates kept for exact rerank
_IVFPQ_K = 3

from ..functions.hashing import duckdb_hash32 as _duck_h32  # noqa: E402


@register(
    "q141_ann_ivfpq",
    sql=f"""
    WITH indexed AS (
      SELECT vec_id, label, embedding,
             UNNEST(RANGE(1, LEN(embedding) + 1)) AS i
      FROM embeddings
    ), elems AS (
      SELECT vec_id, label, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS v
      FROM indexed
    ), cent AS (  -- coarse centroids: exact decimal means per label cell
      SELECT label, pos,
             CAST(SUM(CAST(v AS DECIMAL(28,18))) AS DOUBLE) / COUNT(*) AS cv
      FROM elems GROUP BY label, pos
    ), res AS (   -- residuals r = x - c(cell), split into subspaces
      SELECT e.vec_id, e.label, e.pos,
             e.pos // {64 // _IVFPQ_M} AS sub, e.pos % {64 // _IVFPQ_M} AS spos,
             e.v - c.cv AS r
      FROM elems e JOIN cent c ON e.label = c.label AND e.pos = c.pos
    ), init_ids AS (  -- train_pq init: ksub lowest-portable-hash ids
      SELECT vec_id, ROW_NUMBER() OVER (ORDER BY h, vec_id) - 1 AS cell
      FROM (SELECT DISTINCT vec_id,
                   {_duck_h32("CAST(vec_id AS VARCHAR)", "pq")} AS h
            FROM elems)
      QUALIFY cell < {_IVFPQ_KSUB}
    ), codebook AS (  -- (sub, cell, spos, cw): the picked residual subvectors
      SELECT r.sub, i.cell, r.spos, r.r AS cw
      FROM res r JOIN init_ids i USING (vec_id)
    ), dists AS (     -- per-subspace argmin code assignment
      SELECT r.vec_id, r.sub, cb.cell,
             CAST(SUM(CAST((r.r - cb.cw) * (r.r - cb.cw)
                           AS DECIMAL(28,18))) AS DOUBLE) AS sq
      FROM res r JOIN codebook cb ON cb.sub = r.sub AND cb.spos = r.spos
      GROUP BY r.vec_id, r.sub, cb.cell
    ), codes AS (
      SELECT vec_id, sub, cell FROM (
        SELECT vec_id, sub, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                  ORDER BY sq, cell) AS rn
        FROM dists) WHERE rn = 1
    ), vec_cells AS (
      SELECT DISTINCT vec_id, label FROM elems
    ), recon AS (     -- exact reconstruction norm ||c + r_hat||
      SELECT c.vec_id,
             SQRT(CAST(SUM(CAST((ct.cv + cb.cw) * (ct.cv + cb.cw)
                                AS DECIMAL(28,18))) AS DOUBLE)) AS recon_norm
      FROM codes c
        JOIN codebook cb ON cb.sub = c.sub AND cb.cell = c.cell
        JOIN vec_cells vc ON vc.vec_id = c.vec_id
        JOIN cent ct ON ct.label = vc.label
                    AND ct.pos = c.sub * {64 // _IVFPQ_M} + cb.spos
      GROUP BY c.vec_id
    ), queries AS (
      SELECT vec_id AS query_id, pos, v FROM elems WHERE vec_id < {_N_QUERIES}
    ), qnorm AS (
      SELECT query_id,
             SQRT(CAST(SUM(CAST(v * v AS DECIMAL(28,18))) AS DOUBLE)) AS qn
      FROM queries GROUP BY query_id
    ), routing AS (   -- decimal <q, c> per cell, ranked by cosine
      SELECT q.query_id, c.label,
             SUM(CAST(q.v * c.cv AS DECIMAL(28,18))) AS cdot,
             CAST(SUM(CAST(q.v * c.cv AS DECIMAL(28,18))) AS DOUBLE)
               / (MIN(qn.qn)
                  * SQRT(CAST(SUM(CAST(c.cv * c.cv AS DECIMAL(28,18)))
                              AS DOUBLE))) AS rcos
      FROM queries q
        JOIN cent c USING (pos)
        JOIN qnorm qn USING (query_id)
      GROUP BY q.query_id, c.label
    ), probes AS (
      SELECT query_id, label, cdot FROM (
        SELECT query_id, label, cdot,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY rcos DESC, label) AS pr
        FROM routing) WHERE pr <= {_IVFPQ_PROBE}
    ), qsub AS (
      SELECT query_id, pos // {64 // _IVFPQ_M} AS sub,
             pos % {64 // _IVFPQ_M} AS spos, v
      FROM queries
    ), lut AS (       -- per-query codeword partial dots (decimal-exact)
      SELECT q.query_id, cb.sub, cb.cell,
             SUM(CAST(q.v * cb.cw AS DECIMAL(28,18))) AS pd
      FROM qsub q JOIN codebook cb ON cb.sub = q.sub AND cb.spos = q.spos
      GROUP BY q.query_id, cb.sub, cb.cell
    ), adc AS (       -- ADC score: <q,c> + sum of LUT reads, all decimal
      SELECT p.query_id, vc.vec_id AS neighbor_id,
             CAST(p.cdot + SUM(l.pd) AS DOUBLE)
               / (MIN(qn.qn) * MIN(r.recon_norm)) AS qcos
      FROM probes p
        JOIN vec_cells vc ON vc.label = p.label AND vc.vec_id != p.query_id
        JOIN codes c ON c.vec_id = vc.vec_id
        JOIN lut l ON l.query_id = p.query_id
                  AND l.sub = c.sub AND l.cell = c.cell
        JOIN recon r ON r.vec_id = vc.vec_id
        JOIN qnorm qn ON qn.query_id = p.query_id
      GROUP BY p.query_id, vc.vec_id, p.cdot
    ), cand AS (      -- top-c ADC candidates per query
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY qcos DESC, neighbor_id) AS cr
        FROM adc) WHERE cr <= {_IVFPQ_RERANK}
    ), rerank AS (    -- exact full-precision cosine over the candidates
      SELECT cd.query_id, cd.neighbor_id,
             CAST(SUM(CAST(q.v * e.v AS DECIMAL(28,18))) AS DOUBLE)
               / (SQRT(CAST(SUM(CAST(q.v * q.v AS DECIMAL(28,18))) AS DOUBLE))
                  * SQRT(CAST(SUM(CAST(e.v * e.v AS DECIMAL(28,18)))
                              AS DOUBLE))) AS cosine
      FROM cand cd
        JOIN elems e ON e.vec_id = cd.neighbor_id
        JOIN queries q ON q.query_id = cd.query_id AND q.pos = e.pos
      GROUP BY cd.query_id, cd.neighbor_id
    )
    SELECT query_id, neighbor_id, rnk, ROUND(cosine, 6) AS score
    FROM (
      SELECT query_id, neighbor_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM rerank)
    WHERE rnk <= {_IVFPQ_K}
    ORDER BY query_id, rnk
    """,
    tags=("similarity", "ann", "ivf", "pq", "scale-path"),
)
def q141_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN (`similarity/ivfpq.py`): route each query to its
    ``n_probe`` nearest cells, ADC-score only those cells' residual PQ
    codes via the ``⟨q,c⟩ + Σ LUT`` decomposition, exact-rerank the top
    candidates — the FAISS-IVFADC shape, here end-to-end in DataFrame
    ops with decimal-exact ADC (``exact_adc=True``) so the full DuckDB
    oracle can hash-match candidate selection, not just the reranked
    tail.

    Cells are the fixture label clusters and codebooks are train_pq's
    deterministic init state (no Lloyd rounds), keeping every stage
    SQL-expressible; the iterative trainings keep pytest evidence
    (`tests/test_ivfpq.py`). At 100 TB the encoded corpus is stored
    partitioned by ``cell`` so the probe is partition pruning; the
    centroid table, codebooks, and per-query LUTs all broadcast."""
    from ..similarity.ivfpq import encode_ivfpq, ivfpq_knn, residuals
    from ..similarity.pq import train_pq

    e = table(spark, sf_dir, "embeddings")
    elems = e.select(
        "vec_id",
        F.col("label").cast("int").alias("label"),
        F.posexplode(F.expr("TRANSFORM(embedding, x -> CAST(x AS DOUBLE))")).alias(
            "pos", "v"
        ),
    )
    centroids = (
        elems.groupBy("label", "pos")
        .agg(
            (
                F.sum(F.col("v").cast("decimal(28,18)")).cast("double")
                / F.count(F.lit(1))
            ).alias("cv")
        )
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "cv"))).alias("pcv"))
        .select(
            F.col("label").alias("cell"),
            F.expr("TRANSFORM(pcv, x -> x.cv)").alias("cvec"),
        )
    )
    books = train_pq(
        residuals(e, centroids, cell_col="label"),
        m=_IVFPQ_M,
        ksub=_IVFPQ_KSUB,
        n_iter=0,
        id_col="id",
        vec_col="rvec",
    )
    enc = encode_ivfpq(e, centroids, books, m=_IVFPQ_M, cell_col="label")
    q = e.filter(F.col("vec_id") < _N_QUERIES)
    out = ivfpq_knn(
        q,
        enc,
        centroids,
        books,
        k=_IVFPQ_K,
        m=_IVFPQ_M,
        ksub=_IVFPQ_KSUB,
        n_probe=_IVFPQ_PROBE,
        rerank=_IVFPQ_RERANK,
        corpus=e,
        exact_adc=True,
    )
    return out.select(
        "query_id", "neighbor_id", "rnk", F.round("cosine", 6).alias("score")
    ).orderBy("query_id", "rnk")


# ---------------------------------------------------------------------------
# q170 — hard-negative mining (contrastive training-pair selection)
# ---------------------------------------------------------------------------
# The training-data op behind every contrastive/metric-learning pipeline:
# for each anchor vector, the HARDEST NEGATIVE (most-similar vector with a
# DIFFERENT label — the pair the loss learns most from) and the FARTHEST
# POSITIVE (least-similar same-label vector), plus the triplet margin
# between them (negative margin ⇒ the triplet is currently violated).
# Brute-force over the fixture slice with q55's decimal-exact dot
# products; the IVF/SRP routing rungs (q56/q89) are the scale path for
# candidate generation — the selection logic here is routing-agnostic.

_HN_ANCHORS = 20  # vec_id < 20 act as anchors


@register(
    "q170_hard_negatives",
    sql=f"""
    WITH base0 AS (
      SELECT vec_id, label,
             LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ), norm_terms AS (
      SELECT vec_id, label, emb, UNNEST(RANGE(1, LEN(emb) + 1)) AS i
      FROM base0
    ), base AS (
      SELECT vec_id, ANY_VALUE(label) AS label, ANY_VALUE(emb) AS emb,
             SQRT(CAST(SUM(CAST(emb[i] * emb[i] AS {{dot}})) AS DOUBLE)) AS nrm
      FROM norm_terms GROUP BY vec_id
    ), pairs AS (
      SELECT a.vec_id AS anchor_id, a.label AS anchor_label,
             t.vec_id AS other_id, t.label AS other_label,
             a.emb AS ea, t.emb AS et, a.nrm AS na, t.nrm AS nt
      FROM base a JOIN base t ON t.vec_id != a.vec_id
      WHERE a.vec_id < {{anchors}}
    ), indexed AS (
      SELECT anchor_id, anchor_label, other_id, other_label,
             ea, et, na, nt, UNNEST(RANGE(1, LEN(ea) + 1)) AS i
      FROM pairs
    ), scored AS (
      SELECT anchor_id, ANY_VALUE(anchor_label) AS anchor_label,
             other_id, ANY_VALUE(other_label) AS other_label,
             CAST(SUM(CAST(ea[i] * et[i] AS {{dot}})) AS DOUBLE)
               / (ANY_VALUE(na) * ANY_VALUE(nt)) AS cosine
      FROM indexed GROUP BY anchor_id, other_id
    ), neg AS (
      SELECT anchor_id, anchor_label, other_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY anchor_id
                                ORDER BY cosine DESC, other_id) AS rn
      FROM scored WHERE other_label != anchor_label
    ), pos AS (
      SELECT anchor_id, other_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY anchor_id
                                ORDER BY cosine ASC, other_id) AS rn
      FROM scored WHERE other_label = anchor_label
    )
    SELECT n.anchor_id,
           CAST(n.anchor_label AS BIGINT) AS anchor_label,
           n.other_id AS hard_neg_id,
           ROUND(n.cosine, 6) AS hard_neg_cos,
           p.other_id AS far_pos_id,
           ROUND(p.cosine, 6) AS far_pos_cos,
           ROUND(p.cosine - n.cosine, 6) AS margin
    FROM neg n JOIN pos p
      ON p.anchor_id = n.anchor_id AND p.rn = 1
    WHERE n.rn = 1
    ORDER BY n.anchor_id
    """.format(dot=_DOT_DEC, anchors=_HN_ANCHORS),
    tags=("similarity", "training-pairs", "contrastive", "mining"),
)
def q170_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative / farthest-positive triplet mining per anchor vector:
    the most-similar different-label vector, the least-similar same-label
    vector, and the triplet margin between them — the pair-selection pass
    a contrastive fine-tune runs over its corpus each round.

    Scale shape: anchors broadcast against the corpus (one scan), q55's
    JVM-side ZIP_WITH/AGGREGATE decimal dot products, then two
    anchor-keyed rank windows (negatives by cosine desc, positives asc)
    over the scored pairs. Swap the brute-force pair stage for q56/q89
    routing when the corpus stops fitting a single scan per anchor set."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "embeddings")
    norm = (
        f"SQRT(CAST(AGGREGATE(TRANSFORM(emb, x -> CAST(x * x AS {_DOT_DEC})), "
        f"CAST(0 AS {_DOT_DEC}), (acc, v) -> CAST(acc + v AS {_DOT_DEC})) AS DOUBLE))"
    )
    base = e.select(
        "vec_id",
        "label",
        F.expr("TRANSFORM(embedding, x -> CAST(x AS DOUBLE))").alias("emb"),
    ).withColumn("nrm", F.expr(norm))
    a = base.filter(F.col("vec_id") < _HN_ANCHORS).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.col("emb").alias("ea"),
        F.col("nrm").alias("na"),
    )
    t = base.select(
        F.col("vec_id").alias("other_id"),
        F.col("label").alias("other_label"),
        F.col("emb").alias("et"),
        F.col("nrm").alias("nt"),
    )
    dot = (
        f"AGGREGATE(ZIP_WITH(ea, et, (p, v) -> CAST(p * v AS {_DOT_DEC})), "
        f"CAST(0 AS {_DOT_DEC}), (acc, v) -> CAST(acc + v AS {_DOT_DEC}))"
    )
    scored = (
        F.broadcast(a)
        .join(t, F.col("other_id") != F.col("anchor_id"))
        .select(
            "anchor_id",
            "anchor_label",
            "other_id",
            "other_label",
            (
                F.expr(f"CAST({dot} AS DOUBLE)") / (F.col("na") * F.col("nt"))
            ).alias("cosine"),
        )
    )
    w_neg = Window.partitionBy("anchor_id").orderBy(
        F.desc("cosine"), F.asc("other_id")
    )
    w_pos = Window.partitionBy("anchor_id").orderBy(
        F.asc("cosine"), F.asc("other_id")
    )
    neg = (
        scored.filter(F.col("other_label") != F.col("anchor_label"))
        .withColumn("rn", F.row_number().over(w_neg))
        .filter(F.col("rn") == 1)
        .select(
            "anchor_id",
            F.col("anchor_label").cast("bigint").alias("anchor_label"),
            F.col("other_id").alias("hard_neg_id"),
            F.col("cosine").alias("_nc"),
        )
    )
    pos = (
        scored.filter(F.col("other_label") == F.col("anchor_label"))
        .withColumn("rn", F.row_number().over(w_pos))
        .filter(F.col("rn") == 1)
        .select(
            "anchor_id",
            F.col("other_id").alias("far_pos_id"),
            F.col("cosine").alias("_pc"),
        )
    )
    return (
        neg.join(pos, "anchor_id")
        .select(
            "anchor_id",
            "anchor_label",
            "hard_neg_id",
            F.round("_nc", 6).alias("hard_neg_cos"),
            "far_pos_id",
            F.round("_pc", 6).alias("far_pos_cos"),
            F.round(F.col("_pc") - F.col("_nc"), 6).alias("margin"),
        )
        .orderBy("anchor_id")
    )


# ---------------------------------------------------------------------------
# q177 — hybrid retrieval with reciprocal-rank fusion (BM25 x cosine)
# ---------------------------------------------------------------------------
# The production retrieval stack is hybrid: a lexical leg (BM25, q103)
# catches exact-term matches embeddings smear out, a vector leg (cosine,
# q55) catches paraphrases lexical scoring misses, and reciprocal-rank
# fusion merges the two WITHOUT score calibration — ranks are the only
# common currency between a fixed-point BM25 and a cosine. RRF keeps the
# classic k=60 but evaluates each term as FLOOR(1e12 / (k + rank)): exact
# BIGINT on both engines, order-identical to the 1/(k+r) real for any two
# distinct rank multisets that differ within the leg depth. vec_id is
# doc_id's embedding (the fixtures share the 0..N-1 key space).
_RRF_K = 60
_RRF_SCALE = 1_000_000_000_000
_RRF_DEPTH = 50  # per-leg candidate depth fed into the fusion
_RRF_TOP = 15
_RRF_QVEC = 0  # the vector-leg query embedding


def _rrf_lex_ctes() -> str:
    """The lexical-leg CTE chain (toks → … → lex), shared by q177 and
    q179 — both fuse the same fixed-point BM25 leg."""
    from .textops import _BM25_SQL_LIST

    return f"""toks AS (
      SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w FROM documents
    ), dls AS (
      SELECT doc_id, COUNT(*) AS dl FROM toks WHERE w <> '' GROUP BY doc_id
    ), corpus AS (
      SELECT COUNT(*) AS n, SUM(dl) AS s FROM dls
    ), tfs AS (
      SELECT doc_id, w AS term, COUNT(*) AS tf
      FROM toks WHERE w IN ({_BM25_SQL_LIST})
      GROUP BY doc_id, w
    ), dfs AS (
      SELECT term, COUNT(*) AS df FROM tfs GROUP BY term
    ), lex_scores AS (
      SELECT t.doc_id,
             CAST(SUM(
               ((1000000 * (2*c.n - 2*f.df + 1)) // (2*f.df + 1))
               * ((22000 * c.s * t.tf) // (10*c.s*t.tf + 3*c.s + 9*d.dl*c.n))
             ) AS BIGINT) AS bm25
      FROM tfs t
      JOIN dfs f USING (term)
      JOIN dls d USING (doc_id)
      CROSS JOIN corpus c
      GROUP BY t.doc_id
    ), lex_ranked AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS r_lex
      FROM lex_scores
    ), lex AS (
      SELECT doc_id, r_lex FROM lex_ranked WHERE r_lex <= {_RRF_DEPTH}
    )"""


def _rrf_fusion_sql() -> str:
    """The fusion tail (fused → final → SELECT), shared by q177/q179:
    expects CTEs ``lex(doc_id, r_lex)`` and ``vec(doc_id, r_vec)``."""
    return f""", fused AS (
      SELECT doc_id,
             COALESCE({_RRF_SCALE} // ({_RRF_K} + r_lex), 0)
             + COALESCE({_RRF_SCALE} // ({_RRF_K} + r_vec), 0) AS rrf,
             r_lex, r_vec
      FROM lex FULL JOIN vec USING (doc_id)
    ), final AS (
      SELECT doc_id,
             CAST(rrf AS BIGINT) AS rrf_scaled,
             CAST(COALESCE(r_lex, 0) AS BIGINT) AS lex_rank,
             CAST(COALESCE(r_vec, 0) AS BIGINT) AS vec_rank,
             ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS fr
      FROM fused
    )
    SELECT doc_id, rrf_scaled, lex_rank, vec_rank,
           CAST(fr AS BIGINT) AS fused_rank
    FROM final WHERE fr <= {_RRF_TOP}
    ORDER BY fused_rank
    """


def _rrf_sql() -> str:
    return f"""
    WITH {_rrf_lex_ctes()}, base0 AS (
      SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ), pairs AS (
      SELECT t.vec_id AS doc_id, q.emb AS eq, t.emb AS et
      FROM base0 q JOIN base0 t ON t.vec_id != q.vec_id
      WHERE q.vec_id = {_RRF_QVEC}
    ), indexed AS (
      SELECT doc_id, eq, et, UNNEST(RANGE(1, LEN(eq) + 1)) AS i FROM pairs
    ), vec_scored AS (
      SELECT doc_id,
             CAST(SUM(CAST(eq[i] * et[i] AS {_DOT_DEC})) AS DOUBLE)
               / (SQRT(CAST(SUM(CAST(eq[i] * eq[i] AS {_DOT_DEC})) AS DOUBLE))
                  * SQRT(CAST(SUM(CAST(et[i] * et[i] AS {_DOT_DEC})) AS DOUBLE)))
               AS cosine
      FROM indexed
      GROUP BY doc_id
    ), vec_ranked AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id) AS r_vec
      FROM vec_scored
    ), vec AS (
      SELECT doc_id, r_vec FROM vec_ranked WHERE r_vec <= {_RRF_DEPTH}
    ){_rrf_fusion_sql()}"""


def _rrf_lex_leg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, r_lex): q103's fixed-point BM25 leg ranked and cut at
    the fusion depth (_RRF_DEPTH) — shared by q177 and q179."""
    from pyspark.sql import Window

    from .textops import _BM25_TERMS

    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    dls = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    corpus = dls.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").cast("bigint").alias("s")
    )
    tfs = (
        toks.filter(F.col("w").isin(*_BM25_TERMS))
        .groupBy("doc_id", F.col("w").alias("term"))
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfs = tfs.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf_ppm = F.expr("(1000000 * (2*n - 2*df + 1)) DIV (2*df + 1)")
    sat_k = F.expr("(22000 * s * tf) DIV (10*s*tf + 3*s + 9*dl*n)")
    lex_scores = (
        tfs.join(F.broadcast(dfs), "term")
        .join(dls, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .groupBy("doc_id")
        .agg(F.sum(idf_ppm * sat_k).cast("bigint").alias("bm25"))
    )
    w_lex = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    return (
        lex_scores.withColumn("r_lex", F.row_number().over(w_lex))
        .filter(F.col("r_lex") <= _RRF_DEPTH)
        .select("doc_id", "r_lex")
    )


def _rrf_fuse(lex: DataFrame, vec: DataFrame) -> DataFrame:
    """Integer RRF over two (doc_id, rank) legs, top _RRF_TOP — shared
    by q177 and q179."""
    from pyspark.sql import Window

    fused = lex.join(vec, "doc_id", "full").select(
        "doc_id",
        F.expr(
            f"COALESCE({_RRF_SCALE} DIV ({_RRF_K} + r_lex), 0)"
            f" + COALESCE({_RRF_SCALE} DIV ({_RRF_K} + r_vec), 0)"
        )
        .cast("bigint")
        .alias("rrf_scaled"),
        F.coalesce("r_lex", F.lit(0)).cast("bigint").alias("lex_rank"),
        F.coalesce("r_vec", F.lit(0)).cast("bigint").alias("vec_rank"),
    )
    w_f = Window.orderBy(F.desc("rrf_scaled"), F.asc("doc_id"))
    return (
        fused.withColumn("fused_rank", F.row_number().over(w_f))
        .filter(F.col("fused_rank") <= _RRF_TOP)
        .select(
            "doc_id",
            "rrf_scaled",
            "lex_rank",
            "vec_rank",
            F.col("fused_rank").cast("bigint").alias("fused_rank"),
        )
        .orderBy("fused_rank")
    )


@register(
    "q177_hybrid_rrf",
    sql=_rrf_sql(),
    tags=("similarity", "retrieval", "hybrid", "rrf", "top-k"),
)
def q177_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: q103's fixed-point BM25 leg and a q55-shaped
    exact-cosine leg (query = vec 0's embedding), each cut at depth 50,
    merged by integer reciprocal-rank fusion (k=60, terms scaled to
    FLOOR(1e12/(k+r)) so the fused score is BIGINT-exact on both
    engines); top 15 fused with both legs' ranks for auditability (0 =
    doc absent from that leg's candidates).

    Scale shape: the lexical leg shuffles only query-term matches
    (q103's pre-exchange filter) and the vector leg broadcasts ONE query
    embedding across the corpus scan. At production scale the vector leg
    comes from the ANN index (q56/q141 centroid routing) instead of the
    brute-force scan — RRF consumes only each leg's top-L ranks, so the
    fusion stage is L+L rows per query regardless of corpus size; the
    full-corpus rank window here is the exact-oracle-checkable stand-in.
    """
    from pyspark.sql import Window

    lex = _rrf_lex_leg(spark, sf_dir)

    e = table(spark, sf_dir, "embeddings")
    base = e.select(
        "vec_id",
        F.expr("TRANSFORM(embedding, x -> CAST(x AS DOUBLE))").alias("emb"),
    )
    qv = base.filter(F.col("vec_id") == _RRF_QVEC).select(
        F.col("emb").alias("eq")
    )
    scored = (
        base.filter(F.col("vec_id") != _RRF_QVEC)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.expr(spark_cosine("emb", "eq")).alias("cosine"),
        )
    )
    w_vec = Window.orderBy(F.desc("cosine"), F.asc("doc_id"))
    vec = (
        scored.withColumn("r_vec", F.row_number().over(w_vec))
        .filter(F.col("r_vec") <= _RRF_DEPTH)
        .select("doc_id", "r_vec")
    )
    return _rrf_fuse(lex, vec)


def _rrf_ivf_sql() -> str:
    return f"""
    WITH {_rrf_lex_ctes()}, {_ivf_ranked_ctes(f"vec_id = {_RRF_QVEC}")}, vec AS (
      SELECT neighbor_id AS doc_id, rnk AS r_vec
      FROM ivf_ranked WHERE rnk <= {_RRF_DEPTH}
    ){_rrf_fusion_sql()}"""


@register(
    "q179_hybrid_rrf_ivf",
    sql=_rrf_ivf_sql(),
    tags=("similarity", "retrieval", "hybrid", "rrf", "ivf", "scale-path"),
)
def q179_hybrid_rrf_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q177's scale-path twin: the vector leg comes from the IVF index
    (q56's centroid routing — route the query to its nearest cell, score
    only that cell's members) instead of a brute-force corpus scan, then
    the same integer reciprocal-rank fusion with the BM25 leg. vec_rank=0
    rows show docs the probed cell missed — exactly the recall trade the
    index makes, auditable against q177's exact ranks over the same
    fixtures.

    Scale shape: the lexical leg is unchanged (query-term filter before
    any exchange); the vector leg scans ONE cell — a fixed fraction of
    the corpus selected by a broadcast-size centroid table — so leg cost
    is |cell| dot products instead of |corpus|. Fusion still consumes
    only top-L ranks per leg: L+L rows per query regardless of corpus
    size. Everything here is deterministic (decimal-exact centroid means
    and dot products, total tie orders), so the whole index path is
    oracle-checkable end-to-end.
    """
    from pyspark.sql import Window

    lex = _rrf_lex_leg(spark, sf_dir)

    e = table(spark, sf_dir, "embeddings")
    elems = e.select(
        "vec_id",
        "label",
        F.posexplode(
            F.expr("TRANSFORM(embedding, x -> CAST(x AS DOUBLE))")
        ).alias("pos", "v"),
    )
    centroids = elems.groupBy("label", "pos").agg(
        (
            F.sum(F.col("v").cast("decimal(28,18)")).cast("double")
            / F.count(F.lit(1))
        ).alias("cv")
    )
    qelems = elems.filter(F.col("vec_id") == _RRF_QVEC).select("pos", "v")

    def _dec_sum(prod: str) -> F.Column:
        return F.sum(F.expr(f"CAST({prod} AS {_DOT_DEC})")).cast("double")

    routing = (
        qelems.join(F.broadcast(centroids), "pos")
        .groupBy("label")
        .agg(
            (
                _dec_sum("v * cv")
                / (F.sqrt(_dec_sum("v * v")) * F.sqrt(_dec_sum("cv * cv")))
            ).alias("cosine")
        )
    )
    w_route = Window.orderBy(F.desc("cosine"), F.asc("label"))
    best_cell = (
        routing.withColumn("rnk", F.row_number().over(w_route))
        .filter(F.col("rnk") == 1)
        .select("label")
    )
    cand = (
        F.broadcast(best_cell)
        .join(elems, "label")
        .filter(F.col("vec_id") != _RRF_QVEC)
        .select(F.col("vec_id").alias("doc_id"), "pos", F.col("v").alias("tv"))
        .join(F.broadcast(qelems.withColumnRenamed("v", "qv")), "pos")
    )
    scored = cand.groupBy("doc_id").agg(
        (
            _dec_sum("qv * tv")
            / (F.sqrt(_dec_sum("qv * qv")) * F.sqrt(_dec_sum("tv * tv")))
        ).alias("cosine")
    )
    w_vec = Window.orderBy(F.desc("cosine"), F.asc("doc_id"))
    vec = (
        scored.withColumn("r_vec", F.row_number().over(w_vec))
        .filter(F.col("r_vec") <= _RRF_DEPTH)
        .select("doc_id", "r_vec")
    )
    return _rrf_fuse(lex, vec)


# ---------------------------------------------------------------------------
# q182 — ANN recall audit (IVF vs exact, as a standing query)
# ---------------------------------------------------------------------------
# An index you can't measure is an index you can't trust: the recall of
# the IVF route (q56) against the exact scan (q55) is the number that
# decides nprobe/cell-count tuning. PERF.md carries a one-off PQ sweep;
# this makes the audit a registered, oracle-checked operator on the
# retrieval cadence — the ANN twin of q171's LSH precision audit.
_RECALL_K = 3  # audit depth: IVF's own top-k


def _ann_recall_sql() -> str:
    return f"""
    WITH {_brute_ranked_ctes()}, {_ivf_ranked_ctes(f"vec_id < {_N_QUERIES}")}, exact AS (
      SELECT query_id, neighbor_id FROM ranked WHERE rnk <= {_RECALL_K}
    ), ivf AS (
      SELECT query_id, neighbor_id FROM ivf_ranked WHERE rnk <= {_RECALL_K}
    ), hits AS (
      SELECT e.query_id, COUNT(*) AS c
      FROM exact e JOIN ivf i USING (query_id, neighbor_id)
      GROUP BY e.query_id
    )
    SELECT q.query_id,
           CAST(COALESCE(h.c, 0) AS BIGINT) AS n_hits,
           CAST((COALESCE(h.c, 0) * 1000) // {_RECALL_K} AS BIGINT)
             AS recall_milli
    FROM (SELECT DISTINCT query_id FROM exact) q
    LEFT JOIN hits h USING (query_id)
    ORDER BY query_id
    """


@register(
    "q182_ann_recall_audit",
    sql=_ann_recall_sql(),
    tags=("similarity", "ann", "recall", "audit"),
)
def q182_ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of the IVF route (q56) against the exact scan (q55), per
    query — the index-quality number that tunes nprobe/cell count,
    registered as a standing operator (the ANN analog of q171's LSH
    precision audit). Composes the two registered queries directly, so
    the audit always measures exactly what the index query executes.

    Scale shape: both legs are top-k frames (queries × k rows); the
    audit join and count never touch the corpus again. At 100 TB the
    exact leg is the expensive side — run the audit on a sampled query
    set (the standard recall-estimation protocol), which this query's
    shape already is (5 probe queries).
    """
    exact = (
        q55_ann_bruteforce_topk(spark, sf_dir)
        .filter(F.col("rnk") <= _RECALL_K)
        .select("query_id", "neighbor_id")
    )
    ivf = q56_ann_ivf_topk(spark, sf_dir).select("query_id", "neighbor_id")
    hits = exact.join(ivf, ["query_id", "neighbor_id"]).groupBy(
        "query_id"
    ).agg(F.count(F.lit(1)).alias("c"))
    spine = exact.select("query_id").distinct()
    return (
        spine.join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("c", F.lit(0)).cast("bigint").alias("n_hits"),
            F.expr(f"CAST((COALESCE(c, 0) * 1000) DIV {_RECALL_K} AS BIGINT)").alias(
                "recall_milli"
            ),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# q187 — SRP bucket label-purity audit (LSH clustering quality)
# ---------------------------------------------------------------------------
# q182 audits the IVF index's RECALL against brute force; this is the
# LSH-side quality audit: if the SRP buckets q89 retrieves from are any
# good, vectors sharing a bucket should mostly share a label.  Per
# populated (band, bval) bucket: member count, the majority label (ties
# broken toward the smaller label id — deterministic), and purity in ppm.
# The curation use is direct — low-purity buckets mark embedding-space
# regions where near-duplicate retrieval will cross semantic boundaries,
# i.e. where a dedup threshold tuned on global averages over-merges.


@register(
    "q187_srp_bucket_purity",
    sql=f"""
    WITH {_srp_bands_ctes()}, labeled AS (
      SELECT b.band, CAST(b.bval AS BIGINT) AS bval,
             CAST(e.label AS BIGINT) AS label
      FROM bands b JOIN embeddings e USING (vec_id)
    ), bucket_label AS (
      SELECT band, bval, label, COUNT(*) AS c
      FROM labeled GROUP BY band, bval, label
    ), bucket AS (
      SELECT band, bval, SUM(c) AS n_vecs
      FROM bucket_label GROUP BY band, bval
    ), top AS (
      SELECT band, bval, label, c,
             ROW_NUMBER() OVER (PARTITION BY band, bval
                                ORDER BY c DESC, label) AS rn
      FROM bucket_label
    )
    SELECT b.band, b.bval,
           CAST(b.n_vecs AS BIGINT) AS n_vecs,
           t.label AS top_label,
           CAST(t.c AS BIGINT) AS top_label_n,
           CAST(CAST(t.c AS HUGEINT) * 1000000 // b.n_vecs AS BIGINT)
             AS purity_ppm
    FROM bucket b
      JOIN top t ON t.band = b.band AND t.bval = b.bval AND t.rn = 1
    WHERE b.n_vecs >= 2
    ORDER BY b.band, b.bval
    """,
    tags=("similarity", "lsh", "srp", "audit", "clustering"),
)
def q187_srp_bucket_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label purity of every populated SRP band-bucket (>= 2 members):
    member count, majority label (smaller id on ties), purity in ppm —
    the LSH clustering-quality audit complementing q182's IVF recall
    audit.  Shares the exact signature construction with q89 via
    :func:`_srp_bands` / :func:`_srp_bands_ctes`, so the audit cannot
    drift from the retrieval path it audits.

    Scale shape: signatures are map-side (see _srp_bands); the audit
    itself is two keyed partial aggregations over (band, bval, label)
    then (band, bval) — both on the signature table (4 rows per vector),
    with map-side combine — and a row_number over per-bucket label
    counts (bounded by the label-space size per bucket).  The 1e6
    product is DECIMAL(38,0)/HUGEINT per the overflow idiom: a 100 TB
    corpus piles ~1e12 vectors into the hot bucket and c·1e6 sits at the
    BIGINT edge.
    """
    e = table(spark, sf_dir, "embeddings")
    labeled = _srp_bands(e).join(
        e.select("vec_id", F.col("label").cast("bigint").alias("label")),
        "vec_id",
    ).select("band", F.col("bval").cast("bigint").alias("bval"), "label")
    bucket_label = labeled.groupBy("band", "bval", "label").agg(
        F.count(F.lit(1)).alias("c")
    )
    bucket = bucket_label.groupBy("band", "bval").agg(
        F.sum("c").alias("n_vecs")
    )
    w = Window.partitionBy("band", "bval").orderBy(F.desc("c"), F.asc("label"))
    top = bucket_label.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    return (
        bucket.filter(F.col("n_vecs") >= 2)
        .join(top, ["band", "bval"])
        .select(
            "band",
            "bval",
            F.col("n_vecs").cast("bigint").alias("n_vecs"),
            F.col("label").alias("top_label"),
            F.col("c").cast("bigint").alias("top_label_n"),
            F.expr(
                "CAST(CAST(c AS DECIMAL(38,0)) * 1000000 DIV n_vecs AS BIGINT)"
            ).alias("purity_ppm"),
        )
        .orderBy("band", "bval")
    )


_MKNN_K = 4


@register(
    "q191_mutual_knn_pairs",
    sql=f"""
    WITH base AS (
      SELECT vec_id, CAST(label AS BIGINT) AS label,
             LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ), pairs AS (
      SELECT a.vec_id AS ida, b.vec_id AS idb, a.label,
             a.emb AS ea, b.emb AS eb
      FROM base a JOIN base b ON a.label = b.label AND a.vec_id < b.vec_id
    ), indexed AS (
      SELECT ida, idb, label, ea, eb, UNNEST(RANGE(1, LEN(ea) + 1)) AS i
      FROM pairs
    ), scored AS (
      SELECT ida, idb, ANY_VALUE(label) AS label,
             CAST(SUM(CAST(ea[i] * eb[i] AS {_DOT_DEC})) AS DOUBLE)
               / (SQRT(CAST(SUM(CAST(ea[i] * ea[i] AS {_DOT_DEC})) AS DOUBLE))
                  * SQRT(CAST(SUM(CAST(eb[i] * eb[i] AS {_DOT_DEC})) AS DOUBLE)))
               AS cosine
      FROM indexed GROUP BY ida, idb
    ), directed AS (
      SELECT ida AS src, idb AS dst, label, cosine FROM scored
      UNION ALL
      SELECT idb AS src, ida AS dst, label, cosine FROM scored
    ), ranked AS (
      SELECT src, dst, label, cosine,
             ROW_NUMBER() OVER (PARTITION BY src
                                ORDER BY cosine DESC, dst) AS rnk
      FROM directed
    ), edges AS (
      SELECT * FROM ranked WHERE rnk <= {_MKNN_K}
    )
    SELECT LEAST(src, dst) AS vec_a, GREATEST(src, dst) AS vec_b,
           ANY_VALUE(label) AS label,
           CAST(MAX(CASE WHEN src < dst THEN rnk END) AS BIGINT) AS rank_ab,
           CAST(MAX(CASE WHEN src > dst THEN rnk END) AS BIGINT) AS rank_ba,
           ROUND(ANY_VALUE(cosine), 6) AS score
    FROM edges
    GROUP BY LEAST(src, dst), GREATEST(src, dst)
    HAVING COUNT(*) = 2
    ORDER BY vec_a, vec_b
    """,
    tags=("similarity", "knn", "graph", "curation"),
)
def q191_mutual_knn_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual (reciprocal) kNN pairs within label cells: unordered pairs
    where each vector is in the other's cosine top-{_MKNN_K} — the
    high-precision kNN-graph edge set used for curation/clustering
    (one-directional edges are hub noise; mutual edges survive).

    Runs through :func:`similarity.knn.mutual_knn` with ``cell_col`` so
    the candidate space is a per-cell equijoin, never corpus²: each
    unordered pair is cosine-scored ONCE (decimal-exact ZIP_WITH fold,
    no Python), mirrored for per-vector ranking, and the reciprocity
    reduction is one keyed aggregation (HAVING count = 2) with map-side
    combine — no self-join on the edge list. At 100 TB the cell key is
    an IVF assignment (q56) and the scoring join co-locates by cell.
    """
    from ..similarity import mutual_knn

    e = table(spark, sf_dir, "embeddings").withColumn(
        "label", F.col("label").cast("bigint")
    )
    return (
        mutual_knn(e, k=_MKNN_K, cell_col="label")
        .select(
            "vec_a",
            "vec_b",
            "label",
            "rank_ab",
            "rank_ba",
            F.round("cosine", 6).alias("score"),
        )
        .orderBy("vec_a", "vec_b")
    )


# ---------------------------------------------------------------------------
# q209 — hard-negative mining (contrastive training pairs)
# ---------------------------------------------------------------------------
# Retrieval/embedding training needs near-miss NEGATIVES: for each anchor,
# the highest-cosine vectors that are NOT from the anchor's own class —
# random negatives are too easy and same-class neighbors are positives,
# so the valuable band is "close but wrong". This is q55's exact-cosine
# kernel with a group-disagreement predicate INSIDE the pair join (pruned
# before any dot product), exposed as `similarity/knn.py::
# mine_hard_negatives` (the registered query runs through the API — the
# oracle pins both). The SQL reuses q55/q182's shared CTE chain with the
# label-disagreement predicate injected, so the three stay in lockstep.
_HN_M = 5


@register(
    "q209_hard_negatives",
    sql=f"""
    WITH {_brute_ranked_ctes("t.label != q.label")}
    SELECT query_id, neighbor_id, rnk, ROUND(cosine, 6) AS score
    FROM ranked WHERE rnk <= {_HN_M}
    ORDER BY query_id, rnk
    """,
    tags=("similarity", "ann", "mining", "contrastive"),
)
def q209_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 hard negatives per anchor: nearest cosine neighbors whose
    ``label`` differs from the anchor's (module comment).

    Scale shape: identical to q55's brute kernel — anchors broadcast,
    one corpus scan, JVM-side decimal-exact cosine — with the group
    filter evaluated in the join condition (same-class candidates never
    reach the dot product). The at-scale variant is one flag away:
    ``mine_hard_negatives(..., method="ivf", cell_col=...)`` routes
    through trained cells, and hard negatives are by construction near
    the anchor, exactly where the probed cells are.
    """
    from ..similarity.knn import mine_hard_negatives

    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _N_QUERIES)
    return (
        mine_hard_negatives(q, e, _HN_M, group_col="label")
        .select(
            "query_id",
            "neighbor_id",
            "rnk",
            F.round("cosine", 6).alias("score"),
        )
        .orderBy("query_id", "rnk")
    )


# ---------------------------------------------------------------------------
# q210 — triplet mining with margin audit (anchor, positive, hard negative)
# ---------------------------------------------------------------------------
# The two mining halves composed: per anchor, the best SAME-label
# neighbor (positive) and the best DIFFERENT-label neighbor (q209's hard
# negative), with the margin between their cosines — the quantity a
# triplet/InfoNCE loss trains on, and the census that says whether the
# mined pairs are learnable (margin near 0) or trivial. Runs through
# `similarity/knn.py::mine_triplets`; the oracle re-ranks the SAME
# shared `scored` CTE under each label predicate, so API, q55, q182 and
# q209 all stay in lockstep.
@register(
    "q210_triplet_margins",
    sql=f"""
    WITH {_brute_ranked_ctes()}, pos AS (
      SELECT query_id, neighbor_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM scored WHERE ql = tl
    ), neg AS (
      SELECT query_id, neighbor_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM scored WHERE ql != tl
    )
    SELECT p.query_id AS query_id,
           p.neighbor_id AS pos_id, n.neighbor_id AS neg_id,
           ROUND(p.cosine, 6) AS pos_score,
           ROUND(n.cosine, 6) AS neg_score,
           ROUND(p.cosine - n.cosine, 6) AS margin
    FROM pos p JOIN neg n USING (query_id)
    WHERE p.rnk = 1 AND n.rnk = 1
    ORDER BY query_id
    """,
    tags=("similarity", "mining", "contrastive", "audit"),
)
def q210_triplet_margins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-anchor contrastive triplet: best same-label positive, best
    different-label hard negative, and the cosine margin between them
    (module comment). Anchors with no same-label peer yield no row.

    Scale shape: two instances of q55's brute kernel (anchors broadcast,
    one corpus scan each, group predicate inside the pair join) met by a
    single anchor-keyed join of two ≤|anchors|-row sides. The margin is
    a plain double subtraction of two identically-computed cosines —
    deterministic across engines and partitionings. At scale both legs
    take ``method="ivf"`` and route through trained cells.
    """
    from ..similarity.knn import mine_triplets

    e = table(spark, sf_dir, "embeddings")
    anchors = e.filter(F.col("vec_id") < _N_QUERIES)
    return (
        mine_triplets(anchors, e, group_col="label")
        .select(
            "query_id",
            "pos_id",
            "neg_id",
            F.round("pos_cos", 6).alias("pos_score"),
            F.round("neg_cos", 6).alias("neg_score"),
            F.round("margin", 6).alias("margin"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# q212 — behavioral similarity: hour-of-day activity profiles over events
# ---------------------------------------------------------------------------
# Time-series similarity on the event stream: each user's 24-bin
# hour-of-day event-count profile is a vector; nearest profiles by
# cosine are the users with the most similar daily rhythm (cohorting,
# anomaly peers, bot-ring candidates). Anchors are the 50 MOST ACTIVE
# users (the population you actually investigate) scored against the
# whole population — anchors broadcast, ONE corpus pass, linear in
# users; the measured all-pairs form was quadratic (19 s at sf0.1,
# tools/scale_study.py) and is exactly the shape the anchor cap
# removes. The Spark side runs the SAME knn kernel as q55/q209/q210
# (`similarity/knn.py::knn_join`); the oracle computes the identical
# decimal-exact cosine in its sparse hour-join form — zero products
# drop out of an exact decimal sum, so dense and sparse agree term for
# term. Counts here are fixture-scale (c² far inside DECIMAL(28,18)'s
# 10 integer digits); at real scale normalize profiles to rate-per-hour
# before the kernel (the knn module's documented envelope).
_Q212_TOP = 3
_Q212_ANCHORS = 50


@register(
    "q212_activity_profile_similarity",
    sql=f"""
    WITH prof AS (
      SELECT user_id, HOUR(ts) AS hr, COUNT(*) AS c
      FROM events GROUP BY user_id, HOUR(ts)
    ), activity AS (
      SELECT user_id, SUM(c) AS n_events FROM prof GROUP BY user_id
    ), anchors AS (
      SELECT user_id FROM activity
      ORDER BY n_events DESC, user_id LIMIT {_Q212_ANCHORS}
    ), norms AS (
      SELECT user_id,
             SQRT(CAST(SUM(CAST(c * c AS DECIMAL(28,18))) AS DOUBLE)) AS nrm
      FROM prof GROUP BY user_id
    ), dots AS (
      SELECT a.user_id AS user_id, b.user_id AS peer_id,
             CAST(SUM(CAST(a.c * b.c AS DECIMAL(28,18))) AS DOUBLE) AS dot
      FROM prof a JOIN prof b ON a.hr = b.hr AND a.user_id != b.user_id
      WHERE a.user_id IN (SELECT user_id FROM anchors)
      GROUP BY a.user_id, b.user_id
    ), scored AS (
      SELECT d.user_id, d.peer_id,
             d.dot / (na.nrm * nb.nrm) AS cosine
      FROM dots d
        JOIN norms na ON na.user_id = d.user_id
        JOIN norms nb ON nb.user_id = d.peer_id
    ), ranked AS (
      SELECT user_id, peer_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY cosine DESC, peer_id) AS rnk
      FROM scored
    )
    SELECT user_id, peer_id, rnk, ROUND(cosine, 6) AS score
    FROM ranked WHERE rnk <= {_Q212_TOP}
    ORDER BY user_id, rnk
    """,
    tags=("similarity", "timeseries", "events", "behavioral"),
)
def q212_activity_profile_similarity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-3 most similar users by hour-of-day activity profile for the
    50 most active anchors (module comment) — time-series similarity
    with the repo's one cosine kernel.

    Scale shape: one (user, hour) partial aggregation, a 24-expression
    map-side densification, anchor selection as TakeOrderedAndProject,
    then `knn_join` — 50 anchors broadcast against ONE pass of the
    population (linear in users; the uncapped all-pairs form measured
    quadratic and is documented off). At larger anchor sets the same
    call takes ``method="srp"`` or ``method="ivf"`` unchanged, which is
    the point of routing through the shared kernel.
    """
    from ..similarity.knn import knn_join

    e = table(spark, sf_dir, "events")
    prof = (
        e.groupBy("user_id", F.hour("ts").alias("hr"))
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("user_id")
        .agg(
            F.array(
                *[
                    F.coalesce(
                        F.max(F.when(F.col("hr") == h, F.col("c"))), F.lit(0)
                    ).cast("double")
                    for h in range(24)
                ]
            ).alias("profile"),
            F.sum("c").alias("n_events"),
        )
    )
    anchors = (
        prof.orderBy(F.desc("n_events"), F.asc("user_id"))
        .limit(_Q212_ANCHORS)
        .select("user_id", "profile")
    )
    return (
        knn_join(
            anchors,
            prof.select("user_id", "profile"),
            _Q212_TOP,
            query_id="user_id",
            corpus_id="user_id",
            vec_col="profile",
        )
        .select(
            F.col("query_id").alias("user_id"),
            F.col("neighbor_id").alias("peer_id"),
            "rnk",
            F.round("cosine", 6).alias("score"),
        )
        .orderBy("user_id", "rnk")
    )


# ---------------------------------------------------------------------------
# q217 — vector hygiene audit (the QA gate before any index build)
# ---------------------------------------------------------------------------
# Embedding pipelines break silently: an upstream encoder emits zeros
# (padding bug), NaN/Inf (overflow), or byte-identical vectors for
# different ids (cache bug) — and every one of those poisons an ANN
# index (zero norms divide by zero, dups distort cells, NaN breaks
# ordering). The audit census per label cell: vector count, zero-norm
# count, non-finite count, exact-duplicate count (portable MD5 over the
# canonical string form), and dimensionality agreement — the checks
# `vector_index_lifecycle` should run before train/swap. Planted: the
# fixture is clean, so three pathological vectors are appended in-plan
# (one zero, one NaN, one duplicate of vec_id 0) under label -1/0 to
# prove each counter fires.
@register(
    "q217_vector_hygiene",
    sql=f"""
    WITH planted AS (
      SELECT vec_id, label, embedding FROM embeddings
      UNION ALL
      SELECT 80000001,
             CAST(-1 AS BIGINT),
             LIST_TRANSFORM(embedding, x -> CAST(0.0 AS FLOAT))
      FROM embeddings WHERE vec_id = 0
      UNION ALL
      SELECT 80000002,
             CAST(-1 AS BIGINT),
             LIST_TRANSFORM(embedding, x -> CAST('NaN' AS FLOAT))
      FROM embeddings WHERE vec_id = 0
      UNION ALL
      SELECT 80000003, label, embedding FROM embeddings WHERE vec_id = 0
    ), feats AS (
      SELECT label,
             LEN(embedding) AS dim,
             LEN(LIST_FILTER(embedding, x -> x <> 0.0)) = 0 AS zero_norm,
             LEN(LIST_FILTER(embedding, x -> NOT ISFINITE(x))) > 0
               AS nonfinite,
             MD5(ARRAY_TO_STRING(
               LIST_TRANSFORM(embedding,
                 x -> CASE WHEN ISNAN(x) THEN 'nan'
                           ELSE CAST(CAST(x AS DECIMAL(18,9)) AS VARCHAR)
                      END), ',')) AS vhash
      FROM planted
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(COUNT(DISTINCT dim) AS BIGINT) AS n_dims,
           CAST(SUM(CASE WHEN zero_norm THEN 1 ELSE 0 END) AS BIGINT)
             AS n_zero_norm,
           CAST(SUM(CASE WHEN nonfinite THEN 1 ELSE 0 END) AS BIGINT)
             AS n_nonfinite,
           CAST(COUNT(*) - COUNT(DISTINCT vhash) AS BIGINT) AS n_exact_dups
    FROM feats
    GROUP BY label
    ORDER BY label
    """,
    tags=("similarity", "audit", "quality", "vectors"),
)
def q217_vector_hygiene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell vector QA census (module comment): counts of zero-norm,
    non-finite, exact-duplicate, and dimension-disagreeing embeddings,
    with three planted pathologies proving each counter fires.

    Scale shape: every feature is a map-side array expression (no
    Python); the census is one label-keyed partial aggregation whose
    distinct-count payloads are the 16-byte canonical hashes, not
    vectors. The float canonicalization quantizes to DECIMAL(18,9)
    before hashing — float-to-string formatting differs across engines,
    decimal formatting does not (and NaN != NaN needs the explicit
    branch on BOTH sides or the dup counter undercounts).
    """
    e = table(spark, sf_dir, "embeddings")
    zero = e.filter(F.col("vec_id") == 0).select(
        F.lit(80000001).cast("bigint").alias("vec_id"),
        F.lit(-1).cast("bigint").alias("label"),
        F.expr("TRANSFORM(embedding, x -> CAST(0.0 AS FLOAT))").alias(
            "embedding"
        ),
    )
    nan = e.filter(F.col("vec_id") == 0).select(
        F.lit(80000002).cast("bigint").alias("vec_id"),
        F.lit(-1).cast("bigint").alias("label"),
        F.expr("TRANSFORM(embedding, x -> CAST('NaN' AS FLOAT))").alias(
            "embedding"
        ),
    )
    dup = e.filter(F.col("vec_id") == 0).select(
        F.lit(80000003).cast("bigint").alias("vec_id"),
        F.col("label").cast("bigint").alias("label"),
        "embedding",
    )
    planted = (
        e.select("vec_id", F.col("label").cast("bigint").alias("label"), "embedding")
        .unionByName(zero)
        .unionByName(nan)
        .unionByName(dup)
    )
    feats = planted.select(
        "label",
        F.expr("SIZE(embedding)").alias("dim"),
        F.expr("SIZE(FILTER(embedding, x -> x != 0.0F)) = 0").alias(
            "zero_norm"
        ),
        F.expr(
            "SIZE(FILTER(embedding, x -> ISNAN(x) OR ABS(x) = CAST('Infinity' AS FLOAT))) > 0"
        ).alias("nonfinite"),
        F.expr(
            "MD5(ARRAY_JOIN(TRANSFORM(embedding,"
            " x -> CASE WHEN ISNAN(x) THEN 'nan'"
            " ELSE CAST(CAST(x AS DECIMAL(18,9)) AS STRING) END), ','))"
        ).alias("vhash"),
    )
    return (
        feats.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.countDistinct("dim").cast("bigint").alias("n_dims"),
            F.sum(F.when(F.col("zero_norm"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_zero_norm"),
            F.sum(F.when(F.col("nonfinite"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_nonfinite"),
            (F.count(F.lit(1)) - F.countDistinct("vhash"))
            .cast("bigint")
            .alias("n_exact_dups"),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# q222 — graded retrieval metrics: MRR + NDCG of the IVF route vs exact
# ---------------------------------------------------------------------------
# q182's recall counts hits; ranking quality needs the GRADED metrics a
# retrieval eval actually reports: MRR (how early does the first right
# answer appear) and NDCG@3 (position-discounted credit for all of
# them). Relevance = membership in the exact top-3 (q55), ranking = the
# IVF route (q56) — same two registered legs as q182, composed. The
# log2 discounts are pinned INTEGER CONSTANTS (milli: 1000, 630, 500 =
# floor(1000/log2(r+1)) for r=1..3), identical literals on both engine
# sides — graded metrics without a single float log.
_Q222_DISC = (1000, 630, 500)  # rank 1..3 discount, milli
_Q222_IDCG = sum(_Q222_DISC)   # all three relevant, best order
_Q222_DISC_CASE = "CASE rnk " + " ".join(
    f"WHEN {r + 1} THEN {d}" for r, d in enumerate(_Q222_DISC)
) + " ELSE 0 END"


@register(
    "q222_retrieval_graded_metrics",
    sql=f"""
    WITH {_brute_ranked_ctes()}, {_ivf_ranked_ctes(f"vec_id < {_N_QUERIES}")}, exact AS (
      SELECT query_id, neighbor_id FROM ranked WHERE rnk <= {_RECALL_K}
    ), ivf AS (
      SELECT query_id, neighbor_id, rnk
      FROM ivf_ranked WHERE rnk <= {_RECALL_K}
    ), graded AS (
      SELECT i.query_id, i.rnk,
             CASE WHEN e.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS rel
      FROM ivf i LEFT JOIN exact e
        ON e.query_id = i.query_id AND e.neighbor_id = i.neighbor_id
    ), per_q AS (
      SELECT query_id,
             SUM(rel) AS n_hits,
             MIN(CASE WHEN rel = 1 THEN rnk END) AS first_hit,
             SUM(rel * ({_Q222_DISC_CASE})) AS dcg_milli
      FROM graded GROUP BY query_id
    )
    SELECT q.query_id,
           CAST(COALESCE(p.n_hits, 0) AS BIGINT) AS n_hits,
           CAST(COALESCE(1000 // p.first_hit, 0) AS BIGINT) AS mrr_milli,
           CAST(COALESCE(p.dcg_milli, 0) * 1000 // {_Q222_IDCG} AS BIGINT)
             AS ndcg_milli
    FROM (SELECT DISTINCT query_id FROM exact) q
    LEFT JOIN per_q p USING (query_id)
    ORDER BY query_id
    """,
    tags=("similarity", "ann", "retrieval", "audit", "exact-integer"),
)
def q222_retrieval_graded_metrics(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-query MRR and NDCG@3 (milli, integer-exact) of the IVF route
    against exact-scan relevance (module comment) — the graded
    companion to q182's recall.

    Scale shape: both legs are queries×k frames; the grading join and
    the per-query rollup never touch the corpus. Same sampled-query
    protocol as q182 at 100 TB.
    """
    exact = (
        q55_ann_bruteforce_topk(spark, sf_dir)
        .filter(F.col("rnk") <= _RECALL_K)
        .select("query_id", F.col("neighbor_id").alias("rel_id"))
    )
    ivf = q56_ann_ivf_topk(spark, sf_dir).select(
        "query_id", "neighbor_id", "rnk"
    )
    graded = ivf.join(
        exact,
        (ivf.query_id == exact.query_id)
        & (ivf.neighbor_id == exact.rel_id),
        "left",
    ).select(
        ivf.query_id.alias("qid"),
        "rnk",
        F.when(F.col("rel_id").isNotNull(), 1).otherwise(0).alias("rel"),
    )
    per_q = graded.groupBy("qid").agg(
        F.sum("rel").alias("n_hits"),
        F.min(F.when(F.col("rel") == 1, F.col("rnk"))).alias("first_hit"),
        F.sum(F.col("rel") * F.expr(_Q222_DISC_CASE)).alias("dcg_milli"),
    )
    spine = exact.select("query_id").distinct()
    return (
        spine.join(per_q, spine.query_id == per_q.qid, "left")
        .select(
            "query_id",
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            F.coalesce(
                F.expr("1000 DIV first_hit"), F.lit(0)
            ).cast("bigint").alias("mrr_milli"),
            F.expr(
                f"CAST(COALESCE(dcg_milli, 0) * 1000 DIV {_Q222_IDCG} AS BIGINT)"
            ).alias("ndcg_milli"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# q230 — IVF-PQ with TRAINED cells and codebooks under the oracle
# ---------------------------------------------------------------------------
# q141 pins the retrieval machinery on a training-free instance (label
# cells, init-only codebooks). This query closes the r08 verdict's gap:
# the seeded TRAINING itself — `train_ivfpq` = Lloyd's coarse k-means
# (spread init, decimal-exact portable means, empty-cell retention) then
# residual PQ codebooks (one Lloyd round) — runs under the oracle
# end-to-end: train → encode/assign → route → exact-ADC → exact rerank.
# The DuckDB twin unrolls the same rounds as CTEs GENERATED from the same
# constants, so loop count, init, tie policy, and the mean idiom cannot
# drift between engines. 8-dim slices / tiny k keep the unrolled SQL
# tractable; the semantics are dimension-independent (the 256-dim
# behavior is the measured PERF.md study).

_T_D = 8       # sliced dimensions
_T_K = 4       # coarse cells
_T_RC = 2      # Lloyd rounds for cells
_T_M = 2       # PQ subspaces (4-dim sub-vectors)
_T_KSUB = 4    # codewords per subspace
_T_RPQ = 1     # Lloyd rounds for PQ codebooks
_T_PROBE = 2   # cells probed per query
_T_RERANK = 8  # ADC candidates kept for exact rerank
_T_KNN = 3     # neighbors returned
_T_NQ = 8      # vec_id < 8 act as queries


def _ivfpq_trained_sql() -> str:
    """DuckDB twin of q230: the training loops unrolled round-by-round
    from the module constants — assignment (decimal-exact squared L2,
    ties to the lower cell), portable mean update (decimal SUM → DOUBLE →
    divide, the exact idiom `train_cells`/`train_pq` compute), empty-cell
    retention via LEFT JOIN + COALESCE — then q141's retrieval chain over
    the trained tables."""
    subd = _T_D // _T_M
    h_km = duckdb_hash32("CAST(vec_id AS VARCHAR)", "kmeans")
    h_pq = duckdb_hash32("CAST(vec_id AS VARCHAR)", "pq")

    def assign(name: str, cent: str) -> str:
        return f"""{name} AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY sq, cell) AS rn
        FROM (SELECT e.vec_id, c.cell,
                     CAST(SUM(CAST((e.v - c.cv) * (e.v - c.cv)
                                   AS DECIMAL(28,18))) AS DOUBLE) AS sq
              FROM elems e JOIN {cent} c USING (pos)
              GROUP BY e.vec_id, c.cell))
      WHERE rn = 1)"""

    def pq_assign(name: str, book: str) -> str:
        return f"""{name} AS (
      SELECT vec_id, sub, cell FROM (
        SELECT vec_id, sub, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                  ORDER BY sq, cell) AS rn
        FROM (SELECT r.vec_id, r.sub, b.cell,
                     CAST(SUM(CAST((r.r - b.cw) * (r.r - b.cw)
                                   AS DECIMAL(28,18))) AS DOUBLE) AS sq
              FROM res r JOIN {book} b
                ON b.sub = r.sub AND b.spos = r.spos
              GROUP BY r.vec_id, r.sub, b.cell))
      WHERE rn = 1)"""

    parts = [
        f"""elems AS (
      SELECT vec_id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS v
      FROM (SELECT vec_id, embedding, UNNEST(RANGE(1, {_T_D + 1})) AS i
            FROM embeddings))""",
        f"""seeds AS (
      SELECT vec_id, ROW_NUMBER() OVER (ORDER BY hh, vec_id) - 1 AS cell
      FROM (SELECT DISTINCT vec_id, {h_km} AS hh FROM elems)
      QUALIFY cell < {_T_K})""",
        """cent_0 AS (
      SELECT s.cell, e.pos, e.v AS cv
      FROM seeds s JOIN elems e USING (vec_id))""",
    ]
    for r in range(1, _T_RC + 1):
        parts.append(assign(f"assign_{r}", f"cent_{r - 1}"))
        parts.append(f"""mean_{r} AS (
      SELECT a.cell, e.pos,
             CAST(SUM(CAST(e.v AS DECIMAL(28,18))) AS DOUBLE)
               / COUNT(*) AS mv
      FROM assign_{r} a JOIN elems e USING (vec_id)
      GROUP BY a.cell, e.pos)""")
        parts.append(f"""cent_{r} AS (
      SELECT c.cell, c.pos, COALESCE(m.mv, c.cv) AS cv
      FROM cent_{r - 1} c LEFT JOIN mean_{r} m
        ON m.cell = c.cell AND m.pos = c.pos)""")
    cent = f"cent_{_T_RC}"
    parts.append(assign("assign_f", cent))
    parts.append(f"""res AS (
      SELECT e.vec_id, e.pos,
             e.pos // {subd} AS sub, e.pos % {subd} AS spos,
             e.v - c.cv AS r
      FROM elems e
        JOIN assign_f a USING (vec_id)
        JOIN {cent} c ON c.cell = a.cell AND c.pos = e.pos)""")
    parts.append(f"""pqseeds AS (
      SELECT vec_id, ROW_NUMBER() OVER (ORDER BY hh, vec_id) - 1 AS cell
      FROM (SELECT DISTINCT vec_id, {h_pq} AS hh FROM elems)
      QUALIFY cell < {_T_KSUB})""")
    parts.append("""book_0 AS (
      SELECT r.sub, s.cell, r.spos, r.r AS cw
      FROM pqseeds s JOIN res r USING (vec_id))""")
    for r in range(1, _T_RPQ + 1):
        parts.append(pq_assign(f"pqa_{r}", f"book_{r - 1}"))
        parts.append(f"""pqmean_{r} AS (
      SELECT a.sub, a.cell, r.spos,
             CAST(SUM(CAST(r.r AS DECIMAL(28,18))) AS DOUBLE)
               / COUNT(*) AS mv
      FROM pqa_{r} a JOIN res r
        ON r.vec_id = a.vec_id AND r.sub = a.sub
      GROUP BY a.sub, a.cell, r.spos)""")
        parts.append(f"""book_{r} AS (
      SELECT b.sub, b.cell, b.spos, COALESCE(m.mv, b.cw) AS cw
      FROM book_{r - 1} b LEFT JOIN pqmean_{r} m
        ON m.sub = b.sub AND m.cell = b.cell AND m.spos = b.spos)""")
    book = f"book_{_T_RPQ}"
    parts.append(pq_assign("codes", book))
    parts.append(f"""recon AS (
      SELECT c.vec_id,
             SQRT(CAST(SUM(CAST((ct.cv + b.cw) * (ct.cv + b.cw)
                                AS DECIMAL(28,18))) AS DOUBLE)) AS recon_norm
      FROM codes c
        JOIN {book} b ON b.sub = c.sub AND b.cell = c.cell
        JOIN assign_f a ON a.vec_id = c.vec_id
        JOIN {cent} ct ON ct.cell = a.cell
                      AND ct.pos = c.sub * {subd} + b.spos
      GROUP BY c.vec_id)""")
    parts.append(f"""queries AS (
      SELECT vec_id AS query_id, pos, v FROM elems
      WHERE vec_id < {_T_NQ})""")
    parts.append("""qnorm AS (
      SELECT query_id,
             SQRT(CAST(SUM(CAST(v * v AS DECIMAL(28,18))) AS DOUBLE)) AS qn
      FROM queries GROUP BY query_id)""")
    parts.append(f"""routing AS (
      SELECT q.query_id, c.cell,
             SUM(CAST(q.v * c.cv AS DECIMAL(28,18))) AS cdot,
             CAST(SUM(CAST(q.v * c.cv AS DECIMAL(28,18))) AS DOUBLE)
               / (MIN(qn.qn)
                  * SQRT(CAST(SUM(CAST(c.cv * c.cv AS DECIMAL(28,18)))
                              AS DOUBLE))) AS rcos
      FROM queries q
        JOIN {cent} c USING (pos)
        JOIN qnorm qn USING (query_id)
      GROUP BY q.query_id, c.cell)""")
    parts.append(f"""probes AS (
      SELECT query_id, cell, cdot FROM (
        SELECT query_id, cell, cdot,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY rcos DESC, cell) AS pr
        FROM routing) WHERE pr <= {_T_PROBE})""")
    parts.append(f"""qsub AS (
      SELECT query_id, pos // {subd} AS sub, pos % {subd} AS spos, v
      FROM queries)""")
    parts.append(f"""lut AS (
      SELECT q.query_id, b.sub, b.cell,
             SUM(CAST(q.v * b.cw AS DECIMAL(28,18))) AS pd
      FROM qsub q JOIN {book} b ON b.sub = q.sub AND b.spos = q.spos
      GROUP BY q.query_id, b.sub, b.cell)""")
    parts.append("""adc AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             CAST(p.cdot + SUM(l.pd) AS DOUBLE)
               / (MIN(qn.qn) * MIN(r.recon_norm)) AS qcos
      FROM probes p
        JOIN assign_f a ON a.cell = p.cell AND a.vec_id != p.query_id
        JOIN codes c ON c.vec_id = a.vec_id
        JOIN lut l ON l.query_id = p.query_id
                  AND l.sub = c.sub AND l.cell = c.cell
        JOIN recon r ON r.vec_id = a.vec_id
        JOIN qnorm qn ON qn.query_id = p.query_id
      GROUP BY p.query_id, a.vec_id, p.cdot)""")
    parts.append(f"""cand AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY qcos DESC, neighbor_id) AS cr
        FROM adc) WHERE cr <= {_T_RERANK})""")
    parts.append("""rr AS (
      SELECT cd.query_id, cd.neighbor_id,
             CAST(SUM(CAST(q.v * e.v AS DECIMAL(28,18))) AS DOUBLE)
               / (SQRT(CAST(SUM(CAST(q.v * q.v AS DECIMAL(28,18)))
                            AS DOUBLE))
                  * SQRT(CAST(SUM(CAST(e.v * e.v AS DECIMAL(28,18)))
                              AS DOUBLE))) AS cosine
      FROM cand cd
        JOIN elems e ON e.vec_id = cd.neighbor_id
        JOIN queries q ON q.query_id = cd.query_id AND q.pos = e.pos
      GROUP BY cd.query_id, cd.neighbor_id)""")
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT query_id, neighbor_id, rnk, ROUND(cosine, 6) AS score
    FROM (
      SELECT query_id, neighbor_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM rr)
    WHERE rnk <= {_T_KNN}
    ORDER BY query_id, rnk
    """
    )


@register(
    "q230_ivfpq_trained_funnel",
    sql=_ivfpq_trained_sql(),
    tags=("similarity", "ann", "ivf", "pq", "training", "scale-path"),
)
def q230_ivfpq_trained_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full IVF-PQ funnel with SEEDED TRAINING under the oracle
    (`similarity/ivfpq.py::train_ivfpq` → `encode_ivfpq` → `ivfpq_knn`):
    2 Lloyd rounds train 4 coarse cells from the spread init (lowest
    portable-hash ids), 1 round trains the residual PQ codebooks, then
    each query routes to 2 cells, exact-ADC-scores their codes, and the
    top 8 candidates rerank with exact cosine. Every mean is the portable
    decimal-SUM→double→divide idiom, every argmin/topk ties on ids, so
    cells, codebooks, codes, candidates and scores hash-match the
    round-by-round unrolled DuckDB twin.

    At 100 TB: per Lloyd round one broadcast + one corpus scan + one
    (cell,pos)-keyed shuffle of k·d rows (never corpus-width); the
    trained index stores cell-partitioned so the probe is partition
    pruning (`save_ivfpq_index`)."""
    from ..similarity.ivfpq import encode_ivfpq, ivfpq_knn, train_ivfpq

    e = table(spark, sf_dir, "embeddings")
    e8 = e.select(
        "vec_id",
        F.expr(
            f"TRANSFORM(SLICE(embedding, 1, {_T_D}), x -> CAST(x AS DOUBLE))"
        ).alias("embedding"),
    )
    cents, books = train_ivfpq(
        e8,
        k_cells=_T_K,
        m=_T_M,
        ksub=_T_KSUB,
        n_iter_cells=_T_RC,
        n_iter_pq=_T_RPQ,
        cell_init="spread",
    )
    enc = encode_ivfpq(e8, cents, books, m=_T_M)
    q = e8.filter(F.col("vec_id") < _T_NQ)
    out = ivfpq_knn(
        q,
        enc,
        cents,
        books,
        k=_T_KNN,
        m=_T_M,
        ksub=_T_KSUB,
        n_probe=_T_PROBE,
        rerank=_T_RERANK,
        corpus=e8,
        exact_adc=True,
    )
    return out.select(
        "query_id", "neighbor_id", "rnk", F.round("cosine", 6).alias("score")
    ).orderBy("query_id", "rnk")


# ---------------------------------------------------------------------------
# q231 — FILTERED ANN: metadata predicate inside the IVF probe
# ---------------------------------------------------------------------------
# The most common real retrieval need not covered until now: "nearest
# neighbors WHERE <metadata predicate>". Two orders exist and only one is
# right: filter-then-rank (predicate evaluated inside the cell probe, the
# top-k is over qualifying vectors) vs rank-then-filter (post-filter an
# unfiltered top-k — silently starves below k whenever neighbors fail the
# predicate). `knn_join(filter_expr=...)` implements the former with the
# index geometry untouched (centroids over the FULL corpus; the predicate
# prunes probed-cell members only). This query pins BOTH legs side by
# side: the filtered-IVF top-k and the exact filtered brute ranking, with
# a per-rank agreement flag — so the oracle hash freezes the probe
# semantics AND the measured filtered recall of the fixture.

_FA_PRED = "vec_id % 3 > 0"  # qualifies 2/3 of the corpus, crosses cells
_FA_PROBE = 2
_FA_K = 5


@register(
    "q231_filtered_ann_parity",
    sql=f"""
    WITH e_indexed AS (
      SELECT vec_id, label, embedding,
             UNNEST(RANGE(1, LEN(embedding) + 1)) AS i
      FROM embeddings
    ), elems AS (
      SELECT vec_id, label, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS v
      FROM e_indexed
    ), centroids AS (  -- FULL corpus: the filter never reshapes the index
      SELECT label, pos,
             CAST(SUM(CAST(v AS DECIMAL(28,18))) AS DOUBLE) / COUNT(*) AS cv
      FROM elems GROUP BY label, pos
    ), queries AS (
      SELECT vec_id AS query_id, pos, v FROM elems
      WHERE vec_id < {_N_QUERIES}
    ), qnorm AS (
      SELECT query_id,
             SQRT(CAST(SUM(CAST(v * v AS DECIMAL(28,18))) AS DOUBLE)) AS qn
      FROM queries GROUP BY query_id
    ), routing AS (    -- knn_join's routing: decimal dot, ties low cell
      SELECT q.query_id, c.label,
             CAST(SUM(CAST(q.v * c.cv AS DECIMAL(28,18))) AS DOUBLE) AS dot
      FROM queries q JOIN centroids c USING (pos)
      GROUP BY q.query_id, c.label
    ), probes AS (
      SELECT query_id, label FROM (
        SELECT query_id, label,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY dot DESC, label) AS pr
        FROM routing) WHERE pr <= {_FA_PROBE}
    ), keep AS (       -- the metadata predicate, INSIDE the probe
      SELECT vec_id FROM embeddings WHERE {_FA_PRED}
    ), ivf_scored AS (
      SELECT p.query_id, e.vec_id AS neighbor_id,
             CAST(SUM(CAST(q.v * e.v AS DECIMAL(28,18))) AS DOUBLE)
               / (MIN(qn.qn)
                  * SQRT(CAST(SUM(CAST(e.v * e.v AS DECIMAL(28,18)))
                              AS DOUBLE))) AS cosine
      FROM probes p
        JOIN elems e ON e.label = p.label AND e.vec_id != p.query_id
        SEMI JOIN keep k ON k.vec_id = e.vec_id
        JOIN queries q ON q.query_id = p.query_id AND q.pos = e.pos
        JOIN qnorm qn ON qn.query_id = p.query_id
      GROUP BY p.query_id, e.vec_id
    ), ivf_topk AS (
      SELECT query_id, neighbor_id, rnk FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, neighbor_id) AS rnk
        FROM ivf_scored) WHERE rnk <= {_FA_K}
    ), exact_scored AS (  -- filter-then-rank ground truth: brute over keep
      SELECT q.query_id, e.vec_id AS neighbor_id,
             CAST(SUM(CAST(q.v * e.v AS DECIMAL(28,18))) AS DOUBLE)
               / (MIN(qn.qn)
                  * SQRT(CAST(SUM(CAST(e.v * e.v AS DECIMAL(28,18)))
                              AS DOUBLE))) AS cosine
      FROM elems e
        SEMI JOIN keep k ON k.vec_id = e.vec_id
        JOIN queries q ON q.pos = e.pos AND q.query_id != e.vec_id
        JOIN qnorm qn ON qn.query_id = q.query_id
      GROUP BY q.query_id, e.vec_id
    ), exact_topk AS (
      SELECT query_id, neighbor_id, cosine, rnk FROM (
        SELECT query_id, neighbor_id, cosine,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, neighbor_id) AS rnk
        FROM exact_scored) WHERE rnk <= {_FA_K}
    )
    SELECT x.query_id, x.rnk,
           i.neighbor_id AS ivf_neighbor,
           x.neighbor_id AS exact_neighbor,
           COALESCE(i.neighbor_id = x.neighbor_id, FALSE) AS agree,
           ROUND(x.cosine, 6) AS exact_score
    FROM exact_topk x
      LEFT JOIN ivf_topk i USING (query_id, rnk)
    ORDER BY x.query_id, x.rnk
    """,
    tags=("similarity", "ann", "ivf", "filtered", "scale-path"),
)
def q231_filtered_ann_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered ANN parity census (`similarity/knn.py::knn_join` with
    ``filter_expr``): the IVF leg evaluates the metadata predicate INSIDE
    the probed cells (index geometry untouched), the exact leg is
    brute-force over the qualifying corpus — both filter-then-rank, so
    every returned rank holds a qualifying vector. The per-rank ``agree``
    flag freezes the fixture's filtered recall under the oracle hash; a
    routing, tie, or filter-placement change flips it.

    At 100 TB: the predicate reaches the cell-partitioned encoded scan as
    an ordinary pushed filter (`save_ivfpq_index` layout), so a probe
    reads n_probe directories and skips non-qualifying row groups — no
    post-hoc re-ranking round trips."""
    from ..similarity.knn import knn_join

    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _N_QUERIES)
    ivf = knn_join(
        q,
        e,
        k=_FA_K,
        method="ivf",
        cell_col="label",
        n_probe=_FA_PROBE,
        filter_expr=_FA_PRED,
    ).select("query_id", "rnk", F.col("neighbor_id").alias("ivf_neighbor"))
    exact = knn_join(
        q, e, k=_FA_K, method="brute", filter_expr=_FA_PRED
    ).select(
        "query_id",
        "rnk",
        F.col("neighbor_id").alias("exact_neighbor"),
        F.round("cosine", 6).alias("exact_score"),
    )
    return (
        exact.join(ivf, ["query_id", "rnk"], "left")
        .select(
            "query_id",
            "rnk",
            "ivf_neighbor",
            "exact_neighbor",
            F.coalesce(
                F.col("ivf_neighbor") == F.col("exact_neighbor"), F.lit(False)
            ).alias("agree"),
            "exact_score",
        )
        .orderBy("query_id", "rnk")
    )


# ---------------------------------------------------------------------------
# q244 — graded retrieval audit of the TRAINED IVF-PQ funnel
# ---------------------------------------------------------------------------
# q222 grades the label-cell IVF route; q230 trains real cells and
# codebooks but pins quality only through the rerank output itself. This
# closes the r09 verdict's last similarity gap: MRR + NDCG@3 of the
# TRAINED funnel (q230's exact statement as the ranking leg) against
# exact-scan relevance over the same 8-dim slice — so a regression
# anywhere in training (init, mean idiom, tie policy, ADC, rerank) that
# degrades RETRIEVAL QUALITY hash-fails even when the pipeline still
# runs. Integer milli metrics, the q222 log2-discount constants.


def _trained_graded_sql() -> str:
    """Exact-relevance leg (decimal-exact brute cosine over the 8-dim
    slice, self excluded, ties to lower id) + q230's trained funnel as a
    derived table + the q222 grading arithmetic."""
    trained_stmt = _ivfpq_trained_sql()
    return f"""
    WITH el AS (
      SELECT vec_id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS v
      FROM (SELECT vec_id, embedding, UNNEST(RANGE(1, {_T_D + 1})) AS i
            FROM embeddings)
    ), qv AS (
      SELECT vec_id AS query_id, pos, v FROM el WHERE vec_id < {_T_NQ}
    ), sims AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             CAST(SUM(CAST(q.v * e.v AS DECIMAL(28,18))) AS DOUBLE)
               / (SQRT(CAST(SUM(CAST(q.v * q.v AS DECIMAL(28,18)))
                            AS DOUBLE))
                  * SQRT(CAST(SUM(CAST(e.v * e.v AS DECIMAL(28,18)))
                              AS DOUBLE))) AS cosine
      FROM qv q JOIN el e ON e.pos = q.pos AND e.vec_id != q.query_id
      GROUP BY q.query_id, e.vec_id
    ), exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, neighbor_id) AS rnk
        FROM sims) WHERE rnk <= {_T_KNN}
    ), trained AS (
      SELECT query_id, neighbor_id, rnk FROM ({trained_stmt}) t
    ), graded AS (
      SELECT i.query_id, i.rnk,
             CASE WHEN e.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS rel
      FROM trained i LEFT JOIN exact e
        ON e.query_id = i.query_id AND e.neighbor_id = i.neighbor_id
    ), per_q AS (
      SELECT query_id,
             SUM(rel) AS n_hits,
             MIN(CASE WHEN rel = 1 THEN rnk END) AS first_hit,
             SUM(rel * ({_Q222_DISC_CASE})) AS dcg_milli
      FROM graded GROUP BY query_id
    )
    SELECT q.query_id,
           CAST(COALESCE(p.n_hits, 0) AS BIGINT) AS n_hits,
           CAST(COALESCE(1000 // p.first_hit, 0) AS BIGINT) AS mrr_milli,
           CAST(COALESCE(p.dcg_milli, 0) * 1000 // {_Q222_IDCG} AS BIGINT)
             AS ndcg_milli
    FROM (SELECT DISTINCT query_id FROM exact) q
    LEFT JOIN per_q p USING (query_id)
    ORDER BY query_id
    """


@register(
    "q244_trained_funnel_graded_audit",
    sql=_trained_graded_sql(),
    tags=("similarity", "ann", "ivf", "pq", "training", "retrieval", "audit"),
)
def q244_trained_funnel_graded_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-query MRR and NDCG@3 (milli, integer-exact) of the TRAINED
    IVF-PQ funnel (q230) against exact brute-force relevance over the
    same 8-dim slice — training-QUALITY regressions hash-fail here even
    when q230's plumbing still matches its own twin.

    Scale shape: the relevance leg is the sampled-queries brute scan
    (queries broadcast, one corpus pass); the ranking leg is q230's
    index-width funnel; grading joins two queries×k frames — the corpus
    is touched exactly twice regardless of scale."""
    from ..similarity.knn import knn_join

    e8 = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.expr(
            f"TRANSFORM(SLICE(embedding, 1, {_T_D}), x -> CAST(x AS DOUBLE))"
        ).alias("embedding"),
    )
    qs = e8.filter(F.col("vec_id") < _T_NQ)
    exact = knn_join(qs, e8, k=_T_KNN).select(
        "query_id", F.col("neighbor_id").alias("rel_id")
    )
    trained = q230_ivfpq_trained_funnel(spark, sf_dir).select(
        "query_id", "neighbor_id", "rnk"
    )
    graded = trained.join(
        exact,
        (trained.query_id == exact.query_id)
        & (trained.neighbor_id == exact.rel_id),
        "left",
    ).select(
        trained.query_id.alias("qid"),
        "rnk",
        F.when(F.col("rel_id").isNotNull(), 1).otherwise(0).alias("rel"),
    )
    per_q = graded.groupBy("qid").agg(
        F.sum("rel").alias("n_hits"),
        F.min(F.when(F.col("rel") == 1, F.col("rnk"))).alias("first_hit"),
        F.sum(F.col("rel") * F.expr(_Q222_DISC_CASE)).alias("dcg_milli"),
    )
    spine = exact.select("query_id").distinct()
    return (
        spine.join(per_q, spine.query_id == per_q.qid, "left")
        .select(
            "query_id",
            F.coalesce("n_hits", F.lit(0)).cast("bigint").alias("n_hits"),
            F.coalesce(
                F.expr("1000 DIV first_hit"), F.lit(0)
            ).cast("bigint").alias("mrr_milli"),
            F.expr(
                f"CAST(COALESCE(dcg_milli, 0) * 1000 DIV {_Q222_IDCG}"
                " AS BIGINT)"
            ).alias("ndcg_milli"),
        )
        .orderBy("query_id")
    )
