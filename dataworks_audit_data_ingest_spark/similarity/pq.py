"""Product quantization (PQ) for embedding columns — the compression rung
below int8 scalar quantization (`similarity/quantize.py`): a d-dim vector
becomes ``m`` one-byte codes (one per subspace), an 8× smaller index than
int8 levels at d=64/m=8, with distances computed by table lookup (ADC)
instead of a d-wide dot product.

Spark-first design, no Python in any hot path:

- **Training** (`train_pq`) is one Lloyd's loop over ALL subspaces at
  once: vectors split into m sub-vectors (a per-row ``SLICE`` explode, no
  shuffle), and the k-means rounds key every step by (sub, cell) — the
  same broadcast-assign / decimal-mean-update discipline as
  `similarity/kmeans.py::train_cells`, with the m trainings sharing each
  round's single shuffle instead of running m sequential loops.
- **Encoding** (`encode_pq`) assigns each sub-vector to its nearest
  codeword via a broadcast join against the (m·ksub)-row codebook and
  packs the codes into one ``array<smallint>`` per vector, plus the
  reconstructed norm ``sqrt(Σ_s ||c_s||²)`` (exact for the concatenated
  codeword vector) so cosine ADC needs no second pass.
- **Search** (`pq_knn`) builds a per-query lookup table — the partial dot
  product of each query sub-vector with every codeword, an (m·ksub)-double
  array per query computed with DataFrame ops only — broadcasts it, and
  scores each corpus vector with an m-lookup fold over its code array:
  ``dot(q, x̂) = Σ_s lut[s·ksub + code_s]``. Per pair that is m array
  reads instead of d multiplies. Optional exact rerank re-scores the top
  candidates with full-precision cosine (same two-stage shape as
  `quantized_knn`).

At 100 TB: the codebook is m·ksub·(d/m) doubles (a few KB) — broadcast;
training touches the corpus once per round with one (sub, cell, pos)-keyed
shuffle of k·d rows; encoding is one broadcast join + one id-keyed agg;
search shuffles nothing on the corpus side beyond the final top-k window.
Everything is deterministic: init picks lowest-portable-hash ids per
subspace, means are decimal-exact, ties break on ids.

Determinism caveat shared with the whole similarity family: the ADC fold
is a sequential JVM AGGREGATE (not a shuffled sum), so results are
identical across partitionings and runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import spark_hash32

_DEC = "DECIMAL(28,18)"


def _subvec_rows(
    df: DataFrame, id_name: str, vec_col: str, m: int
) -> DataFrame:
    """(id, sub, svec) — each vector split into m contiguous sub-vectors
    (per-row SLICE explode; no shuffle). Dimension must divide by m —
    checked lazily by the SLICE length downstream."""
    return df.select(
        F.col(id_name).alias("id"),
        F.posexplode(
            F.expr(
                f"TRANSFORM(SEQUENCE(0, {m - 1}), s -> "
                f"SLICE(TRANSFORM({vec_col}, x -> CAST(x AS DOUBLE)), "
                f"s * (SIZE({vec_col}) DIV {m}) + 1, SIZE({vec_col}) DIV {m}))"
            )
        ).alias("sub", "svec"),
    )


def _sq_dist(a: str, b: str) -> str:
    return (
        f"CAST(AGGREGATE(ZIP_WITH({a}, {b}, (p, v) -> "
        f"CAST((p - v) * (p - v) AS {_DEC})), CAST(0 AS {_DEC}), "
        f"(acc, x) -> CAST(acc + x AS {_DEC})) AS DOUBLE)"
    )


def _assign_codes(subpts: DataFrame, codebooks: DataFrame) -> DataFrame:
    """(id, sub, cell, sq_dist): nearest codeword per sub-vector; ties
    break on the lower cell id. One broadcast join + one argmin window —
    the codebook is m·ksub rows, always broadcast-sized."""
    scored = subpts.join(
        F.broadcast(codebooks.select("sub", "cell", "cvec")), "sub"
    ).withColumn("sq_dist", F.expr(_sq_dist("svec", "cvec")))
    w = Window.partitionBy("id", "sub").orderBy("sq_dist", "cell")
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("id", "sub", "cell", "sq_dist")
    )


def train_pq(
    corpus: DataFrame,
    m: int = 8,
    ksub: int = 16,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "pq",
) -> DataFrame:
    """Train per-subspace codebooks: returns (sub, cell, cvec) with
    ``m × ksub`` rows. All m subspace k-means run inside ONE loop —
    assignment and the decimal-exact mean update are keyed by (sub, cell),
    so each Lloyd round costs one broadcast join, one corpus-subvector
    scan, and one (sub, cell, pos)-keyed shuffle of at most m·ksub·(d/m)
    rows. Init is the ``ksub`` lowest-portable-hash sub-vectors per
    subspace (the `train_cells(init="spread")` discipline, one job for all
    subspaces); a cell that loses every member keeps its previous
    codeword. Deterministic across runs and partitionings."""
    subpts = _subvec_rows(corpus, id_col, vec_col, m).localCheckpoint()
    hashed = subpts.withColumn(
        "_h", F.expr(spark_hash32("CAST(id AS STRING)", seed))
    )
    w_init = Window.partitionBy("sub").orderBy("_h", "id")
    codebooks = (
        hashed.withColumn("_rk", F.row_number().over(w_init))
        .filter(F.col("_rk") <= ksub)
        .select("sub", (F.col("_rk") - 1).alias("cell"), F.col("svec").alias("cvec"))
    ).localCheckpoint()

    for _ in range(n_iter):
        assigned = _assign_codes(subpts, codebooks)
        elems = (
            subpts.join(assigned.select("id", "sub", "cell"), ["id", "sub"])
            .select("sub", "cell", F.posexplode("svec").alias("pos", "v"))
        )
        # Portable mean (see kmeans.py): decimal-exact SUM → double →
        # divide, matching DuckDB's CAST(SUM(...) AS DOUBLE)/COUNT(*)
        # bit-for-bit so trained codebooks pin under the oracle (q230).
        means = elems.groupBy("sub", "cell", "pos").agg(
            (
                F.sum(F.col("v").cast(_DEC)).cast("double")
                / F.count(F.lit(1))
            ).alias("mval")
        )
        new_cents = (
            means.groupBy("sub", "cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "mval"))).alias("pm"))
            .select(
                "sub", "cell", F.expr("TRANSFORM(pm, x -> x.mval)").alias("new_cvec")
            )
        )
        codebooks = (
            codebooks.join(new_cents, ["sub", "cell"], "left")
            .select("sub", "cell", F.coalesce("new_cvec", "cvec").alias("cvec"))
        ).localCheckpoint()
    return codebooks


def encode_pq(
    df: DataFrame,
    codebooks: DataFrame,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, pq_codes: array<smallint>, pq_norm: double) — each vector's m
    nearest-codeword indices (ordered by subspace) and the EXACT norm of
    its reconstruction (the concatenated codewords), precomputed so ADC
    cosine needs no corpus-side second pass. One broadcast join + one
    id-keyed agg; d/m·ksub multiplies per sub-vector, m rows shuffled per
    vector."""
    norms = codebooks.withColumn(
        "_csq",
        F.expr(
            f"CAST(AGGREGATE(TRANSFORM(cvec, x -> CAST(x * x AS {_DEC})), "
            f"CAST(0 AS {_DEC}), (acc, v) -> CAST(acc + v AS {_DEC})) AS DOUBLE)"
        ),
    )
    assigned = _assign_codes(
        _subvec_rows(df, id_col, vec_col, m),
        norms.select("sub", "cell", "cvec"),
    ).join(F.broadcast(norms.select("sub", "cell", "_csq")), ["sub", "cell"])
    return (
        assigned.groupBy("id")
        .agg(
            F.array_sort(F.collect_list(F.struct("sub", "cell"))).alias("_sc"),
            F.sqrt(F.sum("_csq")).alias("pq_norm"),
        )
        .select(
            F.col("id").alias(id_col),
            F.expr("TRANSFORM(_sc, x -> CAST(x.cell AS SMALLINT))").alias(
                "pq_codes"
            ),
            "pq_norm",
        )
    )


def pq_knn(
    queries: DataFrame,
    corpus_codes: DataFrame,
    codebooks: DataFrame,
    k: int,
    m: int = 8,
    ksub: int = 16,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    rerank: int = 0,
    corpus: DataFrame | None = None,
) -> DataFrame:
    """Top-k by ADC cosine: (query_id, neighbor_id, rnk, cosine).

    Per query, a lookup table ``lut[s·ksub + c] = <q_s, codeword(s, c)>``
    is built with DataFrame ops (explode query sub-vectors × broadcast
    codebook, fold back to one array column) and broadcast with the query;
    each corpus vector then costs m array reads:
    ``adot = Σ_s lut[s·ksub + pq_codes[s]]``, and
    ``cosine ≈ adot / (||q|| · pq_norm)``. With ``rerank = c ≥ k`` (and
    ``corpus`` supplied), the top c ADC candidates are re-scored with
    exact full-precision cosine — the standard two-stage shape; ADC error
    then only costs recall at the candidate boundary, never precision of
    returned scores."""
    if rerank:
        rerank = max(rerank, k)
        if corpus is None:
            raise ValueError("rerank requires the full-precision corpus")
    qsub = _subvec_rows(queries, query_id, vec_col, m)
    pd_expr = (
        f"CAST(AGGREGATE(ZIP_WITH(svec, cvec, (p, v) -> "
        f"CAST(p * v AS {_DEC})), CAST(0 AS {_DEC}), "
        f"(acc, x) -> CAST(acc + x AS {_DEC})) AS DOUBLE)"
    )
    lut = (
        qsub.join(F.broadcast(codebooks.select("sub", "cell", "cvec")), "sub")
        .withColumn("_pd", F.expr(pd_expr))
        .groupBy("id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("sub", "cell", "_pd"))
            ).alias("_scp")
        )
        .select(
            F.col("id").alias("query_id"),
            F.expr("TRANSFORM(_scp, x -> x._pd)").alias("_lut"),
        )
    )
    qn = queries.select(
        F.col(query_id).alias("query_id"),
        F.expr(
            f"SQRT(CAST(AGGREGATE(TRANSFORM({vec_col}, x -> "
            f"CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS {_DEC})), "
            f"CAST(0 AS {_DEC}), (acc, v) -> CAST(acc + v AS {_DEC})) AS DOUBLE))"
        ).alias("_qn"),
    )
    qside = lut.join(qn, "query_id")
    c = corpus_codes.select(
        F.col(corpus_id).alias("neighbor_id"), "pq_codes", "pq_norm"
    )
    adot = (
        f"AGGREGATE(SEQUENCE(0, {m - 1}), CAST(0 AS DOUBLE), "
        f"(acc, s) -> acc + _lut[s * {ksub} + CAST(pq_codes[s] AS INT)])"
    )
    pairs = (
        F.broadcast(qside)
        .join(c, F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "qcos",
            F.expr(adot)
            / F.when(F.col("pq_norm") > 0, F.col("_qn") * F.col("pq_norm")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qcos"), F.asc("neighbor_id"))
    if not rerank:
        return (
            pairs.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("query_id", "neighbor_id", "rnk", F.col("qcos").alias("cosine"))
        )
    from .knn import _with_norm, cosine_expr

    cand = (
        pairs.withColumn("_cr", F.row_number().over(w))
        .filter(F.col("_cr") <= rerank)
        .select("query_id", "neighbor_id")
    )
    qv = _with_norm(
        queries.select(F.col(query_id).alias("query_id"), vec_col), vec_col
    ).select("query_id", F.col(vec_col).alias("_qv"), F.col("_nrm").alias("_qnrm"))
    cv = _with_norm(
        corpus.select(F.col(corpus_id).alias("neighbor_id"), vec_col), vec_col
    ).select(
        "neighbor_id", F.col(vec_col).alias("_cv"), F.col("_nrm").alias("_cnrm")
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .withColumn("cosine", F.expr(cosine_expr("_qv", "_cv", "_qnrm", "_cnrm")))
        .withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", "cosine")
    )
