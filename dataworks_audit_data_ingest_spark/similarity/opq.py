"""Optimized product quantization (OPQ) — PQ under a learned orthogonal
rotation (Ge et al., "Optimized Product Quantization", CVPR 2013). Plain PQ
quantizes fixed coordinate blocks, so correlated dimensions that straddle a
subspace boundary waste codebook capacity; OPQ first rotates the space to
decorrelate/balance the subspaces, cutting reconstruction error at identical
index size (same m·ksub codes per vector).

Distributed decomposition (the `similarity/pca.py` discipline — numpy only
ever touches d×d driver-side matrices):

  1. **Rotate** — ``y = R·x`` as a pure JVM expression over a literal d×d
     matrix (d² multiplies per row, no Python, no shuffle);
  2. **PQ step** — `pq.train_pq` + `pq.encode_pq` on the rotated vectors
     (one Lloyd loop for all m subspaces, broadcast codebooks);
  3. **Rotation step** — the Procrustes problem
     ``min_R ‖X·Rᵀ − Ŷ‖_F  s.t. RᵀR = I`` is solved from the d×d
     cross-scatter ``M = XᵀŶ = Σ x·ŷᵀ``, computed in ONE distributed pass
     keyed by (i, j) — shuffle width d², never |corpus| — then a
     driver-side SVD: ``M = U·S·Vᵀ ⇒ R = V·Uᵀ``.

Steps 2–3 alternate; each outer round is monotone non-increasing in
quantization error when the PQ step converges (Lloyd is a descent method,
and the rotation step is the exact argmin given the codes).

At 100 TB: per outer round the corpus is scanned once for the PQ step (its
own per-round shuffle is m·ksub·(d/m) codebook rows) and once for the
cross-scatter (d² keys); R itself is d² doubles — broadcast as a literal.
Search is `pq.pq_knn` on rotated queries — rotation is query-side only
(the index already stores rotated codes), and cosine is rotation-invariant
so the exact rerank runs on the ORIGINAL vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .pq import _assign_codes, _subvec_rows, encode_pq, pq_knn, train_pq

_DEC = "DECIMAL(28,18)"


def rotate_vectors(
    df: DataFrame,
    rotation: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "rotated",
) -> DataFrame:
    """``out[i] = Σ_j R[i][j]·x[j]`` — the rotation applied row-wise as JVM
    ZIP_WITH/AGGREGATE expressions over a literal matrix (the
    `pca.transform_pca` pattern; no Python in the per-row path)."""
    x = f"TRANSFORM({vec_col}, x -> CAST(x AS DOUBLE))"
    rows = []
    for r in rotation:
        r_arr = "ARRAY(" + ", ".join(f"CAST({v} AS DOUBLE)" for v in r) + ")"
        rows.append(
            f"AGGREGATE(ZIP_WITH({x}, {r_arr}, (x, r) -> x * r), "
            f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        )
    return df.withColumn(out_col, F.expr("ARRAY(" + ", ".join(rows) + ")"))


def reconstruct_pq(
    codes: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    out_col: str = "yhat",
) -> DataFrame:
    """(id, ŷ) — each vector's PQ reconstruction: the concatenation of its
    assigned codewords, assembled by exploding the code array against the
    broadcast codebook and re-flattening in subspace order."""
    exploded = codes.select(
        F.col(id_col).alias("id"),
        F.posexplode("pq_codes").alias("sub", "cell"),
    ).withColumn("cell", F.col("cell").cast("int"))
    return (
        exploded.join(F.broadcast(codebooks.select("sub", "cell", "cvec")), ["sub", "cell"])
        .groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("sub", "cvec"))).alias("_sc"))
        .select(
            F.col("id").alias(id_col),
            F.expr("FLATTEN(TRANSFORM(_sc, x -> x.cvec))").alias(out_col),
        )
    )


def _cross_scatter(
    corpus: DataFrame,
    recon: DataFrame,
    d: int,
    id_col: str,
    vec_col: str,
):
    """d×d numpy matrix ``M = Σ_rows x·ŷᵀ`` in one distributed pass: join
    original to reconstruction on id, double-posexplode to (i, j, x_i·ŷ_j),
    aggregate by (i, j) — d² keys regardless of corpus size."""
    import numpy as np

    joined = corpus.select(
        F.col(id_col).alias("id"),
        F.expr(f"TRANSFORM({vec_col}, x -> CAST(x AS DOUBLE))").alias("_x"),
    ).join(recon.select(F.col(id_col).alias("id"), "yhat"), "id")
    cells = (
        joined.select(F.posexplode("_x").alias("i", "xi"), "yhat")
        .select("i", "xi", F.posexplode("yhat").alias("j", "yj"))
        .groupBy("i", "j")
        .agg(F.sum(F.col("xi") * F.col("yj")).alias("s"))
        .collect()
    )
    m = np.zeros((d, d))
    for r in cells:
        m[r.i, r.j] = r.s
    return m


def train_opq(
    corpus: DataFrame,
    m: int = 8,
    ksub: int = 16,
    n_outer: int = 3,
    n_iter: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "opq",
) -> tuple[list[list[float]], DataFrame]:
    """Alternating OPQ training: returns ``(R, codebooks)`` where ``R`` is
    the learned d×d orthogonal rotation (row-major, ``y = R·x``) and
    ``codebooks`` the (sub, cell, cvec) table trained on the FINAL rotation
    (one extra PQ step after the last rotation update, so the returned pair
    is consistent). Deterministic: `train_pq` is deterministic, and the SVD
    runs on the same d×d matrix every run."""
    import numpy as np

    d = len(corpus.select(vec_col).first()[0])
    rot = np.eye(d)
    for _ in range(n_outer):
        rotated = rotate_vectors(corpus, rot.tolist(), vec_col, "_rot").localCheckpoint()
        cb = train_pq(rotated, m, ksub, n_iter, id_col, "_rot", seed)
        codes = encode_pq(rotated, cb, m, id_col, "_rot")
        recon = reconstruct_pq(codes, cb, id_col)
        cross = _cross_scatter(corpus, recon, d, id_col, vec_col)
        u, _, vt = np.linalg.svd(cross)
        rot = vt.T @ u.T
    rotated = rotate_vectors(corpus, rot.tolist(), vec_col, "_rot").localCheckpoint()
    cb = train_pq(rotated, m, ksub, n_iter, id_col, "_rot", seed)
    return rot.tolist(), cb


def encode_opq(
    df: DataFrame,
    rotation: list[list[float]],
    codebooks: DataFrame,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, pq_codes, pq_norm) in the rotated space — `pq.encode_pq` after
    the JVM-side rotation."""
    rotated = rotate_vectors(df, rotation, vec_col, "_rot")
    return encode_pq(rotated, codebooks, m, id_col, "_rot")


def _rotated_queries(
    queries: DataFrame, rotation: list[list[float]], vec_col: str
) -> DataFrame:
    """Rotate + materialize the query side once: `pq_knn` walks its query
    input twice (LUT build and norm pass), and the d² rotation runs on the
    interpreted higher-order-function path — localCheckpoint keeps it to
    one evaluation. The query side is small by construction (it broadcasts
    downstream)."""
    return rotate_vectors(queries, rotation, vec_col, "_rot").localCheckpoint()


def opq_knn(
    queries: DataFrame,
    corpus_codes: DataFrame,
    rotation: list[list[float]],
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
    """Top-k by ADC cosine in the rotated space: rotate the QUERIES (index
    codes are already rotated), run `pq.pq_knn`'s lookup-table scan, and —
    because rotation preserves inner products — rerank the top candidates
    with exact cosine on the ORIGINAL vectors (no corpus-side rotation at
    query time)."""
    rq = _rotated_queries(queries, rotation, vec_col)
    if not rerank:
        return pq_knn(
            rq, corpus_codes, codebooks, k, m, ksub, query_id, corpus_id, "_rot"
        )
    rerank = max(rerank, k)
    if corpus is None:
        raise ValueError("rerank requires the full-precision corpus")
    cand = pq_knn(
        rq, corpus_codes, codebooks, rerank, m, ksub, query_id, corpus_id, "_rot"
    ).select("query_id", "neighbor_id")
    from .knn import _with_norm, cosine_expr

    qv = _with_norm(
        queries.select(F.col(query_id).alias("query_id"), vec_col), vec_col
    ).select("query_id", F.col(vec_col).alias("_qv"), F.col("_nrm").alias("_qnrm"))
    cv = _with_norm(
        corpus.select(F.col(corpus_id).alias("neighbor_id"), vec_col), vec_col
    ).select(
        "neighbor_id", F.col(vec_col).alias("_cv"), F.col("_nrm").alias("_cnrm")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .withColumn("cosine", F.expr(cosine_expr("_qv", "_cv", "_qnrm", "_cnrm")))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", "cosine")
    )


def pq_mse(
    df: DataFrame,
    codebooks: DataFrame,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> float:
    """Mean squared quantization error ``avg ‖x − x̂‖²`` — the objective
    both PQ and OPQ minimize; used to verify the rotation actually helps."""
    assigned = _assign_codes(
        _subvec_rows(df, id_col, vec_col, m), codebooks
    )
    row = assigned.groupBy("id").agg(F.sum("sq_dist").alias("e")).agg(
        F.avg("e").alias("mse")
    ).first()
    return float(row.mse)
