"""IVF-PQ — the two-level ANN index: coarse cell routing (IVF) over
residual product-quantized codes (PQ), the composition that carries
billion-vector search (Jégou et al., "Product Quantization for Nearest
Neighbor Search", TPAMI 2011, §IV — IVFADC).

Why the composition beats either level alone at 100 TB:

- IVF alone (`similarity/kmeans.py` + `knn_join(method="ivf")`) prunes
  the corpus to ``n_probe`` cells but still pays a d-wide exact dot per
  surviving vector and stores full-precision vectors.
- PQ alone (`similarity/pq.py`) compresses every vector to ``m`` bytes
  and scores by table lookup, but scans the WHOLE corpus per query.
- IVF-PQ does both: route to ``n_probe`` cells, then ADC-score only
  those cells' codes. Crucially the codes quantize the RESIDUAL
  ``r = x − c(cell)``, which has far lower variance than ``x`` itself, so
  the same code budget reconstructs tighter; and the inner product
  decomposes as ``⟨q, x̂⟩ = ⟨q, c⟩ + ⟨q, r̂⟩`` — the first term is already
  computed during routing, the second is the standard per-query subspace
  lookup table, shared across all probed cells.

Spark shapes (no Python anywhere):

- **Train**: `train_cells` (one (cell,pos)-keyed shuffle per Lloyd
  round) → residuals via one broadcast join → `train_pq` on residuals
  (one (sub,cell,pos)-keyed shuffle per round for all m subspaces).
- **Encode** (`encode_ivfpq`): assign cell (broadcast argmin), subtract
  the broadcast centroid (ZIP_WITH, map-side), assign per-subspace codes
  (broadcast argmin), reconstruct exactly once to precompute
  ``recon_norm = ‖c + r̂‖`` so search needs no corpus-side second pass.
  Store partitioned by ``cell`` and the probe becomes partition pruning.
- **Search** (`ivfpq_knn`): routing dot against the broadcast k-row
  centroid table (kept as the ADC ``⟨q, c⟩`` term), per-query LUT of all
  m·ksub codeword partial dots (broadcast), then each candidate costs m
  array reads + one add. Optional exact rerank of the top candidates on
  the full-precision corpus (two-stage, same as `pq_knn`).

Determinism: every sum in the index path is decimal-exact and every
argmin/topk tie breaks on ids, so cells, codes, and rankings are
identical across runs and partitionings. ``exact_adc=True`` keeps the
ADC accumulation itself in DECIMAL (exact, order-free) — the mode the
oracle-checked q141 runs; the default double path is the production fast
path (same candidates in practice, ulp-level score drift possible).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .kmeans import assign_cells, train_cells
from .pq import _assign_codes, _subvec_rows, train_pq

_DEC = "DECIMAL(28,18)"


def _fold_dec(expr: str) -> str:
    return (
        f"AGGREGATE({expr}, CAST(0 AS {_DEC}), (acc, v) -> CAST(acc + v AS {_DEC}))"
    )


def residuals(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str | None = None,
) -> DataFrame:
    """(id, cell, rvec) — residual ``x − c(cell)`` per vector.

    With ``cell_col`` the existing assignment is used (e.g. a label
    partition, or a stored index); otherwise each vector is assigned to
    its nearest centroid first. One broadcast join either way; the
    subtraction is a map-side ZIP_WITH."""
    pts = corpus.select(
        F.col(id_col).alias("id"),
        F.expr(f"TRANSFORM({vec_col}, x -> CAST(x AS DOUBLE))").alias("vec"),
        *([F.col(cell_col).cast("int").alias("cell")] if cell_col else []),
    )
    if not cell_col:
        assigned = assign_cells(pts, centroids).select("id", "cell")
        pts = pts.join(assigned, "id")
    return (
        pts.join(F.broadcast(centroids), "cell")
        .select(
            "id",
            "cell",
            F.expr("ZIP_WITH(vec, cvec, (a, b) -> a - b)").alias("rvec"),
        )
    )


def train_ivfpq(
    corpus: DataFrame,
    k_cells: int = 16,
    m: int = 8,
    ksub: int = 16,
    n_iter_cells: int = 5,
    n_iter_pq: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_init: str = "spread",
) -> tuple[DataFrame, DataFrame]:
    """(centroids(cell, cvec), codebooks(sub, cell, cvec)) — coarse cells
    from Lloyd's k-means, then per-subspace codebooks trained on the
    RESIDUALS of the final assignment. ``cell_init="spread"`` is the
    one-job init (the IVF-scale default); training cost is
    O(n_iter_cells + n_iter_pq) shuffles total."""
    _, centroids = train_cells(
        corpus,
        k=k_cells,
        n_iter=n_iter_cells,
        id_col=id_col,
        vec_col=vec_col,
        init=cell_init,
    )
    res = residuals(corpus, centroids, id_col=id_col, vec_col=vec_col)
    codebooks = train_pq(
        res, m=m, ksub=ksub, n_iter=n_iter_pq, id_col="id", vec_col="rvec"
    )
    return centroids, codebooks


def encode_ivfpq(
    corpus: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str | None = None,
) -> DataFrame:
    """(id, cell, pq_codes: array<smallint>, recon_norm: double).

    ``recon_norm`` is the EXACT norm of the reconstruction
    ``x̂ = c(cell) + concat(codewords)``: the cross term ⟨c, r̂⟩ makes the
    per-part norms insufficient (unlike plain PQ), so the reconstruction
    is materialized once here — encode-time cost, never search-time.
    One broadcast argmin per subspace + one id-keyed agg."""
    res = residuals(
        corpus, centroids, id_col=id_col, vec_col=vec_col, cell_col=cell_col
    )
    codes = _assign_codes(
        _subvec_rows(res, "id", "rvec", m),
        codebooks.select("sub", F.col("cell"), "cvec"),
    )
    # gather codeword subvectors in subspace order → r̂, then x̂ = c + r̂
    recon = (
        codes.join(
            F.broadcast(
                codebooks.select(
                    "sub", F.col("cell"), F.col("cvec").alias("_cw")
                )
            ),
            ["sub", "cell"],
        )
        .groupBy("id")
        .agg(
            F.array_sort(F.collect_list(F.struct("sub", F.col("cell"), "_cw"))).alias(
                "_sc"
            )
        )
        .select(
            "id",
            F.expr("TRANSFORM(_sc, x -> CAST(x.cell AS SMALLINT))").alias(
                "pq_codes"
            ),
            F.expr("FLATTEN(TRANSFORM(_sc, x -> x._cw))").alias("_rhat"),
        )
    )
    cells = res.select("id", "cell")
    xhat_sq = _fold_dec(
        "ZIP_WITH(_xhat, _xhat, (a, b) -> CAST(a * b AS " + _DEC + "))"
    )
    return (
        recon.join(cells, "id")
        .join(F.broadcast(centroids), "cell")
        .withColumn(
            "_xhat", F.expr("ZIP_WITH(cvec, _rhat, (a, b) -> a + b)")
        )
        .select(
            F.col("id").alias(id_col),
            "cell",
            "pq_codes",
            F.expr(f"SQRT(CAST({xhat_sq} AS DOUBLE))").alias("recon_norm"),
        )
    )


def ivfpq_knn(
    queries: DataFrame,
    encoded: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    k: int,
    m: int = 8,
    ksub: int = 16,
    n_probe: int = 2,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    rerank: int = 0,
    corpus: DataFrame | None = None,
    exact_adc: bool = False,
    candidate_filter: DataFrame | None = None,
) -> DataFrame:
    """Top-k by IVF-routed ADC cosine: (query_id, neighbor_id, rnk, cosine).

    Routing ranks cells by cosine(q, centroid) (ties → lower cell) and
    keeps the decimal ⟨q, c⟩ of each probed cell — the constant term of
    the ADC expansion. Candidates are the probed cells' codes only; each
    costs m LUT reads. ``rerank = c ≥ k`` (with ``corpus``) re-scores the
    top c with exact full-precision cosine. ``exact_adc`` keeps the
    m-term fold in DECIMAL — order-free exact, used by the q141 oracle;
    the double path is the production default.

    ``candidate_filter``: FILTERED ANN at the PQ level (the id-set form
    of `knn_join(filter_expr=...)`, q231): a DataFrame whose ``corpus_id``
    column lists the qualifying vectors. Evaluated INSIDE the probe via a
    semi-join on the encoded codes (filter-then-rank — every returned
    rank qualifies; the index geometry is untouched). At 100 TB the id
    set is the materialized result of a metadata predicate and the
    semi-join rides the cell-partitioned scan."""
    if rerank:
        rerank = max(rerank, k)
        if corpus is None:
            raise ValueError("rerank requires the full-precision corpus")
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.expr(f"TRANSFORM({vec_col}, x -> CAST(x AS DOUBLE))").alias("_qv"),
    )
    qn = q.withColumn(
        "_qn",
        F.expr(
            "SQRT(CAST("
            + _fold_dec(f"ZIP_WITH(_qv, _qv, (a, b) -> CAST(a * b AS {_DEC}))")
            + " AS DOUBLE))"
        ),
    )

    # --- routing: decimal ⟨q, c⟩ per cell; rank by cosine(q, c) ----------
    cent_n = centroids.withColumn(
        "_cn",
        F.expr(
            "SQRT(CAST("
            + _fold_dec(f"ZIP_WITH(cvec, cvec, (a, b) -> CAST(a * b AS {_DEC}))")
            + " AS DOUBLE))"
        ),
    )
    routed = qn.join(F.broadcast(cent_n)).withColumn(
        "_cdot",
        F.expr(_fold_dec(f"ZIP_WITH(_qv, cvec, (a, b) -> CAST(a * b AS {_DEC}))")),
    )
    w_route = Window.partitionBy("query_id").orderBy(
        F.desc(
            F.col("_cdot").cast("double")
            / F.when(F.col("_cn") > 0, F.col("_qn") * F.col("_cn"))
        ),
        F.asc("cell"),
    )
    probes = (
        routed.withColumn("_pr", F.row_number().over(w_route))
        .filter(F.col("_pr") <= n_probe)
        .select("query_id", "cell", "_cdot", "_qn")
    )

    # --- per-query LUT: decimal partial dot per (sub, codeword) ---------
    qsub = _subvec_rows(q, "query_id", "_qv", m)
    lut = (
        qsub.join(F.broadcast(codebooks.select("sub", "cell", "cvec")), "sub")
        .withColumn(
            "_pd",
            F.expr(
                _fold_dec(f"ZIP_WITH(svec, cvec, (p, v) -> CAST(p * v AS {_DEC}))")
            ),
        )
        .groupBy(F.col("id").alias("query_id"))
        .agg(F.array_sort(F.collect_list(F.struct("sub", "cell", "_pd"))).alias("_scp"))
        .select(
            "query_id",
            F.expr("TRANSFORM(_scp, x -> x._pd)").alias("_lut"),
        )
    )

    c = encoded.select(
        F.col(corpus_id).alias("neighbor_id"), "cell", "pq_codes", "recon_norm"
    )
    if candidate_filter is not None:
        c = c.join(
            candidate_filter.select(F.col(corpus_id).alias("neighbor_id")),
            "neighbor_id",
            "left_semi",
        )
    if exact_adc:
        adot = (
            f"CAST(AGGREGATE(SEQUENCE(0, {m - 1}), _cdot, "
            f"(acc, s) -> CAST(acc + _lut[s * {ksub} + CAST(pq_codes[s] AS INT)] "
            f"AS {_DEC})) AS DOUBLE)"
        )
    else:
        adot = (
            f"CAST(_cdot AS DOUBLE) + AGGREGATE(SEQUENCE(0, {m - 1}), "
            f"CAST(0 AS DOUBLE), (acc, s) -> "
            f"acc + CAST(_lut[s * {ksub} + CAST(pq_codes[s] AS INT)] AS DOUBLE))"
        )
    pairs = (
        F.broadcast(probes.join(lut, "query_id"))
        .join(c, ["cell"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "qcos",
            F.expr(adot)
            / F.when(F.col("recon_norm") > 0, F.col("_qn") * F.col("recon_norm")),
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
    ).select("query_id", F.col(vec_col).alias("_qfull"), F.col("_nrm").alias("_qnrm"))
    cv = _with_norm(
        corpus.select(F.col(corpus_id).alias("neighbor_id"), vec_col), vec_col
    ).select(
        "neighbor_id", F.col(vec_col).alias("_cfull"), F.col("_nrm").alias("_cnrm")
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .withColumn("cosine", F.expr(cosine_expr("_qfull", "_cfull", "_qnrm", "_cnrm")))
        .withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk", "cosine")
    )


def save_ivfpq_index(
    path: str,
    centroids: DataFrame,
    codebooks: DataFrame,
    encoded: DataFrame,
) -> None:
    """Persist a trained+encoded IVF-PQ index:

    - ``centroids/``, ``codebooks/`` — broadcast-sized plain parquet;
    - ``encoded/`` — the corpus codes partitioned by ``cell``, so a
      search's ``n_probe`` cells become partition pruning at scan time
      (the probe reads n_probe directories, never the corpus).

    One file per cell keeps the layout compact; at 100 TB shard large
    cells by lifting the repartition count."""
    centroids.write.mode("overwrite").parquet(f"{path}/centroids")
    codebooks.write.mode("overwrite").parquet(f"{path}/codebooks")
    (
        encoded.repartition("cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{path}/encoded")
    )


def load_ivfpq_index(spark, path: str):
    """(centroids, codebooks, encoded) — the search-ready triple.
    ``encoded`` is the cell-partitioned scan; filters on ``cell`` prune
    directories before any byte is read."""
    return (
        spark.read.parquet(f"{path}/centroids"),
        spark.read.parquet(f"{path}/codebooks"),
        spark.read.parquet(f"{path}/encoded"),
    )
