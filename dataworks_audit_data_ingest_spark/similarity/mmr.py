"""Maximal-marginal-relevance (MMR) re-ranking of retrieval candidates.

Carbonell & Goldstein (1998): picking the k most-similar neighbors often
returns k near-copies of each other; MMR greedily selects the candidate
maximizing ``lam * relevance - (1 - lam) * max_similarity_to_already_
selected`` so the result set trades relevance against redundancy. This is
the query-time complement of q95's corpus-level diversity sampling — the
operator a RAG pipeline runs between ANN retrieval and the prompt.

Distribution shape — why this is an ``applyInPandas`` op and not a
DataFrame composition: the greedy loop is inherently sequential (round
r's choice depends on rounds 1..r-1), but ONLY within one query's
candidate list, which is small by construction (the top-m from
``knn_join``, m ≈ 50-200). So the expensive, corpus-sized work (ANN
candidate generation) stays in the distributed JVM plans, and the
sequential tail runs as one Arrow-batched pandas group per query —
thousands of queries re-rank in parallel, none of them big. This is the
sanctioned custom-kernel shape (same class as the crypto/media kernels):
built-ins genuinely cannot express a data-dependent sequential argmax.

Determinism: float64 arithmetic, ties broken by candidate id, no RNG —
the same inputs produce the same ranking on every engine and run.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mmr_select(
    ids: list, rel: "list[float]", vecs: "list[list[float]]", k: int, lam: float
) -> "list[tuple]":
    """Greedy MMR over one candidate list (numpy, float64)."""
    import numpy as np

    v = np.asarray(vecs, dtype=np.float64)
    norms = np.linalg.norm(v, axis=1)
    norms[norms == 0.0] = 1.0
    v = v / norms[:, None]
    rel = np.asarray(rel, dtype=np.float64)
    n = len(ids)
    chosen: list[int] = []
    # Max cosine to the chosen set, per candidate. Starts at -inf, not 0:
    # a candidate anti-correlated with everything selected has NEGATIVE
    # redundancy (the paper's max-over-selected), which a zero floor
    # would erase.
    max_sim = np.full(n, -np.inf)
    out = []
    for rank in range(1, min(k, n) + 1):
        if chosen:
            score = lam * rel - (1.0 - lam) * max_sim
        else:
            score = lam * rel  # first pick: pure relevance
        best, best_key = -1, None
        for i in range(n):
            if i in chosen:
                continue
            key = (-score[i], ids[i])  # deterministic: score desc, id asc
            if best_key is None or key < best_key:
                best, best_key = i, key
        chosen.append(best)
        out.append((ids[best], rank, float(score[best])))
        max_sim = np.maximum(max_sim, v @ v[best])
    return out


def mmr_rerank(
    candidates: DataFrame,
    k: int,
    lam: float = 0.7,
    query_col: str = "query_id",
    id_col: str = "neighbor_id",
    rel_col: str = "cosine",
    vec_col: str = "embedding",
) -> DataFrame:
    """Re-rank each query's candidate rows with MMR; returns one row per
    kept candidate: (query_col, id_col, mmr_rank 1..k, mmr_score).

    ``candidates`` must carry, per (query, candidate): the relevance
    score (``rel_col``, e.g. the knn_join cosine) and the CANDIDATE's
    vector (``vec_col``) for the redundancy term."""
    if not 0.0 <= lam <= 1.0:
        raise ValueError("lam must be in [0, 1]")
    id_dtype = dict(candidates.dtypes)[id_col]
    schema = (
        f"{query_col} {dict(candidates.dtypes)[query_col]}, "
        f"{id_col} {id_dtype}, mmr_rank int, mmr_score double"
    )

    def one_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort")  # order-independence
        picked = _mmr_select(
            list(pdf[id_col]), list(pdf[rel_col]), list(pdf[vec_col]), k, lam
        )
        return pd.DataFrame(
            {
                query_col: [pdf[query_col].iloc[0]] * len(picked),
                id_col: [p[0] for p in picked],
                "mmr_rank": [p[1] for p in picked],
                "mmr_score": [p[2] for p in picked],
            }
        )

    return candidates.select(query_col, id_col, rel_col, vec_col).groupBy(
        query_col
    ).applyInPandas(one_group, schema)


def knn_mmr(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    m: int = 50,
    lam: float = 0.7,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "brute",
    **knn_kwargs,
) -> DataFrame:
    """Retrieve-then-diversify: ``knn_join`` top-m candidates (any method
    — brute / ivf / srp), join back the candidate vectors, MMR down to k.
    The m→k funnel is the standard two-stage retrieval layout: stage one
    distributed and approximate-friendly, stage two small and exact."""
    from .knn import knn_join

    cand = knn_join(
        queries,
        corpus,
        k=m,
        query_id=query_id,
        corpus_id=corpus_id,
        vec_col=vec_col,
        method=method,
        **knn_kwargs,
    )
    with_vec = cand.join(
        corpus.select(
            F.col(corpus_id).alias("neighbor_id"), F.col(vec_col)
        ),
        "neighbor_id",
    )
    return mmr_rerank(
        with_vec, k=k, lam=lam, query_col="query_id", id_col="neighbor_id",
        rel_col="cosine", vec_col=vec_col,
    )
