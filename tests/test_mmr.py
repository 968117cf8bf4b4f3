"""`similarity/mmr.py`: greedy MMR re-ranking — numpy-reference parity,
the lam=1 degeneration to relevance order, an engineered diversity case,
and partition-order independence."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.similarity.mmr import knn_mmr, mmr_rerank


def _reference_mmr(ids, rel, vecs, k, lam):
    """Straight-from-the-paper reference implementation."""
    v = np.asarray(vecs, dtype=np.float64)
    v = v / np.linalg.norm(v, axis=1)[:, None]
    rel = np.asarray(rel, dtype=np.float64)
    remaining = list(range(len(ids)))
    chosen = []
    out = []
    for rank in range(1, k + 1):
        if not remaining:
            break
        scores = []
        for i in remaining:
            red = max((float(v[i] @ v[j]) for j in chosen), default=0.0)
            scores.append((-(lam * rel[i] - (1 - lam) * red), ids[i], i))
        scores.sort()
        _, _, best = scores[0]
        chosen.append(best)
        remaining.remove(best)
        out.append(ids[best])
    return out


def _candidates(spark, n_query=3, n_cand=20, dim=8, seed=7):
    rng = np.random.default_rng(seed)
    rows = []
    for qid in range(n_query):
        for cid in range(n_cand):
            vec = [float(x) for x in rng.normal(size=dim)]
            rel = float(rng.uniform(0.1, 1.0))
            rows.append((qid, qid * 1000 + cid, rel, vec))
    return rows, spark.createDataFrame(
        rows, "query_id int, neighbor_id int, cosine double, embedding array<double>"
    )


def test_matches_reference_implementation(spark):
    rows, df = _candidates(spark)
    got = {
        (r.query_id, r.mmr_rank): r.neighbor_id
        for r in mmr_rerank(df, k=5, lam=0.6).collect()
    }
    for qid in range(3):
        cand = [r for r in rows if r[0] == qid]
        cand.sort(key=lambda r: r[1])  # same id-sorted base order
        want = _reference_mmr(
            [r[1] for r in cand], [r[2] for r in cand], [r[3] for r in cand],
            k=5, lam=0.6,
        )
        assert [got[(qid, rk)] for rk in range(1, 6)] == want


def test_lam_one_is_pure_relevance(spark):
    rows, df = _candidates(spark, n_query=2)
    got = mmr_rerank(df, k=4, lam=1.0).collect()
    for qid in range(2):
        cand = sorted(
            (r for r in rows if r[0] == qid), key=lambda r: (-r[2], r[1])
        )
        want = [r[1] for r in cand[:4]]
        mine = [
            r.neighbor_id
            for r in sorted(got, key=lambda r: r.mmr_rank)
            if r.query_id == qid
        ]
        assert mine == want


def test_diversity_on_engineered_clusters(spark):
    """Ten near-copies of the relevant direction + one orthogonal
    candidate: top-k by relevance keeps only copies; MMR must pull in the
    orthogonal one."""
    copies = [(0, i, 0.95 - i * 0.001, [1.0, 0.0001 * i, 0.0]) for i in range(10)]
    ortho = (0, 99, 0.55, [0.0, 0.0, 1.0])
    df = spark.createDataFrame(
        copies + [ortho],
        "query_id int, neighbor_id int, cosine double, embedding array<double>",
    )
    picked = {
        r.neighbor_id for r in mmr_rerank(df, k=3, lam=0.5).collect()
    }
    assert 99 in picked  # relevance-only top-3 would be {0, 1, 2}


def test_partition_order_independent(spark):
    _, df = _candidates(spark, n_query=2, n_cand=30)
    a = mmr_rerank(df.repartition(1), k=6, lam=0.7).collect()
    b = mmr_rerank(df.repartition(16, "neighbor_id"), k=6, lam=0.7).collect()
    key = lambda r: (r.query_id, r.mmr_rank)  # noqa: E731
    assert sorted((r.query_id, r.mmr_rank, r.neighbor_id) for r in a) == sorted(
        (r.query_id, r.mmr_rank, r.neighbor_id) for r in b
    )


def test_knn_mmr_end_to_end(spark):
    """Funnel: brute knn top-m -> MMR top-k over the embeddings table."""
    from dataworks_audit_data_ingest_spark.tables import table

    emb = table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    out = knn_mmr(queries, emb, k=5, m=20, lam=0.7)
    rows = out.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r.mmr_rank)
    assert set(per_q) == {0, 1, 2}
    for ranks in per_q.values():
        assert sorted(ranks) == [1, 2, 3, 4, 5]


def test_lam_validation(spark):
    _, df = _candidates(spark, n_query=1, n_cand=3)
    with pytest.raises(ValueError):
        mmr_rerank(df, k=2, lam=1.5)
