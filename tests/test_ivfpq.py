"""IVF-PQ (`similarity/ivfpq.py`): residual correctness, exact-recon ADC
identity, full-probe/full-rerank equivalence to brute force, cell pruning,
and determinism across partitionings."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.similarity.ivfpq import (
    encode_ivfpq,
    ivfpq_knn,
    residuals,
    train_ivfpq,
)
from dataworks_audit_data_ingest_spark.similarity.knn import knn_join
from dataworks_audit_data_ingest_spark.tables import table

SF = "/root/testdata/sf0.001"
M, KSUB, KCELLS = 8, 16, 8


def _recall_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def _recall(got: dict, want: dict) -> float:
    total = sum(len(v) for v in want.values())
    hit = sum(len(got.get(q, set()) & want[q]) for q in want)
    return hit / total


def _index(spark, n=None):
    e = table(spark, SF, "embeddings")
    if n:
        e = e.filter(F.col("vec_id") < n)
    cents, books = train_ivfpq(
        e, k_cells=KCELLS, m=M, ksub=KSUB, n_iter_cells=2, n_iter_pq=2
    )
    enc = encode_ivfpq(e, cents, books, m=M)
    return e, cents, books, enc


def test_residuals_subtract_assigned_centroid(spark):
    e, cents, _, _ = _index(spark, n=40)
    res = residuals(e, cents)
    cent_map = {r.cell: list(r.cvec) for r in cents.collect()}
    vec_map = {
        r.vec_id: [float(x) for x in r.embedding] for r in e.collect()
    }
    for r in res.collect():
        want = [a - b for a, b in zip(vec_map[r.id], cent_map[r.cell])]
        assert list(r.rvec) == want  # exact IEEE subtraction, no tolerance


def test_recon_norm_is_exact_reconstruction_norm(spark):
    """recon_norm == ‖centroid + concat(codewords)‖ recomputed in Python —
    the cross-term ⟨c, r̂⟩ is included (the plain-PQ per-part norms would
    not be enough here)."""
    e, cents, books, enc = _index(spark, n=40)
    cent_map = {r.cell: list(r.cvec) for r in cents.collect()}
    book = {(r.sub, r.cell): list(r.cvec) for r in books.collect()}
    for r in enc.collect():
        rhat = []
        for s, code in enumerate(r.pq_codes):
            rhat += book[(s, int(code))]
        xhat = [a + b for a, b in zip(cent_map[r.cell], rhat)]
        want = math.sqrt(sum(x * x for x in xhat))
        assert abs(r.recon_norm - want) < 1e-9


def test_adc_scores_match_reconstruction_cosine(spark):
    """With exact_adc and no rerank, the ADC cosine equals the exact
    cosine(query, reconstruction) — the ⟨q,c⟩ + Σ LUT decomposition is an
    identity, not an approximation, once codes are fixed."""
    e, cents, books, enc = _index(spark, n=60)
    q = e.filter(F.col("vec_id") < 3)
    got = ivfpq_knn(
        q, enc, cents, books, k=5, m=M, ksub=KSUB, n_probe=KCELLS,
        exact_adc=True,
    ).collect()

    cent_map = {r.cell: list(r.cvec) for r in cents.collect()}
    book = {(r.sub, r.cell): list(r.cvec) for r in books.collect()}
    enc_map = {r.vec_id: r for r in enc.collect()}
    qvecs = {r.vec_id: [float(x) for x in r.embedding] for r in q.collect()}
    for row in got:
        er = enc_map[row.neighbor_id]
        rhat = []
        for s, code in enumerate(er.pq_codes):
            rhat += book[(s, int(code))]
        xhat = [a + b for a, b in zip(cent_map[er.cell], rhat)]
        qv = qvecs[row.query_id]
        dot = sum(a * b for a, b in zip(qv, xhat))
        want = dot / (
            math.sqrt(sum(x * x for x in qv)) * math.sqrt(sum(x * x for x in xhat))
        )
        assert abs(row.cosine - want) < 1e-9


def test_full_probe_full_rerank_equals_brute(spark):
    """n_probe = all cells + rerank ≥ corpus ⇒ candidates are the whole
    corpus and the exact-rerank output equals brute-force top-k exactly
    (ids AND scores)."""
    e, cents, books, enc = _index(spark)
    q = e.filter(F.col("vec_id") < 5)
    n = e.count()
    got = ivfpq_knn(
        q, enc, cents, books, k=5, m=M, ksub=KSUB, n_probe=KCELLS,
        rerank=n, corpus=e,
    )
    want = knn_join(q, e, k=5)
    g = sorted((r.query_id, r.rnk, r.neighbor_id, r.cosine) for r in got.collect())
    w = sorted((r.query_id, r.rnk, r.neighbor_id, r.cosine) for r in want.collect())
    assert g == w


def test_cell_pruning_and_reranked_recall(spark):
    """n_probe=3 of 8 cells: candidate volume strictly below the corpus
    size (the probe prunes), and reranked recall@5 vs exact brute stays
    above 0.5 on the sf0.001 corpus."""
    e, cents, books, enc = _index(spark)
    q = e.filter(F.col("vec_id") < 5)
    probes = 3
    # candidate volume = rows of the probed cells (minus self-pairs)
    cell_sizes = {r.cell: r.cnt for r in enc.groupBy("cell").count().withColumnRenamed("count", "cnt").collect()}
    n = e.count()
    assert sum(sorted(cell_sizes.values(), reverse=True)[:probes]) < n

    got = ivfpq_knn(
        q, enc, cents, books, k=5, m=M, ksub=KSUB, n_probe=probes,
        rerank=50, corpus=e,
    )
    want = knn_join(q, e, k=5)
    rec = _recall(_recall_sets(got), _recall_sets(want))
    assert rec >= 0.5, rec


def test_ivfpq_deterministic_across_partitionings(spark):
    e = table(spark, SF, "embeddings")
    cents, books = train_ivfpq(
        e, k_cells=KCELLS, m=M, ksub=KSUB, n_iter_cells=2, n_iter_pq=2
    )
    enc1 = encode_ivfpq(e, cents, books, m=M)
    enc2 = encode_ivfpq(e.repartition(7), cents, books, m=M)
    q = e.filter(F.col("vec_id") < 4)
    r1 = ivfpq_knn(q, enc1, cents, books, k=5, m=M, ksub=KSUB, n_probe=2)
    r2 = ivfpq_knn(
        q.repartition(3), enc2, cents, books, k=5, m=M, ksub=KSUB, n_probe=2
    )
    rows1 = sorted(map(tuple, r1.collect()))
    rows2 = sorted(map(tuple, r2.collect()))
    assert rows1 == rows2


def test_index_roundtrip_preserves_search_results(spark, tmp_path):
    """save → load → search returns bit-identical results, and the
    encoded store is laid out one directory per cell (the probe's
    partition-pruning contract)."""
    import glob

    from dataworks_audit_data_ingest_spark.similarity.ivfpq import (
        load_ivfpq_index,
        save_ivfpq_index,
    )

    e, cents, books, enc = _index(spark)
    q = e.filter(F.col("vec_id") < 4)
    before = sorted(
        map(tuple, ivfpq_knn(q, enc, cents, books, k=5, m=M, ksub=KSUB, n_probe=2).collect())
    )
    path = str(tmp_path / "ivfpq")
    save_ivfpq_index(path, cents, books, enc)
    cents2, books2, enc2 = load_ivfpq_index(spark, path)
    after = sorted(
        map(tuple, ivfpq_knn(q, enc2, cents2, books2, k=5, m=M, ksub=KSUB, n_probe=2).collect())
    )
    assert after == before
    cell_dirs = glob.glob(f"{path}/encoded/cell=*")
    assert len(cell_dirs) == enc.select("cell").distinct().count()


def test_training_partition_invariant_exact(spark):
    """Lloyd training itself (not just encode/search) is bit-identical
    across input partitionings — the property q230's oracle pin relies
    on: decimal-exact sums, portable mean idiom, id tiebreaks."""
    e = table(spark, SF, "embeddings").select(
        "vec_id",
        F.expr("TRANSFORM(SLICE(embedding, 1, 8), x -> CAST(x AS DOUBLE))")
        .alias("embedding"),
    )
    c1, b1 = train_ivfpq(
        e, k_cells=4, m=2, ksub=4, n_iter_cells=2, n_iter_pq=1,
        cell_init="spread",
    )
    c2, b2 = train_ivfpq(
        e.repartition(11), k_cells=4, m=2, ksub=4, n_iter_cells=2,
        n_iter_pq=1, cell_init="spread",
    )
    cents1 = sorted((r.cell, tuple(r.cvec)) for r in c1.collect())
    cents2 = sorted((r.cell, tuple(r.cvec)) for r in c2.collect())
    assert cents1 == cents2
    books1 = sorted((r.sub, r.cell, tuple(r.cvec)) for r in b1.collect())
    books2 = sorted((r.sub, r.cell, tuple(r.cvec)) for r in b2.collect())
    assert books1 == books2


def test_filtered_ivfpq_parity_with_filtered_brute(spark):
    """candidate_filter inside the probe: every returned neighbor
    qualifies, full rank depth is kept, and with all cells probed plus
    full rerank the result equals exact brute force over the qualifying
    corpus (filter-then-rank parity at the PQ level)."""
    e = table(spark, SF, "embeddings")
    cents, books = train_ivfpq(
        e, k_cells=KCELLS, m=M, ksub=KSUB, n_iter_cells=1, n_iter_pq=1
    )
    enc = encode_ivfpq(e, cents, books, m=M)
    q = e.filter(F.col("vec_id") < 4)
    keep = e.filter("vec_id % 3 > 0").select("vec_id")
    n_corpus = e.count()
    out = ivfpq_knn(
        q, enc, cents, books, k=5, m=M, ksub=KSUB, n_probe=KCELLS,
        rerank=n_corpus, corpus=e, candidate_filter=keep,
    )
    rows = out.collect()
    assert all(r.neighbor_id % 3 > 0 for r in rows)
    assert out.groupBy("query_id").count().filter("count < 5").count() == 0
    exact = knn_join(q, e, k=5, filter_expr="vec_id % 3 > 0")
    assert sorted((r.query_id, r.neighbor_id, r.rnk) for r in rows) == sorted(
        (r.query_id, r.neighbor_id, r.rnk) for r in exact.collect()
    )


def test_q244_graded_audit_matches_hand_recomputation(spark):
    """q244's integer metrics equal an independent per-query
    recomputation from the two legs it grades (exact brute top-3 vs the
    trained q230 funnel) — MRR/NDCG arithmetic included."""
    from dataworks_audit_data_ingest_spark.queries.similarity import (
        _Q222_DISC,
        _Q222_IDCG,
        _T_D,
        _T_KNN,
        _T_NQ,
        q230_ivfpq_trained_funnel,
        q244_trained_funnel_graded_audit,
    )
    from dataworks_audit_data_ingest_spark.similarity.knn import knn_join

    sf = "/root/testdata/sf0.001"
    got = {
        r.query_id: (r.n_hits, r.mrr_milli, r.ndcg_milli)
        for r in q244_trained_funnel_graded_audit(spark, sf).collect()
    }
    e8 = table(spark, sf, "embeddings").select(
        "vec_id",
        F.expr(
            f"TRANSFORM(SLICE(embedding, 1, {_T_D}), x -> CAST(x AS DOUBLE))"
        ).alias("embedding"),
    )
    exact = {}
    for r in knn_join(
        e8.filter(F.col("vec_id") < _T_NQ), e8, k=_T_KNN
    ).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    ranked = {}
    for r in q230_ivfpq_trained_funnel(spark, sf).collect():
        ranked.setdefault(r.query_id, []).append((r.rnk, r.neighbor_id))
    assert set(got) == set(range(_T_NQ))
    for qid in range(_T_NQ):
        rel = [
            (rnk, nid in exact.get(qid, set()))
            for rnk, nid in sorted(ranked.get(qid, []))
        ]
        n_hits = sum(1 for _, h in rel if h)
        first = min((rnk for rnk, h in rel if h), default=None)
        mrr = 1000 // first if first else 0
        dcg = sum(_Q222_DISC[rnk - 1] for rnk, h in rel if h)
        ndcg = dcg * 1000 // _Q222_IDCG
        assert got[qid] == (n_hits, mrr, ndcg), qid
    # the audit is non-degenerate on the fixture: at least one query has
    # hits and at least one does not (both regimes exercised)
    assert any(v[0] > 0 for v in got.values())
    assert any(v[0] == 0 for v in got.values())
