"""KNN join API: brute-force equals the q55 oracle query; IVF with
label-cells equals q56."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.queries import all_queries
from dataworks_audit_data_ingest_spark.similarity import knn_join
from dataworks_audit_data_ingest_spark.tables import table

SF = "/root/testdata/sf0.001"


def test_knn_brute_matches_q55(spark):
    e = table(spark, SF, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    got = {
        (r.query_id, r.rnk): r.neighbor_id
        for r in knn_join(queries, e, k=5).collect()
    }
    want = {
        (r.query_id, r.rnk): r.neighbor_id
        for r in all_queries()["q55_ann_bruteforce_topk"].fn(spark, SF).collect()
    }
    assert got == want


def test_knn_ivf_matches_q56(spark):
    e = table(spark, SF, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    got = {
        (r.query_id, r.rnk): r.neighbor_id
        for r in knn_join(
            e.filter(F.col("vec_id") < 5),
            e,
            k=3,
            method="ivf",
            cell_col="label",
            n_probe=1,
        ).collect()
    }
    want = {
        (r.query_id, r.rnk): r.neighbor_id
        for r in all_queries()["q56_ann_ivf_topk"].fn(spark, SF).collect()
    }
    assert got == want


def test_knn_ivf_more_probes_improves_recall(spark):
    e = table(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in knn_join(q, e, k=3).collect()
    }
    r1 = {
        (r.query_id, r.neighbor_id)
        for r in knn_join(q, e, k=3, method="ivf", cell_col="label", n_probe=1).collect()
    }
    r5 = {
        (r.query_id, r.neighbor_id)
        for r in knn_join(q, e, k=3, method="ivf", cell_col="label", n_probe=5).collect()
    }
    assert len(r5 & exact) >= len(r1 & exact)
    assert len(r5 & exact) / len(exact) >= 0.5  # 5 of 10 cells probed


def test_knn_srp_matches_q89(spark):
    """knn_join(method='srp') with q89's default 4x4 banding must return
    exactly the q89 query's result (same hyperplanes, same banding, same
    exact-cosine rerank) — the API and the oracle-checked query are one
    implementation surface."""
    e = table(spark, SF, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    got = {
        (r.query_id, r.rnk): r.neighbor_id
        for r in knn_join(queries, e, k=3, method="srp").collect()
    }
    want = {
        (r.query_id, r.rnk): r.neighbor_id
        for r in all_queries()["q89_ann_srp_lsh"].fn(spark, SF).collect()
    }
    assert got == want


def test_knn_srp_candidates_are_cosine_exact(spark):
    """Every (query, neighbor) pair SRP returns carries the same cosine the
    brute-force scorer assigns to that pair — approximation lives only in
    candidate selection, never in scoring."""
    e = table(spark, SF, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    srp = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in knn_join(queries, e, k=3, method="srp").collect()
    }
    brute = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in knn_join(queries, e, k=len(e.collect())).collect()
    }
    assert srp  # non-empty retrieval on the fixture
    for pair, cos in srp.items():
        assert brute[pair] == cos
