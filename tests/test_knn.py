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
