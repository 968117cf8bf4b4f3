"""Int8 scalar quantization: reconstruction error bound, degenerate
vectors, determinism, and quantized-KNN recall vs exact cosine."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.similarity.quantize import (
    dequantize,
    quantize_int8,
    quantized_knn,
)
from dataworks_audit_data_ingest_spark.similarity import knn_join
from dataworks_audit_data_ingest_spark.tables import table

SF = "/root/testdata/sf0.001"


def test_roundtrip_error_bounded_by_half_scale(spark):
    e = table(spark, SF, "embeddings")
    deq = dequantize(quantize_int8(e))
    bad = deq.select(
        F.expr(
            "AGGREGATE(ZIP_WITH(embedding, deq_embedding, "
            "(a, b) -> ABS(CAST(a AS DOUBLE) - b)), CAST(0 AS DOUBLE), "
            "(acc, v) -> GREATEST(acc, v))"
        ).alias("max_err"),
        (F.col("q_scale") / 2 * 1.0000001).alias("bound"),
    ).filter(F.col("max_err") > F.col("bound"))
    assert bad.count() == 0


def test_levels_stay_in_int8_range(spark):
    e = table(spark, SF, "embeddings")
    q = quantize_int8(e)
    out = q.select(
        F.expr("ARRAY_MIN(q_levels)").alias("lo"),
        F.expr("ARRAY_MAX(q_levels)").alias("hi"),
    ).agg(F.min("lo").alias("lo"), F.max("hi").alias("hi")).collect()[0]
    assert out.lo >= 0 and out.hi <= 255


def test_degenerate_constant_vector_reconstructs_exactly(spark):
    df = spark.createDataFrame(
        [(1, [0.5, 0.5, 0.5]), (2, [0.0, 0.0, 0.0])], ["vec_id", "embedding"]
    )
    rows = {r.vec_id: r for r in dequantize(quantize_int8(df)).collect()}
    assert rows[1].q_scale == 0.0 and rows[1].deq_embedding == [0.5, 0.5, 0.5]
    assert rows[2].deq_embedding == [0.0, 0.0, 0.0]


def test_quantized_knn_close_to_exact_and_rerank_exact(spark):
    e = table(spark, SF, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.rnk): (r.neighbor_id, r.cosine)
        for r in knn_join(queries, e, k=3).collect()
    }
    quant = quantized_knn(queries, e, k=3)
    qrows = quant.collect()
    assert len(qrows) == len(exact)
    # quantized cosine of the exact winners is within quantization error
    exact_pairs = {(q, n): c for (q, _), (n, c) in exact.items()}
    for r in qrows:
        if (r.query_id, r.neighbor_id) in exact_pairs:
            assert math.isclose(
                r.cosine,
                exact_pairs[(r.query_id, r.neighbor_id)],
                abs_tol=0.05,
            )
    # with a rerank cushion the final ranking is the exact ranking
    rer = {
        (r.query_id, r.rnk): (r.neighbor_id, r.cosine)
        for r in quantized_knn(queries, e, k=3, rerank=25).collect()
    }
    exact_n = {key: n for key, (n, _) in exact.items()}
    rer_n = {key: n for key, (n, _) in rer.items()}
    agree = sum(1 for key in exact_n if rer_n.get(key) == exact_n[key])
    assert agree >= len(exact_n) - 2  # near-total agreement on the fixture
    for key, (n, c) in rer.items():
        if exact_n[key] == n:
            assert c == exact[key][1]  # reranked scores are EXACT cosines


def test_quantize_is_deterministic_under_partitioning(spark):
    e = table(spark, SF, "embeddings")
    a = {
        r.vec_id: (r.q_min, r.q_scale, tuple(r.q_levels))
        for r in quantize_int8(e).collect()
    }
    b = {
        r.vec_id: (r.q_min, r.q_scale, tuple(r.q_levels))
        for r in quantize_int8(e.repartition(7)).collect()
    }
    assert a == b
