"""DataFrame-native Lloyd's k-means: convergence, determinism, IVF wiring."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.similarity.kmeans import (
    assign_cells,
    inertia,
    train_cells,
)

SF = "/root/testdata/sf0.001"


def _synthetic_clusters(spark):
    """30 points in 3 well-separated 4-d clusters (deterministic)."""
    rows = []
    centers = {0: [0.0, 0.0, 0.0, 0.0], 1: [10.0, 10.0, 0.0, 0.0], 2: [0.0, 0.0, 10.0, 10.0]}
    for i in range(30):
        g = i % 3
        jitter = [((i * 7 + j * 3) % 5) / 10.0 for j in range(4)]
        rows.append((i, g, [c + e for c, e in zip(centers[g], jitter)]))
    return spark.createDataFrame(rows, "vec_id long, truth int, embedding array<double>")


def test_kmeans_recovers_separated_clusters(spark):
    pts = _synthetic_clusters(spark)
    assigned, centroids = train_cells(pts, k=3, n_iter=4)
    assert centroids.count() == 3
    joined = assigned.join(
        pts.select(F.col("vec_id").alias("id"), "truth"), "id"
    )
    # every learned cell maps to exactly one ground-truth cluster
    purity = joined.groupBy("cell").agg(
        F.countDistinct("truth").alias("n_truths"), F.count(F.lit(1)).alias("n")
    )
    assert all(r.n_truths == 1 for r in purity.collect())
    assert sum(r.n for r in purity.collect()) == 30


def test_kmeans_is_deterministic(spark):
    pts = _synthetic_clusters(spark)
    a1, _ = train_cells(pts, k=3, n_iter=3)
    a2, _ = train_cells(pts, k=3, n_iter=3)
    assert sorted(map(tuple, a1.select("id", "cell").collect())) == sorted(
        map(tuple, a2.select("id", "cell").collect())
    )


def test_kmeans_iterations_do_not_increase_inertia(spark):
    pts = _synthetic_clusters(spark)
    prev = None
    for n in (1, 2, 4):
        assigned, _ = train_cells(pts, k=3, n_iter=n)
        cur = inertia(assigned)
        if prev is not None:
            assert cur <= prev + 1e-9
        prev = cur


def test_trained_cells_drive_ivf_knn(spark):
    """End-to-end: train cells on the embeddings fixture, then run the IVF
    knn_join against the learned partitioning — same API as label cells."""
    from dataworks_audit_data_ingest_spark.similarity.knn import knn_join
    from dataworks_audit_data_ingest_spark.tables import table

    emb = table(spark, SF, "embeddings")
    assigned, _ = train_cells(emb, k=4, n_iter=2)
    corpus = emb.join(
        assigned.select(F.col("id").alias("vec_id"), "cell"), "vec_id"
    )
    queries = corpus.filter(F.col("vec_id") < 3)
    out = knn_join(
        queries, corpus, k=2, method="ivf", cell_col="cell", n_probe=1
    )
    rows = out.collect()
    assert {r.query_id for r in rows} == {0, 1, 2}
    assert all(r.rnk <= 2 for r in rows)


def test_numpy_backend_matches_jvm_assignment(spark):
    """The GEMM argmin and the JVM window argmin must agree exactly —
    same cells, same squared distances (recomputed exactly per point)."""
    from dataworks_audit_data_ingest_spark.similarity.kmeans import (
        _centroid_df,
        assign_cells,
    )

    pts = _synthetic_clusters(spark).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    cents = _centroid_df(
        spark, [[0.2, 0.2, 0.2, 0.2], [10.1, 10.1, 0.2, 0.2], [0.2, 0.2, 10.1, 10.1]]
    )
    jvm = {r.id: (r.cell, r.sq_dist) for r in assign_cells(pts, cents).collect()}
    npy = {
        r.id: (r.cell, r.sq_dist)
        for r in assign_cells(pts, cents, backend="numpy").collect()
    }
    assert jvm.keys() == npy.keys()
    for i in jvm:
        assert jvm[i][0] == npy[i][0]
        assert abs(jvm[i][1] - npy[i][1]) < 1e-9


def test_spread_init_numpy_backend_trains(spark):
    """The scale-path combination (one-job init + GEMM assignment) must
    train end to end, stay deterministic, and keep k cells alive."""
    pts = _synthetic_clusters(spark)
    a1, c1 = train_cells(pts, k=6, n_iter=3, init="spread", backend="numpy")
    a2, _ = train_cells(pts, k=6, n_iter=3, init="spread", backend="numpy")
    assert c1.count() == 6
    assert a1.count() == 30
    assert sorted(map(tuple, a1.select("id", "cell").collect())) == sorted(
        map(tuple, a2.select("id", "cell").collect())
    )


def test_numpy_backend_matches_jvm_at_ivf_scale(spark):
    """IVF-scale equivalence (round-2 verdict item): k = 256 cells over the
    2000-vector, 64-dim embeddings fixture. The GEMM argmin must pick the
    identical cell for every point and agree on the exact recomputed
    squared distance — the scale where the numpy kernel is the production
    path and the JVM window would materialize k*n = 512k rows."""
    from dataworks_audit_data_ingest_spark.similarity.kmeans import (
        _centroid_df,
        assign_cells,
    )
    from dataworks_audit_data_ingest_spark.tables import table

    emb = table(spark, "/root/testdata/sf0.1", "embeddings")
    pts = emb.select(
        F.col("vec_id").alias("id"),
        F.expr("TRANSFORM(embedding, x -> CAST(x AS DOUBLE))").alias("vec"),
    )
    assert pts.count() == 2000
    # 256 deterministic centroids: the first 256 vectors by id
    seeds = [
        list(r.vec) for r in pts.orderBy("id").limit(256).collect()
    ]
    assert len(seeds) == 256 and len(seeds[0]) == 64
    cents = _centroid_df(spark, seeds)

    jvm = {r.id: (r.cell, r.sq_dist) for r in assign_cells(pts, cents).collect()}
    npy = {
        r.id: (r.cell, r.sq_dist)
        for r in assign_cells(pts, cents, backend="numpy").collect()
    }
    assert jvm.keys() == npy.keys() and len(jvm) == 2000
    mismatched_cells = [i for i in jvm if jvm[i][0] != npy[i][0]]
    assert mismatched_cells == []
    for i in jvm:
        assert abs(jvm[i][1] - npy[i][1]) < 1e-9
