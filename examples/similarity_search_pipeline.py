"""End-to-end similarity-search pipeline demo + recall measurement.

  1. load the embeddings fixture,
  2. PCA-reduce 64 -> 16 dims (decorrelate before indexing),
  3. train IVF cells with DataFrame-native k-means,
  4. run brute-force and IVF top-k on the same queries,
  5. report recall@k of IVF vs the exact brute-force answer and timings.

Run:  python examples/similarity_search_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from dataworks_audit_data_ingest_spark.session import get_spark  # noqa: E402
from dataworks_audit_data_ingest_spark.similarity.kmeans import train_cells  # noqa: E402
from dataworks_audit_data_ingest_spark.similarity.knn import knn_join  # noqa: E402
from dataworks_audit_data_ingest_spark.similarity.pca import (  # noqa: E402
    fit_pca,
    transform_pca,
)
from dataworks_audit_data_ingest_spark.tables import table  # noqa: E402

K = 5
N_QUERIES = 20
N_CELLS = 8


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("similarity-demo")
    spark.sparkContext.setLogLevel("ERROR")

    emb = table(spark, sf_dir, "embeddings").cache()
    n = emb.count()
    print(f"[1/5] corpus: {n} vectors x {len(emb.select('embedding').first()[0])} dims")

    t0 = time.time()
    mean, comps, var = fit_pca(emb, n_components=16)
    total_var = sum(var)
    reduced = transform_pca(emb, mean, comps).select(
        "vec_id", "label", F.col("pca").alias("embedding")
    ).cache()
    reduced.count()
    print(
        f"[2/5] PCA 64->16 in {time.time() - t0:.1f}s "
        f"(top-16 explained variance: {total_var:.3f})"
    )

    t0 = time.time()
    assigned, _ = train_cells(reduced, k=N_CELLS, n_iter=3)
    corpus = reduced.join(
        assigned.select(F.col("id").alias("vec_id"), "cell"), "vec_id"
    ).cache()
    corpus.count()
    print(f"[3/5] trained {N_CELLS} IVF cells in {time.time() - t0:.1f}s")

    queries = corpus.filter(F.col("vec_id") < N_QUERIES)

    t0 = time.time()
    brute = knn_join(queries, corpus, k=K, method="brute")
    exact = {
        (r.query_id, r.neighbor_id) for r in brute.collect()
    }
    t_brute = time.time() - t0

    print(f"[4/5] brute top-{K}: {len(exact)} pairs in {t_brute:.1f}s")
    for n_probe in (1, 2, 4, 8):
        t0 = time.time()
        ivf = knn_join(
            queries, corpus, k=K, method="ivf", cell_col="cell", n_probe=n_probe
        )
        approx = {(r.query_id, r.neighbor_id) for r in ivf.collect()}
        recall = len(exact & approx) / len(exact)
        print(
            f"[5/5] IVF n_probe={n_probe}/{N_CELLS}: recall@{K} = {recall:.2f} "
            f"in {time.time() - t0:.1f}s"
        )


if __name__ == "__main__":
    main()
