"""PQ recall at REALISTIC embedding dimension (synthetic, deterministic).

The fixture embeddings are 8-dim — fine for correctness oracles, too
narrow to say anything about PQ behavior at production dimensionality
(256–1024). The fixtures are read-only, so this study GENERATES its
corpus: a seeded numpy clustered mixture (n vectors, dim 256, 32
centers, Gaussian noise — the structure IVF/PQ exploit), identical on
every run, and sweeps the PQ subspace count m at a fixed rerank depth,
reporting recall@10 vs exact brute force and wall clock.

    python tools/pq_dim_study.py [n] [dim] [n_queries]

Results are recorded in PERF.md ("Product quantization at 256-dim").
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.session import get_spark
from dataworks_audit_data_ingest_spark.similarity.knn import knn_join
from dataworks_audit_data_ingest_spark.similarity.pq import (
    encode_pq,
    pq_knn,
    train_pq,
)

KSUB, K, RERANK = 64, 10, 50
SEED, N_CLUSTERS = 20240815, 32


def synth(n: int, dim: int):
    rng = np.random.default_rng(SEED)
    centers = rng.normal(0, 1.0, size=(N_CLUSTERS, dim))
    labels = rng.integers(0, N_CLUSTERS, size=n)
    vecs = centers[labels] + rng.normal(0, 0.35, size=(n, dim))
    return [
        (int(i), int(labels[i]), [float(x) for x in vecs[i]])
        for i in range(n)
    ]


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    n_q = int(sys.argv[3]) if len(sys.argv) > 3 else 40

    spark = get_spark("pq-dim-study")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = spark.createDataFrame(
        synth(n, dim), "vec_id long, label long, embedding array<double>"
    ).repartition(16).localCheckpoint()
    queries = corpus.filter(F.col("vec_id") < n_q)
    print(f"synthetic corpus: n={n} dim={dim} clusters={N_CLUSTERS}"
          f" queries={n_q} ksub={KSUB} rerank={RERANK}")

    t0 = time.time()
    truth = {
        (r.query_id, r.neighbor_id)
        for r in knn_join(queries, corpus, K).collect()
    }
    print(f"exact brute: {time.time() - t0:.1f}s ({len(truth)} truth pairs)")

    print("| m (subspaces) | bytes/vec | train s | search s | recall@10 |")
    print("|---|---|---|---|---|")
    for m in (8, 16, 32):
        t0 = time.time()
        books = train_pq(corpus, m=m, ksub=KSUB).localCheckpoint()
        t_train = time.time() - t0
        codes = encode_pq(corpus, books, m=m).localCheckpoint()
        t0 = time.time()
        got = {
            (r.query_id, r.neighbor_id)
            for r in pq_knn(
                queries, codes, books, K,
                m=m, ksub=KSUB, rerank=RERANK, corpus=corpus,
            ).collect()
        }
        wall = time.time() - t0
        rec = len(got & truth) / len(truth)
        print(f"| {m} | {m} | {t_train:.1f} | {wall:.1f} | {rec:.3f} |")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
