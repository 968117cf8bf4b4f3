"""PQ rerank-depth recall sweep over the FULL sf0.1 embeddings corpus.

The production tuning question for the route→ADC→rerank funnel is the
rerank depth: how many ADC candidates must the exact second stage
re-score before recall@k saturates? This script trains one PQ codebook
(m=16, ksub=128) over all corpus vectors, then sweeps rerank depth and
reports recall@10 vs exact brute force, plus wall clock.

    python tools/pq_study.py [sf_dir] [n_queries]

Results are recorded in PERF.md ("Product quantization" section).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.session import get_spark
from dataworks_audit_data_ingest_spark.similarity.knn import knn_join
from dataworks_audit_data_ingest_spark.similarity.pq import (
    encode_pq,
    pq_knn,
    train_pq,
)
from dataworks_audit_data_ingest_spark.tables import table

M, KSUB, K = 16, 128, 10


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    spark = get_spark("pq-study")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = table(spark, sf, "embeddings").localCheckpoint()
    n = corpus.count()
    queries = corpus.filter(F.col("vec_id") < n_q)
    print(f"corpus={n} queries={n_q} m={M} ksub={KSUB} k={K}")

    t0 = time.time()
    truth = {
        (r.query_id, r.neighbor_id)
        for r in knn_join(queries, corpus, K).collect()
    }
    t_brute = time.time() - t0
    print(f"exact brute: {t_brute:.2f}s ({len(truth)} truth pairs)")

    t0 = time.time()
    books = train_pq(corpus, m=M, ksub=KSUB).localCheckpoint()
    t_train = time.time() - t0
    t0 = time.time()
    codes = encode_pq(corpus, books, m=M).localCheckpoint()
    t_enc = time.time() - t0
    print(f"train={t_train:.1f}s encode={t_enc:.1f}s")

    print("| rerank depth | wall s | recall@10 |")
    print("|---|---|---|")
    for depth in (0, 25, 50, 100, 200):
        t0 = time.time()
        got = {
            (r.query_id, r.neighbor_id)
            for r in pq_knn(
                queries,
                codes,
                books,
                K,
                m=M,
                ksub=KSUB,
                rerank=depth,
                corpus=corpus if depth else None,
            ).collect()
        }
        wall = time.time() - t0
        rec = len(got & truth) / len(truth)
        label = str(depth) if depth else "0 (ADC only)"
        print(f"| {label} | {wall:.2f} | {rec:.3f} |")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
