"""IVF nprobe recall sweep over the FULL sf0.1 embeddings corpus.

The coarse-quantizer tuning question the PQ study doesn't answer: how
many cells must the router probe before recall@k saturates, and what
fraction of the corpus does each probe level actually scan? This script
trains one IVF-PQ index (k_cells=32, PQ at the pq_study's proven
m=16/ksub=128 setting) over all corpus vectors, then sweeps n_probe and
reports, per level: the ROUTING CEILING (fraction of true top-10
neighbors that live in a probed cell — no funnel can beat this), the
achieved end-to-end recall@10 through ADC+rerank, the scanned-candidate
fraction, and wall clock. Ceiling vs achieved separates the two tuning
axes: a gap means the PQ funnel, a low ceiling means the router.

    python tools/ivf_study.py [sf_dir] [n_queries]

Results are recorded in PERF.md (ANN section).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.session import get_spark
from dataworks_audit_data_ingest_spark.similarity.ivfpq import (
    encode_ivfpq,
    ivfpq_knn,
    train_ivfpq,
)
from dataworks_audit_data_ingest_spark.similarity.knn import knn_join
from dataworks_audit_data_ingest_spark.tables import table

K_CELLS, M, KSUB, K, RERANK = 32, 16, 128, 10, 100


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    spark = get_spark("ivf-study")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = table(spark, sf, "embeddings").localCheckpoint()
    n = corpus.count()
    queries = corpus.filter(F.col("vec_id") < n_q)
    print(f"corpus={n} queries={n_q} cells={K_CELLS} m={M} ksub={KSUB} k={K}")

    truth = {
        (r.query_id, r.neighbor_id)
        for r in knn_join(queries, corpus, K).collect()
    }

    t0 = time.time()
    centroids, codebooks = train_ivfpq(
        corpus, k_cells=K_CELLS, m=M, ksub=KSUB
    )
    encoded = encode_ivfpq(corpus, centroids, codebooks, m=M).localCheckpoint()
    cell_sizes = {
        r.cell: r.c
        for r in encoded.groupBy("cell").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    vec_cell = {r.vec_id: r.cell for r in encoded.select("vec_id", "cell").collect()}
    # query -> cells ranked by centroid cosine (float64 numpy
    # re-derivation of ivfpq_knn's decimal routing — a measurement; on
    # near-tied centroid cosines the two can rank cells differently, so
    # treat ceiling ~= recall as equality, not a strict bound)
    import numpy as np

    cent = {r.cell: np.array(r.cvec) for r in centroids.collect()}
    cells_sorted = sorted(cent)
    C = np.stack([cent[c] for c in cells_sorted])
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    qvecs = {
        r.vec_id: np.array(r.embedding, dtype=float) for r in queries.collect()
    }
    probe_order = {}
    for qid, v in qvecs.items():
        cos = Cn @ (v / np.linalg.norm(v))
        probe_order[qid] = [cells_sorted[i] for i in np.argsort(-cos)]
    print(f"train+encode: {time.time() - t0:.1f}s, "
          f"cell sizes min/max: {min(cell_sizes.values())}/{max(cell_sizes.values())}")

    print("| n_probe | routing ceiling | recall@10 | scanned frac | wall s |")
    print("|---|---|---|---|---|")
    for n_probe in (1, 2, 4, 8):
        t0 = time.time()
        got = ivfpq_knn(
            queries,
            encoded,
            centroids,
            codebooks,
            K,
            m=M,
            ksub=KSUB,
            n_probe=n_probe,
            rerank=RERANK,
            corpus=corpus,
        ).collect()
        wall = time.time() - t0
        hits = sum((r.query_id, r.neighbor_id) in truth for r in got)
        recall = hits / len(truth)
        ceiling = sum(
            vec_cell[nid] in probe_order[qid][:n_probe] for qid, nid in truth
        ) / len(truth)
        # scanned fraction: the n_probe globally largest cells over the
        # corpus — a worst-case bound on candidates ADC-scored per query
        sorted_cells = sorted(cell_sizes.values(), reverse=True)
        worst = sum(sorted_cells[:n_probe]) / n
        print(f"| {n_probe} | {ceiling:.3f} | {recall:.3f} | <= {worst:.3f} | {wall:.1f} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
