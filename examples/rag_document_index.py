"""RAG-style document index: chunk -> embed -> reduce -> IVF index -> query.

The end-to-end retrieval story a training/inference data platform needs,
composed entirely from the engine's own operators:

  1. chunk the ``documents`` corpus into ~40-token passages
     (the q86 chunking shape: per-row TRANSFORM explode, no shuffle),
  2. embed each chunk with a deterministic JVM hash encoder
     (STUB for a real model: one MD5 per chunk fanned to 64 dims via the
     universal-hash family — no ML model ships in this container; swap
     ``hash_embed`` with an Arrow-batched Pandas-UDF encoder in
     production, the plumbing is identical),
  3. PCA 64 -> 16 dims (one distributed scatter pass + driver eigh),
  4. train IVF cells with DataFrame-native k-means (numpy GEMM backend —
     the flat-in-k assignment kernel, see PERF.md crossover table),
  5. retrieve top-k chunks for text queries via cell-routed IVF and
     compare against exact brute-force (recall@k).

A query built from the exact text of a known chunk must retrieve that
chunk at rank 1 with cosine ~1.0 (identical text -> identical embedding)
— the pipeline's built-in ground truth.

Run:  python examples/rag_document_index.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import DataFrame, functions as F

sys.path.insert(0, ".")

from dataworks_audit_data_ingest_spark.functions.hashing import (  # noqa: E402
    spark_hash32,
    universal_hash,
)
from dataworks_audit_data_ingest_spark.session import get_spark  # noqa: E402
from dataworks_audit_data_ingest_spark.similarity.kmeans import (  # noqa: E402
    train_cells,
)
from dataworks_audit_data_ingest_spark.similarity.knn import knn_join  # noqa: E402
from dataworks_audit_data_ingest_spark.similarity.pca import (  # noqa: E402
    fit_pca,
    transform_pca,
)
from dataworks_audit_data_ingest_spark.tables import table  # noqa: E402

CHUNK_TOKENS = 40
EMBED_DIMS = 64
PCA_DIMS = 16
N_CELLS = 8
K = 3
QUERY_OFFSET = 1_000_000_000  # query ids live in their own namespace


def chunk_documents(docs: DataFrame, chunk_tokens: int = CHUNK_TOKENS) -> DataFrame:
    """(chunk_id, doc_id, chunk_idx, chunk) — fixed-token-window chunking,
    a per-row explode with no shuffle (the q86 shape)."""
    n = chunk_tokens
    return docs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"TRANSFORM(SEQUENCE(1, CAST(CEIL(SIZE(SPLIT(text, ' ')) / {n}.0) AS INT)), "
                f"i -> ARRAY_JOIN(SLICE(SPLIT(text, ' '), (i - 1) * {n} + 1, {n}), ' '))"
            )
        ).alias("chunk_idx", "chunk"),
    ).select(
        (F.col("doc_id") * 10_000 + F.col("chunk_idx")).alias("chunk_id"),
        "doc_id",
        "chunk_idx",
        "chunk",
    )


def hash_embed(
    chunks: DataFrame, text_col: str = "chunk", dims: int = EMBED_DIMS
) -> DataFrame:
    """Deterministic 64-dim pseudo-embedding, pure JVM: one MD5 of the text
    fanned out through the universal-hash family, scaled to [-1, 1).

    STUB for a real encoder — identical text always embeds identically
    (what the retrieval ground-truth check relies on), and the Spark-side
    shape (one vector column, map-only, no shuffle) matches what a
    Pandas-UDF model encoder produces.
    """
    h = spark_hash32(text_col, "ragembed")
    comps = ", ".join(
        f"(CAST({universal_hash('h', j)} % 2000 AS DOUBLE) / 1000.0 - 1.0)"
        for j in range(dims)
    )
    return chunks.withColumn("h", F.expr(h)).withColumn(
        "embedding", F.expr(f"ARRAY({comps})")
    ).drop("h")


def build_index(spark, sf_dir: str):
    """Chunk + embed + PCA + IVF-train the documents corpus; returns
    (indexed corpus DataFrame, pca params)."""
    docs = table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs)
    embedded = hash_embed(chunks).cache()

    mean, comps, var = fit_pca(embedded, n_components=PCA_DIMS)
    reduced = transform_pca(embedded, mean, comps, vec_col="embedding").select(
        F.col("chunk_id").alias("vec_id"),
        "doc_id",
        "chunk_idx",
        "chunk",
        F.col("pca").alias("embedding"),
    )

    assigned, _ = train_cells(
        reduced, k=N_CELLS, n_iter=3, init="spread", backend="numpy"
    )
    corpus = reduced.join(
        assigned.select(F.col("id").alias("vec_id"), "cell"), "vec_id"
    ).cache()
    corpus.count()
    return corpus, (mean, comps, var)


def embed_queries(spark, pca_params, query_texts) -> DataFrame:
    """Embed free-text queries through the same encoder + PCA projection."""
    mean, comps, _ = pca_params
    qdf = spark.createDataFrame(
        [(QUERY_OFFSET + i, t) for i, t in enumerate(query_texts)],
        "chunk_id long, chunk string",
    )
    qemb = hash_embed(qdf)
    return transform_pca(qemb, mean, comps, vec_col="embedding").select(
        F.col("chunk_id").alias("vec_id"), F.col("pca").alias("embedding")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("rag-demo")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    corpus, pca_params = build_index(spark, sf_dir)
    n_chunks = corpus.count()
    print(f"[1/3] indexed {n_chunks} chunks in {time.time() - t0:.1f}s "
          f"({EMBED_DIMS}->{PCA_DIMS} dims, {N_CELLS} IVF cells)")

    # queries: the exact text of 5 known chunks (self-retrieval ground
    # truth) — in a real deployment these are user questions
    probe_rows = (
        corpus.filter(F.col("chunk_idx") == 1).orderBy("vec_id").limit(5).collect()
    )
    queries = embed_queries(spark, pca_params, [r.chunk for r in probe_rows])

    t0 = time.time()
    brute = knn_join(queries, corpus, k=K, method="brute").cache()
    t_brute = time.time() - t0
    t0 = time.time()
    ivf = knn_join(
        queries, corpus, k=K, method="ivf", cell_col="cell", n_probe=2
    ).cache()
    t_ivf = time.time() - t0

    hits = 0
    top1 = {
        r.query_id: (r.neighbor_id, r.cosine)
        for r in ivf.filter(F.col("rnk") == 1).collect()
    }
    # dedup corpora contain textually identical chunks that tie at cosine
    # 1.0 — any of them at rank 1 is a correct retrieval, so compare TEXT
    chunk_text = {
        r.vec_id: r.chunk
        for r in corpus.select("vec_id", "chunk").collect()
    }
    for i, probe in enumerate(probe_rows):
        got, cos = top1.get(QUERY_OFFSET + i, (None, 0.0))
        ok = got is not None and chunk_text.get(got) == probe.chunk and cos > 0.999999
        hits += ok
        print(f"  query {i}: expect chunk {probe.vec_id}, got {got} "
              f"(cosine {cos:.6f}) {'OK' if ok else 'MISS'}")
    print(f"[2/3] self-retrieval: {hits}/{len(probe_rows)} at rank 1")

    bset = {(r.query_id, r.neighbor_id) for r in brute.collect()}
    iset = {(r.query_id, r.neighbor_id) for r in ivf.collect()}
    recall = len(bset & iset) / len(bset) if bset else 1.0
    print(f"[3/3] IVF recall@{K} vs brute: {recall:.2f} "
          f"(brute {t_brute:.1f}s, ivf {t_ivf:.1f}s, n_probe=2/{N_CELLS})")
    spark.stop()


if __name__ == "__main__":
    main()
