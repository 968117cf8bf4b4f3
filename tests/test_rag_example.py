"""The RAG document-index example (examples/rag_document_index.py) as a
test: chunk -> hash-embed -> PCA -> IVF -> retrieve, with self-retrieval as
the built-in ground truth (identical text => identical embedding => cosine 1
at rank 1)."""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from examples.rag_document_index import (  # noqa: E402
    QUERY_OFFSET,
    build_index,
    chunk_documents,
    embed_queries,
    hash_embed,
)
from dataworks_audit_data_ingest_spark.similarity.knn import knn_join  # noqa: E402
from dataworks_audit_data_ingest_spark.tables import table  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def test_chunking_covers_every_token(spark):
    """Chunks of a doc, re-joined in order, reconstruct the original text
    (fixed-window chunking loses nothing and is map-only)."""
    docs = table(spark, SF_DIR, "documents").limit(20)
    chunks = chunk_documents(docs)
    rebuilt = (
        chunks.groupBy("doc_id")
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_list(F.struct("chunk_idx", "chunk"))
                ).chunk,
                " ",
            ).alias("text2")
        )
    )
    joined = docs.join(rebuilt, "doc_id")
    assert joined.filter(F.col("text") != F.col("text2")).count() == 0
    assert joined.count() == 20


def test_hash_embed_deterministic_and_shaped(spark):
    docs = table(spark, SF_DIR, "documents").limit(5)
    chunks = chunk_documents(docs)
    e1 = hash_embed(chunks)
    row = e1.first()
    assert len(row.embedding) == 64
    assert all(-1.0 <= x < 1.0 for x in row.embedding)
    # identical text -> identical embedding (what self-retrieval relies on)
    e2 = hash_embed(chunks)
    assert e1.select("chunk_id", "embedding").exceptAll(
        e2.select("chunk_id", "embedding")
    ).count() == 0


def test_self_retrieval_rank1(spark):
    """A query built from a known chunk's exact text must come back at
    rank 1 with cosine ~1 through the full chunk->embed->PCA->IVF path."""
    corpus, pca_params = build_index(spark, SF_DIR)
    probes = (
        corpus.filter(F.col("chunk_idx") == 1).orderBy("vec_id").limit(3).collect()
    )
    assert len(probes) == 3
    queries = embed_queries(spark, pca_params, [r.chunk for r in probes])
    ivf = knn_join(queries, corpus, k=3, method="ivf", cell_col="cell", n_probe=2)
    top1 = {
        r.query_id: (r.neighbor_id, r.cosine)
        for r in ivf.filter(F.col("rnk") == 1).collect()
    }
    chunk_text = {
        r.vec_id: r.chunk for r in corpus.select("vec_id", "chunk").collect()
    }
    for i, probe in enumerate(probes):
        got, cos = top1[QUERY_OFFSET + i]
        # identical-text chunks tie at cosine 1.0; any of them is a hit
        assert chunk_text[got] == probe.chunk
        assert cos > 0.999999
    corpus.unpersist()
