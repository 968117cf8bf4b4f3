"""Streaming ANN index job: micro-batched vectors land cell-partitioned,
assignments match the batch path, the store is immediately IVF-queryable,
and partition pruning actually prunes."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.similarity.kmeans import (
    assign_cells,
    train_cells,
)
from dataworks_audit_data_ingest_spark.streaming.index_job import (
    start_index_stream,
    stream_embeddings_json,
)
from dataworks_audit_data_ingest_spark.tables import table

SF = "/root/testdata/sf0.001"


def _write_vec_files(src, rows, n_files=2):
    src.mkdir()
    per = (len(rows) + n_files - 1) // n_files
    for i in range(n_files):
        with open(src / f"{i}.json", "w") as f:
            for r in rows[i * per : (i + 1) * per]:
                f.write(
                    json.dumps(
                        {"vec_id": r.vec_id, "embedding": [float(x) for x in r.embedding]}
                    )
                    + "\n"
                )


def test_index_stream_matches_batch_assignment(spark, tmp_path):
    emb = table(spark, SF, "embeddings")
    _, centroids = train_cells(emb, k=4, n_iter=2)
    rows = emb.collect()
    _write_vec_files(tmp_path / "in", rows)

    stream = stream_embeddings_json(
        spark, str(tmp_path / "in"), max_files_per_trigger=1
    )
    q = start_index_stream(
        stream,
        centroids,
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)
    assert len(q.recentProgress) >= 2  # two micro-batches ran

    store = spark.read.parquet(str(tmp_path / "store"))
    assert store.count() == len(rows)  # every vector indexed exactly once
    # streamed assignment == batch assignment over the full corpus
    got = {r.vec_id: r.cell for r in store.select("vec_id", "cell").collect()}
    pts = emb.select(
        F.col("vec_id").alias("id"),
        F.expr("TRANSFORM(embedding, x -> CAST(x AS DOUBLE))").alias("vec"),
    )
    want = {r.id: r.cell for r in assign_cells(pts, centroids).collect()}
    assert got == want
    # quantized columns landed alongside
    for col in ("q_levels", "q_min", "q_scale"):
        assert col in store.columns

    # cell filter prunes to that cell's files only
    one_cell = next(iter(set(got.values())))
    pruned = spark.read.parquet(str(tmp_path / "store")).filter(
        F.col("cell") == one_cell
    )
    files = pruned.select(F.input_file_name()).distinct().collect()
    assert all(f"cell={one_cell}/" in r[0] for r in files)


def test_replayed_microbatch_is_idempotent(spark, tmp_path):
    """A replayed micro-batch (failure after the store write, before the
    checkpoint commit) must leave the store byte-identical in content:
    deterministic assignment + (cell, batch_id) dynamic overwrite."""
    from dataworks_audit_data_ingest_spark.streaming.index_job import (
        index_microbatch,
    )

    emb = table(spark, SF, "embeddings")
    _, centroids = train_cells(emb, k=4, n_iter=2)
    half = emb.filter(F.col("vec_id") % 2 == 0)
    out = str(tmp_path / "store")

    index_microbatch(half, 0, centroids, out)
    first = sorted(
        (r.vec_id, r.cell, tuple(r.q_levels))
        for r in spark.read.parquet(out).collect()
    )
    index_microbatch(half, 0, centroids, out)  # replay of the same batch
    again = sorted(
        (r.vec_id, r.cell, tuple(r.q_levels))
        for r in spark.read.parquet(out).collect()
    )
    assert again == first  # no duplicates, no loss

    # a DIFFERENT batch appends without touching batch 0's partitions
    other = emb.filter(F.col("vec_id") % 2 == 1)
    index_microbatch(other, 1, centroids, out)
    total = spark.read.parquet(out).count()
    assert total == emb.count()
