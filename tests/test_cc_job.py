"""Streaming cluster maintenance drill (`streaming/cc_job.py`): the
standing CC label store after the stream drains equals batch CC over
every duplicate pair the incremental dedup surfaced, and a checkpointed
restart replays to identical state."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.functions.graph import (
    connected_components,
)
from dataworks_audit_data_ingest_spark.incremental.cc import read_cc_labels
from dataworks_audit_data_ingest_spark.streaming.cc_job import (
    start_cluster_maintenance_stream,
)
from dataworks_audit_data_ingest_spark.streaming.curation_job import (
    stream_documents_json,
)
from dataworks_audit_data_ingest_spark.tables import table
from dataworks_audit_data_ingest_spark.text.incremental_dedup import (
    incremental_dedup_batch,
)

SF = "/root/testdata/sf0.001"


def _spill_chunks(spark, src, n_chunks=3):
    rows = [
        r.asDict()
        for r in table(spark, SF, "documents")
        .select("doc_id", "text", "source")
        .collect()
    ]
    for c in range(n_chunks):
        chunk = [r for i, r in enumerate(rows) if i % n_chunks == c]
        (src / f"c{c}.json").write_text(
            "\n".join(json.dumps(r) for r in chunk)
        )


def _labels(df):
    return sorted((r.node_id, r.cluster_id) for r in df.collect())


def test_stream_labels_equal_batch_cc_and_restart_is_noop(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _spill_chunks(spark, src)
    sig_store = str(tmp_path / "sig_store")
    cc_store = str(tmp_path / "cc_store")
    ckpt = str(tmp_path / "ckpt")

    stream = stream_documents_json(
        spark, str(src), "doc_id long, text string, source string",
        max_files_per_trigger=1,
    )
    q = start_cluster_maintenance_stream(
        stream, sig_store, cc_store, ckpt
    )
    q.awaitTermination()

    got = _labels(read_cc_labels(spark, cc_store))
    assert got

    # the reference answer: replay the same slicing through the batch API
    # into fresh stores, union the pairs, run the batch kernel
    docs = table(spark, SF, "documents").select("doc_id", "text", "source")
    sig2 = str(tmp_path / "sig2")
    union = None
    for b in range(3):
        batch = docs.join(
            spark.read.json(str(src / f"c{b}.json")).select("doc_id"),
            "doc_id",
            "left_semi",
        )
        _, pairs = incremental_dedup_batch(spark, sig2, batch, str(b))
        pairs = pairs.localCheckpoint(eager=True)
        union = pairs if union is None else union.unionByName(pairs)
    want = _labels(
        connected_components(union).select("node_id", "cluster_id")
    )
    assert got == want

    # restart from the same checkpoint: no new files -> no state change
    q2 = start_cluster_maintenance_stream(
        stream_documents_json(
            spark, str(src), "doc_id long, text string, source string",
            max_files_per_trigger=1,
        ),
        sig_store,
        cc_store,
        ckpt,
    )
    q2.awaitTermination()
    assert _labels(read_cc_labels(spark, cc_store)) == got
