"""Streaming passage novelty drill: re-crawled micro-batches emit only
changed windows; stream output equals the driven batch rung."""

from __future__ import annotations

import json

from dataworks_audit_data_ingest_spark.streaming.curation_job import (
    stream_documents_json,
)
from dataworks_audit_data_ingest_spark.streaming.passage_job import (
    start_passage_stream,
)

W, S = 16, 12


def _write(src, name, rows):
    (src / name).write_text("\n".join(json.dumps(r) for r in rows))


def _drive(spark, src, out, store, ckpt):
    stream = stream_documents_json(
        spark,
        str(src),
        schema="doc_id bigint, text string",
        max_files_per_trigger=1,
    )
    q = start_passage_stream(
        stream, out, store, ckpt, window=W, stride=S
    )
    q.awaitTermination(300)


def test_stream_emits_only_changed_windows(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "novel")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    words = [f"w{i}" for i in range(60)]
    _write(src, "f0.json", [{"doc_id": 1, "text": " ".join(words)}])
    _drive(spark, src, out, store, ckpt)
    first = spark.read.parquet(out)
    n_first = first.count()
    assert n_first == 5  # 60 words, W=16 S=12 -> starts 1,13,25,37,49

    # re-crawl with one edited word: exactly one window re-emits
    edited = list(words)
    edited[30] = "EDIT"
    _write(src, "f1.json", [{"doc_id": 1, "text": " ".join(edited)}])
    _drive(spark, src, out, store, ckpt)
    batch1 = spark.read.parquet(out).filter(
        "CAST(batch_id AS STRING) = '1'"
    )
    assert [r.passage_idx for r in batch1.collect()] == [2]

    # unchanged re-crawl: zero new work for the embedding stage
    _write(src, "f2.json", [{"doc_id": 1, "text": " ".join(edited)}])
    _drive(spark, src, out, store, ckpt)
    assert (
        spark.read.parquet(out)
        .filter("CAST(batch_id AS STRING) = '2'")
        .count()
        == 0
    )
