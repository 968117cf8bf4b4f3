"""Streaming DSIR selection drill: fit-then-freeze model, reservoir over
micro-batches equals the batch selection over their union, replays are
no-ops, and the standing reservoir matches the batch API end-to-end."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.functions.sampling import (
    weighted_bottom_k,
)
from dataworks_audit_data_ingest_spark.streaming.curation_job import (
    stream_documents_json,
)
from dataworks_audit_data_ingest_spark.streaming.dsir_job import (
    start_dsir_selection_stream,
)
from dataworks_audit_data_ingest_spark.streaming.sample_job import (
    read_reservoir,
    update_reservoir,
)
from dataworks_audit_data_ingest_spark.tables import table
from dataworks_audit_data_ingest_spark.text.dsir import (
    fit_dsir_model,
    score_with_model,
    select_dsir,
)

SF = "/root/testdata/sf0.001"
K = 25


def _docs(spark):
    return table(spark, SF, "documents").select("doc_id", "text", "source")


def _spill_chunks(spark, src, n_chunks=3):
    rows = [r.asDict() for r in _docs(spark).collect()]
    for c in range(n_chunks):
        chunk = [r for i, r in enumerate(rows) if i % n_chunks == c]
        (src / f"c{c}.json").write_text(
            "\n".join(json.dumps(r) for r in chunk)
        )


def test_stream_reservoir_equals_batch_selection(spark, tmp_path):
    model = str(tmp_path / "model")
    reservoir = str(tmp_path / "reservoir")
    ckpt = str(tmp_path / "ckpt")
    src = tmp_path / "src"
    src.mkdir()

    docs = _docs(spark)
    fit_dsir_model(spark, docs, F.col("source") == "src0", model)
    _spill_chunks(spark, src)

    stream = stream_documents_json(
        spark,
        str(src),
        schema="doc_id bigint, text string, source string",
        max_files_per_trigger=1,
    )
    q = start_dsir_selection_stream(stream, model, reservoir, ckpt, k=K)
    q.awaitTermination(300)

    got = sorted(
        (r.doc_id, r.weight, r.priority)
        for r in read_reservoir(spark, reservoir).collect()
    )
    assert len(got) == K

    # equals the one-shot batch selection over the union, same model
    scored = score_with_model(spark, docs, model)
    want = sorted(
        (r.doc_id, r.weight, r.priority)
        for r in weighted_bottom_k(
            scored, K, "doc_id", "weight", seed="dsir"
        ).collect()
    )
    assert got == want

    # ...and, because the model was fit on this same corpus, the frozen
    # floor equals select_dsir's global shift: the standing reservoir IS
    # the batch API's selection
    api = sorted(
        (r.doc_id, r.weight, r.priority)
        for r in select_dsir(docs, F.col("source") == "src0", K).collect()
    )
    assert got == api

    # replaying a batch merges to an identical reservoir
    chunk0 = spark.read.json(
        str(src / "c0.json"),
        schema="doc_id bigint, text string, source string",
    )
    update_reservoir(
        spark,
        reservoir,
        score_with_model(spark, chunk0, model),
        K,
        "doc_id",
        "weight",
        seed="dsir",
    )
    again = sorted(
        (r.doc_id, r.weight, r.priority)
        for r in read_reservoir(spark, reservoir).collect()
    )
    assert again == got


def test_oov_words_score_at_count_zero_bits(spark, tmp_path):
    model = str(tmp_path / "model")
    docs = _docs(spark)
    fit_dsir_model(spark, docs, F.col("source") == "src0", model)
    unseen = spark.createDataFrame(
        [(1, "zzzqqq xxyyzz zzzqqq", "srcX")],
        "doc_id bigint, text string, source string",
    )
    meta = spark.read.parquet(f"{model}/meta").first()
    got = score_with_model(spark, unseen, model).first()
    assert got.n_tokens == 3
    assert got.ratio_bits == 3 * meta.oov_dbits
    assert got.weight >= 1
