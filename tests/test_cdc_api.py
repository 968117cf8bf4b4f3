"""CDC chunking API (`text/cdc.py`): q93-equivalence, keyed (non-broadcast)
span→text join shape, shift resilience, and the incremental chunk store."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.tables import table
from dataworks_audit_data_ingest_spark.text.cdc import (
    cdc_dedup_stats,
    chunk_documents_cdc,
    incremental_cdc_batch,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return (
        table(spark, SF, "documents")
        .filter((F.col("doc_id") < 200) & (F.length("text") >= 8))
        .select("doc_id", "source", "text")
    )


def _random_text(n, seed):
    rng = random.Random(seed)
    return "".join(rng.choice("abcdefghijklmnopqrstuvwxyz ") for _ in range(n))


def test_api_matches_q93_oracle_aggregate(spark):
    """The API chunker must cut at exactly q93's boundaries: its per-source
    rollup equals the registered (oracle-verified) q93 output."""
    from dataworks_audit_data_ingest_spark.queries.dedup import (
        q93_cdc_chunk_dedup,
    )

    got = sorted(
        map(tuple, cdc_dedup_stats(_docs(spark), group_col="source").collect())
    )
    want = sorted(map(tuple, q93_cdc_chunk_dedup(spark, SF).collect()))
    assert got == want


def test_chunks_reassemble_to_document(spark):
    """Chunks partition each document exactly: contiguous, ordered,
    concatenating back to the original text."""
    d = _docs(spark).limit(20)
    chunks = chunk_documents_cdc(d, with_text=True)
    rebuilt = (
        chunks.groupBy("doc_id")
        .agg(
            F.concat_ws(
                "", F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk_text")))
                .getField("chunk_text")
            ).alias("rebuilt"),
            F.sum("chunk_len").alias("n"),
            F.max("end_pos").alias("last"),
        )
        .join(d, "doc_id")
    )
    bad = rebuilt.filter(
        (F.col("rebuilt") != F.col("text"))
        | (F.col("n") != F.length("text"))
        | (F.col("last") != F.length("text"))
    )
    assert bad.count() == 0


def test_span_text_join_is_keyed_not_broadcast(spark):
    """The production difference vs q93: with auto-broadcast disabled the
    span→text rejoin sort-merges on the id key — document text is never
    forced through a broadcast."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        chunks = chunk_documents_cdc(_docs(spark))
        plan = chunks._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Broadcast" not in plan, plan
        assert chunks.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_short_document_is_one_whole_chunk(spark):
    d = spark.createDataFrame([(1, "tiny")], "doc_id int, text string")
    rows = chunk_documents_cdc(d, with_text=True).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.start_pos, r.end_pos, r.chunk_len, r.chunk_text) == (1, 4, 4, "tiny")


def test_api_shift_resilience(spark):
    """The CDC property at API level: a 1-char early insertion re-aligns at
    most the chunks up to the next content-defined boundary."""
    text = _random_text(4000, seed=23)
    shifted = text[:10] + "X" + text[10:]
    d = spark.createDataFrame(
        [(1, text), (2, shifted)], "doc_id int, text string"
    )
    chunks = chunk_documents_cdc(d)
    h1 = {r.chunk_hash for r in chunks.filter("doc_id = 1").collect()}
    h2 = {r.chunk_hash for r in chunks.filter("doc_id = 2").collect()}
    assert len(h1) >= 20
    assert len(h1 & h2) >= len(h1) - 2, (len(h1), len(h2), len(h1 & h2))


def test_incremental_store_dedupes_across_batches_and_replays(spark, tmp_path):
    store = str(tmp_path / "chunkstore")
    d = _docs(spark)

    b1 = d.filter(F.col("doc_id") < 40)
    novel1, stats1 = incremental_cdc_batch(spark, store, b1, "b1")
    n1 = novel1.count()
    total1 = chunk_documents_cdc(b1).select("chunk_hash").distinct().count()
    assert n1 == total1  # first batch: every distinct chunk is novel

    # batch 2 repeats batch 1's docs plus fresh ones: repeats score 0 novel
    b2 = d.filter(F.col("doc_id") < 60)
    novel2, stats2 = incremental_cdc_batch(spark, store, b2, "b2")
    repeated = stats2.filter(F.col("doc_id") < 40)
    assert repeated.filter(F.col("n_novel") > 0).count() == 0
    fresh_novel = stats2.filter(
        (F.col("doc_id") >= 40) & (F.col("n_novel") > 0)
    )
    assert fresh_novel.count() > 0

    # replay of batch 2 is idempotent: same novel set, store unchanged
    novel2b, stats2b = incremental_cdc_batch(spark, store, b2, "b2")
    assert sorted(map(tuple, novel2b.collect())) == sorted(
        map(tuple, novel2.collect())
    )
    store_now = spark.read.parquet(store)
    assert store_now.count() == store_now.select("chunk_hash").distinct().count()


def test_incremental_corrupt_store_raises(spark, tmp_path):
    corrupt = tmp_path / "bad"
    corrupt.mkdir()
    (corrupt / "part-00000.parquet").write_bytes(b"not parquet")
    d = _docs(spark).limit(5)
    with pytest.raises(Exception, match="[Pp]arquet|PAR1|[Ff]ooter"):
        novel, stats = incremental_cdc_batch(spark, str(corrupt), d, "b1")
        novel.count()


def test_streaming_cdc_job_matches_driven_batches(spark, tmp_path):
    """The foreachBatch wrapper lands the same novel chunks + doc stats as
    driving incremental_cdc_batch directly, and a full stream restart with
    a fresh checkpoint (replaying every batch) leaves the output stable."""
    import json

    from dataworks_audit_data_ingest_spark.streaming.cdc_job import (
        start_cdc_stream,
    )

    docs = [
        (r.doc_id, r.text)
        for r in _docs(spark).filter(F.col("doc_id") < 30).collect()
    ]
    src = tmp_path / "in"
    src.mkdir()
    per = (len(docs) + 2) // 3
    for i in range(3):
        with open(src / f"{i}.json", "w") as f:
            for doc_id, text in docs[i * per : (i + 1) * per]:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")

    def run(ck):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .format("json")
            .load(str(src))
        )
        q = start_cdc_stream(
            stream,
            str(tmp_path / "out"),
            str(tmp_path / "store"),
            str(tmp_path / ck),
        )
        q.awaitTermination(120)

    run("ck1")
    out = spark.read.parquet(str(tmp_path / "out/doc_stats"))
    stats1 = sorted(
        map(tuple, out.select("doc_id", "n_chunks", "n_novel").collect())
    )
    assert len(stats1) == len(docs)
    # every doc's chunks were novel exactly once across the whole run
    chunks = spark.read.parquet(str(tmp_path / "out/chunks"))
    assert (
        chunks.count()
        == chunks.select("chunk_hash").distinct().count()
    )

    # lost checkpoint: the rerun replays every file; batch_id-keyed
    # dynamic overwrite keeps the store and outputs duplicate-free
    run("ck2")
    out2 = spark.read.parquet(str(tmp_path / "out/doc_stats"))
    # replay re-chunks but every chunk now exists in earlier batches'
    # store partitions EXCEPT its own batch partition (excluded on read)
    # -> doc rows unchanged in count, store still hash-unique
    assert out2.select("doc_id").distinct().count() == len(docs)
    store = spark.read.parquet(str(tmp_path / "store"))
    assert store.count() == store.select("chunk_hash").distinct().count()


def test_null_and_empty_text_short_circuit_to_zero_chunks(spark, tmp_path):
    """Empty-text docs must not emit a degenerate chunk (start_pos=1 >
    end_pos=0, md5('')) and null-text docs must not emit a null-hash
    chunk — a null chunk_hash never matches the store's left-anti join,
    so such docs would be re-marked novel and re-written every batch."""
    docs = spark.createDataFrame(
        [(1, "hello world, this is a real document body"), (2, ""), (3, None)],
        "doc_id bigint, text string",
    )
    chunks = chunk_documents_cdc(docs, "doc_id", "text")
    assert chunks.filter(F.col("doc_id").isin(2, 3)).count() == 0
    assert chunks.filter(F.col("doc_id") == 1).count() >= 1

    store = str(tmp_path / "store")
    novel1, _ = incremental_cdc_batch(spark, store, docs, "0")
    assert novel1.filter(F.col("doc_id").isin(2, 3)).count() == 0
    # replaying identical content: NOTHING is novel — in particular the
    # null-text doc no longer re-registers as novel on every batch
    novel2, stats2 = incremental_cdc_batch(spark, store, docs, "1")
    assert novel2.count() == 0
    assert stats2.filter(F.col("n_novel") > 0).count() == 0
    # ...but doc_stats still covers EVERY batch doc: the zero-chunk docs
    # appear with all-zero counts instead of vanishing
    zeros = stats2.filter(F.col("doc_id").isin(2, 3)).collect()
    assert sorted(r.doc_id for r in zeros) == [2, 3]
    assert all(
        (r.n_chunks, r.n_novel, r.novel_chars) == (0, 0, 0) for r in zeros
    )
    assert stats2.count() == 3


def test_cdc_boundaries_cross_engine_for_full_unicode_range(spark):
    """The win<=9 guard's premise, proven empirically: at win=9 the
    rolling-hash boundary set is IDENTICAL in Spark and DuckDB for text
    spanning the full codepoint range — CJK, combining accents, astral
    emoji, and the U+10FFFF ceiling. Both engines index substr/length by
    codepoint and ascii() returns the codepoint, so the BIGINT-bounded
    hash matches cut-for-cut; win>=10 would overflow exactly here."""
    import duckdb

    from dataworks_audit_data_ingest_spark.functions.hashing import (
        cdc_window_hash,
    )

    texts = [
        "hello world this is plain ascii text for control purposes ok",
        "这是一段中文测试文本用来验证跨引擎的哈希一致性边界切割行为是否完全相同",
        "mixé façade naïve über żółć ñandú こんにちは世界 테스트 текст",
        "emoji 😀😃😄😁 astral 𝕏𝕐𝕑 plane 🚀🚀🚀 chars 𠀀𠀁𠀂 end",
        "\U0010FFFF\U0010FFFE boundary codepoints \U000E0000 tail",
    ]
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    sdf.createOrReplaceTempView("cdc_uni_docs")
    expr = cdc_window_hash("text", "p", 9)
    spark_cuts = [
        (r.doc_id, r.p)
        for r in spark.sql(
            f"""SELECT doc_id, p FROM (
              SELECT doc_id, text, explode(sequence(1, length(text) - 8)) AS p
              FROM cdc_uni_docs
            ) WHERE ({expr}) % 16 = 0 ORDER BY doc_id, p"""
        ).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id INT, text VARCHAR)")
    for i, t in enumerate(texts):
        con.execute("INSERT INTO docs VALUES (?, ?)", [i, t])
    duck_cuts = [
        tuple(r)
        for r in con.execute(
            f"""SELECT doc_id, p FROM (
              SELECT doc_id, text, UNNEST(RANGE(1, LENGTH(text) - 7)) AS p
              FROM docs
            ) WHERE ({expr}) % 16 = 0 ORDER BY doc_id, p"""
        ).fetchall()
    ]
    assert spark_cuts == duck_cuts and len(spark_cuts) > 0
