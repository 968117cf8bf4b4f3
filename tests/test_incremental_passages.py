"""Incremental passage store drill: an edited page re-embeds only the
windows its edit touched; replays are no-ops; unchanged re-crawls emit
nothing."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.text.incremental_passages import (
    incremental_passage_batch,
)

W, S = 16, 12  # small windows so one edit touches a known span


def _doc(doc_id, words):
    return (doc_id, " ".join(words))


def test_edit_reembeds_only_touched_windows(spark, tmp_path):
    store = str(tmp_path / "passages")
    words = [f"w{i}" for i in range(60)]  # passages at 1, 13, 25, 37, 49
    d0 = spark.createDataFrame(
        [_doc(1, words), _doc(2, ["stable"] * 30)], "doc_id long, text string"
    )
    novel0, stats0 = incremental_passage_batch(
        spark, store, d0, "0", window=W, stride=S
    )
    n0 = novel0.count()
    assert n0 > 0
    s0 = {r.doc_id: r for r in stats0.collect()}
    assert s0[1].n_novel == s0[1].n_passages  # first crawl: all novel

    # re-crawl, doc 1 edited at one word (w30 -> EDIT): only windows
    # covering position 31 change; doc 2 unchanged contributes nothing
    edited = list(words)
    edited[30] = "EDIT"
    d1 = spark.createDataFrame(
        [_doc(1, edited), _doc(2, ["stable"] * 30)], "doc_id long, text string"
    )
    novel1, stats1 = incremental_passage_batch(
        spark, store, d1, "1", window=W, stride=S
    )
    s1 = {r.doc_id: r for r in stats1.collect()}
    assert s1[2].n_novel == 0
    # word 31 (1-based) lies only in the window starting at 25 (i=2):
    # starts 1/13 end before it, 37/49 begin after it
    touched = {r.passage_idx for r in novel1.filter("doc_id = 1").collect()}
    assert touched == {2}, touched
    assert 0 < s1[1].n_novel < s1[1].n_passages

    # replay of batch 1 re-derives the identical novelty (store read
    # excludes the in-flight batch partition)
    novel1b, stats1b = incremental_passage_batch(
        spark, store, d1, "1", window=W, stride=S
    )
    assert sorted(map(tuple, novel1.collect())) == sorted(
        map(tuple, novel1b.collect())
    )

    # a third crawl with no edits: zero novel passages corpus-wide
    novel2, stats2 = incremental_passage_batch(
        spark, store, d1, "2", window=W, stride=S
    )
    assert novel2.count() == 0
    assert stats2.agg(F.sum("n_novel")).first()[0] == 0

    # store rows stay hash-sized and unique per (batch, hash)
    rows = spark.read.parquet(store)
    assert set(rows.columns) >= {"passage_hash", "n_words", "batch_id"}
    assert (
        rows.groupBy("batch_id", "passage_hash").count().filter("count > 1").count()
        == 0
    )


def test_hashes_align_with_q216_census(spark):
    # the store hash and q216's census hash must be the same function
    from dataworks_audit_data_ingest_spark.queries import REGISTRY

    q = REGISTRY["q216_passage_chunks"].fn(spark, "/root/testdata/sf0.001")
    from dataworks_audit_data_ingest_spark.tables import table
    from dataworks_audit_data_ingest_spark.text.incremental_passages import (
        hash_passages,
    )
    from dataworks_audit_data_ingest_spark.text.pipeline import chunk_passages

    d = (
        table(spark, "/root/testdata/sf0.001", "documents")
        .filter("doc_id % 20 = 0")
        .select("doc_id", "text")
    )
    api = hash_passages(chunk_passages(d, window=64, stride=48)).select(
        "doc_id", "passage_idx", "passage_hash"
    )
    assert sorted(map(tuple, api.collect())) == sorted(
        (r.doc_id, r.passage_idx, r.passage_hash)
        for r in q.select("doc_id", "passage_idx", "passage_hash").collect()
    )
