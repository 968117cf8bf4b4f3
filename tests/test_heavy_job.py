"""Streaming heavy hitters: the standing top-k view obeys the count-min
laws (est >= true >= seen), matches a one-shot batch build regardless of
batch boundaries, replays idempotently, and survives set-semantics
compaction — including the crash window — without double-counting."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.incremental.store import (
    compact_store,
)
from dataworks_audit_data_ingest_spark.streaming.heavy_job import (
    batch_sketch,
    heavy_hitters,
    start_heavy_hitters_stream,
    update_heavy_state,
)
from dataworks_audit_data_ingest_spark.tables import table

SF = "/root/testdata/sf0.001"
DOC_SCHEMA = "doc_id long, text string"


def _doc_rows(spark):
    return table(spark, SF, "documents").select("doc_id", "text").collect()


def _write_doc_files(src, rows, n_files=3):
    src.mkdir()
    per = (len(rows) + n_files - 1) // n_files
    for i in range(n_files):
        with open(src / f"{i}.json", "w") as f:
            for r in rows[i * per : (i + 1) * per]:
                f.write(
                    json.dumps({"doc_id": r.doc_id, "text": r.text}) + "\n"
                )


def _word_stream(spark, path):
    docs = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .format("json")
        .load(str(path))
    )
    return docs.select(
        F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")


def _true_counts(spark):
    d = table(spark, SF, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("word")).filter(
        F.col("word") != ""
    )
    return {
        r.word: r.c
        for r in toks.groupBy("word").agg(F.count(F.lit(1)).alias("c")).collect()
    }


def _run_stream(spark, tmp_path, store="store", ckpt="ckpt"):
    rows = _doc_rows(spark)
    if not (tmp_path / "in").exists():
        _write_doc_files(tmp_path / "in", rows)
    q = start_heavy_hitters_stream(
        _word_stream(spark, tmp_path / "in"),
        str(tmp_path / store),
        str(tmp_path / ckpt),
        key_col="word",
    )
    q.awaitTermination(180)
    assert len(q.recentProgress) >= 3
    return str(tmp_path / store)


def test_countmin_laws_and_true_topk_containment(spark, tmp_path):
    store = _run_stream(spark, tmp_path)
    true = _true_counts(spark)
    top = heavy_hitters(spark, store, k=10)
    got = top.collect()
    assert len(got) == 10
    for r in got:
        # one-sided count-min error: estimate never undercounts; the
        # candidate's own stored batch counts never overcount
        assert r.est_count >= true[r.key], r
        assert r.seen_count <= true[r.key], r
    # the exact top-5 keys must appear in the sketch-scored top-10
    exact5 = {
        w for w, _ in sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    }
    assert exact5 <= {r.key for r in got}


def test_stream_equals_one_shot_batch_build(spark, tmp_path):
    """Batch boundaries are invisible: the streamed store's report equals
    a single update over ALL rows at once (same k, same sketch params)."""
    store = _run_stream(spark, tmp_path)
    streamed = [tuple(r) for r in heavy_hitters(spark, store, k=15).collect()]

    d = table(spark, SF, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("word")).filter(
        F.col("word") != ""
    )
    one = str(tmp_path / "oneshot")
    update_heavy_state(spark, one, toks, 0, "word", m=240)
    oneshot = [tuple(r) for r in heavy_hitters(spark, one, k=15).collect()]
    # est_count is additive across batches and the vocabulary is tiny, so
    # every word is a candidate in both stores: identical reports modulo
    # seen_count (per-batch local top-m sums differ by construction)
    assert [(k, e) for k, e, _ in streamed] == [(k, e) for k, e, _ in oneshot]


def test_sketch_additivity(spark):
    """sketch(A) + sketch(B) == sketch(A u B) summed per cell."""
    d = table(spark, SF, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    a = toks.filter(F.col("doc_id") % 2 == 0)
    b = toks.filter(F.col("doc_id") % 2 == 1)

    def cells(df, bid):
        return {
            (r.row_idx, r.cell): r.c
            for r in batch_sketch(df, bid, "word").collect()
        }

    ca, cb, cu = cells(a, "a"), cells(b, "b"), cells(toks, "u")
    merged = {k: ca.get(k, 0) + cb.get(k, 0) for k in set(ca) | set(cb)}
    assert merged == cu


def test_replay_idempotent(spark, tmp_path):
    d = table(spark, SF, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("word")).filter(
        F.col("word") != ""
    )
    store = str(tmp_path / "store")
    half = toks.limit(300)
    update_heavy_state(spark, store, half, 0, "word")
    update_heavy_state(spark, store, toks, 1, "word")
    before = [tuple(r) for r in heavy_hitters(spark, store, k=10).collect()]
    # batch 1 re-runs (same data, same id): dynamic overwrite rewrites its
    # own partitions and the report is unchanged
    update_heavy_state(spark, store, toks, 1, "word")
    after = [tuple(r) for r in heavy_hitters(spark, store, k=10).collect()]
    assert before == after


def test_compaction_preserves_report_even_mid_crash(spark, tmp_path):
    store = _run_stream(spark, tmp_path)
    before = [tuple(r) for r in heavy_hitters(spark, store, k=10).collect()]

    # crash window first: fold written but originals NOT yet deleted —
    # simulate by copying every original partition's rows into a fake
    # __compacted__ partition alongside them
    import shutil

    for sub in ("sketch", "cands"):
        root = tmp_path / "store" / sub
        parts = [p for p in root.iterdir() if p.name.startswith("batch_id=")]
        dst = root / "batch_id=__compacted__"
        dst.mkdir()
        n = 0
        for p in parts:
            for f in p.glob("*.parquet"):
                shutil.copy(f, dst / f"crash{n}.parquet")
                n += 1
    mid = [tuple(r) for r in heavy_hitters(spark, store, k=10).collect()]
    assert mid == before  # duplicates collapse on (src_batch, ...) identity

    # then the real compaction completes: fold + delete, report unchanged
    for sub in ("sketch", "cands"):
        removed = compact_store(spark, f"{store}/{sub}")
        assert removed >= 3
    after = [tuple(r) for r in heavy_hitters(spark, store, k=10).collect()]
    assert after == before


def test_empty_store_reports_none(spark, tmp_path):
    assert heavy_hitters(spark, str(tmp_path / "missing"), k=5) is None
