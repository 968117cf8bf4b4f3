"""Streaming boilerplate removal drill: evidence accumulates across
micro-batches, the template is convicted mid-stream, replays rewrite
their own partitions, and compaction uses the checkpoint-derived
exclude list."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.incremental.store import (
    checkpoint_replayable_ids,
    compact_store,
)
from dataworks_audit_data_ingest_spark.streaming.boilerplate_job import (
    start_boilerplate_stream,
)
from dataworks_audit_data_ingest_spark.streaming.curation_job import (
    stream_documents_json,
)
from dataworks_audit_data_ingest_spark.text.incremental_boilerplate import (
    read_line_df,
)

TEMPLATE = "subscribe to our newsletter today"
MIN_DOCS = 20


def _file(src, n, n_bp=8, n_plain=2):
    """One micro-batch file: n_bp docs carrying the template line."""
    base = n * 1000
    rows = [
        {
            "doc_id": base + i,
            "text": f"body {base + i} alpha\n{TEMPLATE}",
            "lang": "en",
            "source": "s",
        }
        for i in range(n_bp)
    ] + [
        {
            "doc_id": base + 100 + i,
            "text": f"plain {base + 100 + i} beta",
            "lang": "en",
            "source": "s",
        }
        for i in range(n_plain)
    ]
    (src / f"f{n}.json").write_text("\n".join(json.dumps(r) for r in rows))


def _drive(spark, src, out, store, ckpt):
    stream = stream_documents_json(spark, str(src), max_files_per_trigger=1)
    q = start_boilerplate_stream(
        stream, out, store, ckpt, min_docs=MIN_DOCS
    )
    q.awaitTermination(300)


def test_template_convicted_mid_stream(spark, tmp_path):
    """8 template docs per micro-batch, threshold 20: batches 0 and 1
    keep the line (df 8, 16), batch 2 strips it (24) — and history stays
    immutable (batch 0/1 outputs unchanged after batch 2 runs)."""
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "cleaned")
    store = str(tmp_path / "line_df")
    ckpt = str(tmp_path / "ckpt")

    # one file per stream invocation: deterministic file->batch slicing
    for n in range(3):
        _file(src, n)
        _drive(spark, src, out, store, ckpt)

    cleaned = spark.read.parquet(out)
    kept = {
        str(r.batch_id): r.n
        for r in cleaned.filter(F.col("text").contains(TEMPLATE))
        .groupBy("batch_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert kept.get("0", 0) == 8 and kept.get("1", 0) == 8
    assert kept.get("2", 0) == 0
    # the stripped batch keeps its bodies (docs not dropped, lines are)
    b2 = cleaned.filter("CAST(batch_id AS STRING) = '2' AND doc_id < 2000 + 100")
    assert b2.count() == 8
    assert b2.filter(~F.col("text").startswith("body")).count() == 0

    # a later batch stays convicted
    _file(src, 3)
    _drive(spark, src, out, store, ckpt)
    assert (
        spark.read.parquet(out)
        .filter("CAST(batch_id AS STRING) = '3'")
        .filter(F.col("text").contains(TEMPLATE))
        .count()
        == 0
    )


def test_compaction_with_checkpoint_derived_exclude(spark, tmp_path):
    """Mid-stream compaction of the df store with the exclude list derived
    from the checkpoint: merged df unchanged, and the next batch's
    classification matches an uncompacted control run exactly."""
    def run(workdir):
        src = workdir / "src"
        src.mkdir()
        out = str(workdir / "cleaned")
        store = str(workdir / "line_df")
        ckpt = str(workdir / "ckpt")
        for n in range(3):
            _file(src, n)
            _drive(spark, src, out, store, ckpt)
        return src, out, store, ckpt

    a = tmp_path / "compacted"
    b = tmp_path / "control"
    a.mkdir()
    b.mkdir()
    src_a, out_a, store_a, ckpt_a = run(a)
    src_b, out_b, store_b, ckpt_b = run(b)

    before = {
        r.line_hash: r.df for r in read_line_df(spark, store_a).collect()
    }
    exclude = checkpoint_replayable_ids(spark, ckpt_a)
    folded = compact_store(spark, store_a, exclude=tuple(exclude))
    assert folded >= 1
    after = {
        r.line_hash: r.df for r in read_line_df(spark, store_a).collect()
    }
    assert after == before

    for src, out, store, ckpt in (
        (src_a, out_a, store_a, ckpt_a),
        (src_b, out_b, store_b, ckpt_b),
    ):
        _file(src, 4)
        _drive(spark, src, out, store, ckpt)
    got = (
        spark.read.parquet(out_a).filter("CAST(batch_id AS STRING) = '4'").orderBy("doc_id")
    )
    want = (
        spark.read.parquet(out_b).filter("CAST(batch_id AS STRING) = '4'").orderBy("doc_id")
    )
    assert [r.asDict() for r in got.collect()] == [
        r.asDict() for r in want.collect()
    ]


def test_maintenance_composes_compact_then_recurate(spark, tmp_path):
    """The scheduled maintenance command (compact with checkpoint-derived
    exclude, THEN recurate history against the compacted store) yields an
    archive byte-identical to a control run that recurated WITHOUT
    compacting — and the stream keeps running after maintenance."""
    from dataworks_audit_data_ingest_spark.streaming.boilerplate_job import (
        maintain_boilerplate_store,
    )
    from dataworks_audit_data_ingest_spark.text.incremental_boilerplate import (
        recurate_history,
    )

    def run(workdir):
        src = workdir / "src"
        src.mkdir()
        out = str(workdir / "cleaned")
        store = str(workdir / "line_df")
        ckpt = str(workdir / "ckpt")
        for n in range(3):
            _file(src, n)
            _drive(spark, src, out, store, ckpt)
        return src, out, store, ckpt

    a = tmp_path / "maintained"
    b = tmp_path / "control"
    a.mkdir()
    b.mkdir()
    src_a, out_a, store_a, ckpt_a = run(a)
    src_b, out_b, store_b, ckpt_b = run(b)

    # batches 0 and 1 shipped with the template (df below threshold then)
    assert (
        spark.read.parquet(out_a)
        .filter(F.col("text").contains(TEMPLATE))
        .count()
        == 16
    )

    audit = maintain_boilerplate_store(
        spark, out_a, store_a, ckpt_a, min_docs=MIN_DOCS
    )
    assert audit["folded"] >= 1
    assert audit["recurated"] == 16  # both pre-conviction batches re-clean

    # control: recurate only, store left unfolded
    assert (
        recurate_history(spark, out_b, store_b, min_docs=MIN_DOCS) == 16
    )

    def snap(out):
        return sorted(
            (r.doc_id, r.text, str(r.batch_id))
            for r in spark.read.parquet(out).collect()
        )

    assert snap(out_a) == snap(out_b)
    assert not any(TEMPLATE in t for _, t, _b in snap(out_a))

    # the stream continues against the compacted store: next batch is
    # convicted immediately and history stays clean
    _file(src_a, 3)
    _drive(spark, src_a, out_a, store_a, ckpt_a)
    post = spark.read.parquet(out_a)
    assert post.filter(F.col("text").contains(TEMPLATE)).count() == 0
    assert post.filter("CAST(batch_id AS STRING) = '3'").count() == 10
