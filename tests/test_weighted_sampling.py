"""Weighted bottom-k sampling kernel (`functions/sampling.py`) and the
streaming reservoir built on it (`streaming/sample_job.py`): determinism,
mergeability, replay idempotency, crash recovery."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.functions.sampling import (
    merge_reservoirs,
    weighted_bottom_k,
)
from dataworks_audit_data_ingest_spark.streaming.sample_job import (
    load_reservoir,
    start_weighted_sample_stream,
    update_reservoir,
)


def _docs(spark, n=200, w0=1):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (w0 + (F.col("id") * 37) % 500).alias("weight"),
    )


def _ids(df):
    return [r.doc_id for r in df.orderBy("priority", "doc_id").collect()]


def test_bottom_k_is_deterministic_and_weight_sensitive(spark):
    d = _docs(spark)
    s1, s2 = weighted_bottom_k(d, 30, "doc_id", "weight"), weighted_bottom_k(
        d, 30, "doc_id", "weight"
    )
    assert _ids(s1) == _ids(s2)
    # weight sensitivity: the sampled rows are heavier than the corpus
    # average (priorities shrink with weight)
    mean_all = d.agg(F.avg("weight")).collect()[0][0]
    mean_sampled = s1.agg(F.avg("weight")).collect()[0][0]
    assert mean_sampled > mean_all
    # zero/negative weights are unsampleable, not a divide-by-zero
    with_zero = d.unionByName(
        spark.createDataFrame([(10_000, 0), (10_001, -5)], "doc_id long, weight long")
    )
    assert 10_000 not in set(_ids(weighted_bottom_k(with_zero, 250, "doc_id", "weight")))


def test_bottom_k_merges(spark):
    """Bottom-k of a union == merge of per-chunk bottom-ks — the property
    the streaming reservoir relies on."""
    d = _docs(spark, 300)
    whole = weighted_bottom_k(d, 40, "doc_id", "weight")
    chunks = [
        weighted_bottom_k(d.filter(F.col("doc_id") % 3 == i), 40, "doc_id", "weight")
        for i in range(3)
    ]
    merged = merge_reservoirs(chunks, 40, "doc_id")
    assert _ids(merged) == _ids(whole)
    # duplicate ids (a replayed chunk) collapse, not double-count
    merged_dup = merge_reservoirs(chunks + [chunks[0]], 40, "doc_id")
    assert _ids(merged_dup) == _ids(whole)


def test_update_reservoir_is_replay_idempotent(spark, tmp_path):
    d = _docs(spark, 100)
    path = str(tmp_path / "res")
    update_reservoir(spark, path, d, 20, "doc_id", "weight")
    first = _ids(load_reservoir(spark, path))
    update_reservoir(spark, path, d, 20, "doc_id", "weight")  # replay
    assert _ids(load_reservoir(spark, path)) == first


def test_streaming_reservoir_equals_one_shot_sample(spark, tmp_path):
    """After N micro-batches the reservoir is EXACTLY the bottom-k of all
    rows ever ingested; a crash-shaped swap state recovers; an empty
    re-run changes nothing."""
    src = tmp_path / "src"
    src.mkdir()
    res = str(tmp_path / "res")
    ckpt = str(tmp_path / "ckpt")

    def write_file(name, lo, hi):
        rows = [
            {"doc_id": i, "weight": 1 + (i * 37) % 500} for i in range(lo, hi)
        ]
        (src / name).write_text("\n".join(json.dumps(r) for r in rows) + "\n")

    def run_once():
        stream = (
            spark.readStream.schema("doc_id long, weight long")
            .format("json")
            .load(str(src))
        )
        q = start_weighted_sample_stream(stream, res, ckpt, k=25)
        q.awaitTermination(300)

    write_file("f0.json", 0, 80)
    run_once()
    write_file("f1.json", 80, 160)
    run_once()

    # simulate a crash inside the swap window before the next batch
    os.rename(res, res + ".old")

    write_file("f2.json", 160, 240)
    run_once()

    expected = weighted_bottom_k(_docs(spark, 240), 25, "doc_id", "weight")
    got = load_reservoir(spark, res)
    assert _ids(got) == _ids(expected)

    # no new files: replayed stream leaves the reservoir unchanged
    run_once()
    assert _ids(load_reservoir(spark, res)) == _ids(expected)


def test_merge_resolves_reingested_weight_deterministically(spark):
    """The same id re-offered with a CHANGED weight must resolve to its
    most-sampleable version (min priority) on every partitioning — the
    dropDuplicates partition-order dependence this contract forbids."""
    light = spark.createDataFrame([(7, 10)], "doc_id long, weight long")
    heavy = spark.createDataFrame([(7, 500)], "doc_id long, weight long")
    a = weighted_bottom_k(light, 5, "doc_id", "weight")
    b = weighted_bottom_k(heavy, 5, "doc_id", "weight")
    for parts in ([a, b], [b, a]):
        m = merge_reservoirs(parts, 5, "doc_id").collect()
        assert len(m) == 1
        assert m[0].weight == 500  # heavier copy has the smaller priority
        assert m[0].priority == b.collect()[0].priority


def test_read_reservoir_is_consumer_safe(spark, tmp_path):
    """read_reservoir never mutates swap state: in the crash window
    (aside only) it serves the previous reservoir AND leaves the state
    untouched for the owner's own recovery."""
    from dataworks_audit_data_ingest_spark.streaming.sample_job import (
        read_reservoir,
    )

    d = _docs(spark, 50)
    path = str(tmp_path / "res")
    update_reservoir(spark, path, d, 10, "doc_id", "weight")
    expected = _ids(load_reservoir(spark, path))

    os.rename(path, path + ".old")  # simulate mid-swap crash window
    got = read_reservoir(spark, path)
    assert _ids(got) == expected  # served from the aside copy
    assert not os.path.exists(path)  # NOT repaired — that's owner work
    assert os.path.exists(path + ".old")

    # nothing committed yet anywhere: None, still no mutation
    assert read_reservoir(spark, str(tmp_path / "never")) is None


def test_merge_skips_map_typed_payload_columns(spark):
    """Reservoir rows may carry map-typed payload; the deterministic
    merge must skip unorderable columns instead of crashing."""
    rows = [(1, 5, 100, {"a": "b"}), (1, 5, 100, {"c": "d"})]
    df = spark.createDataFrame(
        rows, "doc_id long, weight long, priority long, meta map<string,string>"
    )
    m = merge_reservoirs([df], 5, "doc_id").collect()
    assert len(m) == 1 and m[0].doc_id == 1


def test_read_reservoir_result_is_materialized(spark, tmp_path):
    """The consumer read must survive the owner deleting the files after
    the read returns (lazy frames over swap dirs fail at action time)."""
    import shutil

    from dataworks_audit_data_ingest_spark.streaming.sample_job import (
        read_reservoir,
    )

    d = _docs(spark, 40)
    path = str(tmp_path / "res")
    update_reservoir(spark, path, d, 10, "doc_id", "weight")
    got = read_reservoir(spark, path)
    shutil.rmtree(path)  # owner swaps/deletes after our read returned
    assert got.count() == 10  # still collectable — materialized
