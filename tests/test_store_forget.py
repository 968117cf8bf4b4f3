"""Forget over derived state: the subject's signatures leave the band
store, a re-submission of the same content is novel again, everyone
else's dedup behavior is unchanged, and untouched partitions stay
byte-stable on disk."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.incremental.forget import (
    forget_ids_from_store,
)
from dataworks_audit_data_ingest_spark.text.incremental_dedup import (
    incremental_dedup_batch,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


TEXT_A = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(30))
TEXT_B = " ".join(f"delta{i} epsilon{i} zeta{i}" for i in range(30))


def test_forget_unghosts_resubmission(spark, tmp_path):
    store = str(tmp_path / "bands")

    u0, _ = incremental_dedup_batch(
        spark, store, _docs(spark, [(1, TEXT_A), (2, TEXT_B)]), "0"
    )
    assert u0.count() == 2

    # same content as doc 1 under a new id: caught as a cross-batch dup
    u1, p1 = incremental_dedup_batch(
        spark, store, _docs(spark, [(10, TEXT_A)]), "1"
    )
    assert u1.count() == 0
    assert {(r.doc_a, r.doc_b) for r in p1.collect()} == {(1, 10)}

    # subject 1 exercises the right to be forgotten
    removed = forget_ids_from_store(spark, store, [1, 10])
    assert sum(removed.values()) > 0
    stored_ids = {
        r.doc_id for r in spark.read.parquet(store).select("doc_id").collect()
    }
    assert 1 not in stored_ids and 10 not in stored_ids
    assert 2 in stored_ids  # everyone else's state intact

    # the same content re-submitted is NOVEL now — no ghost match
    u2, p2 = incremental_dedup_batch(
        spark, store, _docs(spark, [(20, TEXT_A)]), "2"
    )
    assert u2.count() == 1 and p2.count() == 0

    # ...and doc 2's dedup behavior is unchanged
    u3, p3 = incremental_dedup_batch(
        spark, store, _docs(spark, [(30, TEXT_B)]), "3"
    )
    assert u3.count() == 0
    assert {(r.doc_a, r.doc_b) for r in p3.collect()} == {(2, 30)}


def test_forget_idempotent_and_partition_scoped(spark, tmp_path):
    store = str(tmp_path / "bands")
    incremental_dedup_batch(spark, store, _docs(spark, [(1, TEXT_A)]), "0")
    incremental_dedup_batch(spark, store, _docs(spark, [(2, TEXT_B)]), "1")

    untouched = Path(store) / "batch_id=1"
    before = sorted(
        (f.name, f.stat().st_mtime_ns)
        for f in untouched.rglob("*.parquet")
    )
    removed = forget_ids_from_store(spark, store, [1])
    assert list(removed) == ["0"]
    after = sorted(
        (f.name, f.stat().st_mtime_ns)
        for f in untouched.rglob("*.parquet")
    )
    assert after == before  # partition without hits untouched on disk

    # idempotent: second run removes nothing
    assert forget_ids_from_store(spark, store, [1]) == {}
    # empty id list is a no-op even before any store exists
    assert forget_ids_from_store(spark, str(tmp_path / "nope"), []) == {}
    assert forget_ids_from_store(spark, str(tmp_path / "nope"), [5]) == {}


def test_audit_manifest_accumulates(spark, tmp_path):
    store = str(tmp_path / "bands")
    audit = str(tmp_path / "audit")
    incremental_dedup_batch(spark, store, _docs(spark, [(1, TEXT_A)]), "0")
    forget_ids_from_store(spark, store, [1], audit_path=audit)
    forget_ids_from_store(spark, store, [1], audit_path=audit)  # idempotent op, second row
    rows = spark.read.parquet(audit).collect()
    assert len(rows) == 2
    assert {r.operation for r in rows} == {"forget_ids_from_store"}
    assert sorted(r.n_affected for r in rows) == [0, 4]
    assert all(r.recorded_at is not None and "store=" in r.detail for r in rows)


def test_forget_matching_selects_id_col_by_name(spark, tmp_path):
    """ADVICE r09: a multi-column ids frame must be matched on id_col BY
    NAME — never positionally — and a multi-column frame without id_col
    must be rejected, not silently erase whatever column is first."""
    import pytest

    from dataworks_audit_data_ingest_spark.incremental.forget import (
        forget_matching_from_store,
    )

    store = str(tmp_path / "bands")
    incremental_dedup_batch(
        spark, store, _docs(spark, [(1, TEXT_A), (2, TEXT_B)]), "0"
    )

    # id is NOT the first column: positional selection would erase the
    # (wrong) score values; name selection erases doc 1 only
    ids = spark.createDataFrame(
        [(99.0, 1)], "score double, doc_id long"
    )
    removed = forget_matching_from_store(spark, store, ids)
    assert sum(removed.values()) > 0
    stored = {
        r.doc_id
        for r in spark.read.parquet(store).select("doc_id").collect()
    }
    assert 1 not in stored and 2 in stored

    # multi-column frame with NO id_col: loud rejection
    bad = spark.createDataFrame([(1, 2)], "a long, b long")
    with pytest.raises(ValueError, match="none named"):
        forget_matching_from_store(spark, store, bad)

    # single-column frame under any name is still accepted as the id set
    one = spark.createDataFrame([(2,)], "whatever long")
    removed2 = forget_matching_from_store(spark, store, one)
    assert sum(removed2.values()) > 0
