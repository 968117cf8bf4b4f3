"""Engineered-fixture tests for the round-4 additions: q91 batch
sessionization (boundary semantics), q93 CDC chunking (the shift-resilience
property fixed-size blocking lacks), and q94's salted join (physical shape
under a disabled broadcast threshold).

The oracle equivalence of all three is covered by test_queries_oracle; these
tests pin the *behavioral* claims the docstrings make.
"""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

import dataworks_audit_data_ingest_spark.queries.dedup as dd
import dataworks_audit_data_ingest_spark.queries.streaming_shaped as ss
import dataworks_audit_data_ingest_spark.tables as tables

SF = "/root/testdata/sf0.001"


def _patch_events(monkeypatch, module, spark, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    real = tables.table
    monkeypatch.setattr(
        module,
        "table",
        lambda sp, sf, name: df if name == "events" else real(sp, sf, name),
    )


def _patch_documents(monkeypatch, module, spark, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    real = tables.table
    monkeypatch.setattr(
        module,
        "table",
        lambda sp, sf, name: df if name == "documents" else real(sp, sf, name),
    )


# ---------------------------------------------------------------------------
# q91 sessionization boundaries
# ---------------------------------------------------------------------------


def test_sessionize_splits_exactly_at_gap(spark, monkeypatch):
    """29:59 gap keeps the session; 30:01 gap opens a new one; a second
    user's identical timestamps never bleed across the partition key."""
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    mk = lambda eid, uid, seconds: (eid, t0 + dt.timedelta(seconds=seconds), uid, "c", 1.0, "{}")
    rows = [
        mk(1, 7, 0),
        mk(2, 7, 29 * 60 + 59),        # < 30 min after #1 -> same session
        mk(3, 7, 60 * 60 + 1),         # 30:02 after #2 -> new session
        mk(4, 8, 0),                   # other user, own session numbering
    ]
    _patch_events(monkeypatch, ss, spark, rows)
    out = {
        (r.user_id, r.session_id): (r.n_events, r.duration_s)
        for r in ss.q91_sessionize_batch(spark, SF).collect()
    }
    assert out == {
        (7, 1): (2, 29 * 60 + 59),
        (7, 2): (1, 0),
        (8, 1): (1, 0),
    }


def test_sessionize_tied_timestamps_are_one_session(spark, monkeypatch):
    """Equal timestamps have gap 0 under either tie-order — all tied events
    land in one session regardless of event_id ordering."""
    t0 = dt.datetime(2024, 1, 1)
    rows = [(eid, t0, 5, "c", 1.0, "{}") for eid in (3, 1, 2)]
    _patch_events(monkeypatch, ss, spark, rows)
    out = ss.q91_sessionize_batch(spark, SF).collect()
    assert len(out) == 1 and out[0].n_events == 3 and out[0].duration_s == 0


# ---------------------------------------------------------------------------
# q93 CDC chunking: shift resilience + determinism
# ---------------------------------------------------------------------------


def _random_text(n, seed):
    rng = random.Random(seed)
    return "".join(rng.choice("abcdefghijklmnopqrstuvwxyz ") for _ in range(n))


def test_cdc_identical_docs_dedupe_fully(spark, monkeypatch):
    text = _random_text(2000, seed=11)
    rows = [(1, text, "en", "s", len(text)), (2, text, "en", "s", len(text))]
    _patch_documents(monkeypatch, dd, spark, rows)
    [r] = dd.q93_cdc_chunk_dedup(spark, SF).collect()
    assert r.n_chunks == 2 * r.n_unique_chunks
    assert r.total_chars == 2 * len(text)


def test_cdc_early_insertion_shifts_at_most_one_boundary_region(spark, monkeypatch):
    """The CDC property q86's fixed-size blocks lack: inserting one char
    near the front re-aligns only chunks up to the next content-defined
    boundary — everything after it is byte-identical and dedupes."""
    text = _random_text(4000, seed=23)
    shifted = text[:10] + "X" + text[10:]
    rows = [
        (1, text, "en", "s", len(text)),
        (2, shifted, "en", "s", len(shifted)),
    ]
    _patch_documents(monkeypatch, dd, spark, rows)
    [r] = dd.q93_cdc_chunk_dedup(spark, SF).collect()
    n_shared = r.n_chunks - r.n_unique_chunks  # chunks common to both docs
    n_per_doc = r.n_chunks // 2
    # all but the first chunk (and the insertion chunk itself) must match
    assert n_shared >= n_per_doc - 2, (r.n_chunks, r.n_unique_chunks)
    assert n_per_doc >= 20  # the fixture is long enough to be meaningful


# ---------------------------------------------------------------------------
# q94 salted join: physical shape when broadcast is off
# ---------------------------------------------------------------------------


def test_salted_join_shape_without_broadcast(spark):
    """With the broadcast threshold disabled, the salted join sort-merges on
    (key, _salt) — the hot-key-spreading shape the utility exists for — and
    the dimension side carries the salt-replicating explode."""
    from dataworks_audit_data_ingest_spark.functions.skew import salted_join
    from dataworks_audit_data_ingest_spark.tables import table

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = table(spark, SF, "orders").select(
            F.col("o_custkey").alias("custkey"), "o_totalprice"
        )
        cust = table(spark, SF, "customer").select(
            F.col("c_custkey").alias("custkey"), "c_mktsegment"
        )
        joined = salted_join(orders, cust, "custkey", salt_buckets=8)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan and "_salt" in plan
        assert "Generate explode" in plan  # dim replicated once per salt
        # and the rewrite is still the same join
        n_plain = orders.join(cust, "custkey").count()
        assert joined.count() == n_plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
