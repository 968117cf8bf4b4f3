"""SCD2 history maintenance: change closes the open row and opens a new
one, no-change and replay are no-ops, point-in-time slices read correctly."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.sinks.scd2 import apply_scd2, as_of

T0 = datetime(2026, 1, 1)
T1 = datetime(2026, 2, 1)
T2 = datetime(2026, 3, 1)
SCHEMA = "k bigint, attr string, valid_from timestamp, valid_to timestamp"


def _hist(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _upd(spark, rows):
    return spark.createDataFrame(rows, "k bigint, attr string, effective_ts timestamp")


def _snapshot(df):
    return sorted(map(tuple, df.collect()))


def test_change_versions_new_key_inserts(spark):
    hist = _hist(spark, [(1, "gold", T0, None), (2, "silver", T0, None)])
    ups = _upd(spark, [(1, "platinum", T1), (3, "bronze", T1)])
    out = apply_scd2(hist, ups, ["k"], ["attr"])
    assert _snapshot(out) == sorted(
        [
            (1, "gold", T0, T1),        # closed
            (1, "platinum", T1, None),  # new open version
            (2, "silver", T0, None),    # untouched
            (3, "bronze", T1, None),    # brand-new key
        ]
    )


def test_identical_update_and_replay_are_noops(spark):
    hist = _hist(spark, [(1, "gold", T0, None)])
    same = _upd(spark, [(1, "gold", T1)])
    assert _snapshot(apply_scd2(hist, same, ["k"], ["attr"])) == _snapshot(hist)

    changed = _upd(spark, [(1, "platinum", T1)])
    once = apply_scd2(hist, changed, ["k"], ["attr"])
    twice = apply_scd2(once, changed, ["k"], ["attr"])
    assert _snapshot(once) == _snapshot(twice)


def test_closed_history_is_preserved_and_as_of_reads_it(spark):
    hist = _hist(spark, [(1, "gold", T0, None)])
    hist = apply_scd2(hist, _upd(spark, [(1, "platinum", T1)]), ["k"], ["attr"])
    hist = apply_scd2(hist, _upd(spark, [(1, "diamond", T2)]), ["k"], ["attr"])
    assert hist.count() == 3
    assert hist.filter(F.col("valid_to").isNull()).count() == 1

    def attr_at(ts):
        return as_of(hist, ts).select("attr").collect()[0].attr

    assert attr_at(datetime(2026, 1, 15)) == "gold"
    assert attr_at(datetime(2026, 2, 15)) == "platinum"
    assert attr_at(datetime(2026, 3, 15)) == "diamond"
    assert as_of(hist, datetime(2025, 12, 1)).count() == 0


def test_null_safe_tracked_comparison(spark):
    """NULL -> value and value -> NULL both count as changes; NULL -> NULL
    does not (eqNullSafe semantics)."""
    hist = _hist(spark, [(1, None, T0, None), (2, None, T0, None)])
    ups = _upd(spark, [(1, "x", T1), (2, None, T1)])
    out = apply_scd2(hist, ups, ["k"], ["attr"])
    got = {(r.k, r.attr, r.valid_to) for r in out.collect()}
    assert (1, None, T1) in got and (1, "x", None) in got
    assert (2, None, None) in got and len(got) == 3
