"""Skew-salting helpers and corrupt-record quarantine tests."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.functions.skew import (
    HOT_KEY_PRED,
    SKEW_MILLI_EXPR,
    key_skew_milli,
    key_skew_report,
    load_skew_milli,
    maybe_salted_join,
    salted_agg,
    salted_join,
)
from dataworks_audit_data_ingest_spark.sources import read_json_with_quarantine
from dataworks_audit_data_ingest_spark.tables import table

SF = "/root/testdata/sf0.001"


def test_salted_agg_equals_plain_agg(spark):
    ev = table(spark, SF, "events")
    partials = salted_agg(
        ev,
        "event_type",
        [F.count(F.lit(1)).alias("n"), F.sum("event_id").alias("s")],
        salt_buckets=8,
    )
    merged = {
        r.event_type: (r.n, r.s)
        for r in partials.groupBy("event_type")
        .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
        .collect()
    }
    plain = {
        r.event_type: (r.n, r.s)
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("event_id").alias("s"))
        .collect()
    }
    assert merged == plain
    # stage 1 genuinely spread keys over multiple salt buckets
    assert partials.count() > len(plain)


def test_salted_join_equals_plain_join(spark):
    ev = table(spark, SF, "events")
    dim = spark.createDataFrame(
        [("click", 1.0), ("error", 5.0), ("purchase", 2.0), ("signup", 0.5), ("view", 0.1)],
        "event_type string, weight double",
    )
    salted = salted_join(ev, dim, "event_type", salt_buckets=4)
    plain = ev.join(dim, "event_type")
    assert salted.count() == plain.count()
    a = sorted((r.event_id, r.weight) for r in salted.select("event_id", "weight").collect())
    b = sorted((r.event_id, r.weight) for r in plain.select("event_id", "weight").collect())
    assert a == b


def test_json_quarantine_splits_good_and_bad(spark, tmp_path):
    p = tmp_path / "in.json"
    p.write_text(
        '{"a": 1, "b": "x"}\n'
        "THIS IS NOT JSON\n"
        '{"a": 2, "b": "y"}\n'
        '{"a": "not-an-int", "b": 3}\n'
    )
    good, bad = read_json_with_quarantine(spark, str(p), "a int, b string")
    g = sorted((r.a, r.b) for r in good.collect())
    assert g == [(1, "x"), (2, "y")]
    raws = [r.raw for r in bad.collect()]
    assert len(raws) == 2
    assert any("NOT JSON" in r for r in raws)


def test_quarantine_does_not_mutate_caller_schema(spark, tmp_path):
    """StructType.add mutates in place; the reader must copy first so the
    caller's schema object survives repeated calls unchanged."""
    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    p = tmp_path / "rows.json"
    p.write_text('{"a": 1, "b": "x"}\n')
    schema = StructType(
        [StructField("a", IntegerType()), StructField("b", StringType())]
    )
    for _ in range(2):
        good, bad = read_json_with_quarantine(spark, str(p), schema)
        assert good.count() == 1 and bad.count() == 0
    assert [f.name for f in schema.fields] == ["a", "b"]


def test_key_skew_milli_uniform_vs_hot(spark):
    uniform = spark.range(1000).select((F.col("id") % 100).alias("k"))
    assert key_skew_milli(uniform, "k") == 1000
    # one key with 901 rows, 99 keys with 1: mean ~10, max 901 => ~90x
    hot = spark.range(1000).select(
        F.when(F.col("id") < 901, F.lit(0)).otherwise(F.col("id")).alias("k")
    )
    assert key_skew_milli(hot, "k") > 10_000
    assert key_skew_milli(uniform.limit(0), "k") == 1000  # empty => uniform


def test_maybe_salted_join_engages_only_past_threshold(spark):
    """Equivalence: both branches return identical rows AND columns; plan:
    the salted branch replicates the right side (explode + _salt key), the
    plain branch must NOT pay that cost."""
    ev = table(spark, SF, "events")
    dim = spark.createDataFrame(
        [("click", 1.0), ("error", 5.0), ("purchase", 2.0), ("signup", 0.5), ("view", 0.1)],
        "event_type string, weight double",
    )
    plain = maybe_salted_join(ev, dim, "event_type", skew_milli=1_000)
    salted = maybe_salted_join(ev, dim, "event_type", skew_milli=50_000)
    assert plain.columns == salted.columns
    a = sorted((r.event_id, r.weight) for r in plain.select("event_id", "weight").collect())
    b = sorted((r.event_id, r.weight) for r in salted.select("event_id", "weight").collect())
    assert a == b
    plan_plain = plain._jdf.queryExecution().optimizedPlan().toString()
    plan_salted = salted._jdf.queryExecution().optimizedPlan().toString()
    assert "_salt" in plan_salted and "explode" in plan_salted.lower()
    assert "_salt" not in plan_plain

    # with no precomputed skew_milli it consults the histogram itself:
    # events' event_type histogram is mildly skewed but far below 10x
    auto = maybe_salted_join(ev, dim, "event_type")
    assert "_salt" not in auto._jdf.queryExecution().optimizedPlan().toString()


def test_skew_metric_exact_at_extreme_scale(spark):
    """The skew_milli / hot-key expressions must stay exact when the
    BIGINT products overflow — a ~1e9-row hot key over ~1e7 keys pushes
    1000·max_c·n_keys past 2^63, and on non-ANSI Spark the old bare
    product wrapped NEGATIVE, silently disabling maybe_salted_join on
    exactly the tables it exists for. The test runs the PRODUCTION
    expression strings (module constants, shared with key_skew_report /
    key_skew_milli) over a literal stats row at that scale and compares
    against exact Python integer math."""
    max_c, n_keys, n_rows = 10**9, 10**7, 10**16
    stats = spark.createDataFrame(
        [(max_c, n_keys, n_rows)], "max_c bigint, n_keys bigint, n_rows bigint"
    )
    got = stats.selectExpr(f"{SKEW_MILLI_EXPR} AS skew_milli").collect()[0][0]
    want = (1000 * max_c * n_keys) // n_rows  # exact Python ints
    assert 1000 * max_c * n_keys > 2**63 - 1  # the old form genuinely wrapped
    assert got == want > 0

    # hot-key predicate at the same scale: c·n_keys = 1e16·1e7 overflows
    # BIGINT; the hot key must still be detected
    hot_row = spark.createDataFrame(
        [(10**16, n_keys, n_rows)], "c bigint, n_keys bigint, n_rows bigint"
    )
    assert hot_row.filter(F.expr(HOT_KEY_PRED)).count() == 1
    cold_row = spark.createDataFrame(
        [(1, n_keys, n_rows)], "c bigint, n_keys bigint, n_rows bigint"
    )
    assert cold_row.filter(F.expr(HOT_KEY_PRED)).count() == 0


def test_skew_report_unchanged_at_ordinary_scale(spark):
    """Widening the accumulators must not change any small-scale value —
    the q124 shape on a hand-checkable histogram."""
    hot = spark.range(1000).select(
        F.when(F.col("id") < 901, F.lit(0)).otherwise(F.col("id")).alias("k")
    )
    r = key_skew_report(hot, "k").collect()[0]
    assert r.n_keys == 100 and r.n_rows == 1000 and r.max_rows_per_key == 901
    assert r.skew_milli == (1000 * 901 * 100) // 1000
    assert r.n_hot_keys == 1  # only the hot key exceeds 3x the mean


def test_persisted_skew_report_feeds_the_join_decision(spark, tmp_path):
    """key_skew_report persists; load_skew_milli reads the one number
    back; maybe_salted_join consumes it without re-scanning the fact
    side. A missing/empty report raises instead of silently defaulting
    to 'uniform'."""
    hot = spark.range(1000).select(
        F.when(F.col("id") < 901, F.lit(0)).otherwise(F.col("id")).alias("k")
    )
    path = str(tmp_path / "skew_report")
    key_skew_report(hot, "k").write.parquet(path)
    milli = load_skew_milli(spark, path)
    assert milli == key_skew_milli(hot, "k") > 10_000
    dim = spark.createDataFrame([(0, 1.0)], "k bigint, weight double")
    joined = maybe_salted_join(hot, dim, "k", skew_milli=milli)
    assert "_salt" in joined._jdf.queryExecution().optimizedPlan().toString()
    with pytest.raises(Exception):
        load_skew_milli(spark, str(tmp_path / "nope"))
