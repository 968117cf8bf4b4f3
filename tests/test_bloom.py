"""`functions/bloom.py`: the broadcast Bloom pre-filter behind q96.

Pins the three properties the pattern's correctness rests on — zero false
negatives (every inserted key tests positive), bounded bitmap size
independent of key count, and exact-output equivalence of the prefiltered
semi/anti joins to their plain forms — plus an FP-rate sanity band at the
designed load factor and the map-side plan shape (negatives never reach
the join exchange).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.functions.bloom import (
    bloom_might_contain,
    bloom_prefiltered_semi_join,
    build_bloom_bitmap,
)


def _keys(spark, n, prefix="k"):
    return spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("key")
    )


def test_no_false_negatives(spark):
    """Every inserted key must test positive — the property that lets the
    exact-verify composition keep a DuckDB oracle."""
    keys = _keys(spark, 500)
    bitmap = build_bloom_bitmap(keys, "key")
    hits = keys.filter(bloom_might_contain("key", bitmap)).count()
    assert hits == 500


def test_bitmap_size_is_fixed(spark):
    """The bitmap never grows with the key count — that's the point."""
    small = build_bloom_bitmap(_keys(spark, 10), "key", m_bits=1 << 12)
    large = build_bloom_bitmap(_keys(spark, 2000), "key", m_bits=1 << 12)
    assert len(small) == len(large) == (1 << 12) // 64


def test_fp_rate_in_band(spark):
    """At n/m = 1/16 with k=4 the theoretical FP rate is ~0.24%; allow a
    wide band (must be > 0 occasionally-tolerant, << 5%) so the test pins
    'filter actually filters' without flaking on hash luck."""
    n, m = 4096, 1 << 16
    bitmap = build_bloom_bitmap(_keys(spark, n), "key", m_bits=m)
    probes = 20_000
    fp = (
        _keys(spark, probes, prefix="absent-")
        .filter(bloom_might_contain("key", bitmap, m_bits=m))
        .count()
    )
    assert fp / probes < 0.05


def test_semi_and_anti_join_output_identical_to_plain(spark):
    """The composition (Bloom prefilter -> exact join) must be
    row-identical to the plain semi/anti join on overlapping sets."""
    corpus = _keys(spark, 300)  # k0..k299
    blocked = _keys(spark, 600).filter(F.col("key").substr(2, 10).cast("int") % 3 == 0)

    got_semi = bloom_prefiltered_semi_join(corpus, blocked, "key", m_bits=1 << 12)
    want_semi = corpus.join(blocked.distinct(), "key", "left_semi")
    assert sorted(r.key for r in got_semi.collect()) == sorted(
        r.key for r in want_semi.collect()
    )

    got_anti = bloom_prefiltered_semi_join(
        corpus, blocked, "key", m_bits=1 << 12, anti=True
    )
    want_anti = corpus.join(blocked.distinct(), "key", "left_anti")
    assert sorted(r.key for r in got_anti.collect()) == sorted(
        r.key for r in want_anti.collect()
    )


def test_membership_is_codegen_not_python(spark):
    """The membership test must be pure JVM expression work — no
    BatchEvalPython / Arrow eval anywhere in the filter's plan."""
    keys = _keys(spark, 100)
    bitmap = build_bloom_bitmap(keys, "key", m_bits=1 << 12)
    plan = (
        keys.filter(bloom_might_contain("key", bitmap, m_bits=1 << 12))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_validation_errors(spark):
    with pytest.raises(ValueError):
        build_bloom_bitmap(_keys(spark, 1), "key", m_bits=100)  # not mult of 64
    with pytest.raises(ValueError):
        build_bloom_bitmap(_keys(spark, 1), "key", k=0)
    with pytest.raises(ValueError):
        bloom_might_contain("key", [0] * 4, m_bits=512)  # mismatched length
