"""Anonymization-ladder release gate (functions/privacy.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.functions.privacy import (
    anonymize,
    ladder_assignment,
)
from dataworks_audit_data_ingest_spark.tables import table

SF = "/root/testdata/sf0.001"

LEVELS = (
    {"city": "city", "job": "job"},
    {"city": "city", "job": None},
    {"city": "CONCAT('country=', country)", "job": None},
)


def _toy(spark):
    # city A: two jobs of 6 rows each, diverse bands -> release at level 0.
    # city B: 3+4 rows split across jobs (each too small), 7 rows and two
    #   bands together -> release at level 1.
    # city C: 4 rows, one band even at city level; its country holds only
    #   C -> suppressed at every level.
    rows = []
    for i in range(6):
        rows.append((f"a{i}", "A", "eng", "X", "low" if i % 2 else "high"))
        rows.append((f"a{i}x", "A", "law", "X", "low" if i % 2 else "high"))
    for i in range(3):
        rows.append((f"b{i}", "B", "eng", "X", "low"))
    for i in range(4):
        rows.append((f"b{i}x", "B", "law", "X", "high"))
    for i in range(4):
        rows.append((f"c{i}", "C", "eng", "Y", "low"))
    return spark.createDataFrame(
        rows, "id string, city string, job string, country string, band string"
    )


def test_ladder_releases_at_minimal_sufficient_level(spark):
    out = anonymize(_toy(spark), LEVELS, "band", 5, 2, drop_suppressed=False)
    got = {r.id: (r.gen_level, r.city_released, r.job_released) for r in out.collect()}
    assert got["a0"] == (0, "A", "eng")
    assert got["a0x"] == (0, "A", "law")
    assert got["b0"] == (1, "B", "*")
    assert got["b0x"] == (1, "B", "*")
    assert got["c0"][0] == -1
    # suppressed rows drop by default
    released = anonymize(_toy(spark), LEVELS, "band", 5, 2)
    assert {r.id for r in released.collect()} == {
        i for i, (lvl, *_) in got.items() if lvl >= 0
    }


def test_residual_counting_blocks_leaky_coarse_class(spark):
    # City D: job 'eng' has 10 diverse rows (releases at level 0); job
    # 'law' has 3 rows of ONE band. The city class counts 13 rows overall
    # — a full-count ladder (q197's k1 semantics) would call level 1 safe
    # — but the RESIDUAL is just the 3 law rows: publishing (D, *) would
    # expose a 3-row single-band class. The ladder must push them up to
    # the country level (where E's rows give mass and diversity).
    rows = []
    for i in range(10):
        rows.append((f"d{i}", "D", "eng", "Z", "low" if i % 2 else "high"))
    for i in range(3):
        rows.append((f"d{i}x", "D", "law", "Z", "high"))
    # city E is small (4 rows, two bands): fails k at level 0 AND 1, so
    # its rows are still in the pool when country Z is considered.
    for i in range(4):
        rows.append((f"e{i}", "E", "eng", "Z", "low" if i % 3 else "high"))
    df = spark.createDataFrame(
        rows, "id string, city string, job string, country string, band string"
    )
    out = anonymize(df, LEVELS, "band", 5, 2, drop_suppressed=False)
    got = {r.id: r.gen_level for r in out.collect()}
    assert got["d0"] == 0
    assert got["d0x"] == 2  # NOT 1 — residual at city D is 3 rows / 1 band
    # and the level-2 class it lands in is genuinely safe
    lvl2 = [r for r in out.collect() if r.gen_level == 2]
    assert len(lvl2) >= 5
    assert len({r.band for r in lvl2}) >= 2


def test_every_published_class_satisfies_k_and_l(spark):
    d = table(spark, SF, "customer")
    n = table(spark, SF, "nation")
    base = (
        d.join(
            F.broadcast(n.select("n_nationkey", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .selectExpr(
            "CAST(c_nationkey AS STRING) AS city",
            "c_mktsegment AS job",
            "CAST(n_regionkey AS STRING) AS country",
            "CASE WHEN c_acctbal < 0 THEN 'neg'"
            " WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS band",
        )
    )
    k, l = 10, 2
    out = anonymize(base, LEVELS, "band", k, l)
    census = (
        out.groupBy("city_released", "job_released", "gen_level")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("band").alias("n_sens"),
        )
        .collect()
    )
    assert census
    for r in census:
        assert r.n_rows >= k and r.n_sens >= l, r


def test_assignment_partition_invariant_and_consistent(spark):
    df = _toy(spark)
    a1 = ladder_assignment(df, LEVELS, "band", 5, 2)
    a2 = ladder_assignment(df.repartition(17), LEVELS, "band", 5, 2)
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))
    # assignment row counts reconcile with the row-level release
    total = sum(r.n_rows for r in a1.collect())
    assert total == df.count()


def test_ladder_rejects_mismatched_levels(spark):
    with pytest.raises(ValueError):
        ladder_assignment(
            _toy(spark),
            ({"city": "city"}, {"town": "city"}),
            "band",
            2,
            2,
        )


def test_ladder_rejects_marker_collision(spark):
    """A GENUINE QI value equal to the suppression marker must be
    rejected, not silently merged into the suppression bucket
    (ADVICE r08)."""
    from dataworks_audit_data_ingest_spark.functions.privacy import (
        ladder_assignment,
    )

    d = _toy(spark).withColumn(
        "city", F.expr("CASE WHEN city = 'C' THEN '*' ELSE city END")
    )
    with pytest.raises(ValueError, match="suppression marker"):
        ladder_assignment(d, LEVELS, "band", k=5, l=2).collect()
