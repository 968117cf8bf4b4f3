"""Skew guards in the dedup family: LSH bucket cap and stop-gram DF cap.

Property 1 (no behavior change on organic data): with the cap disabled the
queries produce identical output on the fixtures — the guards only engage on
pathological hot keys.
Property 2 (the guard actually engages): a synthetic boilerplate corpus with
one hot bucket is pruned, while pairs from healthy buckets survive.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.queries import all_queries
from dataworks_audit_data_ingest_spark.queries.dedup import (
    _spark_bands,
    _spark_sigs,
    lsh_candidate_pairs,
)

SF = "/root/testdata/sf0.01"
REGISTRY = all_queries()


def _bands_for_fixture(spark):
    from dataworks_audit_data_ingest_spark.queries.dedup import _variants
    from dataworks_audit_data_ingest_spark.tables import table

    d = table(spark, SF, "documents")
    corpus = d.select("doc_id", "text").unionByName(_variants(d))
    return _spark_sigs(corpus).transform(_spark_bands)


def test_lsh_cap_is_noop_on_organic_corpus(spark):
    bands = _bands_for_fixture(spark).cache()
    try:
        capped = {tuple(r) for r in lsh_candidate_pairs(bands).collect()}
        uncapped = {
            tuple(r) for r in lsh_candidate_pairs(bands, bucket_cap=None).collect()
        }
        assert capped == uncapped and capped
    finally:
        bands.unpersist()


def test_lsh_cap_prunes_synthetic_hot_bucket(spark):
    """100 docs in one bucket (boilerplate) + 2 docs in a healthy bucket:
    the hot bucket contributes zero pairs, the healthy pair survives."""
    rows = [(i, 0, "hot") for i in range(100)] + [(1000, 1, "ok"), (1001, 1, "ok")]
    bands = spark.createDataFrame(
        rows, "doc_id long, band_idx int, band_hash string"
    )
    pairs = {tuple(r) for r in lsh_candidate_pairs(bands, bucket_cap=32).collect()}
    assert pairs == {(1000, 1001)}
    # and uncapped would have exploded quadratically
    assert lsh_candidate_pairs(bands, bucket_cap=None).count() == 100 * 99 // 2 + 1


def test_gram_df_cap_engages_on_boilerplate(spark, tmp_path, monkeypatch):
    """A 3-gram present in >cap docs of one source must not contribute to
    intersections: two docs sharing ONLY boilerplate grams score no pair."""
    import dataworks_audit_data_ingest_spark.queries.dedup as dd
    import dataworks_audit_data_ingest_spark.tables as tables

    # corpus: 70 docs all containing the boilerplate token "zzz" (df=70 > 64)
    # plus two true near-dups sharing organic grams
    boiler = [(i, "src", f"zzz unique{i:04d}") for i in range(70)]
    nears = [(900, "src", "abcdefghij"), (901, "src", "abcdefghijk")]
    df = spark.createDataFrame(boiler + nears, "doc_id long, source string, text string")
    out = str(tmp_path / "documents.parquet")
    df.write.parquet(out)

    real_table = tables.table
    monkeypatch.setattr(
        dd,
        "table",
        lambda sp, sf, name: sp.read.parquet(out)
        if name == "documents"
        else real_table(sp, sf, name),
    )
    got = {
        (r.doc_a, r.doc_b)
        for r in dd.q53_dedup_ngram_jaccard(spark, SF).collect()
    }
    # the boilerplate-only overlaps ("zzz") never pair; the organic pair does
    assert (900, 901) in got
    assert all(a >= 900 for a, _ in got), got


def test_q173_decision_engages_salting_in_the_registered_plan(spark):
    """q173's value is the DECIDED salted join: its registered plan must
    actually contain the salted shape (explode-replicated dim joined on
    (k, _salt)) because the histogram probe crosses the threshold on the
    ~90%-hot derived key — if a refactor ever made the probe read
    uniform, the query would silently degrade to a plain join and stop
    exercising the decision path its driver row exists to prove."""
    q = all_queries()["q173_skew_aware_join"]
    df = q.fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "_salt" in plan and "explode" in plan.lower()
