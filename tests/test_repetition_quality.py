"""q81's map-side rewrite (optimization round 12): the per-doc statistics —
total tokens, distinct tokens, and the max word multiplicity via the
sorted-array run-length AGGREGATE fold — must equal the explode-based
pipeline it replaced on every adversarial shape: ties for the top word, a
single repeated word, one-word docs, empty-string text, threshold-boundary
fractions, and null text (dropped by explode, dropped by the IS NOT NULL
filter)."""

from __future__ import annotations

from pyspark.sql import functions as F

import dataworks_audit_data_ingest_spark.queries.curation as cur

SF = "/root/testdata/sf0.001"  # unused by the monkeypatched loader

_DOCS = [
    # (doc_id, source, text)
    (0, "a", "x y x y z"),  # tie for top word (x=2, y=2 of 5 -> 0.4 top)
    (1, "a", "w w w w w w"),  # one word repeated: top=1.0, dup=1-1/6
    (2, "a", "solo"),  # single word: top=1.0 (>0.12), dup=0
    (3, "a", ""),  # empty text: split -> [""], total=1
    (4, "b", " ".join(f"u{i}" for i in range(50))),  # all distinct: passes
    # exactly 1 of 9 repeated -> top 2/9 = 0.222 > 0.12 (top fail only)
    (5, "b", "r r a b c d e f g"),
    # dup fraction: 20 tokens, 5 distinct -> 1 - 5/20 = 0.75 > 0.70
    (6, "b", " ".join(["p", "q", "s", "t", "v"] * 4)),
    (7, "c", None),  # null text: dropped on both shapes
]


def _reference(spark, docs):
    """The pre-rewrite explode pipeline, inlined as the ground truth."""
    d = spark.createDataFrame(docs, "doc_id long, source string, text string")
    wc = (
        d.select("doc_id", "source", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("doc_id", "source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_doc = wc.groupBy("doc_id", "source").agg(
        F.sum("c").alias("total"),
        F.max("c").alias("top_c"),
        F.count(F.lit(1)).alias("n_distinct"),
    )
    top_fail = (F.col("top_c").cast("double") / F.col("total")) > 0.12
    dup_fail = (
        F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("total")
    ) > 0.70
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(top_fail | dup_fail, 1).otherwise(0)).alias("n_dropped"),
            F.sum(F.when(top_fail, 1).otherwise(0)).alias("n_top_word_fail"),
            F.sum(F.when(dup_fail, 1).otherwise(0)).alias("n_dup_word_fail"),
        )
        .orderBy("source")
    )


def test_q81_matches_explode_reference_on_adversarial_corpus(
    spark, tmp_path, monkeypatch
):
    out = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        _DOCS, "doc_id long, source string, text string"
    ).write.parquet(out)
    monkeypatch.setattr(
        cur, "table", lambda sp, sf, name: sp.read.parquet(out)
    )
    got = [tuple(r) for r in cur.q81_repetition_quality(spark, SF).collect()]
    want = [tuple(r) for r in _reference(spark, _DOCS).collect()]
    assert got == want, (got, want)
    # spot-check the hand-computed rows so the reference itself is pinned:
    # source a: 4 docs survive (null-text doc is in source c), doc0 tie
    # top=2/5=0.4 fails top; doc1 fails both; doc2 fails top; doc3 ([""])
    # top=1.0 fails top.
    by_src = {r[0]: r for r in got}
    assert by_src["a"] == ("a", 4, 4, 4, 1)
    # source b: doc4 passes, doc5 top-fails only, doc6 dup-fails (0.75)
    # and top-fails (4/20 = 0.2 > 0.12)
    assert by_src["b"] == ("b", 3, 2, 2, 1)
    # source c held only the null-text doc: absent entirely
    assert "c" not in by_src


def test_q81_max_multiplicity_equals_sorted_run_length(spark):
    """The AGGREGATE fold is exactly max multiplicity, independent of the
    original word order (sorting is what makes runs == multiplicity)."""
    rows = spark.createDataFrame(
        [("b a c a b a",), ("z z z",), ("m",)], "text string"
    ).select(
        F.expr(
            "AGGREGATE(ARRAY_SORT(SPLIT(text, ' ')),"
            " NAMED_STRUCT('prev', CAST(NULL AS STRING), 'run', 0L, 'best', 0L),"
            " (acc, w) -> NAMED_STRUCT("
            "   'prev', w,"
            "   'run', IF(acc.prev IS NOT NULL AND w = acc.prev, acc.run + 1L, 1L),"
            "   'best', GREATEST(acc.best, IF(acc.prev IS NOT NULL AND w = acc.prev, acc.run + 1L, 1L))),"
            " acc -> acc.best) AS top_c"
        )
    )
    assert [r.top_c for r in rows.collect()] == [3, 3, 1]
