"""Composable text-curation operators — the programmatic API behind the
q60-q65 query surface, shaped for chaining:

    docs = annotate_quality(docs)
    docs = docs.filter("quality_verdict = 'keep'")
    docs = drop_near_duplicates(docs)
    docs = token_budget_sample(docs, budget_tokens=10_000_000)

Each stage is one or two shuffles and carries its provenance columns along,
so a curation run is auditable (why was this document kept/dropped?).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import spark_hash32

_STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "on")


def annotate_quality(
    docs: DataFrame, text_col: str = "text", min_tokens: int = 40
) -> DataFrame:
    """Attach quality features + keep/drop verdict (q61's semantics as a
    reusable stage)."""
    words = F.split(F.col(text_col), " ")
    n_tokens = F.size(words)
    n_stop = F.size(F.filter(words, lambda w: w.isin(*_STOPWORDS)))
    stop_ratio = n_stop.cast("double") / n_tokens
    return (
        docs.withColumn("n_tokens", n_tokens)
        .withColumn("stopword_ratio", stop_ratio)
        .withColumn(
            "quality_verdict",
            F.when(
                (n_tokens >= min_tokens) & stop_ratio.between(0.01, 0.5), "keep"
            ).otherwise("drop"),
        )
    )


def drop_near_duplicates(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Keep one representative per near-dup cluster: MinHash-LSH candidate
    pairs (q51's signature pipeline) reduced to a keep/drop decision — a row
    is dropped if any kept row with a smaller id shares an LSH bucket.

    One-round approximation of full connected components (q58): ideal for
    curation where clusters are shallow; chains longer than one hop keep one
    extra representative rather than over-deleting.
    """
    from ..queries.dedup import _spark_bands, _spark_sigs

    bands = _spark_bands(_spark_sigs(docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))))
    a, b = bands.alias("a"), bands.alias("b")
    dropped = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") > F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias(id_col))
        .distinct()
    )
    return docs.join(dropped, id_col, "left_anti")


def token_budget_sample(
    docs: DataFrame,
    budget_tokens: int,
    text_col: str = "text",
    order_seed: str = "budget",
) -> DataFrame:
    """Deterministic sample of documents filling a token budget: order by the
    content hash (reproducible shuffle, q64's primitive), take documents
    until the running token total reaches the budget.

    The running sum is a window over the hash order — one shuffle; the same
    corpus and budget always select the same set, across runs and engines.
    """
    words = F.split(F.col(text_col), " ")
    h = F.expr(spark_hash32(text_col, order_seed))
    w = (
        Window.orderBy("_h", text_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.withColumn("_h", h)
        .withColumn("_n_tok", F.size(words))
        .withColumn("_running", F.sum("_n_tok").over(w))
        .filter(F.col("_running") <= budget_tokens)
        .drop("_h", "_n_tok", "_running")
    )
