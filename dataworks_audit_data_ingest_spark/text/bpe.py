"""Distributed byte-pair-encoding tokenizer training and encoding.

Sennrich et al. 2016, distributed the way the algorithm's own structure
demands: the corpus collapses ONCE to its distinct-word frequency table
(the only corpus-sized pass — web corpora have ~10^7-10^8 distinct words
no matter how many tokens), and every merge round runs over that table:

  count adjacent symbol pairs (weighted by word frequency, map-combined,
  key space bounded by the current vocab²) → take the argmax pair (a
  driver collect of ONE row) → rewrite the symbol arrays with the merge
  applied (a pure JVM higher-order ``AGGREGATE`` fold, greedy
  left-to-right exactly like the reference algorithm) → next round.

So a full training run is n_merges × (one aggregation + one map) over
vocab-sized data, never over the corpus — the same driver-loop shape as
``similarity/kmeans.py``'s Lloyd rounds. Encoding then never replays the
merge history per token: documents join their words against the trained
word→symbols table (one shuffle or a broadcast when the vocab fits),
which is what makes tokenizing 100 TB a join, not a per-row loop.

q98_bpe_pair_counts pins one pair-count round against the DuckDB oracle;
this module is the full iterated operator (driver-looped, so no single
SQL oracle — pytest pins exact merge-sequence parity with a pure-Python
reference implementation instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _q(s: str) -> str:
    """Quote a symbol for direct inclusion in a SQL string literal."""
    return s.replace("\\", "\\\\").replace("'", "\\'")


def word_frequency_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct-word counts with each word split to character symbols —
    BPE training's working set (the one corpus-sized aggregation)."""
    return (
        docs.select(F.explode(F.split(text_col, " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "syms",
            F.expr("TRANSFORM(SEQUENCE(1, LENGTH(w)), i -> SUBSTRING(w, i, 1))"),
        )
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    return (
        vocab.filter(F.size("syms") >= 2)
        .select(
            F.explode(
                F.expr(
                    "TRANSFORM(SEQUENCE(1, SIZE(syms) - 1), "
                    "i -> STRUCT(ELEMENT_AT(syms, i) AS a, "
                    "ELEMENT_AT(syms, i + 1) AS b))"
                )
            ).alias("p"),
            "cnt",
        )
        .groupBy("p.a", "p.b")
        .agg(F.sum("cnt").alias("n"))
    )


def _apply_merge_expr(a: str, b: str) -> str:
    """JVM fold rewriting one symbol array with the merge (a, b) -> a||b
    applied greedily left-to-right (a freshly merged token never
    re-merges in the same round — the reference algorithm's semantics)."""
    qa, qb = _q(a), _q(b)
    empty = "CAST(ARRAY() AS ARRAY<STRING>)"
    return f"""
    AGGREGATE(
      syms,
      NAMED_STRUCT('acc', {empty}, 'prev', CAST(NULL AS STRING)),
      (s, x) -> CASE
        WHEN s.prev IS NULL
          THEN NAMED_STRUCT('acc', s.acc, 'prev', x)
        WHEN s.prev = '{qa}' AND x = '{qb}'
          THEN NAMED_STRUCT('acc', CONCAT(s.acc, ARRAY('{qa}{qb}')),
                            'prev', CAST(NULL AS STRING))
        ELSE NAMED_STRUCT('acc', CONCAT(s.acc, ARRAY(s.prev)), 'prev', x)
      END,
      s -> CASE WHEN s.prev IS NULL THEN s.acc
                ELSE CONCAT(s.acc, ARRAY(s.prev)) END
    )"""


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> "tuple[list[tuple[str, str]], DataFrame]":
    """Learn up to ``n_merges`` BPE merges; returns (merges in training
    order, the trained word→symbols vocabulary DataFrame).

    Each round's driver collect is ONE row (the argmax pair — same
    sanctioned-collect class as the k-means centroids); ties break
    deterministically by (count desc, a asc, b asc) so training is
    reproducible run-to-run and matches the pure-Python reference."""
    vocab = word_frequency_table(docs, text_col).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < min_pair_count:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        # localCheckpoint: bounds lineage/codegen depth at one fold per
        # round instead of n_merges nested folds (the CC-kernel pattern).
        vocab = vocab.withColumn(
            "syms", F.expr(_apply_merge_expr(a, b))
        ).localCheckpoint()
    return merges, vocab


def tokenize_documents(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Encode documents with a trained vocabulary: explode words with
    their position, join the word→symbols table (broadcast when it fits
    — the common case; hash join otherwise), reassemble in order.
    Returns (id_col, tokens array<string>, n_tokens).

    Out-of-vocabulary words (never seen in training) fall back to
    character symbols — the standard open-vocabulary behavior."""
    words = docs.select(
        F.col(id_col),
        F.posexplode(F.split(text_col, " ")).alias("pos", "w"),
    ).filter(F.col("w") != "")
    v = vocab.select("w", "syms")
    joined = words.join(
        F.broadcast(v) if broadcast_vocab else v, "w", "left"
    ).withColumn(
        "syms",
        F.coalesce(
            F.col("syms"),
            F.expr("TRANSFORM(SEQUENCE(1, LENGTH(w)), i -> SUBSTRING(w, i, 1))"),
        ),
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.flatten(
                F.expr("TRANSFORM(ARRAY_SORT(COLLECT_LIST(STRUCT(pos, syms))), "
                       "s -> s.syms)")
            ).alias("tokens")
        )
        .withColumn("n_tokens", F.size("tokens"))
    )
