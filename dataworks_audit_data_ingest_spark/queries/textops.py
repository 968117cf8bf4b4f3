"""Text-analysis operators over ``documents``: language-ID heuristic, quality
scoring, token counting, document fingerprinting (north-star extensions;
no analog in the reference, which never parses file contents —
`audit_data_ingest.py:118-120`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from ..functions.localrel import local_rows_df

from ..functions.hashing import duckdb_hash32, spark_hash32
from ..tables import spread, table
from .base import register

# Marker/stopword list for the heuristics — fixed vocabulary, identical in
# both dialects.
_STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "on")
_SW_SQL_LIST = ", ".join(f"'{w}'" for w in _STOPWORDS)


@register(
    "q60_lang_id_heuristic",
    sql=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
             LEN(LIST_FILTER(STRING_SPLIT(text, ' '), w -> w IN ({_SW_SQL_LIST}))) AS n_stop
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN CAST(n_stop AS DOUBLE) / n_tokens >= 0.04
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_pred_en,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_stop) AS BIGINT) AS total_stopwords
    FROM scored
    GROUP BY lang
    ORDER BY lang
    """,
    tags=("text", "lang-id"),
)
def q60_lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram/stopword language-ID heuristic: a document whose English
    function-word ratio clears a threshold is classified English; results are
    rolled up against the labeled ``lang`` column."""
    d = table(spark, sf_dir, "documents")
    scored = d.select(
        "lang",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.size(
            F.filter(
                F.split("text", " "),
                lambda w: w.isin(*_STOPWORDS),
            )
        ).alias("n_stop"),
    )
    pred_en = (F.col("n_stop").cast("double") / F.col("n_tokens") >= 0.04).cast("int")
    return (
        scored.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(pred_en).alias("n_pred_en"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_stop").alias("total_stopwords"),
        )
        .orderBy("lang")
    )


@register(
    "q61_quality_score",
    sql=f"""
    WITH feats AS (
      SELECT doc_id, source,
             LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
             LENGTH(text) AS n_chars,
             LEN(LIST_FILTER(STRING_SPLIT(text, ' '), w -> w IN ({_SW_SQL_LIST}))) AS n_stop,
             LEN(LIST_FILTER(STRING_SPLIT(text, ' '), w -> LENGTH(w) >= 6)) AS n_long
      FROM documents
    )
    SELECT doc_id, source, n_tokens,
           CAST(n_chars - n_tokens + 1 AS DOUBLE) / n_tokens AS avg_word_len,
           CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
           CAST(n_long AS DOUBLE) / n_tokens AS long_word_ratio,
           CASE WHEN n_tokens >= 40
                     AND CAST(n_stop AS DOUBLE) / n_tokens BETWEEN 0.01 AND 0.5
                THEN 'keep' ELSE 'drop' END AS quality_verdict
    FROM feats
    ORDER BY doc_id
    """,
    tags=("text", "quality"),
)
def q61_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features (length, word-shape, stopword ratios)
    and a keep/drop verdict — the filter stage of a training-data pipeline.
    Pure built-ins over the split array; ratios are int/int double divisions,
    deterministic everywhere."""
    d = table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    n_tokens = F.size(words)
    n_stop = F.size(F.filter(words, lambda w: w.isin(*_STOPWORDS)))
    n_long = F.size(F.filter(words, lambda w: F.length(w) >= 6))
    feats = d.select(
        "doc_id",
        "source",
        n_tokens.alias("n_tokens"),
        F.length("text").alias("n_chars"),
        n_stop.alias("n_stop"),
        n_long.alias("n_long"),
    )
    stop_ratio = F.col("n_stop").cast("double") / F.col("n_tokens")
    return feats.select(
        "doc_id",
        "source",
        "n_tokens",
        (
            (F.col("n_chars") - F.col("n_tokens") + F.lit(1)).cast("double")
            / F.col("n_tokens")
        ).alias("avg_word_len"),
        stop_ratio.alias("stopword_ratio"),
        (F.col("n_long").cast("double") / F.col("n_tokens")).alias("long_word_ratio"),
        F.when(
            (F.col("n_tokens") >= 40) & stop_ratio.between(0.01, 0.5), "keep"
        )
        .otherwise("drop")
        .alias("quality_verdict"),
    ).orderBy("doc_id")


@register(
    "q62_token_count",
    sql="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS ws_tokens,
           CAST(SUM(LEN(REGEXP_EXTRACT_ALL(text, '[a-z]+'))) AS BIGINT) AS word_tokens,
           CAST(SUM(LEN(REGEXP_EXTRACT_ALL(text, '[a-z]{1,4}'))) AS BIGINT) AS bpe_ish_tokens
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
    tags=("text", "tokens"),
)
def q62_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace split, word-regex, and a
    BPE-ish greedy ≤4-char chunking — the cost model for LLM data budgets."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select(
            "lang",
            F.size(F.split("text", " ")).alias("ws"),
            F.size(F.expr("REGEXP_EXTRACT_ALL(text, '[a-z]+', 0)")).alias("words"),
            F.size(F.expr("REGEXP_EXTRACT_ALL(text, '[a-z]{1,4}', 0)")).alias("bpe"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws").alias("ws_tokens"),
            F.sum("words").alias("word_tokens"),
            F.sum("bpe").alias("bpe_ish_tokens"),
        )
        .orderBy("lang")
    )


@register(
    "q63_fingerprint",
    sql="""
    WITH fp AS (
      SELECT doc_id,
             MD5(ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(STRING_SPLIT(text, ' '))), ' ')) AS fingerprint
      FROM documents
    )
    SELECT fingerprint, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc_id
    FROM fp
    GROUP BY fingerprint
    HAVING COUNT(*) > 1
    ORDER BY fingerprint
    """,
    tags=("text", "fingerprint"),
)
def q63_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-of-words document fingerprint (sorted distinct tokens → MD5):
    word-order-insensitive duplicate clusters, the cheap complement to
    MinHash for template/boilerplate detection."""
    d = table(spark, sf_dir, "documents")
    fp = F.md5(
        F.array_join(F.array_sort(F.array_distinct(F.split("text", " "))), " ")
    )
    return (
        d.select("doc_id", fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
        .filter(F.col("n_docs") > 1)
        .orderBy("fingerprint")
    )


@register(
    "q64_deterministic_sample",
    sql=f"""
    SELECT lang, COUNT(*) AS n_sampled, MIN(doc_id) AS min_doc_id
    FROM documents
    WHERE {duckdb_hash32('text', 'sample')} % 10 = 0
    GROUP BY lang
    ORDER BY lang
    """,
    tags=("text", "sampling"),
)
def q64_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sampling by content hash — the reproducible
    alternative to TABLESAMPLE for training-data splits: the same document
    always lands in the same split, across engines, runs, and repartitions.
    """
    d = table(spark, sf_dir, "documents")
    return (
        d.filter(F.expr(f"{spark_hash32('text', 'sample')} % 10 = 0"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_sampled"), F.min("doc_id").alias("min_doc_id"))
        .orderBy("lang")
    )


@register(
    "q65_tfidf_top_terms",
    sql="""
    WITH tf AS (
      SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS term
      FROM documents
    ), term_freq AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tf GROUP BY doc_id, term
    ), doc_freq AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term
    ), n_docs AS (
      SELECT COUNT(*) AS n FROM documents
    ), scored AS (
      SELECT doc_id, term, tf, df,
             CAST(tf AS DOUBLE) * n / df AS tfidf_lin
      FROM term_freq JOIN doc_freq USING (term) CROSS JOIN n_docs
    )
    SELECT doc_id, term, tf, df, tfidf_lin, term_rank FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf_lin DESC, term) AS term_rank
      FROM scored)
    WHERE term_rank <= 3 AND doc_id < 100
    ORDER BY doc_id, term_rank
    """,
    tags=("text", "tfidf"),
)
def q65_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top terms per document (linearized idf: tf·N/df instead of
    tf·ln(N/df) — same ranking for fixed tf, and libm-free so both engines
    agree bit-for-bit; swap in log for production scoring).

    Scale shape: two aggs (term-per-doc, doc-freq) + a broadcast-sized
    doc-freq join keyed by term; the corpus is read once.
    """
    d = table(spark, sf_dir, "documents")
    tf = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    term_freq = tf.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # doc_freq derives from term_freq (one row per (doc, term) already), so
    # the corpus is exploded and aggregated ONCE instead of twice, and the
    # second agg shuffles |doc,term| pairs, not |tokens|.
    doc_freq = term_freq.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # n_docs as a broadcast 1-row scalar instead of a per-build .count()
    # driver action (one Spark job saved per invocation; same value).
    n_docs = F.broadcast(d.agg(F.count(F.lit(1)).alias("n_docs")))
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf_lin"), F.asc("term"))
    return (
        term_freq.join(F.broadcast(doc_freq), "term")
        .crossJoin(n_docs)
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            (F.col("tf").cast("double") * F.col("n_docs") / F.col("df")).alias(
                "tfidf_lin"
            ),
        )
        .withColumn("term_rank", F.row_number().over(w))
        .filter((F.col("term_rank") <= 3) & (F.col("doc_id") < 100))
        .select("doc_id", "term", "tf", "df", "tfidf_lin", "term_rank")
        .orderBy("doc_id", "term_rank")
    )


@register(
    "q66_fuzzy_brand_match",
    sql="""
    WITH brands AS (SELECT DISTINCT p_brand FROM part)
    SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
           levenshtein(a.p_brand, b.p_brand) AS edit_dist
    FROM brands a JOIN brands b ON a.p_brand < b.p_brand
    WHERE levenshtein(a.p_brand, b.p_brand) <= 1
    ORDER BY brand_a, brand_b
    """,
    tags=("text", "fuzzy", "levenshtein"),
)
def q66_fuzzy_brand_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy matching via edit distance: near-identical label pairs — the
    typo/variant-detection primitive for entity resolution.

    Scale-safe, fully-distributed form (no driver-side collect of the value
    domain): every distinct value emits O(len) blocking keys — the raw
    string, each mask-at-i variant, and each delete-at-i variant. Any pair
    at edit distance <=1 shares at least one key (substitution pairs share a
    masked key; insert/delete pairs share raw-vs-deletion), so an equi-join
    on the key followed by an exact ``levenshtein`` residual is lossless.
    Candidate fan-out is bounded by string length, never by domain size —
    this survives a 10^8-value domain where an all-pairs or collect-based
    plan cannot. Threshold <=1 so the predicate is observable on this
    fixture (distance-1 brand pairs differ in exactly one digit)."""
    p = table(spark, sf_dir, "part")
    vals = p.select("p_brand").distinct()
    # \x01 never occurs in the data; it marks a masked position.
    keys = vals.select(
        "p_brand",
        F.explode(
            F.expr(
                """
                array_union(
                  array(p_brand),
                  array_union(
                    transform(sequence(1, length(p_brand)),
                              i -> concat(substr(p_brand, 1, i-1), '\x01',
                                          substr(p_brand, i+1))),
                    transform(sequence(1, length(p_brand)),
                              i -> concat(substr(p_brand, 1, i-1),
                                          substr(p_brand, i+1)))))
                """
            )
        ).alias("bkey"),
    )
    a = keys.select(F.col("p_brand").alias("brand_a"), "bkey")
    b = keys.select(F.col("p_brand").alias("brand_b"), "bkey")
    pairs = (
        a.join(b, ["bkey"])
        .filter(F.col("brand_a") < F.col("brand_b"))
        .select("brand_a", "brand_b")
        .distinct()
    )
    return (
        pairs.withColumn("edit_dist", F.levenshtein("brand_a", "brand_b"))
        .filter(F.col("edit_dist") <= 1)
        .orderBy("brand_a", "brand_b")
    )


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters
# ---------------------------------------------------------------------------

from ..functions.hashing import universal_hash  # noqa: E402

_CMS_D = 4  # sketch depth (independent hash rows)
_CMS_W = 1024  # sketch width (cells per row)
_CMS_MIN_EST = 150  # heavy-hitter threshold on the estimate
_CMS_TOP = 25


def _cms_cell(i: int) -> str:
    """Cell index of hash row ``i`` for a base-hash column ``h`` —
    dialect-free integer SQL (both operands non-negative)."""
    return f"({universal_hash('h', i)}) % {_CMS_W}"


def _cms_sql() -> str:
    cell_rows = "\n      UNION ALL\n".join(
        f"      SELECT {i} AS row_idx, {_cms_cell(i)} AS cell FROM hashed"
        for i in range(_CMS_D)
    )
    probe_rows = "\n      UNION ALL\n".join(
        f"      SELECT word, true_count, {i} AS row_idx, {_cms_cell(i)} AS cell"
        " FROM whashed"
        for i in range(_CMS_D)
    )
    return f"""
    WITH toks AS (
      SELECT UNNEST(STRING_SPLIT(text, ' ')) AS word FROM documents
    ), words_nonempty AS (
      SELECT word FROM toks WHERE word <> ''
    ), hashed AS (
      SELECT word, {duckdb_hash32("word", "cms")} AS h FROM words_nonempty
    ), cells AS (
{cell_rows}
    ), sketch AS (
      SELECT row_idx, cell, COUNT(*) AS c FROM cells GROUP BY row_idx, cell
    ), words AS (
      SELECT word, COUNT(*) AS true_count FROM words_nonempty GROUP BY word
    ), whashed AS (
      SELECT word, true_count, {duckdb_hash32("word", "cms")} AS h FROM words
    ), probes AS (
{probe_rows}
    )
    SELECT p.word,
           CAST(MIN(s.c) AS BIGINT) AS est_count,
           CAST(MAX(p.true_count) AS BIGINT) AS true_count
    FROM probes p JOIN sketch s ON p.row_idx = s.row_idx AND p.cell = s.cell
    GROUP BY p.word
    HAVING MIN(s.c) >= {_CMS_MIN_EST}
    ORDER BY est_count DESC, word
    LIMIT {_CMS_TOP}
    """


@register(
    "q87_heavy_hitters_countmin",
    sql=_cms_sql(),
    tags=("text", "sketch", "heavy-hitters", "countmin"),
)
def q87_heavy_hitters_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter tokens via a count-min sketch: every token occurrence
    increments _CMS_D cells (one universal-hash row each, portable
    MD5-derived hashing so both engines build the identical sketch); a
    token's frequency estimate is the MIN over its cells — always >= the
    true count, with the overestimate bounded by the sketch collision mass.
    ``true_count`` rides along to exhibit the one-sided error.

    Scale shape: the sketch is d x w = 4x1024 cells REGARDLESS of corpus
    size — partial aggregation builds per-task sketches map-side and the
    shuffle carries at most d*w rows per task, the whole point of
    sketching over an exact full-cardinality groupBy. The probe side joins
    candidates against the broadcast-sized sketch. (The candidate set here
    is the corpus vocabulary for oracle purposes; a 100 TB deployment
    feeds per-partition local frequent items instead.)
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("word")).filter(
        F.col("word") != ""
    )
    hashed = toks.select(F.expr(spark_hash32("word", "cms")).alias("h"))
    stack_args = ", ".join(f"{i}, {_cms_cell(i)}" for i in range(_CMS_D))
    cells = hashed.select(
        F.expr(f"STACK({_CMS_D}, {stack_args}) AS (row_idx, cell)")
    )
    sketch = cells.groupBy("row_idx", "cell").agg(F.count(F.lit(1)).alias("c"))

    words = toks.groupBy("word").agg(F.count(F.lit(1)).alias("true_count"))
    probes = words.withColumn(
        "h", F.expr(spark_hash32("word", "cms"))
    ).select(
        "word",
        "true_count",
        F.expr(f"STACK({_CMS_D}, {stack_args}) AS (row_idx, cell)"),
    )
    return (
        probes.join(F.broadcast(sketch), ["row_idx", "cell"])
        .groupBy("word")
        .agg(
            F.min("c").cast("bigint").alias("est_count"),
            F.max("true_count").cast("bigint").alias("true_count"),
        )
        .filter(F.col("est_count") >= _CMS_MIN_EST)
        .orderBy(F.desc("est_count"), "word")
        .limit(_CMS_TOP)
    )


@register(
    "q92_char_diversity",
    sql="""
    WITH chars AS (
      SELECT doc_id, UNNEST(string_split(text, '')) AS ch
      FROM documents WHERE doc_id < 200 AND length(text) > 0
    ), counts AS (
      SELECT doc_id, ch, COUNT(*) AS cnt FROM chars GROUP BY doc_id, ch
    )
    SELECT doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_chars_total,
           COUNT(*) AS n_distinct_chars,
           CAST((MAX(cnt) * 1000000) // SUM(cnt) AS BIGINT) AS top_char_ppm,
           CAST(((SUM(cnt) * SUM(cnt) - SUM(cnt * cnt)) * 1000000)
             // (SUM(cnt) * SUM(cnt)) AS BIGINT) AS gini_ppm
    FROM counts
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    tags=("text", "quality", "diversity"),
)
def q92_char_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-diversity quality signal per document: distinct-character
    count, hottest-character share, and Gini impurity 1 − Σpᵢ² — a
    libm-free stand-in for character entropy (same ordering on the
    degenerate-text axis a quality filter cares about: low diversity ⇒ low
    Gini ⇒ likely boilerplate/repetition). All ratios are emitted in exact
    integer parts-per-million (transcendental-free, so both engines agree
    bit-for-bit — same policy as q65's linearized idf).

    Scale shape: one explode (rows = corpus characters) feeding a two-level
    aggregate — (doc, char) partials combine map-side, then one shuffle
    keyed by doc_id. No joins, no global state; row width after the first
    aggregate is two small integers per distinct (doc, char).
    """
    d = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") < 200) & (F.length("text") > 0))
        .select("doc_id", F.explode(F.split("text", "")).alias("ch"))
    )
    counts = d.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        counts.groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_chars_total"),
            F.count(F.lit(1)).alias("n_distinct_chars"),
            F.expr("(MAX(cnt) * 1000000) DIV SUM(cnt)").alias("top_char_ppm"),
            F.expr(
                "((SUM(cnt) * SUM(cnt) - SUM(cnt * cnt)) * 1000000)"
                " DIV (SUM(cnt) * SUM(cnt))"
            ).alias("gini_ppm"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# BPE pair counting (tokenizer-training kernel)
# ---------------------------------------------------------------------------

_BPE_TOP = 40  # merge candidates reported


@register(
    "q98_bpe_pair_counts",
    sql=f"""
    WITH wc AS (
      SELECT w, COUNT(*) AS cnt
      FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS w FROM documents)
      WHERE w <> ''
      GROUP BY w
    ), pairs AS (
      SELECT SUBSTRING(w, i, 2) AS pair, cnt
      FROM (SELECT w, cnt, UNNEST(RANGE(1, LENGTH(w))) AS i FROM wc
            WHERE LENGTH(w) >= 2)
    )
    SELECT pair,
           CAST(SUM(cnt) AS BIGINT) AS n_occurrences,
           COUNT(*) AS n_distinct_words
    FROM pairs
    GROUP BY pair
    ORDER BY n_occurrences DESC, pair
    LIMIT {_BPE_TOP}
    """,
    tags=("text", "tokenizer", "bpe"),
)
def q98_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-character pair counting over the word-frequency table —
    the inner kernel of byte-pair-encoding tokenizer training (Sennrich
    et al. 2016): the highest-count pair is the next merge. Reported as
    the top merge candidates with corpus-wide occurrence counts.

    Scale shape — the reason BPE training distributes at all: the corpus
    collapses to its DISTINCT-WORD frequency table first (one
    map-combined aggregation; web corpora have ~10^7-10^8 distinct words
    regardless of token count), and pairs explode over that table, never
    over the raw corpus — a 10^4-10^6× reduction before the expensive
    stage. The pair aggregation's key space is bounded by alphabet², so
    its shuffle is KBs. A full training run iterates this kernel with the
    chosen merge applied to the word table (driver-looped like q59's
    Lloyd rounds — each round is one broadcast of the merge + one pass);
    this query pins one iteration exactly."""
    d = table(spark, sf_dir, "documents")
    wc = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    pairs = (
        wc.filter(F.length("w") >= 2)
        .select(
            F.explode(
                F.expr(
                    "TRANSFORM(SEQUENCE(1, LENGTH(w) - 1), "
                    "i -> SUBSTRING(w, i, 2))"
                )
            ).alias("pair"),
            "cnt",
        )
    )
    return (
        pairs.groupBy("pair")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_occurrences"),
            F.count(F.lit(1)).alias("n_distinct_words"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("pair"))
        .limit(_BPE_TOP)
    )


# ---------------------------------------------------------------------------
# Vocabulary coverage curve
# ---------------------------------------------------------------------------

_VC_PCTS = (50, 90, 95, 99)
_VC_PCT_SQL = ", ".join(f"({p})" for p in _VC_PCTS)


@register(
    "q100_vocab_coverage",
    sql=f"""
    WITH wc AS (
      SELECT w, COUNT(*) AS cnt
      FROM (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS w FROM documents)
      WHERE w <> ''
      GROUP BY w
    ), tot AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM wc
    ), ranked AS (
      SELECT ROW_NUMBER() OVER (ORDER BY cnt DESC, w) AS rnk,
             SUM(cnt) OVER (ORDER BY cnt DESC, w
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
      FROM wc
    ), pcts(pct) AS (VALUES {_VC_PCT_SQL})
    SELECT p.pct,
           CAST(MIN(r.rnk) AS BIGINT) AS vocab_size,
           CAST(MIN(r.cum) AS BIGINT) AS covered_tokens,
           CAST(MIN(t.total) AS BIGINT) AS total_tokens
    FROM ranked r CROSS JOIN tot t JOIN pcts p
      ON r.cum * 100 >= p.pct * t.total
    GROUP BY p.pct
    ORDER BY p.pct
    """,
    tags=("text", "tokenizer", "coverage", "window"),
)
def q100_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: the smallest frequency-ranked vocabulary
    covering 50/90/95/99% of corpus tokens — the curve that sizes a
    tokenizer's vocab budget (and quantifies the long tail BPE's subword
    fallback must absorb; companion analysis to q98/`text.bpe`).

    Scale shape: the corpus collapses to distinct-word counts map-side
    first (the q98 collapse), so the global rank/cumsum window runs over
    the VOCAB table, not the corpus. Like q16/q37 it pins the exact
    single-ordering form as the oracle; at 10^8-word vocabularies the
    production form is the q37s two-pass histogram (bucket by count,
    cumulative bucket totals, exact-rank only the boundary bucket) —
    same answer, no single-task sort. Thresholds compare in exact
    integer arithmetic (cum*100 >= pct*total: no float ratios).

    Deterministic: ranking ties break by (count desc, word asc);
    coverage at the minimal rank is MIN(cum) over qualifying rows
    because cum increases with rank."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    wc = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tot = wc.agg(F.sum("cnt").cast("bigint").alias("total"))
    w_rank = Window.orderBy(F.desc("cnt"), F.asc("w"))
    ranked = wc.select(
        F.row_number().over(w_rank).alias("rnk"),
        F.sum("cnt")
        .over(w_rank.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
    )
    pcts = local_rows_df(spark, [(p,) for p in _VC_PCTS], "pct int")
    return (
        ranked.crossJoin(F.broadcast(tot))
        .join(
            F.broadcast(pcts),
            F.col("cum") * 100 >= F.col("pct") * F.col("total"),
        )
        .groupBy("pct")
        .agg(
            F.min("rnk").cast("bigint").alias("vocab_size"),
            F.min("cum").cast("bigint").alias("covered_tokens"),
            F.min("total").cast("bigint").alias("total_tokens"),
        )
        .orderBy("pct")
    )


# ---------------------------------------------------------------------------
# q103 — BM25 retrieval (exact fixed-point variant)
# ---------------------------------------------------------------------------
# Query terms are a broadcast literal set; k1=1.2, b=0.75. Both the idf and
# the tf-saturation are evaluated in scaled integer arithmetic so the score
# is bit-identical across engines (no ln(), no float division):
#
#   idf_ppm = floor(1e6 * (N - df + 1/2) / (df + 1/2))
#           = (1_000_000 * (2N - 2df + 1)) DIV (2df + 1)
#   sat_k   = floor(1000 * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)))
#           = (22_000 * S * tf) DIV (10*S*tf + 3*S + 9*dl*N)     [S = Σ dl]
#   score   = Σ_terms idf_ppm * sat_k
#
# The rational idf (Robertson-Sparck-Jones without the log) keeps the same
# ordering as log-idf for a single term and saturates tf identically; the
# log is deliberately traded for engine-exact integers (same policy as the
# q92 ppm features). BIGINT headroom: sat's numerator 22e3*S*tf stays under
# 2^63 while S*tf < 4e14 — beyond ~1e12 corpus tokens, production divides
# S and N by gcd-like 2^k first (pure rescaling, same quotient to ±1ulp of
# the fixed point); idf_ppm*sat_k < 2e15*2200 fits BIGINT to N = 1e9 docs.
_BM25_TERMS = ("spark", "join", "window", "stream")
_BM25_SQL_LIST = ", ".join(f"'{t}'" for t in _BM25_TERMS)
_BM25_TOP = 10


@register(
    "q103_bm25",
    sql=f"""
    WITH toks AS (
      SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w
      FROM documents
    ), dls AS (
      SELECT doc_id, COUNT(*) AS dl FROM toks WHERE w <> '' GROUP BY doc_id
    ), corpus AS (
      SELECT COUNT(*) AS n, SUM(dl) AS s FROM dls
    ), tfs AS (
      SELECT doc_id, w AS term, COUNT(*) AS tf
      FROM toks WHERE w IN ({_BM25_SQL_LIST})
      GROUP BY doc_id, w
    ), dfs AS (
      SELECT term, COUNT(*) AS df FROM tfs GROUP BY term
    )
    SELECT t.doc_id,
           CAST(SUM(
             ((1000000 * (2*c.n - 2*f.df + 1)) // (2*f.df + 1))
             * ((22000 * c.s * t.tf) // (10*c.s*t.tf + 3*c.s + 9*d.dl*c.n))
           ) AS BIGINT) AS bm25_scaled,
           CAST(COUNT(*) AS BIGINT) AS n_terms_hit
    FROM tfs t
    JOIN dfs f USING (term)
    JOIN dls d USING (doc_id)
    CROSS JOIN corpus c
    GROUP BY t.doc_id
    ORDER BY bm25_scaled DESC, t.doc_id
    LIMIT {_BM25_TOP}
    """,
    tags=("text", "retrieval", "bm25", "top-k"),
)
def q103_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword retrieval over ``documents``: score every document
    against a fixed query-term set and return the top 10 — the lexical
    half of a retrieval stack (the vector half is q55/q56/q89; a
    production RAG funnel unions both and reranks).

    Scale shape: the explode filters to query terms BEFORE any exchange,
    so the (doc_id, term) aggregation shuffles only matching rows — for a
    4-term query that is a vanishing fraction of the corpus. Doc lengths
    need one corpus pass (reused from the same explode), corpus N/S and
    the per-term df table are broadcast (df has |terms| rows). Final
    top-k is TakeOrderedAndProject — no global sort. All arithmetic is
    JVM integer ops; see the module comment for the fixed-point spec and
    BIGINT headroom analysis."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("w")).filter(
        F.col("w") != ""
    )
    dls = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    corpus = dls.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").cast("bigint").alias("s")
    )
    tfs = (
        toks.filter(F.col("w").isin(*_BM25_TERMS))
        .groupBy("doc_id", F.col("w").alias("term"))
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfs = tfs.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf_ppm = F.expr("(1000000 * (2*n - 2*df + 1)) DIV (2*df + 1)")
    sat_k = F.expr("(22000 * s * tf) DIV (10*s*tf + 3*s + 9*dl*n)")
    return (
        tfs.join(F.broadcast(dfs), "term")
        .join(dls, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .groupBy("doc_id")
        .agg(
            F.sum(idf_ppm * sat_k).cast("bigint").alias("bm25_scaled"),
            F.count(F.lit(1)).cast("bigint").alias("n_terms_hit"),
        )
        .orderBy(F.desc("bm25_scaled"), "doc_id")
        .limit(_BM25_TOP)
    )


# ---------------------------------------------------------------------------
# q104 — deterministic train/val/test split
# ---------------------------------------------------------------------------
# The split must be a pure function of a stable document key — never of
# row order, partition layout, or a seeded RNG — so that re-runs, backfills
# and incremental appends route every document to the same split forever
# (the property decontamination audits depend on). Bucket = MD5-derived
# 32-bit hash of doc_id mod 100: train < 80, val < 90, test otherwise.
_SPLIT_SQL = "CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END"


@register(
    "q104_train_split",
    sql=f"""
    WITH b AS (
      SELECT source, n_chars,
             {duckdb_hash32("CAST(doc_id AS VARCHAR)", seed="split")} % 100 AS bucket
      FROM documents
    )
    SELECT source, {_SPLIT_SQL} AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM b
    GROUP BY source, split
    ORDER BY source, split
    """,
    tags=("curation", "split", "hash"),
)
def q104_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based train/val/test split (80/10/10) with
    per-source split sizes — the assignment step every training-data
    pipeline runs last, made reproducible by keying the split on a
    content-stable id hash instead of an RNG.

    Scale shape: the bucket is map-side arithmetic on the id (MD5-derived
    32-bit hash, identical in both engines — `functions/hashing.py`); the
    only exchange is the final (source, split) rollup over ~3×|sources|
    groups. Assignment itself never shuffles: at 100 TB the split column
    is computed for free inside whatever write job materializes the
    corpus."""
    d = table(spark, sf_dir, "documents")
    bucket = (
        F.expr(spark_hash32("CAST(doc_id AS STRING)", seed="split")) % 100
    ).alias("bucket")
    b = d.select("source", "n_chars", bucket)
    return (
        b.select("source", "n_chars", F.expr(_SPLIT_SQL).alias("split"))
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("source", "split")
    )


# ---------------------------------------------------------------------------
# q105 — inverted-index posting lists
# ---------------------------------------------------------------------------
_PL_MIN_DF = 100  # report terms appearing in at least this many docs
_PL_K = 8  # posting-list prefix length per term


@register(
    "q105_posting_lists",
    sql=f"""
    WITH postings AS (
      SELECT DISTINCT w AS term, doc_id
      FROM (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w FROM documents)
      WHERE w <> ''
    ), agg AS (
      SELECT term, COUNT(*) AS df,
             LIST(doc_id ORDER BY doc_id) AS docs
      FROM postings GROUP BY term
    )
    SELECT term, CAST(df AS BIGINT) AS df,
           ARRAY_TO_STRING(docs[1:{_PL_K}], ',') AS postings_head
    FROM agg
    WHERE df >= {_PL_MIN_DF}
    ORDER BY term
    """,
    tags=("text", "index", "retrieval"),
)
def q105_posting_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction: per term, the document frequency and
    the head of the sorted posting list — the index build behind q103's
    retrieval (a search deployment writes the full lists, partitioned by
    term; the head-prefix here keeps the oracle row bounded).

    Scale shape: explode → per-partition DISTINCT (term, doc_id) combine →
    one term-keyed exchange carrying doc ids only. collect_list runs after
    the exchange with each term's postings co-located; array_sort makes
    the list order partition-independent. Terms are the natural index
    partition key at 100 TB (hot stop-words are exactly what the df floor
    drops from the report)."""
    d = table(spark, sf_dir, "documents")
    postings = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .distinct()
    )
    agg = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.array_sort(F.collect_list("doc_id")).alias("docs"),
    )
    return (
        agg.filter(F.col("df") >= _PL_MIN_DF)
        .select(
            "term",
            "df",
            F.array_join(F.slice("docs", 1, _PL_K), ",").alias("postings_head"),
        )
        .orderBy("term")
    )


# ---------------------------------------------------------------------------
# q109 — linear quality-model inference
# ---------------------------------------------------------------------------
# The model-scoring stage of a curation pipeline: a trained linear model
# (here: pinned integer weights, the artifact a real pipeline loads from a
# model registry) scored over per-document features, entirely in BIGINT
# ppm arithmetic so the decision boundary is bit-identical across engines:
#
#   tok_term  = 900 * LEAST(n_tokens, 400)        (reward length, capped)
#   stop_pen  = |stop_ppm - 300000| DIV 2         (ideal stopword rate 30%)
#   long_term = long_ppm DIV 4                    (reward lexical richness)
#   score     = 200000 + tok_term - stop_pen + long_term ;  keep if >= 300000
#
# Constant weights fold into whole-stage codegen — the FASTEST inference
# shape Spark has (no join, no UDF). The alternative "model as data"
# pattern (weights table -> broadcast join -> dot product) is what q55/q56
# do for embedding models; a linear scorer doesn't need it.
_Q109_THRESH = 300_000


@register(
    "q109_quality_model_score",
    sql=f"""
    WITH feats AS (
      SELECT doc_id, source,
             LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
             LEN(LIST_FILTER(STRING_SPLIT(text, ' '), w -> w IN ({_SW_SQL_LIST}))) AS n_stop,
             LEN(LIST_FILTER(STRING_SPLIT(text, ' '), w -> LENGTH(w) >= 6)) AS n_long
      FROM documents
    ), scored AS (
      SELECT doc_id, source,
             200000 + 900 * LEAST(n_tokens, 400)
             - ABS(1000000 * n_stop // n_tokens - 300000) // 2
             + (1000000 * n_long // n_tokens) // 4 AS score
      FROM feats WHERE n_tokens > 0
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(CASE WHEN score < {_Q109_THRESH} THEN 1 END) AS BIGINT) AS n_dropped,
           CAST(SUM(score) // COUNT(*) AS BIGINT) AS mean_score,
           CAST(MIN(score) AS BIGINT) AS min_score
    FROM scored
    GROUP BY source
    ORDER BY source
    """,
    tags=("text", "quality", "model-inference"),
)
def q109_quality_model_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every document with a trained linear quality model and report
    the per-source keep/drop outcome — model inference as a corpus-scale
    filter (q61's hand-rule verdict, upgraded to a weighted model; see the
    module comment for the fixed-point spec).

    Scale shape: features and the dot product are map-side JVM expressions
    inside one whole-stage-codegen span — zero shuffles until the final
    per-source rollup (|sources| groups, partial-agg combined). At 100 TB
    inference cost is exactly one corpus scan; the score column is free to
    compute inside whatever write job materializes the curated corpus."""
    d = table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    feats = d.select(
        "doc_id",
        "source",
        F.size(words).alias("n_tokens"),
        F.size(F.filter(words, lambda w: w.isin(*_STOPWORDS))).alias("n_stop"),
        F.size(F.filter(words, lambda w: F.length(w) >= 6)).alias("n_long"),
    ).filter(F.col("n_tokens") > 0)
    score = F.expr(
        "200000 + 900 * LEAST(n_tokens, 400)"
        " - ABS(1000000 * n_stop DIV n_tokens - 300000) DIV 2"
        " + (1000000 * n_long DIV n_tokens) DIV 4"
    )
    return (
        feats.select("source", score.alias("score"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count(F.when(F.col("score") < _Q109_THRESH, 1))
            .cast("bigint")
            .alias("n_dropped"),
            F.expr("SUM(score) DIV COUNT(*)").cast("bigint").alias("mean_score"),
            F.min("score").cast("bigint").alias("min_score"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q112 — unigram surprisal (integer perplexity-filter analog)
# ---------------------------------------------------------------------------
# Perplexity filtering scores each document by the mean -log p(token)
# under a language model; the unigram version needs only corpus counts.
# Floating ln() breaks cross-engine exactness, so surprisal is measured in
# whole bits via bit lengths:
#
#   bits(t)  = bit_length(T DIV c_t)  ~  floor(log2(T / c_t)) + 1
#   doc score = (1000 * Σ_occurrences bits(t)) DIV n_tokens
#
# with T total corpus token occurrences and c_t the term's count. Monotone
# in true unigram surprisal, exact in BIGINT, and the thresholds behave
# like perplexity cuts: boilerplate (all frequent tokens) scores low, OCR
# noise / rare-token soup scores high.
_Q112_HI = 9_000  # mean surprisal > 9 bits -> rare-token noise
_Q112_LO = 5_000  # mean surprisal < 5 bits -> boilerplate


@register(
    "q112_unigram_surprisal",
    sql=f"""
    WITH toks AS (
      SELECT doc_id, source, UNNEST(STRING_SPLIT(text, ' ')) AS t
      FROM documents
    ), toks_f AS (
      SELECT * FROM toks WHERE t <> ''
    ), counts AS (
      SELECT t, COUNT(*) AS c FROM toks_f GROUP BY t
    ), total AS (
      SELECT SUM(c) AS total_t FROM counts
    ), scored AS (
      SELECT k.doc_id, k.source,
             (1000 * SUM(LENGTH(BIN(total_t // c)))) // COUNT(*) AS surprisal
      FROM toks_f k JOIN counts USING (t) CROSS JOIN total
      GROUP BY k.doc_id, k.source
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(surprisal) // COUNT(*) AS BIGINT) AS mean_surprisal,
           CAST(COUNT(CASE WHEN surprisal > {_Q112_HI} THEN 1 END) AS BIGINT) AS n_noisy,
           CAST(COUNT(CASE WHEN surprisal < {_Q112_LO} THEN 1 END) AS BIGINT) AS n_boilerplate
    FROM scored
    GROUP BY source
    ORDER BY source
    """,
    tags=("text", "quality", "perplexity", "exact-integer"),
)
def q112_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean per-token surprisal per document under the corpus's own
    unigram model, rolled up per source with noisy/boilerplate flag counts
    — the engine-exact stand-in for LM perplexity filtering (spec in the
    module comment; a real deployment swaps `bits` for a KenLM-style
    scorer over the same plumbing).

    Scale shape: classic three-exchange TF-IDF plumbing (q65): explode →
    token-keyed count with map-side combine, token-keyed join of counts
    back onto occurrences (the vocabulary is Zipf-bounded; Spark picks
    broadcast when it fits, shuffle-hash otherwise), doc-keyed mean. The
    corpus total rides a broadcast 1-row cross join. Hot stop-tokens skew
    the count agg's key space but partial aggregation flattens them before
    the exchange — the join side is per-occurrence and hashes uniformly
    over doc_id after projection."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("t")
    ).filter(F.col("t") != "")
    counts = toks.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    total = counts.agg(F.sum("c").alias("total_t"))
    scored = (
        toks.join(counts, "t")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id", "source")
        .agg(
            F.expr(
                "(1000 * SUM(LENGTH(BIN(total_t DIV c)))) DIV COUNT(*)"
            ).alias("surprisal")
        )
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.expr("SUM(surprisal) DIV COUNT(*)").cast("bigint").alias(
                "mean_surprisal"
            ),
            F.count(F.when(F.col("surprisal") > _Q112_HI, 1))
            .cast("bigint")
            .alias("n_noisy"),
            F.count(F.when(F.col("surprisal") < _Q112_LO, 1))
            .cast("bigint")
            .alias("n_boilerplate"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q119 — bigram conditional surprisal (sequence-predictability scoring)
# ---------------------------------------------------------------------------
# q112 scores tokens in isolation; this conditions each token on its
# predecessor — the smallest model that sees SEQUENCE structure, so it
# separates failure modes q112 cannot: templated/boilerplate text has low
# conditional surprisal (every next token is predictable) even when its
# vocabulary is unremarkable, while shuffled/incoherent text scores high
# even over common words. Same integer-bits policy:
#
#   bits(w2 | w1)  = bit_length(c(w1) DIV c(w1,w2))
#   doc score      = (1000 * Σ_pairs bits) DIV n_pairs
_Q119_LO = 2_000  # mean conditional surprisal < 2 bits -> templated
_Q119_HI = 7_000  # > 7 bits -> incoherent sequence


@register(
    "q119_bigram_surprisal",
    sql=f"""
    WITH toks AS (
      SELECT doc_id, source, w, pos FROM (
        SELECT doc_id, source,
               UNNEST(STRING_SPLIT(text, ' ')) AS w,
               generate_subscripts(STRING_SPLIT(text, ' '), 1) AS pos
        FROM documents
      ) WHERE w <> ''
    ), pairs AS (
      SELECT doc_id, source,
             LAG(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w1,
             w AS w2
      FROM toks
      QUALIFY w1 IS NOT NULL
    ), uni AS (
      SELECT w1, COUNT(*) AS c1 FROM pairs GROUP BY w1
    ), bi AS (
      SELECT w1, w2, COUNT(*) AS c12 FROM pairs GROUP BY w1, w2
    ), scored AS (
      SELECT p.doc_id, p.source,
             (1000 * SUM(LENGTH(BIN(u.c1 // b.c12)))) // COUNT(*) AS surprisal
      FROM pairs p JOIN uni u USING (w1) JOIN bi b ON p.w1 = b.w1 AND p.w2 = b.w2
      GROUP BY p.doc_id, p.source
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(surprisal) // COUNT(*) AS BIGINT) AS mean_surprisal,
           CAST(COUNT(CASE WHEN surprisal < {_Q119_LO} THEN 1 END) AS BIGINT) AS n_templated,
           CAST(COUNT(CASE WHEN surprisal > {_Q119_HI} THEN 1 END) AS BIGINT) AS n_incoherent
    FROM scored
    GROUP BY source
    ORDER BY source
    """,
    tags=("text", "quality", "perplexity", "bigram", "exact-integer"),
)
def q119_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean conditional (bigram) surprisal per document under the
    corpus's own bigram counts, per source with templated/incoherent
    flags — the sequence-aware rung of the perplexity-filter ladder
    (module comment; unigram rung: q112).

    Scale shape: position-tagged explode is map-side; adjacency needs ONE
    doc-keyed window (lag over pos — each doc's tokens co-locate, the
    same exchange q112's doc rollup pays anyway), then bigram counts and
    the count join are (w1, w2)-keyed with map-side combine. Bigram key
    space is Zipf-bounded in practice; a hot bigram skews only the count
    agg, which partial aggregation flattens. The join back to pairs
    hashes per-occurrence and rebalances on doc_id at the final rollup."""
    d = table(spark, sf_dir, "documents")
    toks = (
        d.select(
            "doc_id", "source", F.posexplode(F.split("text", " ")).alias("pos", "w")
        )
        .filter(F.col("w") != "")
    )
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    pairs = (
        toks.withColumn("w1", F.lag("w").over(w_doc))
        .filter(F.col("w1").isNotNull())
        .select("doc_id", "source", "w1", F.col("w").alias("w2"))
    )
    uni = pairs.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    bi = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    scored = (
        pairs.join(uni, "w1")
        .join(bi, ["w1", "w2"])
        .groupBy("doc_id", "source")
        .agg(
            F.expr("(1000 * SUM(LENGTH(BIN(c1 DIV c12)))) DIV COUNT(*)").alias(
                "surprisal"
            )
        )
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.expr("SUM(surprisal) DIV COUNT(*)").cast("bigint").alias(
                "mean_surprisal"
            ),
            F.count(F.when(F.col("surprisal") < _Q119_LO, 1))
            .cast("bigint")
            .alias("n_templated"),
            F.count(F.when(F.col("surprisal") > _Q119_HI, 1))
            .cast("bigint")
            .alias("n_incoherent"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q125 — LATERAL UDTF chunking as an oracle-checked table
# ---------------------------------------------------------------------------
# The RAG chunking stage (functions/udtfs.py::ChunkDocument) promoted from
# smoke-tested kernel to value-checked query: every (doc, chunk) row the
# Python UDTF yields is mirrored by DuckDB list slicing, chunk text
# compared by MD5 so row width stays bounded. One of the three sanctioned
# Python surfaces (crypto, media, UDTF) — chunk slicing is expressible
# with JVM SEQUENCE+SLICE too (text/pipeline chunkers do exactly that);
# the UDTF form exists to pin the table-function API end to end.
_Q125_TOKENS = 32


@register(
    "q125_udtf_chunks",
    sql=f"""
    WITH words AS (
      SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents
    ), chunks AS (
      SELECT doc_id,
             UNNEST(RANGE(0, (LEN(w) + {_Q125_TOKENS} - 1) // {_Q125_TOKENS})) AS chunk_idx,
             w
      FROM words
    )
    SELECT doc_id,
           CAST(chunk_idx AS INTEGER) AS chunk_idx,
           CAST(LEN(w[chunk_idx * {_Q125_TOKENS} + 1 : chunk_idx * {_Q125_TOKENS} + {_Q125_TOKENS}]) AS INTEGER) AS n_tokens,
           MD5(ARRAY_TO_STRING(w[chunk_idx * {_Q125_TOKENS} + 1 : chunk_idx * {_Q125_TOKENS} + {_Q125_TOKENS}], ' ')) AS chunk_md5
    FROM chunks
    ORDER BY doc_id, chunk_idx
    """,
    tags=("text", "udtf", "chunking", "rag"),
)
def q125_udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking via the Python table function (LATERAL
    ChunkDocument), one row per ≤32-token chunk with an MD5 of the chunk
    text — the UDTF API surface under the oracle (module comment).

    Scale shape: the UDTF runs Arrow-batched per task, no shuffle until
    the output sort; chunk rows feed an embedding stage directly (the
    `examples/rag_document_index.py` funnel). The JVM SEQUENCE+SLICE
    twin in `text/` is the no-Python path when chunk logic stays this
    simple; the UDTF wins once chunking needs real tokenizers."""
    from ..functions.udtfs import ChunkDocument

    spark.udtf.register("chunk_document_q125", ChunkDocument)
    d = table(spark, sf_dir, "documents")
    d.createOrReplaceTempView("q125_docs")
    return spark.sql(
        f"""
        SELECT doc_id,
               c.chunk_idx,
               c.n_tokens,
               MD5(c.chunk) AS chunk_md5
        FROM q125_docs, LATERAL chunk_document_q125(text, {_Q125_TOKENS}) AS c
        ORDER BY doc_id, chunk_idx
        """
    )


# ---------------------------------------------------------------------------
# q126 — feature hashing (hashed bag-of-words vectors)
# ---------------------------------------------------------------------------
# The model-free featurizer: each document becomes a fixed-width integer
# count vector with dimension = portable_hash(token) % D — no vocabulary
# table, no training pass, stable under corpus growth (the property that
# lets a 100 TB corpus featurize in one map-side pass). D = 16 keeps the
# oracle rows readable; production uses 2^18+ and the same plan.
_FH_D = 16


@register(
    "q126_hashed_features",
    sql=f"""
    WITH toks AS (
      SELECT doc_id, {duckdb_hash32("w", seed="fh")} % {_FH_D} AS dim
      FROM (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS w FROM documents)
      WHERE w <> ''
    )
    SELECT doc_id,
           ARRAY_TO_STRING([{", ".join(f"COUNT(CASE WHEN dim = {i} THEN 1 END)" for i in range(_FH_D))}], ',') AS features,
           CAST({" + ".join(f"COUNT(CASE WHEN dim = {i} THEN 1 END) * COUNT(CASE WHEN dim = {i} THEN 1 END)" for i in range(_FH_D))} AS BIGINT) AS sq_norm
    FROM toks
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    tags=("text", "features", "hashing-trick", "exact-integer"),
)
def q126_hashed_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed bag-of-words: every document as a fixed D=16 integer count
    vector (dimension = portable token hash mod D) with its squared L2
    norm — the vocabulary-free featurizer feeding cheap clustering /
    linear models when no embedding model is in the loop (module
    comment). The vector is serialized (comma-joined) for the driver's
    hashability invariant; pipeline consumers keep the array form.

    Scale shape: hashing and dimension assignment are map-side; ONE
    doc-keyed exchange carries the conditional-count partials (D BIGINTs
    per doc per task, combined map-side). No vocabulary build, no second
    pass, no global state — the whole featurizer is a single
    whole-stage-codegen aggregation, which is why the hashing trick is
    the 100 TB baseline before anything learned."""
    d = table(spark, sf_dir, "documents")
    toks = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .select(
            "doc_id",
            F.expr(f"{spark_hash32('w', seed='fh')} % {_FH_D}").alias("dim"),
        )
    )
    counts = [
        F.count(F.when(F.col("dim") == i, 1)).alias(f"c{i}") for i in range(_FH_D)
    ]
    wide = toks.groupBy("doc_id").agg(*counts)
    return wide.select(
        "doc_id",
        F.array_join(
            F.array(*[F.col(f"c{i}") for i in range(_FH_D)]), ","
        ).alias("features"),
        sum(
            (F.col(f"c{i}") * F.col(f"c{i}") for i in range(_FH_D)), F.lit(0)
        )
        .cast("bigint")
        .alias("sq_norm"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q129 — quality-model calibration table
# ---------------------------------------------------------------------------
# The evaluation artifact behind a score threshold decision: documents
# bucketed by fixed-width score bands (histogram binning, q110's
# scale-honest pattern — NOT a single-task NTILE), each band reporting
# volume and the agreement rate with q61's independent hand-rule verdict.
# A well-calibrated model's agreement should rise monotonically with the
# band; the table is what a reviewer inspects before moving the q109
# threshold.
_Q129_BAND = 50_000  # score units per band


@register(
    "q129_model_calibration",
    sql=f"""
    WITH feats AS (
      SELECT doc_id,
             LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
             LEN(LIST_FILTER(STRING_SPLIT(text, ' '), w -> w IN ({_SW_SQL_LIST}))) AS n_stop,
             LEN(LIST_FILTER(STRING_SPLIT(text, ' '), w -> LENGTH(w) >= 6)) AS n_long
      FROM documents
    ), scored AS (
      SELECT doc_id,
             200000 + 900 * LEAST(n_tokens, 400)
             - ABS(1000000 * n_stop // n_tokens - 300000) // 2
             + (1000000 * n_long // n_tokens) // 4 AS score,
             CASE WHEN n_tokens >= 40
                       AND 1000000 * n_stop // n_tokens BETWEEN 10000 AND 500000
                  THEN 1 ELSE 0 END AS hand_keep
      FROM feats WHERE n_tokens > 0
    )
    SELECT score // {_Q129_BAND} AS band,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(hand_keep) AS BIGINT) AS n_hand_keep,
           CAST((1000 * SUM(hand_keep)) // COUNT(*) AS BIGINT) AS agree_milli
    FROM scored
    GROUP BY band
    ORDER BY band
    """,
    tags=("text", "quality", "model-eval", "calibration", "exact-integer"),
)
def q129_model_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration table for the q109 linear quality model: fixed-width
    score bands vs agreement with q61's independent hand rule (module
    comment) — the threshold-setting artifact of the model-eval loop.

    Scale shape: identical single-scan moment arithmetic to q109 plus a
    band-keyed rollup (score DIV band — map-side, bounded key space).
    The hand rule rides the same scan; nothing is computed twice. Note
    the hand rule's stopword band here is the integer-ppm restatement of
    q61's double ratio — the calibration COMPARES verdicts, so both
    sides must be engine-exact."""
    d = table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    feats = d.select(
        F.size(words).alias("n_tokens"),
        F.size(F.filter(words, lambda w: w.isin(*_STOPWORDS))).alias("n_stop"),
        F.size(F.filter(words, lambda w: F.length(w) >= 6)).alias("n_long"),
    ).filter(F.col("n_tokens") > 0)
    scored = feats.select(
        F.expr(
            "200000 + 900 * LEAST(n_tokens, 400)"
            " - ABS(1000000 * n_stop DIV n_tokens - 300000) DIV 2"
            " + (1000000 * n_long DIV n_tokens) DIV 4"
        ).alias("score"),
        F.expr(
            "CASE WHEN n_tokens >= 40"
            " AND 1000000 * n_stop DIV n_tokens BETWEEN 10000 AND 500000"
            " THEN 1 ELSE 0 END"
        ).alias("hand_keep"),
    )
    return (
        scored.groupBy(F.expr(f"score DIV {_Q129_BAND}").alias("band"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("hand_keep").cast("bigint").alias("n_hand_keep"),
            F.expr("CAST((1000 * SUM(hand_keep)) DIV COUNT(*) AS BIGINT)").alias(
                "agree_milli"
            ),
        )
        .orderBy("band")
    )


# ---------------------------------------------------------------------------
# q142 — training shard manifest
# ---------------------------------------------------------------------------
# The manifest computation behind `sinks/shards.py::write_training_shards`:
# placement (shard = h(id) mod N), exact per-shard volumes, the order-free
# integer checksum a loader verifies against, and the first document in the
# deterministic epoch-0 order. Everything is portable-hash + integer
# arithmetic, so the layout contract itself is oracle-checked — a driver
# row here means the shard writer puts every document where the manifest
# says, on any engine.
_N_SHARDS = 8


@register(
    "q142_shard_manifest",
    sql=f"""
    WITH h AS (
      SELECT doc_id, n_chars,
             {duckdb_hash32("CAST(doc_id AS VARCHAR)", seed="shards")} AS ord
      FROM documents
    ), placed AS (
      SELECT doc_id, n_chars, ord, ord % {_N_SHARDS} AS shard,
             ROW_NUMBER() OVER (PARTITION BY ord % {_N_SHARDS}
                                ORDER BY ord, doc_id) AS rn
      FROM h
    )
    SELECT CAST(shard AS INT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(ord) AS BIGINT) AS checksum,
           CAST(MIN(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS first_doc_id
    FROM placed
    GROUP BY shard
    ORDER BY shard
    """,
    tags=("curation", "shards", "hash", "sink-shaped"),
)
def q142_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-layout manifest (`sinks/shards.py`): deterministic placement
    ``shard = h(doc_id) mod N`` plus the per-shard row count, char
    volume, order-free hash checksum, and the first document of the
    epoch-0 stream — the integrity record a training loader checks
    before consuming a shard set.

    Scale shape: placement and the hash are map-side; the only exchange
    is the N-group rollup (the same shuffle the shard write itself
    performs, whose output these stats ride at zero extra cost). The
    within-shard ROW_NUMBER the oracle uses is expressed here as a
    min-struct aggregate — no second window pass."""
    from ..sinks.shards import shard_assignment

    d = table(spark, sf_dir, "documents")
    a = shard_assignment(d, "doc_id", _N_SHARDS)
    return (
        a.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.sum("shard_ord").cast("bigint").alias("checksum"),
            F.min(F.struct("shard_ord", "doc_id"))
            .getField("doc_id")
            .cast("bigint")
            .alias("first_doc_id"),
        )
        .orderBy("shard")
    )


# ---------------------------------------------------------------------------
# q143 — KMV distinct sketch (exactly checkable estimator)
# ---------------------------------------------------------------------------
# The k-minimum-values sketch from `functions/sketches.py`: unlike HLL
# (whose q42 form is rows-only and whose q107 twin needs shared float
# constants), KMV is pure integer arithmetic over the portable hash — the
# sketch, the estimate, AND the error column are bit-identical across
# engines. Reported per source over the distinct token space, with the
# exact distinct count alongside so the estimator's accuracy is visible in
# the result itself.
_KMV_K = 64

from ..functions.sketches import kmv_estimate_sql as _kmv_est  # noqa: E402

_KMV_EST_DUCK = _kmv_est("kth_hash", "n_held", _KMV_K, dialect="duckdb")


@register(
    "q143_kmv_distinct",
    sql=f"""
    WITH toks AS (
      SELECT DISTINCT source,
             {duckdb_hash32("w", seed="kmv")} AS h
      FROM (SELECT source, UNNEST(STRING_SPLIT(text, ' ')) AS w FROM documents)
      WHERE w <> ''
    ), ranked AS (
      SELECT source, h,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n_distinct
      FROM toks
    ), sk AS (
      SELECT source, MIN(n_distinct) AS n_distinct,
             COUNT(*) AS n_held, MAX(h) AS kth_hash
      FROM ranked WHERE rn <= {_KMV_K}
      GROUP BY source
    )
    SELECT source, CAST(n_held AS BIGINT) AS n_held,
           CAST(kth_hash AS BIGINT) AS kth_hash,
           CAST({_KMV_EST_DUCK} AS BIGINT) AS kmv_estimate,
           CAST(({_KMV_EST_DUCK}) * 10000 // n_distinct - 10000
                AS BIGINT) AS err_bps,
           CAST(n_distinct AS BIGINT) AS exact_distinct
    FROM sk
    ORDER BY source
    """,
    tags=("sketch", "kmv", "distinct", "text"),
)
def q143_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-token estimate per source: keep the k smallest
    distinct token hashes, estimate ``(k-1)·2³²/U_k`` (Beyer et al.,
    SIGMOD 2007), report against the exact distinct count with signed
    error in bps — the sketch whose whole lifecycle is integer-exact and
    therefore fully oracle-checked (the HLL family's checkable
    complement, `functions/sketches.py::kmv_estimate_sql`).

    Scale shape: token hashing is map-side; the (source, h) DISTINCT
    pre-aggregates map-side before its one exchange; the k-smallest
    selection is a per-source window over distinct hashes only. At
    100 TB the exact_distinct column is dropped (it is the quantity
    being avoided) and the k-set itself is kept as the mergeable sketch:
    unions are k-smallest-of-union, so per-day sketches roll up to any
    period without rescanning tokens."""
    from ..functions.sketches import kmv_estimate_sql

    d = table(spark, sf_dir, "documents")
    toks = (
        d.select(
            "source",
            F.explode(F.split("text", " ")).alias("w"),
        )
        .filter(F.col("w") != "")
        .select("source", F.expr(spark_hash32("w", seed="kmv")).alias("h"))
        .distinct()
    )
    w_rank = Window.partitionBy("source").orderBy("h")
    w_all = Window.partitionBy("source")
    ranked = toks.withColumn("rn", F.row_number().over(w_rank)).withColumn(
        "n_distinct", F.count(F.lit(1)).over(w_all)
    )
    sk = (
        ranked.filter(F.col("rn") <= _KMV_K)
        .groupBy("source")
        .agg(
            F.min("n_distinct").alias("n_distinct"),
            F.count(F.lit(1)).alias("n_held"),
            F.max("h").alias("kth_hash"),
        )
    )
    est = kmv_estimate_sql("kth_hash", "n_held", _KMV_K, dialect="spark")
    return sk.select(
        "source",
        F.col("n_held").cast("bigint").alias("n_held"),
        F.col("kth_hash").cast("bigint").alias("kth_hash"),
        F.expr(est).cast("bigint").alias("kmv_estimate"),
        F.col("n_distinct").cast("bigint").alias("exact_distinct"),
        # est*10000 is non-negative, so trunc (Spark DIV) == floor
        # (DuckDB //) — a signed numerator would diverge between engines
        F.expr(f"CAST(({est}) * 10000 DIV n_distinct - 10000 AS BIGINT)").alias(
            "err_bps"
        ),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# q153 — record linkage (Fellegi–Sunter-lite entity resolution)
# ---------------------------------------------------------------------------
# Match a dirty registry (planted: every 10th customer re-entered with one
# name typo and a small balance drift) back to the master table WITHOUT a
# shared key: block on (nation, mask-at-i name keys — q66's edit-distance
# blocking, so any 1-substitution pair is guaranteed a shared key), then
# score field agreements with integer weights (name edit distance tiered,
# balance proximity, nation implicit in the block) and keep pairs above
# the match threshold. Everything is integer/IEEE-exact, so the linkage
# decisions themselves hash-match across engines.
_RL_THRESHOLD = 30
_RL_NAME_PTS = "CASE WHEN ld = 0 THEN 24 WHEN ld = 1 THEN 16 WHEN ld = 2 THEN 4 ELSE -12 END"
_RL_BAL_PTS = "CASE WHEN ABS(bal_delta) <= 5.0 THEN 16 ELSE -8 END"


@register(
    "q153_record_linkage",
    sql=f"""
    WITH dirty AS (
      SELECT c_custkey + 30000000 AS d_key,
             CONCAT(SUBSTRING(c_name, 1, 11), 'Q', SUBSTRING(c_name, 13))
               AS d_name,
             c_nationkey AS d_nation,
             c_acctbal + (c_custkey % 7 - 3) * 0.01 AS d_bal
      FROM customer WHERE c_custkey % 10 = 0
    ), clean_keys AS (
      SELECT c_custkey, c_name, c_nationkey, c_acctbal,
             CASE WHEN i = 0 THEN c_name
                  ELSE CONCAT(SUBSTRING(c_name, 1, i - 1), CHR(1),
                              SUBSTRING(c_name, i + 1)) END AS bkey
      FROM customer, UNNEST(RANGE(0, LENGTH('Customer#000000001') + 1)) t(i)
    ), dirty_keys AS (
      SELECT d_key, d_name, d_nation, d_bal,
             CASE WHEN i = 0 THEN d_name
                  ELSE CONCAT(SUBSTRING(d_name, 1, i - 1), CHR(1),
                              SUBSTRING(d_name, i + 1)) END AS bkey
      FROM dirty, UNNEST(RANGE(0, LENGTH('Customer#000000001') + 1)) t(i)
    ), cand AS (
      SELECT DISTINCT c.c_custkey, c.c_name, c.c_acctbal,
                      d.d_key, d.d_name, d.d_bal
      FROM clean_keys c
        JOIN dirty_keys d ON d.bkey = c.bkey AND d.d_nation = c.c_nationkey
    ), scored AS (
      SELECT c_custkey, d_key,
             levenshtein(c_name, d_name) AS ld,
             d_bal - c_acctbal AS bal_delta
      FROM cand
    )
    SELECT c_custkey AS clean_key, d_key AS dirty_key,
           CAST(ld AS BIGINT) AS edit_dist,
           CAST(({_RL_NAME_PTS}) + ({_RL_BAL_PTS}) AS BIGINT) AS score
    FROM scored
    WHERE ({_RL_NAME_PTS}) + ({_RL_BAL_PTS}) >= {_RL_THRESHOLD}
    ORDER BY clean_key, dirty_key
    """,
    tags=("linkage", "entity-resolution", "fuzzy", "blocking"),
)
def q153_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution without a shared key: a dirty re-entry of every
    10th customer (one name typo + balance drift) links back to the
    master via mask-at-i blocking keys (any single-substitution pair
    provably shares one — q66's device) and Fellegi–Sunter-style integer
    agreement weights; pairs above the threshold are declared matches.

    Scale shape: each record emits O(name_len) blocking keys map-side;
    the only exchange is the (nation, key) equi-join — candidate fan-out
    is bounded by per-key collision groups (≈10 digit-siblings), never
    the all-pairs product; the exact levenshtein runs on candidates
    only. At 100 TB the same shape holds with phonetic or q-gram keys
    for free-text names."""
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"
    )
    dirty = c.filter(F.col("c_custkey") % 10 == 0).select(
        (F.col("c_custkey") + 30000000).alias("d_key"),
        F.expr(
            "CONCAT(SUBSTRING(c_name, 1, 11), 'Q', SUBSTRING(c_name, 13))"
        ).alias("d_name"),
        F.col("c_nationkey").alias("d_nation"),
        (F.col("c_acctbal") + (F.col("c_custkey") % 7 - 3) * 0.01).alias(
            "d_bal"
        ),
    )

    def with_keys(df, name_col):
        return df.select(
            "*",
            F.explode(
                F.expr(
                    f"TRANSFORM(SEQUENCE(0, LENGTH({name_col})), i -> "
                    f"CASE WHEN i = 0 THEN {name_col} "
                    f"ELSE CONCAT(SUBSTRING({name_col}, 1, i - 1), CHR(1), "
                    f"SUBSTRING({name_col}, i + 1)) END)"
                )
            ).alias("bkey"),
        )

    ck = with_keys(c, "c_name")
    dk = with_keys(dirty, "d_name")
    cand = (
        ck.join(
            dk,
            (ck.bkey == dk.bkey) & (ck.c_nationkey == dk.d_nation),
        )
        .select("c_custkey", "c_name", "c_acctbal", "d_key", "d_name", "d_bal")
        .distinct()
    )
    scored = cand.select(
        "c_custkey",
        "d_key",
        F.expr("levenshtein(c_name, d_name)").alias("ld"),
        (F.col("d_bal") - F.col("c_acctbal")).alias("bal_delta"),
    )
    return (
        scored.withColumn(
            "score", F.expr(f"CAST(({_RL_NAME_PTS}) + ({_RL_BAL_PTS}) AS BIGINT)")
        )
        .filter(F.col("score") >= _RL_THRESHOLD)
        .select(
            F.col("c_custkey").alias("clean_key"),
            F.col("d_key").alias("dirty_key"),
            F.col("ld").cast("bigint").alias("edit_dist"),
            "score",
        )
        .orderBy("clean_key", "dirty_key")
    )


# ---------------------------------------------------------------------------
# q159 — vocabulary drift between corpus snapshots
# ---------------------------------------------------------------------------
# Distribution-shift monitoring for training data: compare token shares
# between two corpus slices (here the deterministic source halves standing
# in for consecutive snapshots) and report the biggest movers in exact
# integer ppm. The report catches "the crawl changed under me" — new
# boilerplate, lost domains, template churn — before it shows up as model
# regressions. Same shape against yesterday/today partitions in
# production.
_DRIFT_TOP = 30
_DRIFT_MIN_COUNT = 50  # ignore rare-token noise


@register(
    "q159_vocab_drift",
    sql=f"""
    WITH toks AS (
      SELECT CASE WHEN CAST(SUBSTRING(source, 4) AS BIGINT) < 10
                  THEN 'a' ELSE 'b' END AS snap,
             UNNEST(STRING_SPLIT(text, ' ')) AS w
      FROM documents
    ), counts AS (
      SELECT snap, w, COUNT(*) AS n FROM toks WHERE w <> '' GROUP BY snap, w
    ), totals AS (
      SELECT snap, SUM(n) AS total FROM counts GROUP BY snap
    ), shares AS (
      SELECT w,
             COALESCE(MAX(CASE WHEN c.snap = 'a' THEN n END), 0) AS n_a,
             COALESCE(MAX(CASE WHEN c.snap = 'b' THEN n END), 0) AS n_b,
             COALESCE(MAX(CASE WHEN c.snap = 'a'
                      THEN CAST(1000000 AS HUGEINT) * n // t.total END), 0) AS ppm_a,
             COALESCE(MAX(CASE WHEN c.snap = 'b'
                      THEN CAST(1000000 AS HUGEINT) * n // t.total END), 0) AS ppm_b
      FROM counts c JOIN totals t USING (snap)
      GROUP BY w
    )
    SELECT w AS token,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(ppm_a AS BIGINT) AS ppm_a, CAST(ppm_b AS BIGINT) AS ppm_b,
           CAST(ABS(ppm_b - ppm_a) AS BIGINT) AS abs_drift_ppm
    FROM shares
    WHERE n_a + n_b >= {_DRIFT_MIN_COUNT}
    ORDER BY abs_drift_ppm DESC, token
    LIMIT {_DRIFT_TOP}
    """,
    tags=("text", "drift", "monitoring", "distribution-shift"),
)
def q159_vocab_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-share drift between two corpus snapshots (the source halves
    as stand-ins): per token the exact ppm share in each slice and the
    absolute drift, top movers first — the vocabulary-level
    distribution-shift report run between crawls (KL-style summaries
    need logs; the movers table is exact, actionable, and
    hash-checkable).

    Scale shape: token counts partial-aggregate map-side; the pivot to
    (n_a, n_b) is one token-keyed exchange over the distinct vocabulary;
    totals broadcast. Top movers via TakeOrderedAndProject, never a
    global sort."""
    d = table(spark, sf_dir, "documents")
    toks = (
        d.select(
            F.when(
                F.expr("CAST(SUBSTRING(source, 4) AS BIGINT)") < 10, "a"
            )
            .otherwise("b")
            .alias("snap"),
            F.explode(F.split("text", " ")).alias("w"),
        )
        .filter(F.col("w") != "")
    )
    counts = toks.groupBy("snap", "w").agg(F.count(F.lit(1)).alias("n"))
    totals = counts.groupBy("snap").agg(F.sum("n").alias("total"))
    shares = (
        counts.join(F.broadcast(totals), "snap")
        .groupBy("w")
        .agg(
            F.coalesce(
                F.max(F.when(F.col("snap") == "a", F.col("n"))), F.lit(0)
            ).alias("n_a"),
            F.coalesce(
                F.max(F.when(F.col("snap") == "b", F.col("n"))), F.lit(0)
            ).alias("n_b"),
            F.coalesce(
                F.max(
                    F.when(
                        F.col("snap") == "a",
                        F.expr("1000000 * CAST(n AS DECIMAL(38,0)) DIV total"),
                    )
                ),
                F.lit(0),
            ).alias("ppm_a"),
            F.coalesce(
                F.max(
                    F.when(
                        F.col("snap") == "b",
                        F.expr("1000000 * CAST(n AS DECIMAL(38,0)) DIV total"),
                    )
                ),
                F.lit(0),
            ).alias("ppm_b"),
        )
    )
    return (
        shares.filter(F.col("n_a") + F.col("n_b") >= _DRIFT_MIN_COUNT)
        .select(
            F.col("w").alias("token"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.col("ppm_a").cast("bigint").alias("ppm_a"),
            F.col("ppm_b").cast("bigint").alias("ppm_b"),
            F.expr("CAST(ABS(ppm_b - ppm_a) AS BIGINT)").alias(
                "abs_drift_ppm"
            ),
        )
        .orderBy(F.desc("abs_drift_ppm"), "token")
        .limit(_DRIFT_TOP)
    )


# ---------------------------------------------------------------------------
# q167 — integer readability scoring (Flesch-style, libm-free)
# ---------------------------------------------------------------------------
# The readability axis q61's quality gate doesn't measure: sentence length
# and syllable density. Syllables are approximated by maximal vowel runs
# (the classic heuristic); the Flesch reading-ease formula
# 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words) is evaluated
# in exact integer milli-points with truncating division (non-negative
# numerators, so Spark DIV == DuckDB //) — cross-engine bit-identical, no
# floats, no libm. Low scores flag run-on machine-generated text; high
# scores flag fragmentary boilerplate — both curation signals.


@register(
    "q167_readability",
    sql="""
    WITH base AS (
      SELECT doc_id,
             CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_words,
             GREATEST(CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text,
                 '[.!?]', '', 'g')) AS BIGINT), 1) AS n_sentences,
             GREATEST(CAST(LEN(REGEXP_EXTRACT_ALL(LOWER(text),
                 '[aeiouy]+')) AS BIGINT), 1) AS n_syllables
      FROM documents WHERE doc_id < 200 AND LENGTH(text) > 0
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
           CAST(1000 * n_words // n_sentences AS BIGINT)
             AS words_per_sentence_milli,
           CAST(1000 * n_syllables // n_words AS BIGINT)
             AS syllables_per_word_milli,
           CAST(206835 - (1015000 * n_words // n_sentences) // 1000
                       - (84600 * n_syllables) // n_words
                AS BIGINT) AS flesch_milli
    FROM base
    ORDER BY doc_id
    """,
    tags=("text", "quality", "readability"),
)
def q167_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer Flesch-style readability per document: whitespace words
    (q62's convention), sentences counted as terminal-punctuation marks,
    syllables approximated by maximal vowel runs, and the reading-ease
    score in exact milli-points. Everything is integer arithmetic with
    non-negative numerators, so both engines truncate identically and
    the score hash-matches bit-for-bit.

    Scale shape: pure map-side expressions (two regexes + a split per
    document) and no join — the final ORDER BY is the only exchange."""
    d = table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") < 200) & (F.length("text") > 0)
    )
    base = d.select(
        "doc_id",
        F.expr("CAST(SIZE(SPLIT(text, ' ')) AS BIGINT)").alias("n_words"),
        F.expr(
            "GREATEST(CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text,"
            " '[.!?]', '')) AS BIGINT), 1)"
        ).alias("n_sentences"),
        F.expr(
            "GREATEST(CAST(SIZE(REGEXP_EXTRACT_ALL(LOWER(text),"
            " '[aeiouy]+', 0)) AS BIGINT), 1)"
        ).alias("n_syllables"),
    )
    return base.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.expr("CAST(1000 * n_words DIV n_sentences AS BIGINT)").alias(
            "words_per_sentence_milli"
        ),
        F.expr("CAST(1000 * n_syllables DIV n_words AS BIGINT)").alias(
            "syllables_per_word_milli"
        ),
        F.expr(
            "CAST(206835 - (1015000 * n_words DIV n_sentences) DIV 1000"
            " - (84600 * n_syllables) DIV n_words AS BIGINT)"
        ).alias("flesch_milli"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q178 — normalization-aware exact-dedup gain
# ---------------------------------------------------------------------------
# Exact dedup on raw bytes misses trivially reformatted copies (case
# changes, punctuation decoration, whitespace runs) — the cheapest
# duplication class in web corpora. The standard fix is canonicalize-
# then-hash: lowercase, strip non-alphanumerics to spaces, collapse
# runs, trim. Both engines evaluate the identical regex chain (ASCII
# classes only, so Java-regex vs RE2 semantics agree); the query
# reports, per source, how many extra duplicates normalization exposes
# over raw exact dedup — the signal for whether a corpus needs the
# canonical pass before the more expensive near-dup rungs (q51/q53).
SPARK_NORM_TEXT = (
    "TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER({col}),"
    " '[^a-z0-9 ]', ' '), ' +', ' '))"
)
_DUCK_NORM_TEXT = (
    "TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER({col}),"
    " '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"
)


@register(
    "q178_normalized_dedup_gain",
    sql=f"""
    WITH corpus AS (
      SELECT doc_id, text, source FROM documents
      UNION ALL
      SELECT doc_id + 60000000, '** ' || UPPER(text) || ' **', source
      FROM documents WHERE doc_id % 15 = 0
    ), canon AS (
      SELECT source, text,
             {_DUCK_NORM_TEXT.format(col="text")} AS norm_text
      FROM corpus
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT text) AS BIGINT) AS raw_unique,
           CAST(COUNT(DISTINCT norm_text) AS BIGINT) AS norm_unique,
           CAST(COUNT(DISTINCT text) - COUNT(DISTINCT norm_text) AS BIGINT)
             AS dup_gain
    FROM canon
    GROUP BY source
    ORDER BY source
    """,
    tags=("text", "dedup", "normalization"),
)
def q178_normalized_dedup_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source census of duplicates exposed by text canonicalization
    (lowercase → non-alnum to space → collapse runs → trim) that raw
    exact dedup misses, against planted reformatted copies (every 15th
    doc re-added uppercased with punctuation decoration). dup_gain > 0
    is the decision signal to run the canonical pass before hashing.

    Scale shape: the normalization is one map-side expression chain
    (whole-stage codegen, no Python); the census is a per-source
    distinct-count aggregation — the same shuffle as q50's exact-dedup
    shape. The canonical form feeds any downstream hash-keyed dedup
    unchanged."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    decorated = d.filter(F.col("doc_id") % 15 == 0).select(
        (F.col("doc_id") + 60000000).alias("doc_id"),
        F.concat(F.lit("** "), F.upper("text"), F.lit(" **")).alias("text"),
        "source",
    )
    corpus = d.unionByName(decorated)
    canon = corpus.select(
        "source",
        "text",
        F.expr(SPARK_NORM_TEXT.format(col="text")).alias("norm_text"),
    )
    return (
        canon.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("text").cast("bigint").alias("raw_unique"),
            F.countDistinct("norm_text").cast("bigint").alias("norm_unique"),
            (F.countDistinct("text") - F.countDistinct("norm_text"))
            .cast("bigint")
            .alias("dup_gain"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q183 — deterministic weighted sampling (priority sampling by quality)
# ---------------------------------------------------------------------------
# Training-data pipelines sample by weight (quality score, source quota,
# length) far more often than uniformly; q64 covers the uniform hash-mod
# case, this covers the weighted one. Scheme: per-doc priority
# u·SCALE DIV w — an MD5-derived 32-bit uniform divided by the weight,
# take the k smallest. Heavier docs draw proportionally smaller
# priorities, the weighted analog of bottom-k sketching. The key is pure
# integer arithmetic (u·10⁶ < 2⁶³), so both engines agree bit-for-bit —
# the integer-exact stand-in for Efraimidis–Spirakis keys (-ln(u)/w),
# whose ln() last-ulp behavior is not portable across engines.
from ..functions.sampling import (  # noqa: E402
    DEFAULT_SEED as _WS_SEED,
    duckdb_weighted_priority_expr,
)

_WS_K = 50


@register(
    "q183_weighted_sample",
    sql=f"""
    WITH keyed AS (
      SELECT doc_id, source, n_chars AS weight,
             {duckdb_weighted_priority_expr("doc_id", "n_chars")} AS priority
      FROM documents
      WHERE n_chars > 0
    )
    SELECT doc_id, source, weight, priority
    FROM keyed
    ORDER BY priority, doc_id
    LIMIT {_WS_K}
    """,
    tags=("text", "sampling", "weighted"),
)
def q183_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample of k=50 docs, selection probability increasing with
    ``n_chars``: per-doc integer priority = hash-uniform·10⁶ DIV weight,
    keep the k smallest (deterministic tie-break on doc_id).

    Scale shape: the priority is one map-side codegen expression on the
    scan; the top-k compiles to TakeOrderedAndProject (per-partition
    heaps, k rows to the driver, no global sort/shuffle of the corpus) —
    the same plan shape as q26. Changing the weight column (a quality
    model score, a source quota multiplier) changes nothing structural.
    """
    from ..functions.sampling import weighted_bottom_k

    d = table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").alias("weight")
    )
    return weighted_bottom_k(d, _WS_K, "doc_id", "weight", _WS_SEED).select(
        "doc_id", "source", "weight", "priority"
    )


# ---------------------------------------------------------------------------
# q184 — token-mass quantiles (length thresholds by cumulative corpus mass)
# ---------------------------------------------------------------------------
# Doc-count percentiles of length (q75-style profiles) answer "how long is
# the median document"; curation budgeting needs the mass-weighted twin:
# "below what length do 25/50/75 % of the corpus's CHARACTERS sit?" — the
# number that decides truncation caps and packing bucket edges, because
# training cost follows token mass, not document count. Exact integer
# arithmetic: per-(source, length) mass, one cumsum over the distinct
# length support per source, threshold tests as DECIMAL(38,0)/HUGEINT
# products (the round-6 overflow idiom — 100·total_chars at 100 TB sits
# near 2^63 for a big source).


@register(
    "q184_token_mass_quantiles",
    sql="""
    WITH per_len AS (
      SELECT source, n_chars,
             SUM(n_chars) AS mass
      FROM documents
      GROUP BY source, n_chars
    ), cum AS (
      SELECT source, n_chars, mass,
             SUM(mass) OVER (PARTITION BY source ORDER BY n_chars) AS cum_mass
      FROM per_len
    ), totals AS (
      SELECT source,
             SUM(n_chars) AS total_chars,
             COUNT(*) AS n_docs
      FROM documents
      GROUP BY source
    )
    SELECT c.source,
           CAST(MIN(CASE WHEN CAST(c.cum_mass AS HUGEINT) * 100
                              >= 25 * CAST(t.total_chars AS HUGEINT)
                     THEN c.n_chars END) AS BIGINT) AS l25_chars,
           CAST(MIN(CASE WHEN CAST(c.cum_mass AS HUGEINT) * 100
                              >= 50 * CAST(t.total_chars AS HUGEINT)
                     THEN c.n_chars END) AS BIGINT) AS l50_chars,
           CAST(MIN(CASE WHEN CAST(c.cum_mass AS HUGEINT) * 100
                              >= 75 * CAST(t.total_chars AS HUGEINT)
                     THEN c.n_chars END) AS BIGINT) AS l75_chars,
           CAST(ANY_VALUE(t.total_chars) AS BIGINT) AS total_chars,
           CAST(ANY_VALUE(t.n_docs) AS BIGINT) AS n_docs
    FROM cum c JOIN totals t USING (source)
    GROUP BY c.source
    ORDER BY c.source
    """,
    tags=("text", "profile", "quantiles", "mass-weighted"),
)
def q184_token_mass_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per source, the smallest document length at which cumulative
    character mass reaches 25/50/75 % of the source total — the
    mass-weighted length distribution that sets truncation caps and
    packing buckets (cost follows token mass, not doc count).

    Scale shape: one (source, n_chars) partial aggregation, then the
    ordered cumsum runs over the DISTINCT length support per source
    (thousands of rows, not the corpus — the q175/q37s histogram-window
    discipline), and the threshold scan is a grouped MIN over that same
    support. Products are DECIMAL(38,0) (Spark) / HUGEINT (oracle) so a
    100 TB source cannot wrap the 100x mass test.
    """
    d = table(spark, sf_dir, "documents")
    per_len = d.groupBy("source", "n_chars").agg(
        F.sum("n_chars").alias("mass")
    )
    w = Window.partitionBy("source").orderBy("n_chars")
    cum = per_len.withColumn("cum_mass", F.sum("mass").over(w))
    totals = d.groupBy("source").agg(
        F.sum("n_chars").alias("total_chars"),
        F.count(F.lit(1)).alias("n_docs"),
    )

    def thresh(p: int) -> F.Column:
        return F.min(
            F.expr(
                f"CASE WHEN CAST(cum_mass AS DECIMAL(38,0)) * 100"
                f" >= {p} * CAST(total_chars AS DECIMAL(38,0))"
                f" THEN n_chars END"
            )
        ).cast("bigint")

    return (
        cum.join(F.broadcast(totals), "source")
        .groupBy("source")
        .agg(
            thresh(25).alias("l25_chars"),
            thresh(50).alias("l50_chars"),
            thresh(75).alias("l75_chars"),
            F.first("total_chars").cast("bigint").alias("total_chars"),
            F.first("n_docs").cast("bigint").alias("n_docs"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q186 — co-occurrence lift (PMI-style collocation mining)
# ---------------------------------------------------------------------------
# The pair-mining op behind phrase induction and tokenizer-vocab curation:
# which word PAIRS co-occur in the same document far more often than their
# independent document frequencies predict?  q119 scores ADJACENT bigrams;
# this is the document-level twin (unordered pairs, any distance), the
# signal used to pick multi-word vocabulary entries and to audit topical
# contamination between nominally-independent sources.  Lift is reported as
# an exact integer ppm — lift_ppm = 1e6 * P(a,b) / (P(a) P(b)) =
# 1e6 * n_ab * n_docs / (n_a * n_b) — instead of log-PMI, so both engines
# agree bit-for-bit (the log is monotone; ordering and thresholds are
# identical).
_Q186_MIN_DF = 2  # a word must appear in >= this many docs to qualify
_Q186_MIN_COOC = 5  # a pair must co-occur in >= this many docs
_Q186_TOP = 30


@register(
    "q186_cooccurrence_lift",
    sql=f"""
    WITH words AS (
      SELECT DISTINCT doc_id, t AS w
      FROM (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS t
            FROM documents)
      WHERE t <> ''
    ), dfc AS (
      SELECT w, COUNT(*) AS n_w FROM words GROUP BY w
      HAVING COUNT(*) >= {_Q186_MIN_DF}
    ), wq AS (
      SELECT doc_id, w FROM words JOIN dfc USING (w)
    ), total AS (
      SELECT COUNT(*) AS n_docs FROM documents
    ), pc AS (
      SELECT a.w AS w1, b.w AS w2, COUNT(*) AS n_ab
      FROM wq a JOIN wq b ON a.doc_id = b.doc_id AND a.w < b.w
      GROUP BY a.w, b.w
      HAVING COUNT(*) >= {_Q186_MIN_COOC}
    )
    SELECT w1, w2,
           CAST(n_ab AS BIGINT) AS n_ab,
           CAST(d1.n_w AS BIGINT) AS n_w1,
           CAST(d2.n_w AS BIGINT) AS n_w2,
           CAST(CAST(n_ab AS HUGEINT) * n_docs * 1000000
                // (CAST(d1.n_w AS HUGEINT) * d2.n_w) AS BIGINT) AS lift_ppm
    FROM pc
      JOIN dfc d1 ON d1.w = pc.w1
      JOIN dfc d2 ON d2.w = pc.w2
      CROSS JOIN total
    ORDER BY lift_ppm DESC, w1, w2
    LIMIT {_Q186_TOP}
    """,
    tags=("text", "collocation", "pmi", "mining", "exact-integer"),
)
def q186_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top document-level word-pair collocations by exact-integer lift:
    lift_ppm = 1e6·n_ab·n_docs / (n_a·n_b), over pairs of words that each
    appear in >= {_Q186_MIN_DF} docs and co-occur in >= {_Q186_MIN_COOC} —
    the PMI-style collocation miner (log dropped: monotone, so ordering
    and thresholds are unchanged and the integers are portable).

    Scale shape: per-doc DISTINCT runs map-side (array_distinct on the
    split array — no corpus-wide distinct exchange); document frequencies
    are one word-keyed partial agg whose result is Zipf-bounded
    (vocabulary-sized) and broadcast back as the qualification filter, so
    the pair self-join is doc_id-keyed over only QUALIFYING word
    occurrences — per-doc fan-out is O(k²) in the per-doc qualifying
    vocabulary, the standard within-doc pair budget (cap k upstream via a
    df ceiling for stopword-heavy corpora).  Pair counts take map-side
    partial aggregation on (w1, w2); the final lift arithmetic runs on the
    aggregated pair table (vocab², driver-small) with DECIMAL(38,0)/
    HUGEINT products per the overflow idiom — n_ab·n_docs·1e6 wraps BIGINT
    near 1e12 docs.  Top-{_Q186_TOP} is TakeOrderedAndProject.
    """
    d = table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.explode(F.array_distinct(F.split("text", " "))).alias("w"),
    ).filter(F.col("w") != "")
    dfc = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_w"))
        .filter(F.col("n_w") >= _Q186_MIN_DF)
    )
    total = d.agg(F.count(F.lit(1)).alias("n_docs"))
    wq = words.join(F.broadcast(dfc.select("w")), "w")
    pc = (
        wq.select("doc_id", F.col("w").alias("w1"))
        .join(wq.select("doc_id", F.col("w").alias("w2")), "doc_id")
        .filter(F.col("w1") < F.col("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= _Q186_MIN_COOC)
    )
    return (
        pc.join(
            F.broadcast(
                dfc.select(F.col("w").alias("w1"), F.col("n_w").alias("_n1"))
            ),
            "w1",
        )
        .join(
            F.broadcast(
                dfc.select(F.col("w").alias("w2"), F.col("n_w").alias("_n2"))
            ),
            "w2",
        )
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.col("_n1").cast("bigint").alias("n_w1"),
            F.col("_n2").cast("bigint").alias("n_w2"),
            F.expr(
                "CAST(CAST(n_ab AS DECIMAL(38,0)) * n_docs * 1000000"
                " DIV (CAST(_n1 AS DECIMAL(38,0)) * _n2) AS BIGINT)"
            ).alias("lift_ppm"),
        )
        .orderBy(F.desc("lift_ppm"), "w1", "w2")
        .limit(_Q186_TOP)
    )


# ---------------------------------------------------------------------------
# q195 — naive-Bayes source classifier (integer-exact domain scoring)
# ---------------------------------------------------------------------------
# Domain/quality classifiers (CCNet's LM filter, DSIR importance weights,
# fastText domain tagging) are core curation machinery: score every
# document under per-domain token models, route by the best score. The
# multinomial naive-Bayes version needs only corpus counts, and the
# floor-log2 bit-length idiom (q112's policy) keeps the whole score in
# exact BIGINT arithmetic:
#
#   bits(w | s) = bit_length((T_s + V) DIV (c_ws + 1))   # add-one smoothing
#   prior(s)    = bit_length(N_docs DIV n_docs_s)
#   score(d, s) = prior(s) + Σ_occurrences bits(w | s)   # total surprisal
#   pred(d)     = argmin_s score  (ties -> lexicographically first source)
#
# The output is the source confusion matrix — the separability audit that
# tells a pipeline owner whether source labels carry signal worth routing
# on (diagonal mass) or the domains are interchangeable (uniform rows).


@register(
    "q195_nb_source_classifier",
    sql="""
    WITH toks AS (
      SELECT doc_id, source, UNNEST(STRING_SPLIT(text, ' ')) AS w
      FROM documents
    ), toks_f AS (
      SELECT * FROM toks WHERE w <> ''
    ), vocab AS (
      SELECT DISTINCT w FROM toks_f
    ), vsize AS (
      SELECT COUNT(*) AS v FROM vocab
    ), srcs AS (
      SELECT source, COUNT(*) AS t_s, COUNT(DISTINCT doc_id) AS nd_s
      FROM toks_f GROUP BY source
    ), ndocs AS (
      SELECT SUM(nd_s) AS n FROM srcs
    ), cws AS (
      SELECT w, source, COUNT(*) AS c FROM toks_f GROUP BY w, source
    ), grid AS (
      SELECT v.w, s.source,
             LENGTH(BIN((s.t_s + z.v) // (COALESCE(c.c, 0) + 1))) AS bits
      FROM vocab v CROSS JOIN srcs s CROSS JOIN vsize z
        LEFT JOIN cws c ON c.w = v.w AND c.source = s.source
    ), priors AS (
      SELECT s.source, LENGTH(BIN(n.n // s.nd_s)) AS pbits
      FROM srcs s CROSS JOIN ndocs n
    ), scored AS (
      SELECT k.doc_id, ANY_VALUE(k.source) AS true_source, g.source AS cand,
             ANY_VALUE(p.pbits) + SUM(g.bits) AS score
      FROM toks_f k
        JOIN grid g USING (w)
        JOIN priors p ON p.source = g.source
      GROUP BY k.doc_id, g.source
    ), best AS (
      SELECT doc_id, true_source, cand AS pred_source,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score, cand) AS rk
      FROM scored
    )
    SELECT true_source, pred_source, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM best WHERE rk = 1
    GROUP BY true_source, pred_source
    ORDER BY true_source, pred_source
    """,
    tags=("text", "curation", "classifier", "exact-integer"),
)
def q195_nb_source_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive-Bayes source classification, exact-integer (spec
    in the module comment): every document scored under each source's
    add-one-smoothed unigram model in whole bits, routed to the argmin
    total surprisal, reported as the source confusion matrix — the
    domain-separability audit behind classifier-based curation routing.

    Scale shape: q112's three-exchange plumbing widened by the class
    axis. Token counts per (w, source) are one partial-aggregated
    exchange; the (w, source) surprisal grid is vocab × |sources| —
    Zipf-bounded vocab keeps it broadcastable (apply a document-frequency
    floor at open-web scale); scoring joins each occurrence to its
    |sources| grid rows and partially aggregates on (doc, source) before
    the exchange, so the wire carries |docs|·|sources| partial rows, not
    occurrence fan-out. The argmin is a per-doc window over |sources|
    rows; the confusion rollup is trivially small.
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    vocab = toks.select("w").distinct()
    vsize = vocab.agg(F.count(F.lit(1)).alias("v"))
    srcs = toks.groupBy("source").agg(
        F.count(F.lit(1)).alias("t_s"),
        F.countDistinct("doc_id").alias("nd_s"),
    )
    ndocs = srcs.agg(F.sum("nd_s").alias("n"))
    cws = toks.groupBy("w", "source").agg(F.count(F.lit(1)).alias("c"))
    grid = (
        vocab.crossJoin(F.broadcast(srcs))
        .crossJoin(F.broadcast(vsize))
        .join(cws, ["w", "source"], "left")
        .select(
            "w",
            "source",
            F.expr(
                "LENGTH(BIN((t_s + v) DIV (COALESCE(c, 0) + 1)))"
            ).alias("bits"),
        )
    )
    priors = srcs.crossJoin(F.broadcast(ndocs)).select(
        "source", F.expr("LENGTH(BIN(n DIV nd_s))").alias("pbits")
    )
    # collapse to per-doc word counts BEFORE the |sources| fan-out: on a
    # Zipf corpus the (doc, w) table is far smaller than the occurrence
    # stream, so the grid join multiplies distinct words, not tokens
    doc_w = toks.groupBy("doc_id", "w").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.any_value("source").alias("true_source"),
    )
    scored = (
        doc_w.join(grid.withColumnRenamed("source", "cand"), "w")
        .groupBy("doc_id", "cand")
        .agg(
            F.any_value("true_source").alias("true_source"),
            F.sum(F.col("cnt") * F.col("bits")).alias("wbits"),
        )
        .join(F.broadcast(priors.withColumnRenamed("source", "cand")), "cand")
        .withColumn("score", F.col("pbits") + F.col("wbits"))
    )
    w_best = Window.partitionBy("doc_id").orderBy("score", "cand")
    return (
        scored.withColumn("rk", F.row_number().over(w_best))
        .filter(F.col("rk") == 1)
        .groupBy(
            "true_source", F.col("cand").alias("pred_source")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("true_source", "pred_source")
    )


# ---------------------------------------------------------------------------
# q196 — DSIR importance weights (likelihood-ratio data selection)
# ---------------------------------------------------------------------------
# Data Selection via Importance Resampling (DSIR; Xie et al. 2023) ranks
# raw-corpus documents by how much more likely a TARGET-domain n-gram
# model finds them than the raw-corpus model — the standard recipe for
# carving a domain-focused training subset out of a web crawl. The
# unigram, whole-bit version stays in exact BIGINT (q112/q195's policy):
#
#   bits_m(w)     = bit_length((T_m + V) DIV (c_m(w) + 1))    m in {target, raw}
#   ratio_bits(d) = Σ_w cnt_dw · (bits_raw(w) - bits_target(w))
#
# positive = the target model explains the document more cheaply than the
# raw model ⇒ target-like. Output: the top-K most target-like documents.
_Q196_TARGET = "src0"
_Q196_TOP = 50


@register(
    "q196_dsir_weights",
    sql=f"""
    WITH toks AS (
      SELECT doc_id, source, UNNEST(STRING_SPLIT(text, ' ')) AS w
      FROM documents
    ), toks_f AS (
      SELECT * FROM toks WHERE w <> ''
    ), vsize AS (
      SELECT COUNT(DISTINCT w) AS v FROM toks_f
    ), raw_c AS (
      SELECT w, COUNT(*) AS c FROM toks_f GROUP BY w
    ), tgt_c AS (
      SELECT w, COUNT(*) AS c FROM toks_f
      WHERE source = '{_Q196_TARGET}' GROUP BY w
    ), totals AS (
      SELECT (SELECT SUM(c) FROM raw_c) AS t_raw,
             (SELECT COALESCE(SUM(c), 0) FROM tgt_c) AS t_tgt
    ), grid AS (
      SELECT r.w,
             LENGTH(BIN((t.t_raw + z.v) // (r.c + 1)))
               - LENGTH(BIN((t.t_tgt + z.v) // (COALESCE(g.c, 0) + 1)))
               AS dbits
      FROM raw_c r
        LEFT JOIN tgt_c g USING (w)
        CROSS JOIN totals t CROSS JOIN vsize z
    ), doc_w AS (
      SELECT doc_id, w, COUNT(*) AS cnt,
             ANY_VALUE(source) AS source
      FROM toks_f GROUP BY doc_id, w
    ), scored AS (
      SELECT d.doc_id, ANY_VALUE(d.source) AS source,
             CAST(SUM(d.cnt) AS BIGINT) AS n_tokens,
             CAST(SUM(d.cnt * g.dbits) AS BIGINT) AS ratio_bits
      FROM doc_w d JOIN grid g USING (w)
      GROUP BY d.doc_id
    )
    SELECT doc_id, source, n_tokens, ratio_bits
    FROM scored
    ORDER BY ratio_bits DESC, doc_id
    LIMIT {_Q196_TOP}
    """,
    tags=("text", "curation", "dsir", "sampling", "exact-integer"),
)
def q196_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance ranking (spec in the module comment): every
    document scored by the integer-bit likelihood ratio between the
    target-domain unigram model and the raw-corpus model; the top-K most
    target-like documents are the selected subset. The real DSIR
    resamples proportionally to the ratio — the ranking here is its
    deterministic top-K form; swap in q183's bottom-k priority kernel
    with ``ratio_bits`` as the weight for the sampled variant.

    Scale shape: two token-count aggregations (raw and target — the
    target side scans only the target partition), a vocab-sized
    difference grid that broadcasts under any Zipf-bounded vocabulary,
    per-doc word counts collapsed BEFORE the grid join (q195's measured
    win), one doc-keyed partial aggregation, and a top-K that plans as
    TakeOrderedAndProject — no global sort materializes.

    The scoring is the shared `text/dsir.py::ratio_bits` builder, also
    consumed by `select_dsir` (q203) — the API and this audit query
    cannot drift.
    """
    from ..text.dsir import ratio_bits

    d = table(spark, sf_dir, "documents")
    return (
        ratio_bits(d, F.col("source") == _Q196_TARGET)
        .orderBy(F.desc("ratio_bits"), F.asc("doc_id"))
        .limit(_Q196_TOP)
    )


# ---------------------------------------------------------------------------
# q203 — DSIR-sampled selection (importance resampling, replay-stable)
# ---------------------------------------------------------------------------
# q196 ranks; real DSIR RESAMPLES — selection probability increasing in
# the likelihood ratio rather than a deterministic top-K (top-K overfits
# the target's head vocabulary; resampling keeps tail diversity). This is
# the `text/dsir.py::select_dsir` API as a query: q196's integer-bit
# scoring composed with q183's bottom-k priority kernel through a
# rank-preserving global shift (weight = ratio_bits − min + 1, every doc
# sampleable). Both engine sides are generated from the SAME module
# (`select_dsir` / `duckdb_select_dsir_sql`), so the oracle cannot drift
# from the API. Selection is replay-stable: weight is a pure function of
# the corpus, priority of (doc_id, weight, seed).
from ..text.dsir import duckdb_select_dsir_sql as _dsir_sql  # noqa: E402

_Q203_K = 40


@register(
    "q203_dsir_selection",
    sql=_dsir_sql(f"source = '{_Q196_TARGET}'", _Q203_K),
    tags=("text", "curation", "dsir", "sampling", "exact-integer"),
)
def q203_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-sampled selection of k=40 documents, drawn with probability
    increasing in their target-vs-raw likelihood ratio (module comment);
    output carries the full audit trail (n_tokens, ratio_bits, weight,
    priority).

    Scale shape: q196's scoring plan (vocab grid broadcasts, per-doc
    counts collapse before the grid join) plus ONE extra broadcast 1-row
    global-min cross join for the weight shift, then the bottom-k plans
    as TakeOrderedAndProject — per-partition heaps, k rows to the merge,
    no global sort of the corpus at any point.
    """
    from ..text.dsir import select_dsir

    d = table(spark, sf_dir, "documents")
    return select_dsir(d, F.col("source") == _Q196_TARGET, _Q203_K)


# ---------------------------------------------------------------------------
# q211 — training-order interleave census (stride evenness audit)
# ---------------------------------------------------------------------------
# After curation+mixing, the ORDER documents are fed to the trainer in
# matters: a block of one source is ordering bias, and a resumed run
# must see the identical sequence. `text/pipeline.py::
# interleave_for_training` assigns the stride key rank·N DIV n_s (per-
# source seeded-hash rank), which spreads every source evenly across the
# whole order deterministically. This census cuts the order into ten
# equal bands and counts each source per band — the evenness proof: the
# count can deviate from n_s/10 by at most 1 by the stride construction.
_Q211_BANDS = 10


@register(
    "q211_training_interleave",
    sql=f"""
    WITH ranked AS (
      SELECT source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY {duckdb_hash32("CAST(doc_id AS VARCHAR)", "interleave")},
                        doc_id
             ) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS ns
      FROM documents
    ), total AS (
      SELECT COUNT(*) AS n FROM documents
    ), keyed AS (
      SELECT source,
             CAST(CAST(rn AS HUGEINT) * t.n // ns AS BIGINT) AS order_key,
             t.n AS n
      FROM ranked CROSS JOIN total t
    )
    SELECT CAST((order_key - 1) * {_Q211_BANDS} // n AS BIGINT) AS band,
           source,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM keyed
    GROUP BY band, source
    ORDER BY band, source
    """,
    tags=("text", "curation", "ordering", "audit", "exact-integer"),
)
def q211_training_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evenness census of the deterministic training interleave (module
    comment): ten equal bands of the global order × source, with each
    source's count per band pinned to n_s/10 ± 1 by the stride key.

    Scale shape: the per-source rank is a per-source sort — the one
    intentional total-order materialization (run once per corpus
    freeze, same class as the shard writer); the corpus total is a
    broadcast 1-row cross join; the band census is a tiny two-key
    aggregate. The map-side alternative (``mode="hash"``) trades exact
    evenness for zero sorting — documented on the API.
    """
    from ..text.pipeline import interleave_for_training

    d = table(spark, sf_dir, "documents").select("doc_id", "source")
    keyed = interleave_for_training(d)
    total = d.agg(F.count(F.lit(1)).alias("n"))
    return (
        keyed.crossJoin(F.broadcast(total))
        .select(
            F.expr(
                f"CAST((order_key - 1) * {_Q211_BANDS} DIV n AS BIGINT)"
            ).alias("band"),
            "source",
        )
        .groupBy("band", "source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("band", "source")
    )


# ---------------------------------------------------------------------------
# q216 — overlapping passage chunking (fixed window + stride, RAG shape)
# ---------------------------------------------------------------------------
# q93/q86 chunk by CONTENT (CDC boundaries — dedup-stable); retrieval
# and pretraining pipelines also need the other chunking: fixed word
# windows with overlap (window W, stride S < W), so every position has
# context on both sides and no boundary ever severs an answer span.
# Passages are derived data — the query emits (doc, passage_idx, word
# span, portable passage hash) rather than text, which is what an index
# builder actually ships (the text reconstructs from the span). API twin
# `text/pipeline.py::chunk_passages` returns the passages with text for
# downstream embedding.
_Q216_W = 64
_Q216_S = 48
_Q216_DOC_MOD = 20  # census over every 20th doc keeps rows driver-sized


@register(
    "q216_passage_chunks",
    sql=f"""
    WITH docs AS (
      SELECT doc_id, STRING_SPLIT(text, ' ') AS ws
      FROM documents WHERE doc_id % {_Q216_DOC_MOD} = 0
    ), spans AS (
      SELECT doc_id,
             CAST(i AS BIGINT) AS passage_idx,
             1 + i * {_Q216_S} AS w_start,
             LEAST(1 + i * {_Q216_S} + {_Q216_W} - 1, LEN(ws)) AS w_end,
             ws
      FROM (SELECT doc_id, ws,
                   UNNEST(RANGE(0, GREATEST(
                     (LEN(ws) - {_Q216_W} + {_Q216_S} - 1) // {_Q216_S}, 0
                   ) + 1)) AS i
            FROM docs)
    )
    SELECT doc_id, passage_idx,
           CAST(w_start AS BIGINT) AS w_start,
           CAST(w_end - w_start + 1 AS BIGINT) AS n_words,
           {duckdb_hash32("ARRAY_TO_STRING(ws[w_start:w_end], ' ')", "psg")}
             AS passage_hash
    FROM spans
    ORDER BY doc_id, passage_idx
    """,
    tags=("text", "chunking", "rag", "exact-integer"),
)
def q216_passage_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping passage decomposition census (module comment): every
    20th document cut into 64-word windows at stride 48, each passage
    identified by (doc, idx, start, length) and a portable MD5 hash of
    its reconstructed text.

    Scale shape: pure map-side — one SEQUENCE/TRANSFORM explode per
    document (passages ≈ words/stride per doc, bounded fan-out), the
    hash computed on the SLICE without materializing passage text
    downstream; no shuffle until the final presentation sort. The API
    twin (`chunk_passages`) keeps the text column for the embedding
    stage; both share the same window arithmetic so spans can never
    disagree with the index.
    """
    from ..text.pipeline import chunk_passages

    d = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % _Q216_DOC_MOD == 0)
        .select("doc_id", "text")
    )
    p = chunk_passages(d, window=_Q216_W, stride=_Q216_S)
    return (
        p.select(
            "doc_id",
            "passage_idx",
            "w_start",
            "n_words",
            F.expr(spark_hash32("passage_text", "psg")).alias("passage_hash"),
        )
        .orderBy("doc_id", "passage_idx")
    )


# ---------------------------------------------------------------------------
# q218 — passage-level BM25 (the granularity a RAG index actually serves)
# ---------------------------------------------------------------------------
# q103 ranks DOCUMENTS; retrieval stacks index PASSAGES — the answer for
# a query lives in a 64-word span, and document-level tf smears it. Same
# fixed-point BM25 arithmetic as q103 (module comment above it — exact
# integers, no ln), re-keyed on (doc_id, passage_idx) over q216's
# overlapping windows: dl is the passage length, df counts passages, and
# the winning passage localizes the hit to a span the reader model can
# consume. Spark side goes through `text/pipeline.py::chunk_passages`
# (the API is what an index builder calls); the oracle recomputes the
# same spans from the shared window constants.
_Q218_TOP = 10


@register(
    "q218_passage_bm25",
    sql=f"""
    WITH docs AS (
      SELECT doc_id, STRING_SPLIT(text, ' ') AS ws
      FROM documents WHERE doc_id % {_Q216_DOC_MOD} = 0
    ), spans AS (
      SELECT doc_id,
             CAST(i AS BIGINT) AS passage_idx,
             ws[1 + i * {_Q216_S} :
                LEAST(1 + i * {_Q216_S} + {_Q216_W} - 1, LEN(ws))] AS pws
      FROM (SELECT doc_id, ws,
                   UNNEST(RANGE(0, GREATEST(
                     (LEN(ws) - {_Q216_W} + {_Q216_S} - 1) // {_Q216_S}, 0
                   ) + 1)) AS i
            FROM docs)
    ), toks AS (
      SELECT doc_id, passage_idx, UNNEST(pws) AS w FROM spans
    ), dls AS (
      SELECT doc_id, passage_idx, COUNT(*) AS dl
      FROM toks WHERE w <> '' GROUP BY doc_id, passage_idx
    ), corpus AS (
      SELECT COUNT(*) AS n, SUM(dl) AS s FROM dls
    ), tfs AS (
      SELECT doc_id, passage_idx, w AS term, COUNT(*) AS tf
      FROM toks WHERE w IN ({_BM25_SQL_LIST})
      GROUP BY doc_id, passage_idx, w
    ), dfs AS (
      SELECT term, COUNT(*) AS df FROM tfs GROUP BY term
    )
    SELECT t.doc_id, t.passage_idx,
           CAST(SUM(
             ((1000000 * (2*c.n - 2*f.df + 1)) // (2*f.df + 1))
             * ((22000 * c.s * t.tf) // (10*c.s*t.tf + 3*c.s + 9*d.dl*c.n))
           ) AS BIGINT) AS bm25_scaled,
           CAST(COUNT(*) AS BIGINT) AS n_terms_hit
    FROM tfs t
    JOIN dfs f USING (term)
    JOIN dls d USING (doc_id, passage_idx)
    CROSS JOIN corpus c
    GROUP BY t.doc_id, t.passage_idx
    ORDER BY bm25_scaled DESC, t.doc_id, t.passage_idx
    LIMIT {_Q218_TOP}
    """,
    tags=("text", "retrieval", "bm25", "rag", "chunking", "top-k"),
)
def q218_passage_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 passages by fixed-point BM25 against the standing 4-term
    query set — q103's kernel at the granularity a RAG index serves,
    over q216's overlapping 64/48 windows (module comment).

    Scale shape: q103's exact shape with the passage explode fused in
    front — the term filter still runs BEFORE any exchange so only
    matching (passage, term) rows shuffle; passage lengths come from the
    same explode; corpus totals and the |terms|-row df table broadcast;
    top-10 is TakeOrderedAndProject. The overlap factor (W/S = 4/3)
    multiplies token volume by a constant, not a scale term.
    """
    from ..text.pipeline import chunk_passages

    d = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % _Q216_DOC_MOD == 0)
        .select("doc_id", "text")
    )
    p = chunk_passages(d, window=_Q216_W, stride=_Q216_S)
    toks = p.select(
        "doc_id",
        "passage_idx",
        F.explode(F.split("passage_text", " ")).alias("w"),
    ).filter(F.col("w") != "")
    dls = toks.groupBy("doc_id", "passage_idx").agg(
        F.count(F.lit(1)).alias("dl")
    )
    corpus = dls.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").cast("bigint").alias("s")
    )
    tfs = (
        toks.filter(F.col("w").isin(*_BM25_TERMS))
        .groupBy("doc_id", "passage_idx", F.col("w").alias("term"))
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfs = tfs.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf_ppm = F.expr("(1000000 * (2*n - 2*df + 1)) DIV (2*df + 1)")
    sat_k = F.expr("(22000 * s * tf) DIV (10*s*tf + 3*s + 9*dl*n)")
    return (
        tfs.join(F.broadcast(dfs), "term")
        .join(dls, ["doc_id", "passage_idx"])
        .crossJoin(F.broadcast(corpus))
        .groupBy("doc_id", "passage_idx")
        .agg(
            F.sum(idf_ppm * sat_k).cast("bigint").alias("bm25_scaled"),
            F.count(F.lit(1)).cast("bigint").alias("n_terms_hit"),
        )
        .orderBy(F.desc("bm25_scaled"), "doc_id", "passage_idx")
        .limit(_Q218_TOP)
    )


# ---------------------------------------------------------------------------
# q219 — source-fair quality thresholds (global vs per-source percentile)
# ---------------------------------------------------------------------------
# A single global quality cutoff starves whole sources: code and chat
# score short, prose scores long, and "drop the bottom 30 % by length"
# quietly deletes the bottom 80 % of one domain and 5 % of another. The
# calibration census: the exact 30th-percentile length cutoff computed
# GLOBALLY and PER SOURCE (both via the q184 discipline — cumsum over
# the distinct length support, never a corpus sort), and per source how
# many documents each policy keeps. The gap column is the argument for
# rank-normalizing quality scores within source before any global gate.
_Q219_PCT = 30  # drop the bottom 30 %


@register(
    "q219_source_fair_threshold",
    sql=f"""
    WITH support AS (
      SELECT source, n_chars, COUNT(*) AS c
      FROM documents GROUP BY source, n_chars
    ), per_src AS (
      SELECT source, n_chars, c,
             SUM(c) OVER (PARTITION BY source ORDER BY n_chars) AS cum_s,
             SUM(c) OVER (PARTITION BY source) AS n_s
      FROM support
    ), src_cut AS (
      SELECT source,
             MIN(CASE WHEN cum_s * 100 >= {_Q219_PCT} * n_s
                      THEN n_chars END) AS cut_src
      FROM per_src GROUP BY source
    ), glob_support AS (
      SELECT n_chars, SUM(c) AS c FROM support GROUP BY n_chars
    ), glob_cum AS (
      SELECT n_chars,
             SUM(c) OVER (ORDER BY n_chars) AS cum_g,
             SUM(c) OVER () AS n_g
      FROM glob_support
    ), glob_cut AS (
      SELECT MIN(CASE WHEN cum_g * 100 >= {_Q219_PCT} * n_g
                      THEN n_chars END) AS cut_glob
      FROM glob_cum
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(ANY_VALUE(g.cut_glob) AS BIGINT) AS cut_global,
           CAST(ANY_VALUE(s.cut_src) AS BIGINT) AS cut_source,
           CAST(SUM(CASE WHEN d.n_chars >= g.cut_glob THEN 1 ELSE 0 END)
                AS BIGINT) AS kept_global,
           CAST(SUM(CASE WHEN d.n_chars >= s.cut_src THEN 1 ELSE 0 END)
                AS BIGINT) AS kept_fair,
           CAST(SUM(CASE WHEN d.n_chars >= s.cut_src THEN 1 ELSE 0 END)
                - SUM(CASE WHEN d.n_chars >= g.cut_glob THEN 1 ELSE 0 END)
                AS BIGINT) AS fairness_gap
    FROM documents d
      JOIN src_cut s ON s.source = d.source
      CROSS JOIN glob_cut g
    GROUP BY d.source
    ORDER BY d.source
    """,
    tags=("text", "curation", "quality", "calibration", "exact-integer"),
)
def q219_source_fair_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source keep counts under a GLOBAL 30th-percentile length
    cutoff vs a PER-SOURCE one (module comment): the fairness gap a
    rank-normalized gate closes.

    Scale shape: percentile cutoffs come from cumsums over the DISTINCT
    length support per source / globally (thousands of rows, never a
    corpus sort — q184's discipline); the tiny cutoff tables broadcast
    back onto one corpus scan; the census is one per-source partial
    aggregation.
    """
    d = table(spark, sf_dir, "documents").select("source", "n_chars")
    support = d.groupBy("source", "n_chars").agg(F.count(F.lit(1)).alias("c"))
    w_cum = Window.partitionBy("source").orderBy("n_chars")
    w_src = Window.partitionBy("source")
    per_src = support.withColumn("cum_s", F.sum("c").over(w_cum)).withColumn(
        "n_s", F.sum("c").over(w_src)
    )
    src_cut = per_src.groupBy("source").agg(
        F.min(
            F.when(
                F.col("cum_s") * 100 >= _Q219_PCT * F.col("n_s"),
                F.col("n_chars"),
            )
        ).alias("cut_src")
    )
    glob_support = support.groupBy("n_chars").agg(F.sum("c").alias("c"))
    w_g = Window.partitionBy(F.lit(1)).orderBy("n_chars")
    glob_cut = (
        glob_support.crossJoin(
            F.broadcast(glob_support.agg(F.sum("c").alias("n_g")))
        )
        .withColumn("cum_g", F.sum("c").over(w_g))
        .agg(
            F.min(
                F.when(
                    F.col("cum_g") * 100 >= _Q219_PCT * F.col("n_g"),
                    F.col("n_chars"),
                )
            ).alias("cut_glob")
        )
    )
    kept_g = F.when(F.col("n_chars") >= F.col("cut_glob"), 1).otherwise(0)
    kept_s = F.when(F.col("n_chars") >= F.col("cut_src"), 1).otherwise(0)
    return (
        d.join(F.broadcast(src_cut), "source")
        .crossJoin(F.broadcast(glob_cut))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.any_value("cut_glob").cast("bigint").alias("cut_global"),
            F.any_value("cut_src").cast("bigint").alias("cut_source"),
            F.sum(kept_g).cast("bigint").alias("kept_global"),
            F.sum(kept_s).cast("bigint").alias("kept_fair"),
            (F.sum(kept_s) - F.sum(kept_g)).cast("bigint").alias("fairness_gap"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q221 — source signature terms (per-source lift over the corpus share)
# ---------------------------------------------------------------------------
# Curation debugging's first question about an opaque source is "what
# IS this" — answered by the terms most over-represented in it relative
# to the corpus: lift_ppm = (c_st / T_s) / (c_gt / T_g) in exact integer
# ppm (the q186 idiom applied source-vs-corpus instead of pair-vs-
# independence). A support floor keeps one-off typos out; the top-5
# per source come off a rank window over the qualified (source, term)
# table, which is vocabulary-sized, never corpus-sized.
_Q221_MIN_COUNT = 8
_Q221_TOP = 5


@register(
    "q221_source_signature_terms",
    sql=f"""
    WITH toks AS (
      SELECT source, UNNEST(STRING_SPLIT(text, ' ')) AS w
      FROM documents
    ), toks_f AS (
      SELECT * FROM toks WHERE w <> ''
    ), st AS (
      SELECT source, w, COUNT(*) AS c_st FROM toks_f GROUP BY source, w
    ), s_tot AS (
      SELECT source, SUM(c_st) AS t_s FROM st GROUP BY source
    ), gt AS (
      SELECT w, SUM(c_st) AS c_gt FROM st GROUP BY w
    ), g_tot AS (
      SELECT SUM(c_st) AS t_g FROM st
    ), lifted AS (
      SELECT st.source, st.w,
             CAST(st.c_st AS BIGINT) AS c_src,
             CAST(gt.c_gt AS BIGINT) AS c_corpus,
             CAST(CAST(st.c_st AS HUGEINT) * g.t_g * 1000000
                  // (CAST(gt.c_gt AS HUGEINT) * s.t_s) AS BIGINT)
               AS lift_ppm
      FROM st
        JOIN gt USING (w)
        JOIN s_tot s USING (source)
        CROSS JOIN g_tot g
      WHERE st.c_st >= {_Q221_MIN_COUNT}
    )
    SELECT source, w AS term, c_src, c_corpus, lift_ppm,
           CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY source ORDER BY lift_ppm DESC, w) AS rnk
      FROM lifted)
    WHERE rnk <= {_Q221_TOP}
    ORDER BY source, rnk
    """,
    tags=("text", "curation", "profile", "exact-integer"),
)
def q221_source_signature_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 most over-represented terms per source by exact integer
    lift ppm with a support floor (module comment).

    Scale shape: one (source, term) partial aggregation off the token
    explode; the global term table re-aggregates THAT (vocabulary-sized
    exchange, the q195 collapse discipline); source totals and the
    corpus total broadcast; the rank window runs over the qualified
    vocabulary table only. HUGEINT/DECIMAL(38,0) products — c_st·T_g
    wraps BIGINT once the corpus passes ~10⁹ tokens.
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    st = toks.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c_st"))
    s_tot = st.groupBy("source").agg(F.sum("c_st").alias("t_s"))
    gt = st.groupBy("w").agg(F.sum("c_st").alias("c_gt"))
    g_tot = st.agg(F.sum("c_st").alias("t_g"))
    lifted = (
        st.filter(F.col("c_st") >= _Q221_MIN_COUNT)
        .join(gt, "w")
        .join(F.broadcast(s_tot), "source")
        .crossJoin(F.broadcast(g_tot))
        .select(
            "source",
            "w",
            F.col("c_st").cast("bigint").alias("c_src"),
            F.col("c_gt").cast("bigint").alias("c_corpus"),
            F.expr(
                "CAST(CAST(c_st AS DECIMAL(38,0)) * t_g * 1000000"
                " DIV (CAST(c_gt AS DECIMAL(38,0)) * t_s) AS BIGINT)"
            ).alias("lift_ppm"),
        )
    )
    w_rank = Window.partitionBy("source").orderBy(
        F.desc("lift_ppm"), F.asc("w")
    )
    return (
        lifted.withColumn("rnk", F.row_number().over(w_rank).cast("bigint"))
        .filter(F.col("rnk") <= _Q221_TOP)
        .select(
            "source", F.col("w").alias("term"),
            "c_src", "c_corpus", "lift_ppm", "rnk",
        )
        .orderBy("source", "rnk")
    )


# ---------------------------------------------------------------------------
# q233 — temperature-sampled source budget allocation (largest remainder)
# ---------------------------------------------------------------------------
# The mixing weights that q83 (fixed rates) and q88 (fixed quotas)
# ENFORCE have to come from somewhere: multilingual/multi-source
# training mixes allocate the budget proportionally to token-mass^alpha
# (alpha=0.5 here — the standard sampling temperature that up-weights
# small sources), with Hamilton's largest-remainder rounding so the
# integer allocations sum exactly to the budget. Every step is integer
# arithmetic or a correctly-rounded sqrt of an integer — portable.

_Q233_BUDGET = 1000


@register(
    "q233_source_budget_allocation",
    sql=f"""
    WITH per_src AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ), w AS (
      SELECT source, n_docs, n_tokens,
             CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS weight
      FROM per_src
    ), t AS (
      SELECT *, SUM(weight) OVER () AS tot_w,
             ({_Q233_BUDGET} * weight) // SUM(weight) OVER () AS base,
             ({_Q233_BUDGET} * weight) % SUM(weight) OVER () AS rem
      FROM w
    ), r AS (
      SELECT *, {_Q233_BUDGET} - SUM(base) OVER () AS spare,
             ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rr
      FROM t
    )
    SELECT source, n_docs, n_tokens, weight,
           CAST(base + CASE WHEN rr <= spare THEN 1 ELSE 0 END AS BIGINT)
             AS alloc_docs
    FROM r ORDER BY source
    """,
    tags=("text", "sources", "sampling", "training-data"),
)
def q233_source_budget_allocation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Temperature (α=0.5) source allocation with largest-remainder
    rounding (`text/pipeline.py::allocate_source_budget`): the quota
    table a source-balanced training mix enforces downstream
    (q83/q88/q211). One corpus scan folds to |sources| rows; the
    remainder ranking runs on that broadcast-sized table. Allocations
    are integers summing exactly to the budget — drill-pinned — and
    every step is portable integer math, so the oracle hash freezes the
    allocation itself."""
    from ..text.pipeline import allocate_source_budget

    d = table(spark, sf_dir, "documents")
    return allocate_source_budget(d, _Q233_BUDGET)
