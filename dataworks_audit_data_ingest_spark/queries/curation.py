"""Corpus-curation operators a large-scale training-data pipeline needs
beyond dedup: PII redaction, repetition-based quality filtering, benchmark
decontamination, and deterministic source mixing (north-star extensions —
the reference has no text notion; its payloads are opaque blobs,
`audit_data_ingest.py:118-120`).

The fixture corpus is clean word-soup, so (like queries/dedup.py) the
queries plant deterministic contamination/PII in-query and must find
exactly it — making every operator oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import duckdb_hash32, spark_hash32
from ..tables import spread, table
from .base import register

# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Same regexes on both engines (Java regex and RE2 agree on this subset).
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE_RE = "555-[0-9]{4}"


@register(
    "q80_pii_redaction",
    sql=f"""
    WITH seeded AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % 7 = 0
                  THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                  WHEN doc_id % 11 = 0
                  THEN text || ' call 555-' || LPAD(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  ELSE text END AS text
      FROM documents
    ), redacted AS (
      SELECT doc_id, source, text,
             REGEXP_REPLACE(REGEXP_REPLACE(text, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                            '{_PHONE_RE}', '[PHONE]', 'g') AS clean
      FROM seeded
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN text LIKE '%@example.com%' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_email_docs,
           CAST(SUM(CASE WHEN clean LIKE '%[PHONE]%' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_phone_docs,
           CAST(SUM(LENGTH(text) - LENGTH(clean)) AS BIGINT) AS chars_removed
    FROM redacted
    GROUP BY source
    ORDER BY source
    """,
    tags=("curation", "pii", "regex"),
)
def q80_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: plant synthetic emails/phone numbers, strip them with
    the standard regex pass, report per-source counts and bytes removed.

    At 100 TB this is a pure map stage (regexp_replace is JVM codegen —
    no Python, no shuffle before the final small agg)."""
    d = table(spark, sf_dir, "documents")
    seeded = d.select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com"),
            ),
        )
        .when(
            F.col("doc_id") % 11 == 0,
            F.concat(
                F.col("text"),
                F.lit(" call 555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    redacted = seeded.withColumn(
        "clean",
        F.regexp_replace(
            F.regexp_replace("text", _EMAIL_RE, "[EMAIL]"), _PHONE_RE, "[PHONE]"
        ),
    )
    return (
        redacted.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("text").contains("@example.com"), 1).otherwise(0)
            ).alias("n_email_docs"),
            F.sum(F.when(F.col("clean").contains("[PHONE]"), 1).otherwise(0)).alias(
                "n_phone_docs"
            ),
            F.sum(F.length("text") - F.length("clean")).alias("chars_removed"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Repetition-based quality (Gopher-style rules)
# ---------------------------------------------------------------------------

_TOP_WORD_MAX = 0.12  # drop if the most frequent word exceeds this fraction
_DUP_WORD_MAX = 0.70  # drop if 1 - distinct/total exceeds this


@register(
    "q81_repetition_quality",
    sql=f"""
    WITH words AS (
      SELECT doc_id, source, UNNEST(STRING_SPLIT(text, ' ')) AS w
      FROM documents
    ), wc AS (
      SELECT doc_id, source, w, COUNT(*) AS c
      FROM words GROUP BY doc_id, source, w
    ), per_doc AS (
      SELECT doc_id, source,
             CAST(SUM(c) AS BIGINT) AS total,
             CAST(MAX(c) AS BIGINT) AS top_c,
             COUNT(*) AS n_distinct
      FROM wc GROUP BY doc_id, source
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN CAST(top_c AS DOUBLE) / total > {_TOP_WORD_MAX}
                           OR 1.0 - CAST(n_distinct AS DOUBLE) / total > {_DUP_WORD_MAX}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
           CAST(SUM(CASE WHEN CAST(top_c AS DOUBLE) / total > {_TOP_WORD_MAX}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_top_word_fail,
           CAST(SUM(CASE WHEN 1.0 - CAST(n_distinct AS DOUBLE) / total > {_DUP_WORD_MAX}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_word_fail
    FROM per_doc
    GROUP BY source
    ORDER BY source
    """,
    tags=("curation", "quality", "repetition"),
)
def q81_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality gate (Gopher-style): a document fails when
    its most frequent word exceeds 12% of tokens or its duplicate-word
    fraction exceeds 70%. Reported as per-source drop counts.

    Scale shape (optimization round 12): all three per-doc statistics are
    computed MAP-SIDE from the word array — ``total`` = SIZE, ``n_distinct``
    = SIZE∘ARRAY_DISTINCT, and ``top_c`` (max word multiplicity) as the max
    run length of the sorted array via one AGGREGATE fold. The former
    explode → groupBy(doc, word) → groupBy(doc) pipeline shuffled one row
    per distinct (doc, word); this shape shuffles nothing until the tiny
    per-source rollup (guide §2.4 "remove shuffles outright"). Equivalence:
    max multiplicity == longest equal-run in the sorted array; the
    text-IS-NOT-NULL filter reproduces explode's null-row drop exactly.
    Interleaved low-steal A/B at sf0.1: med 0.82 s vs 0.88 s plain, and the
    (doc, word) exchange is gone from the plan (3 shuffles → 2)."""
    d = table(spark, sf_dir, "documents")
    per_doc = (
        # spread: the per-doc array work otherwise runs in the single-task
        # fixture scan.
        spread(d.filter(F.col("text").isNotNull()), sf_dir, "doc_id")
        .select("source", F.split("text", " ").alias("ws"))
        .select(
            "source",
            F.expr(
                "AGGREGATE(ARRAY_SORT(ws),"
                " NAMED_STRUCT('prev', CAST(NULL AS STRING), 'run', 0L, 'best', 0L),"
                " (acc, w) -> NAMED_STRUCT("
                "   'prev', w,"
                "   'run', IF(acc.prev IS NOT NULL AND w = acc.prev, acc.run + 1L, 1L),"
                "   'best', GREATEST(acc.best, IF(acc.prev IS NOT NULL AND w = acc.prev, acc.run + 1L, 1L))),"
                " acc -> acc.best) AS top_c"
            ),
            F.expr("CAST(SIZE(ws) AS BIGINT) AS total"),
            F.expr("CAST(SIZE(ARRAY_DISTINCT(ws)) AS BIGINT) AS n_distinct"),
        )
    )
    top_fail = (F.col("top_c").cast("double") / F.col("total")) > _TOP_WORD_MAX
    dup_fail = (
        F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("total")
    ) > _DUP_WORD_MAX
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


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------

_NGRAM = 8  # word n-gram length for contamination matching
_BENCH_MOD = 97  # doc_id % 97 == 0 plays the held-out benchmark set
_SEED_MOD = 50  # doc_id % 50 == 3 get benchmark text planted (observability)


@register(
    "q82_decontamination",
    sql=f"""
    WITH probe AS (
      SELECT ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[1:{_NGRAM}], ' ') AS g0
      FROM documents WHERE doc_id = 0
    ), seeded AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % {_SEED_MOD} = 3 AND doc_id % {_BENCH_MOD} <> 0
                  THEN text || ' ' || g0 ELSE text END AS text
      FROM documents CROSS JOIN probe
    ), words AS (
      SELECT doc_id, source, STRING_SPLIT(text, ' ') AS ws
      FROM seeded
      WHERE LEN(STRING_SPLIT(text, ' ')) >= {_NGRAM}
    ), grams AS (
      SELECT DISTINCT doc_id, source,
             ARRAY_TO_STRING(ws[i:i+{_NGRAM - 1}], ' ') AS gram
      FROM (SELECT doc_id, source, ws,
                   UNNEST(RANGE(1, LEN(ws) - {_NGRAM - 2})) AS i
            FROM words)
    ), bench AS (
      SELECT DISTINCT gram FROM grams WHERE doc_id % {_BENCH_MOD} = 0
    ), contaminated AS (
      SELECT DISTINCT g.doc_id, g.source
      FROM grams g SEMI JOIN bench b ON g.gram = b.gram
      WHERE g.doc_id % {_BENCH_MOD} <> 0
    )
    SELECT d.source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_contaminated
    FROM documents d LEFT JOIN contaminated c ON d.doc_id = c.doc_id
    GROUP BY d.source
    ORDER BY d.source
    """,
    tags=("curation", "decontamination", "ngram"),
)
def q82_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any word
    8-gram with a held-out benchmark set (docs with doc_id % 97 == 0 play
    the benchmark; docs with doc_id % 50 == 3 get a benchmark 8-gram
    planted so the detector is observable on the clean fixture). The
    standard pre-training hygiene pass.

    Scale shape: the benchmark gram set is tiny relative to the corpus —
    broadcast semi-join against it; corpus grams stream through one
    projection straight into the map-side semi-join, nothing corpus-sized
    ever shuffles on the gram key. Each side filters to its own docs
    BEFORE exploding (the benchmark slice is ~1/97 of the corpus, so the
    expensive gram explode runs once over each doc, not twice), and dedup
    happens per consumer where it is cheap: the benchmark grams (tiny)
    dedup before broadcast, hits dedup on doc_id only — never the full
    exploded gram stream."""
    d = table(spark, sf_dir, "documents")
    probe = (
        d.filter(F.col("doc_id") == 0)
        .select(
            F.expr(
                f"ARRAY_JOIN(SLICE(SPLIT(text, ' '), 1, {_NGRAM}), ' ')"
            ).alias("g0")
        )
    )
    seeded = d.join(F.broadcast(probe)).select(
        "doc_id",
        "source",
        F.when(
            (F.col("doc_id") % _SEED_MOD == 3) & (F.col("doc_id") % _BENCH_MOD != 0),
            F.concat_ws(" ", F.col("text"), F.col("g0")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )

    def _grams(docs: DataFrame) -> DataFrame:
        # Split once into a materialized column: the previous form re-ran
        # SPLIT(text) inside the TRANSFORM lambda, i.e. once per gram
        # position — O(words²) splits per document (guide §1.2: fix the
        # per-task work). CollapseProject keeps the multiply-referenced,
        # non-cheap `ws` alias as its own projection, so the split really
        # happens once per row.
        ws = docs.select(
            "doc_id", "source", F.split("text", " ").alias("ws")
        ).filter(F.size("ws") >= _NGRAM)
        return ws.select(
            "doc_id",
            "source",
            F.explode(
                F.expr(
                    f"TRANSFORM(SEQUENCE(1, SIZE(ws) - {_NGRAM - 1}), "
                    f"i -> ARRAY_JOIN(SLICE(ws, i, {_NGRAM}), ' '))"
                )
            ).alias("gram"),
        )

    bench = (
        _grams(seeded.filter(F.col("doc_id") % _BENCH_MOD == 0))
        .select("gram")
        .distinct()
    )
    contaminated = (
        # spread: the corpus-side 8-gram explode is ~97/98ths of the work
        # and otherwise runs inside the single-task fixture scan.
        _grams(spread(seeded.filter(F.col("doc_id") % _BENCH_MOD != 0), sf_dir, "doc_id"))
        .join(F.broadcast(bench), "gram", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        # contaminated is ~|docs|/SEED_MOD rows of one bigint — broadcast it
        # so the corpus side of this left join is never exchanged (was a
        # SortMergeJoin that shuffled+sorted all of `documents`).
        d.join(F.broadcast(contaminated), "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_contaminated"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Deterministic source mixing
# ---------------------------------------------------------------------------


@register(
    "q83_source_mixing",
    sql=f"""
    WITH rated AS (
      SELECT doc_id, source, lang, n_chars,
             CASE WHEN source IN ('src0', 'src1') THEN 10000
                  WHEN lang = 'en' THEN 5000
                  ELSE 2500 END AS rate_bp,
             {duckdb_hash32("CAST(doc_id AS VARCHAR)", "mix")} % 10000 AS u
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN u < rate_bp THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN u < rate_bp THEN n_chars ELSE 0 END) AS BIGINT)
             AS chars_kept
    FROM rated
    GROUP BY source
    ORDER BY source
    """,
    tags=("curation", "sampling", "mixing"),
)
def q83_source_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic source-mixing sampler: per-source/lang target rates
    (prio sources 100%, English 50%, rest 25%) applied via a portable
    MD5-uniform on doc_id — the same doc survives on every engine and every
    re-run, the property a reproducible training-data pipeline needs.

    Scale shape: pure map + one small agg; the sample decision never
    shuffles and the rate table is a CASE expression (broadcast-free)."""
    d = table(spark, sf_dir, "documents")
    rated = d.select(
        "source",
        "n_chars",
        F.when(F.col("source").isin("src0", "src1"), 10000)
        .when(F.col("lang") == "en", 5000)
        .otherwise(2500)
        .alias("rate_bp"),
        (
            F.expr(spark_hash32("CAST(doc_id AS STRING)", "mix")) % 10000
        ).alias("u"),
    )
    kept = F.col("u") < F.col("rate_bp")
    return (
        rated.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(kept, F.col("n_chars")).otherwise(0)).alias("chars_kept"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Sequence packing
# ---------------------------------------------------------------------------

_PACK_BUDGET = 512  # tokens per training sequence


@register(
    "q85_sequence_packing",
    sql=f"""
    WITH toks AS (
      SELECT doc_id,
             LEN(STRING_SPLIT(text, ' ')) AS n_tok,
             {duckdb_hash32("CAST(doc_id AS VARCHAR)", "pack")} AS h
      FROM documents
    ), placed AS (
      SELECT doc_id, n_tok,
             SUM(n_tok) OVER (ORDER BY h, doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum
      FROM toks
    ), assigned AS (
      SELECT doc_id, n_tok,
             CAST(FLOOR(CAST(cum - n_tok AS DOUBLE) / {_PACK_BUDGET}) AS BIGINT)
               AS seq_id
      FROM placed
    )
    SELECT seq_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS seq_tokens,
           MIN(doc_id) AS first_doc
    FROM assigned
    GROUP BY seq_id
    ORDER BY seq_id
    """,
    tags=("curation", "packing", "window"),
)
def q85_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: lay documents end-to-end in a deterministic
    (portable-hash) order and assign each to the fixed-budget training
    sequence its start offset falls in — the packing step that turns a
    curated corpus into fixed-length pretraining rows.

    This query pins the exact-global form (one running-sum window — single
    task at the limit, like q16/q37); the production form is
    ``text.pipeline.pack_sequences``, which packs within hash-buckets so
    every window is bucket-local. Assignment-by-start-offset means a doc
    can straddle a boundary — downstream either splits it across the two
    sequences or pads, a tokenizer-side decision."""
    d = table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    toks = d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tok"),
        F.expr(spark_hash32("CAST(doc_id AS STRING)", "pack")).alias("h"),
    )
    w = Window.orderBy("h", "doc_id").rowsBetween(Window.unboundedPreceding, 0)
    placed = toks.withColumn("cum", F.sum("n_tok").over(w))
    assigned = placed.withColumn(
        "seq_id",
        F.floor((F.col("cum") - F.col("n_tok")).cast("double") / _PACK_BUDGET).cast(
            "bigint"
        ),
    )
    return (
        assigned.groupBy("seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("seq_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("seq_id")
    )


# ---------------------------------------------------------------------------
# Per-source quota sampling
# ---------------------------------------------------------------------------

_QUOTA_N = 10  # max docs kept per source


@register(
    "q88_source_quota",
    sql=f"""
    SELECT doc_id, source, pick_rank FROM (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY {duckdb_hash32("CAST(doc_id AS VARCHAR)", "quota")},
                        doc_id
             ) AS pick_rank
      FROM documents)
    WHERE pick_rank <= {_QUOTA_N}
    ORDER BY source, pick_rank
    """,
    tags=("curation", "sampling", "quota"),
)
def q88_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota sampling: keep at most N documents per source,
    chosen by a deterministic portable hash — the "no single domain may
    dominate the mix" cap every web-scale training corpus applies (the
    complement of q83's proportional mixing: q83 sets the ratio, this
    bounds the absolute head).

    Hash-ordered selection makes the sample uniform-without-replacement,
    reproducible across runs/engines, and incremental-friendly (a doc's
    keep/drop fate never depends on which other docs are present until the
    quota boundary).

    Scale shape: one shuffle keyed by source, partial top-N per map task
    via the window rank. For sources with billions of docs the exact
    window sort degenerates to a per-key global sort; the production
    escape hatch is the two-pass hash-threshold pre-thin implemented in
    ``text.pipeline.cap_per_source(prethin=True)`` (per-source threshold
    t = 2^32·target/n broadcast to a MAP-SIDE h < t filter, exact rank
    over the ~target survivors, verify-and-fallback for binomial
    undershoot) — output-identical, equivalence-pinned by
    ``tests/test_text_pipeline.py``. The exact window form here is the
    oracle pin."""
    d = table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(
        F.expr(spark_hash32("CAST(doc_id AS STRING)", "quota")), F.asc("doc_id")
    )
    return (
        d.select("doc_id", "source")
        .withColumn("pick_rank", F.row_number().over(w))
        .filter(F.col("pick_rank") <= _QUOTA_N)
        .orderBy("source", "pick_rank")
    )


# ---------------------------------------------------------------------------
# Blocklist decontamination with a Bloom pre-filter
# ---------------------------------------------------------------------------

_BLOCK_MOD = 31  # doc_id % 31 == 0 plays the opt-out/takedown blocklist
_PLANT_MOD = 23  # doc_id % 23 == 7 get the probe text planted (observability)


@register(
    "q96_bloom_blocklist",
    sql=f"""
    WITH probe AS (
      SELECT text AS ptext FROM documents WHERE doc_id = 0
    ), seeded AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % {_PLANT_MOD} = 7 AND doc_id % {_BLOCK_MOD} <> 0
                  THEN ptext ELSE text END AS text
      FROM documents CROSS JOIN probe
    ), blocklist AS (
      SELECT DISTINCT MD5(text) AS fp FROM seeded WHERE doc_id % {_BLOCK_MOD} = 0
    ), corpus AS (
      SELECT doc_id, source, MD5(text) AS fp, LENGTH(text) AS n_chars
      FROM seeded WHERE doc_id % {_BLOCK_MOD} <> 0
    ), hits AS (
      SELECT DISTINCT doc_id FROM corpus SEMI JOIN blocklist USING (fp)
    )
    SELECT c.source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_blocked,
           CAST(SUM(CASE WHEN h.doc_id IS NOT NULL THEN c.n_chars ELSE 0 END)
                AS BIGINT) AS chars_blocked
    FROM corpus c LEFT JOIN hits h ON c.doc_id = h.doc_id
    GROUP BY c.source
    ORDER BY c.source
    """,
    tags=("curation", "decontamination", "bloom"),
)
def q96_bloom_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist decontamination via a broadcast Bloom pre-filter: drop
    corpus documents whose content fingerprint appears in an opt-out /
    takedown blocklist (docs with doc_id % 31 == 0 play the blocklist;
    docs with doc_id % 23 == 7 get a blocklisted text planted so the
    detector is observable on the clean fixture).

    The operator q82 cannot become at scale: q82 broadcasts the raw
    benchmark grams, which stops working when the key set has billions of
    entries. Here the blocklist aggregates into a FIXED-SIZE Bloom bitmap
    (``functions.bloom.build_bloom_bitmap`` — one bit_or aggregation,
    shuffle bounded by tasks x m/64 words regardless of key count), the
    8 KiB bitmap rides into the corpus scan as a constant-folded array
    literal, and the overwhelming majority of rows dies MAP-SIDE on the
    membership test (shift/and arithmetic inside codegen, no UDF). Only
    the Bloom-positive sliver (true hits + the configured FP rate) enters
    the exact semi-join, whose verify step makes the composition
    row-identical to the plain join — no false negatives, so the DuckDB
    oracle is the plain exact join. The 100 TB decontamination shape.
    """
    d = table(spark, sf_dir, "documents")
    from ..functions.bloom import bloom_might_contain, build_bloom_bitmap

    probe = d.filter(F.col("doc_id") == 0).select(F.col("text").alias("ptext"))
    seeded = d.join(F.broadcast(probe)).select(
        "doc_id",
        "source",
        F.when(
            (F.col("doc_id") % _PLANT_MOD == 7) & (F.col("doc_id") % _BLOCK_MOD != 0),
            F.col("ptext"),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    blocklist = (
        seeded.filter(F.col("doc_id") % _BLOCK_MOD == 0)
        .select(F.md5("text").alias("fp"))
        .distinct()
    )
    corpus = seeded.filter(F.col("doc_id") % _BLOCK_MOD != 0).select(
        "doc_id", "source", F.md5("text").alias("fp"), F.length("text").alias("n_chars")
    )
    bitmap = build_bloom_bitmap(blocklist, "fp")
    hits = (
        corpus.filter(bloom_might_contain("fp", bitmap))
        .join(blocklist, "fp", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        corpus.join(hits, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_blocked"),
            F.sum(
                F.when(F.col("hit").isNotNull(), F.col("n_chars")).otherwise(0)
            ).alias("chars_blocked"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q108 — train/eval split-leakage audit
# ---------------------------------------------------------------------------
# Composes q104's deterministic hash split with the SimHash signature
# family (queries/dedup.py): an eval document whose 32-bit signature
# collides with any training document is flagged as leaked — the audit a
# training pipeline runs AFTER splitting, complementing q82's
# benchmark-side decontamination (there the contaminant set is external;
# here it is the pipeline's own train split).
from .dedup import _simhash_sig_ctes as _sig_ctes  # noqa: E402
from .dedup import _spark_simhash_sigs as _spark_sigs  # noqa: E402

_SPLIT_CASE = (
    "CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' "
    "ELSE 'test' END"
)


@register(
    "q108_split_leakage",
    sql=f"""{_sig_ctes()}
    , splits AS (
      SELECT doc_id,
             {_SPLIT_CASE.replace("bucket", f"({duckdb_hash32('CAST(doc_id AS VARCHAR)', seed='split')} % 100)")} AS split
      FROM documents
    ), tagged AS (
      SELECT s.doc_id, g.simhash, s.split
      FROM splits s JOIN sigs g USING (doc_id)
    ), per_sig AS (
      SELECT simhash,
             COUNT(CASE WHEN split = 'train' THEN 1 END) AS n_train,
             COUNT(CASE WHEN split = 'val' THEN 1 END) AS n_val,
             COUNT(CASE WHEN split = 'test' THEN 1 END) AS n_test,
             MIN(CASE WHEN split <> 'train' THEN doc_id END) AS min_eval_doc
      FROM tagged GROUP BY simhash
    )
    SELECT 'val' AS split,
           CAST(COALESCE(SUM(n_val), 0) AS BIGINT) AS n_leaked_docs,
           CAST(COUNT(*) AS BIGINT) AS n_leaky_sigs,
           CAST(MIN(min_eval_doc) AS BIGINT) AS example_doc
    FROM per_sig WHERE n_train > 0 AND n_val > 0
    UNION ALL
    SELECT 'test' AS split,
           CAST(COALESCE(SUM(n_test), 0) AS BIGINT) AS n_leaked_docs,
           CAST(COUNT(*) AS BIGINT) AS n_leaky_sigs,
           CAST(MIN(min_eval_doc) AS BIGINT) AS example_doc
    FROM per_sig WHERE n_train > 0 AND n_test > 0
    ORDER BY split
    """,
    tags=("curation", "decontamination", "split", "simhash"),
)
def q108_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per eval split, how many documents are near-duplicates (identical
    32-bit SimHash) of a training document — plus how many distinct
    signature clusters leak and one example doc id to inspect.

    Scale shape: signatures come from the shared simhash kernel (explode →
    doc-keyed partial agg); the split tag is map-side hash arithmetic on
    doc_id (zero extra shuffle — it rides the signature rows). The audit
    itself is one signature-keyed aggregation counting each split's docs
    per signature, then a 3-row rollup: no pairwise join materializes, so
    a signature shared by 10^6 train docs and one test doc costs one
    counter, not 10^6 pairs. At 100 TB this is strictly cheaper than the
    dedup queries it reuses. Widening to Hamming<=k leakage swaps the
    exact-signature groupBy for q52b's pigeonhole band join."""
    d = table(spark, sf_dir, "documents")
    sigs = _spark_sigs(d.select("doc_id", "text"))
    bucket_sql = f"({spark_hash32('CAST(doc_id AS STRING)', seed='split')} % 100)"
    splits = d.select(
        "doc_id",
        F.expr(_SPLIT_CASE.replace("bucket", bucket_sql)).alias("split"),
    )
    tagged = splits.join(sigs, "doc_id")
    per_sig = tagged.groupBy("simhash").agg(
        F.count(F.when(F.col("split") == "train", 1)).alias("n_train"),
        F.count(F.when(F.col("split") == "val", 1)).alias("n_val"),
        F.count(F.when(F.col("split") == "test", 1)).alias("n_test"),
        F.min(F.when(F.col("split") != "train", F.col("doc_id"))).alias(
            "min_eval_doc"
        ),
    )

    def leak_row(split: str):
        f = per_sig.filter((F.col("n_train") > 0) & (F.col(f"n_{split}") > 0))
        return f.agg(
            F.lit(split).alias("split"),
            F.coalesce(F.sum(f"n_{split}"), F.lit(0)).cast("bigint").alias(
                "n_leaked_docs"
            ),
            F.count(F.lit(1)).cast("bigint").alias("n_leaky_sigs"),
            F.min("min_eval_doc").cast("bigint").alias("example_doc"),
        )

    return leak_row("test").unionAll(leak_row("val")).orderBy("split")


# ---------------------------------------------------------------------------
# q113 — data-quality expectation suite
# ---------------------------------------------------------------------------
# The contract gate a pipeline runs on every batch before publishing
# (functions/expectations.py — Deequ's idea, one aggregation pass for the
# whole suite). The registered form pins the documents table's contract;
# the suite is data, so a real deployment loads it from config.
from ..functions import expectations as EX  # noqa: E402

_Q113_LANGS = ("de", "en", "es", "fr", "zh")


@register(
    "q113_data_expectations",
    sql=f"""
    WITH agg AS (
      SELECT
        COUNT(CASE WHEN doc_id IS NULL THEN 1 END) AS v_not_null,
        COUNT(doc_id) - COUNT(DISTINCT doc_id) AS v_unique,
        COUNT(CASE WHEN n_chars NOT BETWEEN 1 AND 10000000 THEN 1 END) AS v_range,
        COUNT(CASE WHEN NOT (n_chars = LENGTH(text)) THEN 1 END) AS v_consistent,
        COUNT(CASE WHEN lang NOT IN ({", ".join(f"'{x}'" for x in _Q113_LANGS)}) THEN 1 END) AS v_lang,
        COUNT(CASE WHEN NOT REGEXP_MATCHES(source, '^[a-z0-9_.-]+$') THEN 1 END) AS v_source
      FROM documents
    )
    SELECT expectation, n_violations, n_violations = 0 AS passed
    FROM (
      SELECT 'chars_match_text' AS expectation, CAST(v_consistent AS BIGINT) AS n_violations FROM agg
      UNION ALL SELECT 'in_range(n_chars,1,10000000)', CAST(v_range AS BIGINT) FROM agg
      UNION ALL SELECT 'in_set(lang)', CAST(v_lang AS BIGINT) FROM agg
      UNION ALL SELECT 'not_null(doc_id)', CAST(v_not_null AS BIGINT) FROM agg
      UNION ALL SELECT 'source_slug', CAST(v_source AS BIGINT) FROM agg
      UNION ALL SELECT 'unique(doc_id)', CAST(v_unique AS BIGINT) FROM agg
    )
    ORDER BY expectation
    """,
    tags=("curation", "quality", "expectations", "contract"),
)
def q113_data_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents table's publish contract, checked in one pass: key
    integrity, metadata/payload consistency, closed vocabularies, and
    value ranges — the report a batch pipeline gates its snapshot commit
    on (compose with ``SnapshotTable``: commit only if every row passes).

    Scale shape: all six rules fold into ONE aggregation job —
    map-side partial counters per task, a single-row reduction, then a
    literal-sized unpivot. The lone key-wide piece is unique(doc_id)'s
    distinct (expand + two-phase agg, still the same single pass); the
    module docstring documents the HLL swap when even that is too much."""
    d = table(spark, sf_dir, "documents")
    return EX.check_expectations(
        d,
        [
            EX.not_null("doc_id"),
            EX.unique("doc_id"),
            EX.in_range("n_chars", 1, 10_000_000),
            EX.satisfies("n_chars = LENGTH(text)", name="chars_match_text"),
            EX.in_set("lang", _Q113_LANGS),
            EX.matches("source", "^[a-z0-9_.-]+$", name="source_slug"),
        ],
    )


@register(
    "q130_source_overlap_matrix",
    sql=f"""{_sig_ctes()}
    , tagged AS (
      SELECT g.simhash, d.source
      FROM sigs g JOIN documents d USING (doc_id)
    ), per_sig AS (
      SELECT simhash, source, COUNT(*) AS c
      FROM tagged GROUP BY simhash, source
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(SUM(a.c * b.c) AS BIGINT) AS n_cross_pairs,
           CAST(COUNT(*) AS BIGINT) AS n_shared_sigs
    FROM per_sig a JOIN per_sig b
      ON a.simhash = b.simhash AND a.source < b.source
    GROUP BY a.source, b.source
    ORDER BY n_cross_pairs DESC, source_a, source_b
    """,
    tags=("curation", "dedup", "provenance", "simhash"),
)
def q130_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which source pairs share near-duplicate content: for every pair of
    sources, the number of cross-source near-dup document pairs
    (identical 32-bit SimHash) and how many distinct signature clusters
    they share — the provenance diagnostic that tells a curation team
    where scraped mirrors and syndicated feeds overlap BEFORE choosing
    which source to keep in `mix_sources`.

    Scale shape: signatures from the shared simhash kernel; the matrix
    comes from joining per-(signature, source) COUNTS with themselves on
    the signature — a signature's cost is |sources-present|², bounded by
    the source vocabulary, never by document volume (the doc×doc product
    is factored into c_a·c_b exactly, same counting trick as q108).
    Output rows are |sources|² at most."""
    d = table(spark, sf_dir, "documents")
    sigs = _spark_sigs(d.select("doc_id", "text"))
    per_sig = (
        sigs.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("simhash", "source")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    a = per_sig.alias("a")
    b = per_sig.alias("b")
    return (
        a.join(
            b,
            (F.col("a.simhash") == F.col("b.simhash"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b")
        )
        .agg(
            # DECIMAL(38,0) sum: a boilerplate signature shared by two
            # huge sources makes c_a·c_b ~ |src|², and the pair total can
            # pass BIGINT where Spark wraps silently but the oracle's SUM
            # promotes to HUGEINT (q92/q93 class); decimal stays exact
            F.sum(
                F.expr("CAST(a.c AS DECIMAL(38,0)) * b.c")
            ).cast("bigint").alias("n_cross_pairs"),
            F.count(F.lit(1)).cast("bigint").alias("n_shared_sigs"),
        )
        .orderBy(F.desc("n_cross_pairs"), "source_a", "source_b")
    )


# ---------------------------------------------------------------------------
# q144 — temperature mixture allocation (largest-remainder seats)
# ---------------------------------------------------------------------------
# `text/pipeline.py::temperature_allocation` under the oracle: rebalance
# the source distribution at temperature T=0.5 (weights ∝ √count — the
# multilingual-corpus flattening move) and hand out EXACTLY `total`
# integer seats by the largest-remainder method. Portable because √ is
# correctly-rounded IEEE, the weight sum runs in DECIMAL (order-free),
# and remainder ties break on the source name.
_MIX_TOTAL = 300


@register(
    "q144_temperature_mixture",
    sql=f"""
    WITH counts AS (
      SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
    ), weighted AS (
      SELECT source, n_docs, SQRT(CAST(n_docs AS DOUBLE)) AS w FROM counts
    ), sums AS (
      SELECT CAST(SUM(CAST(w AS DECIMAL(28,18))) AS DOUBLE) AS s,
             COUNT(*) AS k
      FROM weighted
    ), quoted AS (
      SELECT source, n_docs,
             {_MIX_TOTAL} * w / s AS quota,
             CAST(FLOOR({_MIX_TOTAL} * w / s) AS BIGINT) AS fl,
             {_MIX_TOTAL} * w / s - FLOOR({_MIX_TOTAL} * w / s) AS frac
      FROM weighted, sums
    ), ranked AS (
      SELECT source, n_docs, fl, frac,
             ROW_NUMBER() OVER (ORDER BY frac DESC, source) AS rk,
             SUM(fl) OVER () AS fsum
      FROM quoted
    )
    SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(fl + CASE WHEN rk <= {_MIX_TOTAL} - fsum THEN 1 ELSE 0 END
                AS BIGINT) AS alloc,
           (fl + CASE WHEN rk <= {_MIX_TOTAL} - fsum THEN 1 ELSE 0 END)
             > n_docs AS oversampled
    FROM ranked
    ORDER BY source
    """,
    tags=("curation", "mixing", "allocation"),
)
def q144_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-0.5 source-mixing allocation
    (`text/pipeline.py::temperature_allocation`): per-source integer seat
    counts ∝ √(docs) that sum to exactly {total} via largest-remainder
    rounding, with the oversampling flag (alloc > inventory ⇒ the loader
    repeats that source rather than the corpus growing).

    Scale shape: one map-combined count shuffle to |sources| rows; all
    allocation arithmetic happens on that broadcast-sized table — free at
    any corpus size. The only window is over |sources| rows."""
    from ..text.pipeline import temperature_allocation

    d = table(spark, sf_dir, "documents")
    return temperature_allocation(d, _MIX_TOTAL, temperature=0.5).orderBy("source")


# ---------------------------------------------------------------------------
# q164 — model-quality scorecard (ECE + sharpness, one row)
# ---------------------------------------------------------------------------
# q129 prints the calibration TABLE; operations wants one NUMBER to alarm
# on. Expected calibration error = the band-size-weighted mean gap between
# a band's predicted confidence (its normalized score midpoint) and its
# observed keep rate, in exact integer milli; sharpness = the spread of
# band keep-rates (max − min) — a calibrated-but-flat model scores well on
# ECE and uselessly on sharpness, so the pair is the scorecard. Same
# feature/score/band definitions as q109/q129, character for character.


@register(
    "q164_model_ece",
    sql="""
    WITH feats AS (
      SELECT doc_id,
             LEN(STRING_SPLIT(text, ' ')) AS n_tokens,
             LEN(LIST_FILTER(STRING_SPLIT(text, ' '), w -> w IN ('the', 'a', 'of', 'to', 'and', 'in', 'is', 'on'))) AS n_stop,
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
    ), banded AS (
      SELECT score // 50000 AS band, COUNT(*) AS n,
             SUM(hand_keep) AS k,
             (1000 * SUM(hand_keep)) // COUNT(*) AS actual_milli,
             -- predicted confidence: band midpoint of the normalized
             -- score range observed across bands (min..max -> 0..1000)
             1000 * (score // 50000 * 50000 + 25000
                     - MIN(score // 50000 * 50000) OVER ())
               // NULLIF((MAX(score // 50000 * 50000) OVER ())
                         + 50000
                         - (MIN(score // 50000 * 50000) OVER ()), 0)
               AS pred_milli
      FROM scored
      GROUP BY score // 50000
    )
    SELECT CAST(SUM(n) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_bands,
           CAST(SUM(n * ABS(pred_milli - actual_milli)) // SUM(n) AS BIGINT)
             AS ece_milli,
           CAST(MAX(actual_milli) - MIN(actual_milli) AS BIGINT)
             AS sharpness_milli
    FROM banded
    """,
    tags=("ml", "calibration", "ece", "monitoring"),
)
def q164_model_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row model scorecard for the q109 quality model: expected
    calibration error (band-weighted |predicted − observed| keep rate,
    milli) and sharpness (spread of band keep-rates) — the alarmable
    pair that summarizes q129's calibration table (calibrated-but-flat
    fails sharpness; sharp-but-miscalibrated fails ECE). All integer
    arithmetic, same score/band definitions as q109/q129.

    Scale shape: one scan + a band rollup (≤ ~20 groups) + window over
    the band table — the scorecard is free at any corpus size."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    feats = d.select(
        "doc_id",
        F.expr("SIZE(SPLIT(text, ' '))").alias("n_tokens"),
        F.expr(
            "SIZE(FILTER(SPLIT(text, ' '), w -> w IN "
            "('the', 'a', 'of', 'to', 'and', 'in', 'is', 'on')))"
        ).alias("n_stop"),
        F.expr("SIZE(FILTER(SPLIT(text, ' '), w -> LENGTH(w) >= 6))").alias(
            "n_long"
        ),
    ).filter(F.col("n_tokens") > 0)
    scored = feats.select(
        F.expr(
            "200000 + 900 * LEAST(n_tokens, 400) "
            "- ABS(1000000 * n_stop DIV n_tokens - 300000) DIV 2 "
            "+ (1000000 * n_long DIV n_tokens) DIV 4"
        ).alias("score"),
        F.expr(
            "CASE WHEN n_tokens >= 40 AND 1000000 * n_stop DIV n_tokens "
            "BETWEEN 10000 AND 500000 THEN 1 ELSE 0 END"
        ).alias("hand_keep"),
    )
    banded = scored.groupBy(F.expr("score DIV 50000").alias("band")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("hand_keep").alias("k"),
        F.expr("(1000 * SUM(hand_keep)) DIV COUNT(*)").alias("actual_milli"),
    )
    w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    banded = banded.withColumn("lo", F.min(F.expr("band * 50000")).over(w)).withColumn(
        "hi", F.max(F.expr("band * 50000")).over(w)
    ).withColumn(
        "pred_milli",
        F.expr(
            "1000 * (band * 50000 + 25000 - lo) "
            "DIV NULLIF(hi + 50000 - lo, 0)"
        ),
    )
    return banded.agg(
        F.sum("n").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_bands"),
        F.expr(
            "CAST(SUM(n * ABS(pred_milli - actual_milli)) DIV SUM(n) AS BIGINT)"
        ).alias("ece_milli"),
        F.expr(
            "CAST(MAX(actual_milli) - MIN(actual_milli) AS BIGINT)"
        ).alias("sharpness_milli"),
    )


# ---------------------------------------------------------------------------
# q181 — semantic decontamination (q82's embedding-space twin)
# ---------------------------------------------------------------------------
# Lexical decontamination (q82) only catches verbatim/near-verbatim
# benchmark leakage; paraphrased eval items survive gram overlap but sit
# next to the benchmark in embedding space. The semantic rung: broadcast
# the (small) benchmark embedding set against the corpus scan and flag
# any training vector whose max cosine against ANY benchmark vector
# clears the threshold. vec_id < 25 plays the benchmark; contaminated
# copies are planted in-query (scale*1.02 + 0.01 per dim, cosine ~0.997
# vs a natural corpus max of ~0.49 on these fixtures) so the flagged set
# is exact and oracle-checkable.
_SEM_BENCH_N = 25  # vec_id < 25 = the benchmark/eval embedding set
_SEM_PLANT_OFFSET = 3_000_000
_SEM_THRESH = 0.98


def _semantic_decontam_sql() -> str:
    from .dedup import _DOT_DEC

    return f"""
    WITH base AS (
      SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ), bench AS (
      SELECT vec_id AS bench_id, emb AS eb FROM base
      WHERE vec_id < {_SEM_BENCH_N}
    ), corpus AS (
      SELECT vec_id AS cand_id, emb AS ec FROM base
      WHERE vec_id >= {_SEM_BENCH_N}
      UNION ALL
      SELECT bench_id + {_SEM_PLANT_OFFSET} AS cand_id,
             LIST_TRANSFORM(eb, x -> x * CAST(1.02 AS DOUBLE)
                                      + CAST(0.01 AS DOUBLE)) AS ec
      FROM bench WHERE bench_id % 5 = 0
    ), pairs AS (
      SELECT c.cand_id, b.bench_id, c.ec, b.eb
      FROM corpus c CROSS JOIN bench b
    ), idx AS (
      SELECT cand_id, bench_id, ec, eb,
             UNNEST(RANGE(1, LEN(ec) + 1)) AS i
      FROM pairs
    ), scored AS (
      SELECT cand_id, bench_id,
             CAST(SUM(CAST(ec[i] * eb[i] AS {_DOT_DEC})) AS DOUBLE)
               / (SQRT(CAST(SUM(CAST(ec[i] * ec[i] AS {_DOT_DEC})) AS DOUBLE))
                  * SQRT(CAST(SUM(CAST(eb[i] * eb[i] AS {_DOT_DEC})) AS DOUBLE)))
               AS cosine
      FROM idx GROUP BY cand_id, bench_id
    ), ranked AS (
      SELECT cand_id, bench_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY cand_id
                                ORDER BY cosine DESC, bench_id) AS rnk
      FROM scored
    )
    SELECT cand_id, bench_id, ROUND(cosine, 6) AS score
    FROM ranked WHERE rnk = 1 AND cosine >= {_SEM_THRESH}
    ORDER BY cand_id
    """


@register(
    "q181_semantic_decontamination",
    sql=_semantic_decontam_sql(),
    tags=("curation", "decontamination", "semantic", "embeddings"),
)
def q181_semantic_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag training vectors semantically too close to the benchmark set:
    max-cosine vs all benchmark embeddings >= 0.98, reported as
    (cand_id, bench_id of the nearest benchmark item, rounded cosine).
    Planted paraphrase-shaped copies of every 5th benchmark vector must
    be exactly the flagged set.

    Scale shape: the benchmark side is broadcast (eval sets are
    thousands of rows; the corpus is the 100 TB side), so the scan
    streams map-side with zero shuffle until the per-candidate max — a
    keyed partial aggregation. The decimal-exact dot products make the
    threshold decision identical on both engines; at production scale
    swap the exact scan for the IVF route (q56) with the same threshold
    as a prefilter and exact rerank."""
    from .dedup import _DOT_DEC, spark_cosine

    e = table(spark, sf_dir, "embeddings")
    base = e.select(
        "vec_id",
        F.expr("TRANSFORM(embedding, x -> CAST(x AS DOUBLE))").alias("emb"),
    )
    bench = base.filter(F.col("vec_id") < _SEM_BENCH_N).select(
        F.col("vec_id").alias("bench_id"), F.col("emb").alias("eb")
    )
    planted = bench.filter(F.col("bench_id") % 5 == 0).select(
        (F.col("bench_id") + _SEM_PLANT_OFFSET).alias("cand_id"),
        F.expr("TRANSFORM(eb, x -> x * CAST(1.02 AS DOUBLE) + CAST(0.01 AS DOUBLE))").alias("ec"),
    )
    corpus = (
        base.filter(F.col("vec_id") >= _SEM_BENCH_N)
        .select(F.col("vec_id").alias("cand_id"), F.col("emb").alias("ec"))
        .unionByName(planted)
    )
    scored = corpus.join(F.broadcast(bench)).select(
        "cand_id",
        "bench_id",
        F.expr(spark_cosine("ec", "eb")).alias("cosine"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("cand_id").orderBy(
        F.desc("cosine"), F.asc("bench_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter((F.col("rnk") == 1) & (F.col("cosine") >= _SEM_THRESH))
        .select("cand_id", "bench_id", F.round("cosine", 6).alias("score"))
        .orderBy("cand_id")
    )


# ---------------------------------------------------------------------------
# q185 — packing-waste audit by length bucket
# ---------------------------------------------------------------------------
# q85 packs sequences greedily; this is the PLANNING query that runs
# before it: bucket documents by power-of-two length class, compute how
# many fixed-size contexts each (source, bucket) needs under
# same-bucket packing, and the padding waste that choice locks in —
# the number that decides bucket edges and whether a source needs
# chunking (oversize) or concatenation (tiny docs) first. Everything is
# integer arithmetic (CEIL division via (n + cap - 1) DIV cap; waste in
# ppm), so both engines agree exactly; the bucket ladder is an explicit
# CASE, not float LOG2, whose boundary behavior is not portable.
_PACK_CTX = 2048  # context size in chars (the packing budget)
_PACK_BUCKETS = (64, 128, 256, 512, 1024, 2048)


def _bucket_case(col: str) -> str:
    branches = " ".join(
        f"WHEN {col} <= {b} THEN {b}" for b in _PACK_BUCKETS
    )
    return f"CASE {branches} END"


@register(
    "q185_packing_waste",
    sql=f"""
    WITH sized AS (
      SELECT source, n_chars, {_bucket_case("n_chars")} AS bucket
      FROM documents
      WHERE n_chars > 0
    ), packable AS (
      SELECT source, bucket,
             COUNT(*) AS n_docs,
             SUM(n_chars) AS sum_chars
      FROM sized
      WHERE bucket IS NOT NULL
      GROUP BY source, bucket
    ), planned AS (
      SELECT source, bucket, n_docs, sum_chars,
             {_PACK_CTX} // bucket AS docs_per_ctx,
             (n_docs + ({_PACK_CTX} // bucket) - 1) // ({_PACK_CTX} // bucket)
               AS n_contexts
      FROM packable
    )
    SELECT source,
           CAST(bucket AS BIGINT) AS bucket,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_contexts AS BIGINT) AS n_contexts,
           CAST((CAST(n_contexts AS HUGEINT) * {_PACK_CTX} - sum_chars)
                * 1000000
                // (CAST(n_contexts AS HUGEINT) * {_PACK_CTX}) AS BIGINT)
             AS waste_ppm
    FROM planned
    ORDER BY source, bucket
    """,
    tags=("curation", "packing", "audit"),
)
def q185_packing_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (source, power-of-two length bucket): documents, fixed-size
    contexts needed under same-bucket packing (capacity = ctx DIV
    bucket, contexts = ceil-div), and locked-in padding waste in ppm —
    the planning audit that sets bucket edges before q85 packs.
    Docs longer than the context (bucket NULL) are excluded here; they
    need chunking upstream, and the fixtures contain none.

    Scale shape: one map-side CASE ladder on the existing scan, one
    (source, bucket) partial aggregation — the same shuffle as q50; the
    waste arithmetic runs on the aggregated rows (sources × buckets,
    driver-tiny). DECIMAL/HUGEINT products per the overflow idiom: a
    100 TB source's n_contexts·ctx·10⁶ exceeds BIGINT.
    """
    d = table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    sized = d.select(
        "source",
        "n_chars",
        F.expr(_bucket_case("n_chars")).alias("bucket"),
    ).filter(F.col("bucket").isNotNull())
    packable = sized.groupBy("source", "bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )
    planned = packable.withColumn(
        "docs_per_ctx", F.expr(f"{_PACK_CTX} DIV bucket")
    ).withColumn(
        "n_contexts", F.expr("(n_docs + docs_per_ctx - 1) DIV docs_per_ctx")
    )
    return planned.select(
        "source",
        F.col("bucket").cast("bigint").alias("bucket"),
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("n_contexts").cast("bigint").alias("n_contexts"),
        F.expr(
            f"CAST((CAST(n_contexts AS DECIMAL(38,0)) * {_PACK_CTX} - sum_chars)"
            f" * 1000000"
            f" DIV (CAST(n_contexts AS DECIMAL(38,0)) * {_PACK_CTX}) AS BIGINT)"
        ).alias("waste_ppm"),
    ).orderBy("source", "bucket")


# ---------------------------------------------------------------------------
# q193 — cross-document boilerplate line removal (CCNet-style)
# ---------------------------------------------------------------------------
# Web-crawl corpora carry template lines (nav bars, cookie banners,
# copyright footers) repeated across thousands of pages; CCNet-style
# curation drops any LINE whose document frequency crosses a threshold and
# reassembles each document from its surviving lines in order. The fixture
# has no natural newlines, so the corpus plants deterministic header/footer
# boilerplate on arithmetic subsets — the operator itself is generic.
_BP_HEADER = "subscribe to our newsletter for weekly updates"
_BP_FOOTER = "all rights reserved contact the site administrator"
_BP_MIN_DOCS = 20  # line df >= 20 distinct docs -> boilerplate


def _bp_corpus_case() -> tuple[str, str]:
    """(header, footer) CASE expressions — identical SQL text on both
    engines; CONCAT_WS skips NULL args in Spark and DuckDB alike."""
    return (
        f"CASE WHEN doc_id % 3 = 0 THEN '{_BP_HEADER}' END",
        f"CASE WHEN doc_id % 2 = 0 THEN '{_BP_FOOTER}' END",
    )


@register(
    "q193_boilerplate_lines",
    sql=f"""
    WITH corpus AS (
      SELECT doc_id,
             CONCAT_WS(CHR(10), {_bp_corpus_case()[0]}, text,
                       {_bp_corpus_case()[1]}) AS raw
      FROM documents
    ), split AS (
      SELECT doc_id, STRING_SPLIT(raw, CHR(10)) AS lines FROM corpus
    ), positioned AS (
      SELECT doc_id, lines, UNNEST(RANGE(1, LEN(lines) + 1)) AS i FROM split
    ), lined AS (
      SELECT doc_id, i, lines[i] AS line FROM positioned
    ), bp AS (
      SELECT line FROM lined
      GROUP BY line HAVING COUNT(DISTINCT doc_id) >= {_BP_MIN_DOCS}
    ), kept AS (
      SELECT l.doc_id, l.i, l.line FROM lined l
      ANTI JOIN bp ON l.line = bp.line
    ), rebuilt AS (
      SELECT doc_id, COUNT(*) AS n_kept,
             STRING_AGG(line, CHR(10) ORDER BY i) AS clean
      FROM kept GROUP BY doc_id
    ), stats AS (
      SELECT doc_id, COUNT(*) AS n_lines FROM lined GROUP BY doc_id
    )
    SELECT s.doc_id,
           CAST(s.n_lines AS BIGINT) AS n_lines,
           CAST(s.n_lines - COALESCE(r.n_kept, 0) AS BIGINT) AS n_dropped,
           {duckdb_hash32("COALESCE(r.clean, '')", "bp")} AS clean_hash
    FROM stats s LEFT JOIN rebuilt r USING (doc_id)
    WHERE s.n_lines - COALESCE(r.n_kept, 0) > 0
    ORDER BY s.doc_id
    """,
    tags=("curation", "boilerplate", "dedup", "lines"),
)
def q193_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style boilerplate line removal: any line appearing in >=
    {_BP_MIN_DOCS} distinct documents is template noise; each affected
    document is reassembled from its surviving lines IN ORDER and reported
    with a portable hash of the cleaned text (the hash pins that
    reconstruction preserves line order exactly — a shuffled rebuild
    hash-mismatches).

    Scale shape: line document-frequency is one (line)-keyed partial
    aggregation (map-side combine collapses each doc's repeats first);
    the boilerplate set is tiny by construction (df >= threshold) so the
    removal anti-join broadcasts it; reassembly is one doc-keyed
    aggregation whose per-group payload is the document's own line count
    (array_sort over collected (pos, line) structs — no global sort). At
    100 TB, hash lines (hash64) before the df count so the exchange
    carries 8-byte keys, not full line text; the q86 chunk-store pattern
    makes the df table incremental across crawls.
    """
    header, footer = _bp_corpus_case()
    d = table(spark, sf_dir, "documents")
    corpus = d.selectExpr(
        "doc_id",
        f"CONCAT_WS(CHR(10), {header}, text, {footer}) AS raw",
    )
    lined = corpus.select(
        "doc_id",
        F.posexplode(F.split("raw", "\n")).alias("i0", "line"),
    ).select("doc_id", (F.col("i0") + 1).alias("i"), "line")
    bp = (
        lined.groupBy("line")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= _BP_MIN_DOCS)
        .select("line")
    )
    kept = lined.join(F.broadcast(bp), "line", "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.expr("TRANSFORM(ARRAY_SORT(COLLECT_LIST(STRUCT(i, line))), x -> x.line)"),
            "\n",
        ).alias("clean"),
    )
    stats = lined.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_lines"))
    return (
        stats.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_lines").cast("bigint").alias("n_lines"),
            (F.col("n_lines") - F.coalesce("n_kept", F.lit(0)))
            .cast("bigint")
            .alias("n_dropped"),
            F.expr(spark_hash32("COALESCE(clean, '')", "bp")).alias(
                "clean_hash"
            ),
        )
        .filter(F.col("n_dropped") > 0)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q197 — k-anonymity / generalization audit (privacy release gate)
# ---------------------------------------------------------------------------
# Before a dataset leaves the pipeline (vendor handoff, eval release, the
# GDPR-forget sink's cousin), the privacy question is structural: how many
# rows sit in quasi-identifier equivalence classes smaller than k, and
# does one generalization step fix them? Quasi-identifiers here are
# (nation, market segment); the sensitive attribute is the account-balance
# band (a CASE ladder over integer cents — portable, no float division,
# no negative-DIV divergence); generalization suppresses the segment.
# l-diversity counts distinct sensitive bands per class — a class can be
# large yet leak if every member shares one band.
_Q197_K = 10
_Q197_BAND = (
    "CASE WHEN cents < 0 THEN 'neg'"
    " WHEN cents < 500000 THEN 'low' ELSE 'high' END"
)
_Q197_CENTS = "CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)"


@register(
    "q197_k_anonymity",
    sql=f"""
    WITH base AS (
      SELECT CAST(c_nationkey AS BIGINT) AS nation_key,
             c_mktsegment AS segment,
             {_Q197_CENTS} AS cents
      FROM customer
    ), banded AS (
      SELECT nation_key, segment, {_Q197_BAND} AS band FROM base
    ), classes AS (
      SELECT nation_key, segment,
             COUNT(*) AS k0,
             COUNT(DISTINCT band) AS l0
      FROM banded GROUP BY nation_key, segment
    ), generalized AS (
      SELECT nation_key, COUNT(*) AS k1
      FROM banded GROUP BY nation_key
    )
    SELECT c.nation_key, c.segment,
           CAST(c.k0 AS BIGINT) AS k0,
           CAST(c.l0 AS BIGINT) AS l0,
           CAST(g.k1 AS BIGINT) AS k1,
           CAST(CASE WHEN c.k0 < {_Q197_K} THEN 1 ELSE 0 END AS BIGINT)
             AS at_risk,
           CAST(CASE WHEN c.k0 < {_Q197_K} AND g.k1 >= {_Q197_K}
                     THEN 1 ELSE 0 END AS BIGINT) AS fixed_by_generalizing
    FROM classes c JOIN generalized g USING (nation_key)
    ORDER BY nation_key, segment
    """,
    tags=("privacy", "k-anonymity", "audit", "curation"),
)
def q197_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity census with a one-step generalization ladder (spec in
    the module comment): per quasi-identifier class, its size k0 and
    sensitive-band diversity l0; k1 is the class size after suppressing
    the segment, and ``fixed_by_generalizing`` marks at-risk classes one
    generalization step rescues — the release-gate report a privacy
    review actually reads.

    Scale shape: two partial-aggregated rollups over the same scan (the
    generalized level re-aggregates the class table in a second tiny
    exchange keyed on the shorter prefix), one broadcast-sized join
    between them. Row counts are class counts, never data rows. The
    sensitive band is a pure-integer CASE ladder over cents — no float
    division and no negative-operand DIV (Spark truncates toward zero
    where DuckDB floors, so banded arithmetic on signed values must
    stay in comparisons).
    """
    c = table(spark, sf_dir, "customer")
    banded = c.selectExpr(
        "CAST(c_nationkey AS BIGINT) AS nation_key",
        "c_mktsegment AS segment",
        f"{_Q197_CENTS} AS cents",
    ).selectExpr("nation_key", "segment", f"{_Q197_BAND} AS band")
    classes = banded.groupBy("nation_key", "segment").agg(
        F.count(F.lit(1)).alias("k0"),
        F.countDistinct("band").alias("l0"),
    )
    generalized = classes.groupBy("nation_key").agg(
        F.sum("k0").alias("k1")
    )
    return (
        classes.join(F.broadcast(generalized), "nation_key")
        .select(
            "nation_key",
            "segment",
            F.col("k0").cast("bigint").alias("k0"),
            F.col("l0").cast("bigint").alias("l0"),
            F.col("k1").cast("bigint").alias("k1"),
            F.expr(
                f"CAST(CASE WHEN k0 < {_Q197_K} THEN 1 ELSE 0 END AS BIGINT)"
            ).alias("at_risk"),
            F.expr(
                f"CAST(CASE WHEN k0 < {_Q197_K} AND k1 >= {_Q197_K}"
                " THEN 1 ELSE 0 END AS BIGINT)"
            ).alias("fixed_by_generalizing"),
        )
        .orderBy("nation_key", "segment")
    )


# ---------------------------------------------------------------------------
# q204 — multi-step anonymization ladder (k/l release gate, suppression last)
# ---------------------------------------------------------------------------
# q197 audits whether ONE generalization step would rescue at-risk
# classes; this publishes the actual release: walk a generalization
# HIERARCHY — (nation, segment) → (nation, *) → (region, *) — releasing
# each class at the most specific level satisfying k-anonymity AND
# l-diversity over the rows still unreleased (iterative residual
# recoding — the sound variant; a coarse class must be k-large among the
# rows it actually publishes, not counting rows that already released at
# a finer level), suppressing whatever survives the whole ladder. Both
# engine sides are generated from `functions/privacy.py` (`anonymize` /
# `duckdb_ladder_census_sql`), so the oracle pins the API itself.
_Q204_LEVELS = (
    {"nation": "CAST(nation_key AS STRING)", "segment": "segment"},
    {"nation": "CAST(nation_key AS STRING)", "segment": None},
    {"nation": "CONCAT('region=', CAST(region_key AS STRING))", "segment": None},
)
_Q204_K = 10
_Q204_L = 2
_Q204_FROM = f"""
    SELECT nation_key, segment, region_key, {_Q197_BAND} AS band
    FROM (
      SELECT CAST(c.c_nationkey AS BIGINT) AS nation_key,
             c.c_mktsegment AS segment,
             CAST(n.n_regionkey AS BIGINT) AS region_key,
             {_Q197_CENTS} AS cents
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    )
"""

from ..functions.privacy import duckdb_ladder_census_sql as _ladder_sql  # noqa: E402


@register(
    "q204_anonymity_ladder",
    sql=_ladder_sql(
        _Q204_LEVELS, "band", _Q204_K, _Q204_L, from_sql=_Q204_FROM
    ),
    tags=("privacy", "k-anonymity", "l-diversity", "release-gate", "curation"),
)
def q204_anonymity_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Published-class census of the three-level anonymization ladder
    (module comment): one row per released (or suppressed) class —
    released QI display, the level it published at (-1 = suppressed),
    row count and sensitive-band diversity. Every gen_level >= 0 row has
    n_rows >= k and n_sens >= l by construction of the residual walk.

    Scale shape: the ladder walks the (class x band) table — class-count
    rows at any corpus size — with one broadcast semi/anti split per
    level; the row-level release is ONE broadcast join back to the
    corpus (`functions/privacy.py` module docstring); the census here
    re-aggregates the released rows on their display key. The nation dim
    join is broadcast.
    """
    from ..functions.privacy import anonymize

    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    base = (
        c.join(
            F.broadcast(n.select("n_nationkey", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .selectExpr(
            "CAST(c_nationkey AS BIGINT) AS nation_key",
            "c_mktsegment AS segment",
            "CAST(n_regionkey AS BIGINT) AS region_key",
            f"{_Q197_CENTS} AS cents",
        )
        .selectExpr("nation_key", "segment", "region_key", f"{_Q197_BAND} AS band")
    )
    released = anonymize(
        base, _Q204_LEVELS, "band", _Q204_K, _Q204_L, drop_suppressed=False
    )
    return (
        released.groupBy("nation_released", "segment_released", "gen_level")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct("band").cast("bigint").alias("n_sens"),
        )
        .select(
            "nation_released",
            "segment_released",
            F.col("gen_level").cast("bigint").alias("gen_level"),
            "n_rows",
            "n_sens",
        )
        .orderBy("gen_level", "nation_released", "segment_released")
    )


# ---------------------------------------------------------------------------
# q213 — Gopher surface-form quality rules (census with planted violators)
# ---------------------------------------------------------------------------
# q81 carries the repetition half of the Gopher filter set (Rae et al.
# 2021); this is the SURFACE-FORM half — word-count bounds, mean word
# length, symbol-to-word ratio, bullet/ellipsis line fractions,
# alphabetic-word fraction — as `text/pipeline.py::annotate_gopher_rules`
# under the oracle. The fixture's synthetic prose passes these rules
# almost uniformly, so six violator documents are PLANTED (one per
# rule, built from REPEAT/CHR literals evaluated identically by both
# engines) and the census proves each rule fires on its target and the
# verdict composes.
_Q213_PLANTED = (
    ("90000001", "'tiny document with nine words only here now'"),
    ("90000002", "REPEAT('#tag ', 60)"),
    ("90000003", "REPEAT(CONCAT('- item', CHR(10)), 20)"),
    ("90000004", "REPEAT(CONCAT('to be continued...', CHR(10)), 10)"),
    ("90000005", "REPEAT('12345 6789 ', 30)"),
    ("90000006", "REPEAT('abcdefghijklmnop ', 60)"),
)
_Q213_FAILS = (
    "fail_word_count",
    "fail_mean_word_len",
    "fail_symbol_ratio",
    "fail_bullet_lines",
    "fail_ellipsis_lines",
    "fail_alpha_words",
)


def _q213_duck_rules() -> str:
    words = "LIST_FILTER(STRING_SPLIT(text, ' '), w -> w <> '')"
    lines = "STRING_SPLIT(text, CHR(10))"
    return f"""
      SELECT source,
             LEN({words}) AS nw,
             COALESCE(LIST_SUM(LIST_TRANSFORM({words}, w -> LENGTH(w))), 0)
               AS wchars,
             LEN({lines}) AS nl,
             LEN(LIST_FILTER({lines},
                 l -> l LIKE '- %' OR l LIKE '* %')) AS bullets,
             LEN(LIST_FILTER({lines}, l -> l LIKE '%...')) AS ellipses,
             LENGTH(text) - LENGTH(REPLACE(text, '#', ''))
               + (LENGTH(text) - LENGTH(REPLACE(text, '...', ''))) // 3
               AS symbols,
             LEN(LIST_FILTER({words},
                 w -> REGEXP_MATCHES(w, '[A-Za-z]'))) AS alphas
      FROM corpus
    """


@register(
    "q213_gopher_rules",
    sql=f"""
    WITH corpus AS (
      SELECT source, text FROM documents
      UNION ALL
      SELECT 'planted' AS source, t AS text FROM (
        VALUES {", ".join(f"({expr})" for _, expr in _Q213_PLANTED)}
      ) v(t)
    ), feats AS ({_q213_duck_rules()}
    ), flags AS (
      SELECT source,
             (nw < 50 OR nw > 100000) AS fail_word_count,
             (nw > 0 AND (wchars < 3 * nw OR wchars > 10 * nw))
               AS fail_mean_word_len,
             (nw > 0 AND symbols * 10 > nw) AS fail_symbol_ratio,
             (bullets * 10 > nl * 9) AS fail_bullet_lines,
             (ellipses * 10 > nl * 3) AS fail_ellipsis_lines,
             (alphas * 10 < nw * 8) AS fail_alpha_words
      FROM feats
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN {" OR ".join(_Q213_FAILS)}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_drop,
           {", ".join(
               f"CAST(SUM(CASE WHEN {c} THEN 1 ELSE 0 END) AS BIGINT) AS n_{c}"
               for c in _Q213_FAILS
           )}
    FROM flags
    GROUP BY source
    ORDER BY source
    """,
    tags=("curation", "quality", "gopher", "text"),
)
def q213_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source census of the Gopher surface-form rules with six
    planted single-rule violators (module comment): how many documents
    each rule would drop, and the composed drop count.

    Scale shape: every rule is a map-side expression over the split
    arrays (`annotate_gopher_rules` — whole-stage codegen, no Python,
    no shuffle); the census is one per-source partial aggregation. The
    planted rows are a 6-row in-plan union.
    """
    from ..text.pipeline import annotate_gopher_rules

    d = table(spark, sf_dir, "documents").select("source", "text")
    planted = spark.range(1).selectExpr(
        *[f"{expr} AS t{i}" for i, (_, expr) in enumerate(_Q213_PLANTED)]
    )
    planted = planted.selectExpr(
        f"STACK({len(_Q213_PLANTED)}, "
        + ", ".join(f"'planted', t{i}" for i in range(len(_Q213_PLANTED)))
        + ") AS (source, text)"
    )
    corpus = d.unionByName(planted)
    flagged = annotate_gopher_rules(corpus)
    any_fail = None
    for c in _Q213_FAILS:
        any_fail = F.col(c) if any_fail is None else (any_fail | F.col(c))
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(any_fail, 1).otherwise(0))
            .cast("bigint")
            .alias("n_drop"),
            *[
                F.sum(F.when(F.col(c), 1).otherwise(0))
                .cast("bigint")
                .alias(f"n_{c}")
                for c in _Q213_FAILS
            ],
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q214 — contamination FRACTION (dirty-gram ppm per document)
# ---------------------------------------------------------------------------
# q82's gate is binary (any shared 8-gram ⇒ flagged); real hygiene
# policies (GPT-3 appendix C's dirty-document definition and its
# descendants) grade by HOW MUCH of a document overlaps the benchmark —
# a page quoting one benchmark item is salvageable by span-removal, a
# page that IS the benchmark is not. Per candidate document: distinct
# 8-grams, distinct grams hitting the benchmark set, and the exact
# integer dirty-ppm; output the 20 dirtiest. Same corpus seeding as q82
# (planted gram on doc_id % 50 == 3) so the ranking is observable on
# the clean fixture, same broadcast-semi-join scale shape, plus one
# doc-keyed partial aggregation and a TakeOrderedAndProject.
_Q214_TOP = 20


@register(
    "q214_contamination_fraction",
    sql=f"""
    WITH probe AS (
      SELECT ARRAY_TO_STRING((STRING_SPLIT(text, ' '))[1:{_NGRAM}], ' ') AS g0
      FROM documents WHERE doc_id = 0
    ), seeded AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % {_SEED_MOD} = 3 AND doc_id % {_BENCH_MOD} <> 0
                  THEN text || ' ' || g0 ELSE text END AS text
      FROM documents CROSS JOIN probe
    ), words AS (
      SELECT doc_id, source, STRING_SPLIT(text, ' ') AS ws
      FROM seeded
      WHERE LEN(STRING_SPLIT(text, ' ')) >= {_NGRAM}
    ), grams AS (
      SELECT DISTINCT doc_id, source,
             ARRAY_TO_STRING(ws[i:i+{_NGRAM - 1}], ' ') AS gram
      FROM (SELECT doc_id, source, ws,
                   UNNEST(RANGE(1, LEN(ws) - {_NGRAM - 2})) AS i
            FROM words)
    ), bench AS (
      SELECT DISTINCT gram FROM grams WHERE doc_id % {_BENCH_MOD} = 0
    ), per_doc AS (
      SELECT g.doc_id, ANY_VALUE(g.source) AS source,
             CAST(COUNT(*) AS BIGINT) AS n_grams,
             CAST(SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_dirty
      FROM grams g LEFT JOIN bench b ON g.gram = b.gram
      WHERE g.doc_id % {_BENCH_MOD} <> 0
      GROUP BY g.doc_id
    )
    SELECT doc_id, source, n_grams, n_dirty,
           CAST(n_dirty * 1000000 // n_grams AS BIGINT) AS dirty_ppm
    FROM per_doc
    WHERE n_dirty > 0
    ORDER BY dirty_ppm DESC, doc_id
    LIMIT {_Q214_TOP}
    """,
    tags=("curation", "decontamination", "ngram", "exact-integer"),
)
def q214_contamination_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 20 most benchmark-contaminated candidate documents by exact
    dirty-gram ppm (module comment) — the graded form of q82's gate.

    Scale shape: q82's exact shape (each side filters to its own docs
    before the gram explode, benchmark grams dedup tiny then broadcast)
    with the semi-join widened to a broadcast LEFT join so the per-doc
    aggregation counts hits and misses in one pass; ppm is exact BIGINT
    arithmetic; top-20 plans as TakeOrderedAndProject.
    """
    d = table(spark, sf_dir, "documents")
    probe = d.filter(F.col("doc_id") == 0).select(
        F.expr(
            f"ARRAY_JOIN(SLICE(SPLIT(text, ' '), 1, {_NGRAM}), ' ')"
        ).alias("g0")
    )
    seeded = d.join(F.broadcast(probe)).select(
        "doc_id",
        "source",
        F.when(
            (F.col("doc_id") % _SEED_MOD == 3)
            & (F.col("doc_id") % _BENCH_MOD != 0),
            F.concat_ws(" ", F.col("text"), F.col("g0")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )

    def _grams(docs: DataFrame) -> DataFrame:
        return (
            docs.filter(F.size(F.split("text", " ")) >= _NGRAM)
            .select(
                "doc_id",
                "source",
                F.explode(
                    F.expr(
                        f"TRANSFORM(SEQUENCE(1, SIZE(SPLIT(text, ' ')) - {_NGRAM - 1}), "
                        f"i -> ARRAY_JOIN(SLICE(SPLIT(text, ' '), i, {_NGRAM}), ' '))"
                    )
                ).alias("gram"),
            )
            .distinct()
        )

    bench = (
        _grams(seeded.filter(F.col("doc_id") % _BENCH_MOD == 0))
        .select("gram")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        _grams(seeded.filter(F.col("doc_id") % _BENCH_MOD != 0))
        .join(F.broadcast(bench), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.any_value("source").alias("source"),
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(F.coalesce("hit", F.lit(0))).cast("bigint").alias("n_dirty"),
        )
        .filter(F.col("n_dirty") > 0)
        .withColumn(
            "dirty_ppm",
            F.expr("CAST(n_dirty * 1000000 DIV n_grams AS BIGINT)"),
        )
        .orderBy(F.desc("dirty_ppm"), F.asc("doc_id"))
        .limit(_Q214_TOP)
    )


# ---------------------------------------------------------------------------
# q220 — quality-filter agreement (pairwise Cohen's kappa, exact ppm)
# ---------------------------------------------------------------------------
# Three keep/drop gates ship in this repo (q61 heuristics, q81
# repetition, q213 Gopher surface form); before stacking filters a
# pipeline should know whether they agree BEYOND CHANCE — raw overlap
# (q194's Jaccard, right for dedup pair sets) is inflated when both
# filters keep almost everything. Cohen's kappa corrects for chance:
#
#   kappa = (po - pe) / (1 - pe)
#         = (N·(n11+n00) − (r1·c1 + r0·c0)) / (N² − (r1·c1 + r0·c0))
#
# — a ratio of integers; the census reports it in exact ppm with the
# full 2×2 table alongside. Products run as HUGEINT / DECIMAL(38,0)
# (N² wraps BIGINT at ~3·10⁹ docs — the q184 overflow idiom).
_Q220_GATES = ("heuristic", "repetition", "gopher")


def _q220_duck_verdicts() -> str:
    words = "LIST_FILTER(STRING_SPLIT(text, ' '), w -> w <> '')"
    stop_list = ", ".join(f"'{w}'" for w in
                          ("the", "a", "of", "to", "and", "in", "is", "on"))
    return f"""
      SELECT doc_id,
             (LEN({words}) >= 40
              AND LEN(LIST_FILTER({words}, w -> w IN ({stop_list}))) * 100
                  BETWEEN 1 * LEN({words}) AND 50 * LEN({words}))
               AS keep_heuristic,
             (SELECT NOT (MAX(c) * 100 > 12 * SUM(c)
                          OR (SUM(c) - COUNT(*)) * 100 > 70 * SUM(c))
              FROM (SELECT COUNT(*) AS c
                    FROM UNNEST(STRING_SPLIT(d.text, ' ')) AS t(w)
                    WHERE w <> '' GROUP BY w))
               AS keep_repetition,
             (LEN({words}) BETWEEN 50 AND 100000
              AND LEN({words}) > 0
              AND COALESCE(LIST_SUM(LIST_TRANSFORM({words},
                    w -> LENGTH(w))), 0) BETWEEN 3 * LEN({words})
                                             AND 10 * LEN({words})
              AND (LENGTH(text) - LENGTH(REPLACE(text, '#', ''))
                   + (LENGTH(text) - LENGTH(REPLACE(text, '...', ''))) // 3)
                  * 10 <= LEN({words})
              AND LEN(LIST_FILTER(STRING_SPLIT(text, CHR(10)),
                    l -> l LIKE '- %' OR l LIKE '* %')) * 10
                  <= LEN(STRING_SPLIT(text, CHR(10))) * 9
              AND LEN(LIST_FILTER(STRING_SPLIT(text, CHR(10)),
                    l -> l LIKE '%...')) * 10
                  <= LEN(STRING_SPLIT(text, CHR(10))) * 3
              AND LEN(LIST_FILTER({words},
                    w -> REGEXP_MATCHES(w, '[A-Za-z]'))) * 10
                  >= LEN({words}) * 8)
               AS keep_gopher
      FROM documents d
    """


@register(
    "q220_filter_agreement_kappa",
    sql=f"""
    WITH verdicts AS ({_q220_duck_verdicts()}
    ), pairs AS (
      SELECT 'heuristic|repetition' AS pair,
             keep_heuristic AS a, keep_repetition AS b FROM verdicts
      UNION ALL
      SELECT 'heuristic|gopher', keep_heuristic, keep_gopher FROM verdicts
      UNION ALL
      SELECT 'repetition|gopher', keep_repetition, keep_gopher FROM verdicts
    ), cells AS (
      SELECT pair,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n11,
             CAST(SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n00,
             CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n10,
             CAST(SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n01
      FROM pairs GROUP BY pair
    )
    SELECT pair, n, n11, n00, n10, n01,
           CAST(1000000 * (CAST(n AS HUGEINT) * (n11 + n00)
                  - (CAST(n11 + n10 AS HUGEINT) * (n11 + n01)
                     + CAST(n00 + n01 AS HUGEINT) * (n00 + n10)))
                // (CAST(n AS HUGEINT) * n
                  - (CAST(n11 + n10 AS HUGEINT) * (n11 + n01)
                     + CAST(n00 + n01 AS HUGEINT) * (n00 + n10)))
             AS BIGINT) AS kappa_ppm
    FROM cells
    ORDER BY pair
    """,
    tags=("curation", "quality", "calibration", "statistics", "exact-integer"),
)
def q220_filter_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Cohen's kappa (exact ppm) between the repo's three
    keep/drop quality gates, with the full 2×2 agreement table per pair
    (module comment) — the do-my-filters-measure-the-same-thing audit
    run before stacking them.

    Scale shape: all three verdicts are map-side expressions computed in
    ONE corpus scan (the repetition gate's word counts collapse per doc
    before aggregation); the 2×2 cells are a 3-row rollup; kappa is
    integer arithmetic over the cells with DECIMAL(38,0)/HUGEINT
    products for the N² terms.
    """
    from ..text.pipeline import annotate_gopher_rules, annotate_quality

    d = table(spark, sf_dir, "documents")
    base = annotate_gopher_rules(annotate_quality(d)).select(
        "doc_id",
        (F.col("quality_verdict") == "keep").alias("keep_heuristic"),
        (F.col("gopher_verdict") == "keep").alias("keep_gopher"),
        "text",
    )
    wc = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("total"),
            F.max("c").alias("top_c"),
            F.count(F.lit(1)).alias("n_distinct"),
        )
        .select(
            "doc_id",
            (
                ~(
                    (F.col("top_c") * 100 > 12 * F.col("total"))
                    | ((F.col("total") - F.col("n_distinct")) * 100
                       > 70 * F.col("total"))
                )
            ).alias("keep_repetition"),
        )
    )
    v = base.join(wc, "doc_id").select(
        "keep_heuristic", "keep_repetition", "keep_gopher"
    )
    pairs = None
    combos = [
        ("heuristic|repetition", "keep_heuristic", "keep_repetition"),
        ("heuristic|gopher", "keep_heuristic", "keep_gopher"),
        ("repetition|gopher", "keep_repetition", "keep_gopher"),
    ]
    for name, ca, cb in combos:
        part = v.select(
            F.lit(name).alias("pair"),
            F.col(ca).alias("a"),
            F.col(cb).alias("b"),
        )
        pairs = part if pairs is None else pairs.unionByName(part)
    cells = pairs.groupBy("pair").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("a") & F.col("b"), 1).otherwise(0))
        .cast("bigint")
        .alias("n11"),
        F.sum(F.when(~F.col("a") & ~F.col("b"), 1).otherwise(0))
        .cast("bigint")
        .alias("n00"),
        F.sum(F.when(F.col("a") & ~F.col("b"), 1).otherwise(0))
        .cast("bigint")
        .alias("n10"),
        F.sum(F.when(~F.col("a") & F.col("b"), 1).otherwise(0))
        .cast("bigint")
        .alias("n01"),
    )
    dec = "DECIMAL(38,0)"
    pe_terms = (
        f"(CAST(n11 + n10 AS {dec}) * (n11 + n01)"
        f" + CAST(n00 + n01 AS {dec}) * (n00 + n10))"
    )
    kappa = (
        f"CAST((1000000 * (CAST(n AS {dec}) * (n11 + n00) - {pe_terms}))"
        f" DIV (CAST(n AS {dec}) * n - {pe_terms}) AS BIGINT)"
    )
    return cells.select(
        "pair", "n", "n11", "n00", "n10", "n01",
        F.expr(kappa).alias("kappa_ppm"),
    ).orderBy("pair")


# ---------------------------------------------------------------------------
# q245 — rendezvous (HRW) shard routing census
# ---------------------------------------------------------------------------
# `sinks/shards.py::shard_assignment` places by hash-modulo — perfect
# until n_shards changes, when nearly every document moves. The elastic
# variant for a standing corpus is rendezvous hashing (`rendezvous_shard`):
# shard = argmax over shards of the portable hash of (shard, id), so a
# capacity change moves exactly the documents the new shard wins
# (~1/(n+1); minimal-disruption drill in tests/test_shards.py). This
# query pins the routing law itself under the oracle: both engines
# compute the argmax over the identical hash family, so a drift in the
# hash text, the tie policy, or the argmax fold breaks the value hash.

_Q245_SHARDS = 8


@register(
    "q245_rendezvous_sharding",
    sql=f"""
    WITH cand AS (
      SELECT d.doc_id, d.text, s.s,
             {duckdb_hash32("CONCAT(CAST(s.s AS VARCHAR), '#', CAST(d.doc_id AS VARCHAR))", "hrw")} AS h
      FROM documents d
      CROSS JOIN (SELECT UNNEST(RANGE({_Q245_SHARDS})) AS s) s
    ), placed AS (
      SELECT doc_id, text, s AS shard FROM (
        SELECT doc_id, text, s,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY h DESC, s) AS rn
        FROM cand) WHERE rn = 1
    )
    SELECT CAST(shard AS INT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS n_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc
    FROM placed
    GROUP BY shard
    ORDER BY shard
    """,
    tags=("curation", "sharding", "rendezvous", "scale-path"),
)
def q245_rendezvous_sharding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard census of the rendezvous routing over the documents
    table: doc count, token mass, id range per shard — balance at a
    glance, and the routing law itself under the value hash.

    Scale shape: the argmax folds n candidate hashes INSIDE one per-row
    expression (no explode — the DuckDB twin unnests because it has no
    array fold, but the Spark side never materializes candidates); the
    only exchange is the |shards|-row census aggregate."""
    from ..sinks.shards import rendezvous_shard

    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        d.withColumn(
            "shard", rendezvous_shard("doc_id", _Q245_SHARDS)
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.size(F.split("text", " ")))
            .cast("bigint")
            .alias("n_tokens"),
            F.min("doc_id").cast("bigint").alias("min_doc"),
            F.max("doc_id").cast("bigint").alias("max_doc"),
        )
        .orderBy("shard")
    )


# ---------------------------------------------------------------------------
# q262 — Neyman (optimal) stratified sample allocation: how many docs to
# draw per source for a fixed eval-set budget, proportional to stratum
# size × within-stratum spread.
# ---------------------------------------------------------------------------

_Q262_BUDGET = 10_000


@register(
    "q262_neyman_allocation",
    sql=f"""
    WITH s AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               (CAST(CAST(ROUND(SUM(CAST(n_chars AS DECIMAL(18,4))), 4)
                     * 10000 AS BIGINT) AS DOUBLE) / 10000.0)
                   / COUNT(*) AS m,
               (CAST(CAST(ROUND(SUM(CAST(n_chars * n_chars AS DECIMAL(18,4))), 4)
                     * 10000 AS BIGINT) AS DOUBLE) / 10000.0)
                   / COUNT(*) AS ex2
        FROM documents
        GROUP BY source
    ), w AS (
        SELECT source, n_docs,
               CAST(FLOOR(SQRT(GREATEST(ex2 - m * m, 0)) * 1000) AS BIGINT)
                   AS s_milli
        FROM s
    )
    SELECT source, n_docs, s_milli,
           CAST((n_docs * s_milli * {_Q262_BUDGET})
                // NULLIF(SUM(n_docs * s_milli) OVER (), 0) AS BIGINT)
               AS alloc_docs
    FROM w
    ORDER BY source
    """,
    tags=("curation", "sampling", "stats", "agg"),
)
def q262_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal allocation of a {budget}-doc eval sample across
    sources: n_h ∝ N_h·S_h (stratum size × within-stratum std-dev of
    n_chars) — the design that minimizes the estimator's variance for a
    fixed budget (Neyman 1934). Uniform or size-proportional sampling
    over-draws from large homogeneous sources; this sends budget where
    the VARIABILITY is. Output: per source, the stratum size, its
    std-dev in milli (integer — portable), and the allocated quota.

    Numeric policy: moments are exact decimal sums quantized through the
    shared q4 idiom, the std-dev is one correctly-rounded IEEE SQRT
    floored to milli, and the allocation is INTEGER arithmetic
    (n_docs·s_milli·budget DIV Σ) — every division either exact-integer
    or a single identical IEEE op, so both engines hash-match bit-for-bit.

    Scale shape: one map-side partial agg over the scan (count/sum/sum²
    partials), |sources| rows after the exchange, then a window over
    that tiny aggregate. Nothing downstream of the scan exceeds the
    stratum count."""
    from .base import q4

    docs = table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.expr(
            q4("SUM(CAST(n_chars AS DECIMAL(18,4)))")
        ).alias("sx"),
        F.expr(
            q4("SUM(CAST(n_chars * n_chars AS DECIMAL(18,4)))")
        ).alias("sxx"),
    )
    w = s.select(
        "source",
        "n_docs",
        F.expr(
            "CAST(FLOOR(SQRT(GREATEST(sxx / n_docs"
            " - (sx / n_docs) * (sx / n_docs), 0D)) * 1000) AS BIGINT)"
        ).alias("s_milli"),
    )
    from pyspark.sql.window import Window

    return (
        w.withColumn(
            "num",
            F.expr(f"n_docs * s_milli * {_Q262_BUDGET}").cast("bigint"),
        )
        .withColumn(
            "total",
            F.sum(F.expr("n_docs * s_milli")).over(Window.partitionBy()),
        )
        .select(
            "source",
            "n_docs",
            "s_milli",
            # NULLIF guard: if EVERY stratum has zero spread the global
            # weight is 0 — Spark's DIV would yield NULL while DuckDB's
            # // raises; NULLIF makes both engines return NULL allocs
            F.expr("num DIV NULLIF(total, 0)")
            .cast("bigint")
            .alias("alloc_docs"),
        )
        .orderBy("source")
    )
