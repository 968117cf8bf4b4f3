"""Deduplication operators over the ``documents`` / ``embeddings`` tables:
exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup
(north-star extensions per SURVEY.md §2.2 last row; the reference has no
dedup notion — its nearest analog is idempotent S3 overwrite on re-run,
`audit_data_ingest.py:65-68`).

The fixture corpus has no natural duplicates, so the near-dup queries build
perturbed variants *inside the query* (drop trailing words / rescale vectors)
and must rediscover the (original, variant) pairs. All hashing is MD5-derived
(see ``functions.hashing``) so Spark and the DuckDB oracle agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import duckdb_hash32, spark_hash32, universal_hash
from ..tables import table
from .base import register

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


@register(
    "q50_dedup_exact",
    sql="""
    WITH doubled AS (SELECT * FROM documents UNION ALL SELECT * FROM documents)
    SELECT source,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT text) AS n_unique_texts,
           MIN(doc_id) AS min_doc_id
    FROM doubled
    GROUP BY source
    ORDER BY source
    """,
    tags=("dedup", "exact"),
)
def q50_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via hash-groupBy: the corpus is doubled (simulating a
    re-ingest) and distinct text counts prove the dedup key.

    At 100 TB this is a single hash shuffle on the dedup key; for long texts
    dedup on md5(text) instead to shrink the shuffle payload.
    """
    d = table(spark, sf_dir, "documents")
    doubled = d.unionByName(d)
    return (
        doubled.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("text").alias("n_unique_texts"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_N_SEEDS = 12  # minhash signature length
_BANDS = 4  # LSH bands of 3 rows each
_ROWS = _N_SEEDS // _BANDS
_VARIANT_OFFSET = 1_000_000
_N_VARIANT_DOCS = 50  # doc_id < 50 get a near-dup variant (drop last 5 words)
# Skew guard for the LSH self-join: a (band, band_hash) bucket holding more
# than this many docs is excluded from pair generation on BOTH engines.
# Boilerplate-heavy corpora concentrate near-identical docs into a handful of
# buckets whose pair count grows quadratically; dropping them bounds any
# bucket's contribution to cap^2 pairs. 32 is far above any organic bucket in
# the fixtures (test pins capped == uncapped there) while turning the 100 TB
# worst case from O(hot^2) into a no-op.
_LSH_BUCKET_CAP = 32
# Stop-gram guard for the n-gram Jaccard join: a 3-gram occurring in more
# than this many docs of one source is boilerplate ("the", "ing", markup) —
# it is removed from every doc's gram set (both engines) before sizes and
# intersections, exactly like stopword removal. This bounds the join fan-out
# per (source, gram) key at cap^2 instead of |source|^2 at 100 TB.
_GRAM_DF_CAP = 64


def _minhash_sql() -> str:
    """DuckDB oracle mirroring the Spark minhash pipeline exactly.

    One MD5 per shingle (``h``); the 12 permutations are universal-hash
    transforms of it — same digest economy as the Spark side.
    """
    mins = ",\n             ".join(
        f"MIN({universal_hash('h', i)}) AS mh_{i}" for i in range(_N_SEEDS)
    )
    band_rows = "\n      UNION ALL\n".join(
        "      SELECT doc_id, {b} AS band_idx, MD5(CONCAT_WS(',', {cols})) AS band_hash FROM sigs".format(
            b=b,
            cols=", ".join(
                f"CAST(mh_{b * _ROWS + r} AS VARCHAR)" for r in range(_ROWS)
            ),
        )
        for b in range(_BANDS)
    )
    return f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {_VARIANT_OFFSET} AS doc_id,
             ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[1:LEN(STRING_SPLIT(text, ' ')) - 5], ' ') AS text
      FROM documents
      WHERE doc_id < {_N_VARIANT_DOCS} AND LEN(STRING_SPLIT(text, ' ')) > 5
    ), positions AS (
      SELECT doc_id, STRING_SPLIT(text, ' ') AS words,
             UNNEST(RANGE(1, LEN(STRING_SPLIT(text, ' ')) - 1)) AS i
      FROM corpus
      WHERE LEN(STRING_SPLIT(text, ' ')) >= 3
    ), shingled AS (
      SELECT doc_id,
             {duckdb_hash32("ARRAY_TO_STRING(words[i:i+2], ' ')", 'mh')} AS h
      FROM positions
    ), sigs AS (
      SELECT doc_id,
             {mins}
      FROM shingled
      GROUP BY doc_id
    ), bands AS (
{band_rows}
    ), hot AS (
      SELECT band_idx, band_hash FROM bands
      GROUP BY band_idx, band_hash HAVING COUNT(*) > {_LSH_BUCKET_CAP}
    ), kept AS (
      SELECT bands.* FROM bands
      ANTI JOIN hot ON bands.band_idx = hot.band_idx
                   AND bands.band_hash = hot.band_hash
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM kept a JOIN kept b
      ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
         AND a.doc_id < b.doc_id
    ORDER BY doc_a, doc_b
    """



def _variants(d: DataFrame) -> DataFrame:
    """Near-dup variants: drop the last 5 words of the first N docs. Docs of
    <= 5 words are excluded on both engines (SLICE with a non-positive
    length is an error in Spark and an end-relative slice in DuckDB)."""
    return d.filter(
        (F.col("doc_id") < _N_VARIANT_DOCS) & (F.size(F.split("text", " ")) > 5)
    ).select(
        (F.col("doc_id") + _VARIANT_OFFSET).alias("doc_id"),
        F.expr(
            "ARRAY_JOIN(SLICE(SPLIT(text, ' '), 1, SIZE(SPLIT(text, ' ')) - 5), ' ')"
        ).alias("text"),
    )


def lsh_candidate_pairs(
    bands: DataFrame, bucket_cap: int | None = _LSH_BUCKET_CAP
) -> DataFrame:
    """(doc_a, doc_b) candidate pairs from an LSH bands table, excluding
    buckets larger than ``bucket_cap`` (skew guard — see _LSH_BUCKET_CAP).

    The bucket size is computed as a window count partitioned by the join
    key itself — it rides the exact shuffle the self-join needs anyway (no
    second lineage over the signature pipeline, and AQE's exchange reuse
    still sees two identical sides), and the filter bounds every bucket's
    pair count at cap^2.
    """
    if bucket_cap is not None:
        from pyspark.sql import Window

        wb = Window.partitionBy("band_idx", "band_hash")
        bands = (
            bands.withColumn("_bucket_n", F.count(F.lit(1)).over(wb))
            .filter(F.col("_bucket_n") <= bucket_cap)
            .drop("_bucket_n")
        )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


@register("q51_dedup_minhash_lsh", sql=_minhash_sql(), tags=("dedup", "minhash", "lsh"))
def q51_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup detection: word 3-shingles → 12-permutation MinHash →
    4-band LSH → bucket self-join → candidate pairs.

    Scale shape: signatures are one groupBy over exploded shingles (map-side
    combine keeps the shuffle at |docs|×12 ints), and the LSH join shuffles
    on (band, bucket) — never the all-pairs cross product. Buckets larger
    than _LSH_BUCKET_CAP are excluded on both engines (boilerplate skew
    guard; see lsh_candidate_pairs).
    """
    d = table(spark, sf_dir, "documents")
    corpus = d.select("doc_id", "text").unionByName(_variants(d))
    # Round 13: the round-12 spread + bands localCheckpoint pair was a
    # driver-measured 0.63× regression (BENCH_r12: 1.84 → 2.92 s, minima
    # moved too). Re-adjudicated with 8-sample interleaved A/Bs: plain
    # med 1.52 s (max 1.98) vs spread-only 1.55 (max 2.32) vs
    # spread+ckpt 1.85 (max 2.90) — materializing the 4-rows-per-doc
    # bands costs more than recomputing the signature pipeline on the
    # second join side, and the spread is a wash once the checkpoint is
    # gone. Reverted to the r11 shape (guide §5: materialize only when
    # recomputation provably exceeds materialization — here it does not).
    bands = _spark_bands(_spark_sigs(corpus))
    return lsh_candidate_pairs(bands).orderBy("doc_a", "doc_b")


def _spark_sigs(corpus: DataFrame) -> DataFrame:
    """(doc_id, mh_0..mh_N) minhash signatures: one MD5 per shingle, the N
    permutations as universal-hash transforms (a·H+b mod p) — identical
    digest economy on both engines."""
    shingled = (
        corpus.withColumn("words", F.split("text", " "))
        .filter(F.size("words") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "TRANSFORM(SEQUENCE(1, SIZE(words) - 2), i -> ARRAY_JOIN(SLICE(words, i, 3), ' '))"
                )
            ).alias("shingle"),
        )
        .select("doc_id", F.expr(spark_hash32("shingle", "mh")).alias("h"))
    )
    return shingled.groupBy("doc_id").agg(
        *[
            F.expr(f"MIN({universal_hash('h', i)})").alias(f"mh_{i}")
            for i in range(_N_SEEDS)
        ]
    )


def _spark_bands(sigs: DataFrame) -> DataFrame:
    stack_args = ", ".join(
        "{b}, MD5(CONCAT_WS(',', {cols}))".format(
            b=b,
            cols=", ".join(f"CAST(mh_{b * _ROWS + r} AS STRING)" for r in range(_ROWS)),
        )
        for b in range(_BANDS)
    )
    return sigs.select(
        "doc_id",
        F.expr(f"STACK({_BANDS}, {stack_args}) AS (band_idx, band_hash)"),
    )


def _minhash_jaccard_sql() -> str:
    """Candidate pairs from q51's LSH, with signature-estimated Jaccard."""
    mins = ",\n             ".join(
        f"MIN({universal_hash('h', i)}) AS mh_{i}" for i in range(_N_SEEDS)
    )
    band_rows = "\n      UNION ALL\n".join(
        "      SELECT doc_id, {b} AS band_idx, MD5(CONCAT_WS(',', {cols})) AS band_hash FROM sigs".format(
            b=b,
            cols=", ".join(
                f"CAST(mh_{b * _ROWS + r} AS VARCHAR)" for r in range(_ROWS)
            ),
        )
        for b in range(_BANDS)
    )
    agree = " + ".join(
        f"(CASE WHEN a.mh_{i} = b.mh_{i} THEN 1 ELSE 0 END)" for i in range(_N_SEEDS)
    )
    return f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {_VARIANT_OFFSET} AS doc_id,
             ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[1:LEN(STRING_SPLIT(text, ' ')) - 5], ' ') AS text
      FROM documents
      WHERE doc_id < {_N_VARIANT_DOCS} AND LEN(STRING_SPLIT(text, ' ')) > 5
    ), positions AS (
      SELECT doc_id, STRING_SPLIT(text, ' ') AS words,
             UNNEST(RANGE(1, LEN(STRING_SPLIT(text, ' ')) - 1)) AS i
      FROM corpus
      WHERE LEN(STRING_SPLIT(text, ' ')) >= 3
    ), shingled AS (
      SELECT doc_id,
             {duckdb_hash32("ARRAY_TO_STRING(words[i:i+2], ' ')", 'mh')} AS h
      FROM positions
    ), sigs AS (
      SELECT doc_id,
             {mins}
      FROM shingled
      GROUP BY doc_id
    ), bands AS (
{band_rows}
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
           AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST({agree} AS DOUBLE) / {_N_SEEDS} AS est_jaccard
    FROM cand
      JOIN sigs a ON a.doc_id = doc_a
      JOIN sigs b ON b.doc_id = doc_b
    WHERE CAST({agree} AS DOUBLE) / {_N_SEEDS} >= 0.5
    ORDER BY doc_a, doc_b
    """


@register(
    "q57_minhash_jaccard_estimate",
    sql=_minhash_jaccard_sql(),
    tags=("dedup", "minhash", "similarity"),
)
def q57_minhash_jaccard_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signature-based Jaccard estimation over LSH candidates: the fraction
    of agreeing minhash components estimates J(A,B) — the verify stage that
    filters LSH false positives without touching the original texts.

    At 100 TB the signatures (12 ints/doc) are the only thing joined —
    the documents themselves are never re-read.
    """
    d = table(spark, sf_dir, "documents")
    corpus = d.select("doc_id", "text").unionByName(_variants(d))
    sigs = _spark_sigs(corpus)
    bands = _spark_bands(sigs)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    agree = " + ".join(
        f"(CASE WHEN a.mh_{i} = b.mh_{i} THEN 1 ELSE 0 END)" for i in range(_N_SEEDS)
    )
    sa, sb = sigs.alias("a"), sigs.alias("b")
    return (
        cand.join(sa, cand.doc_a == F.col("a.doc_id"))
        .join(sb, cand.doc_b == F.col("b.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.expr(f"CAST({agree} AS DOUBLE) / {_N_SEEDS}").alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= 0.5)
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_SIM_BITS = 32


def _simhash_sig_ctes(
    corpus_sql: str = "SELECT doc_id, text FROM documents", bits: int = _SIM_BITS
) -> str:
    """CTE chain corpus->tokens->bitsums->sigs (DuckDB), shared by the
    simhash family. For bits > 32 the token hash is widened by combining
    two independent 32-bit MD5-derived hashes (same trick on both
    engines), so every signature bit has an independent source bit."""
    h = duckdb_hash32("token", "sim")
    h2 = duckdb_hash32("token", "sim2")
    def src(j):
        return f"({h} >> {j})" if j < 32 else f"({h2} >> {j - 32})"
    bit_sums = ",\n             ".join(
        f"SUM(CASE WHEN (({src(j)}) & 1) = 1 THEN 1 ELSE -1 END) AS s_{j}"
        for j in range(bits)
    )
    sig = " + ".join(
        f"(CASE WHEN s_{j} >= 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
        for j in range(bits)
    )
    return f"""
    WITH corpus AS (
      {corpus_sql}
    ), tokens AS (
      SELECT DISTINCT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token
      FROM corpus
    ), bitsums AS (
      SELECT doc_id,
             {bit_sums}
      FROM tokens
      GROUP BY doc_id
    ), sigs AS (
      SELECT doc_id, {sig} AS simhash FROM bitsums
    )"""


def _simhash_sql() -> str:
    return f"""{_simhash_sig_ctes()}
    SELECT simhash, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc_id
    FROM sigs
    GROUP BY simhash
    ORDER BY simhash
    """



def _spark_simhash_sigs(corpus: DataFrame, bits: int = _SIM_BITS) -> DataFrame:
    """(doc_id, simhash) SimHash signatures (shared by the simhash family);
    see _simhash_sig_ctes for the >32-bit widening scheme."""
    tokens = corpus.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).distinct()
    # Hoist the two MD5 hashes into one projection: inlining them into the
    # 32/64 SUM(CASE ...) aggregate expressions made every bit position
    # re-derive its source hash (guide §1.2 per-task work). Each hash column
    # is referenced by >1 aggregate, so CollapseProject keeps the projection
    # and each row pays exactly two MD5s.
    tokens = tokens.select(
        "doc_id",
        F.expr(spark_hash32("token", "sim")).alias("h_sim"),
        F.expr(spark_hash32("token", "sim2")).alias("h_sim2"),
    )

    def src(j):
        return f"SHIFTRIGHT(h_sim, {j})" if j < 32 else f"SHIFTRIGHT(h_sim2, {j - 32})"

    bitsums = tokens.groupBy("doc_id").agg(
        *[
            F.expr(
                f"SUM(CASE WHEN {src(j)} % 2 = 1 THEN 1 ELSE -1 END)"
            ).alias(f"s_{j}")
            for j in range(bits)
        ]
    )
    sig = " + ".join(
        f"(CASE WHEN s_{j} >= 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
        for j in range(bits)
    )
    return bitsums.select("doc_id", F.expr(sig).alias("simhash"))


@register("q52_dedup_simhash", sql=_simhash_sql(), tags=("dedup", "simhash"))
def q52_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash document signatures: 32-bit sign-of-sums over distinct-token
    hashes, then duplicate-cluster histogram (same signature = near-dup
    cluster).

    Scale shape: explode tokens → one partial+final agg keyed by doc_id;
    signature comparison is a groupBy on the 32-bit signature — no pairwise
    scan. Hamming-<=k retrieval bands the signature bytes like q51.
    """
    d = table(spark, sf_dir, "documents")
    return (
        _spark_simhash_sigs(d.select("doc_id", "text"))
        .groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
        .orderBy("simhash")
    )


def _cc_sql() -> str:
    """DuckDB oracle for connected components: min-label fixpoint as a
    recursive CTE. ``reach`` enumerates (node, label) where ``label`` is a
    node reachable from ``node`` carrying a smaller id at every hop — the
    component minimum is smaller than every node on its path, so it always
    survives the prune and MIN(label) per node is the component minimum.
    The recursive UNION deduplicates rows, bounding the fixpoint."""
    pairs_body = _minhash_sql().replace("ORDER BY doc_a, doc_b", "")
    return f"""
    WITH RECURSIVE pairs AS (
      {pairs_body}
    ), edges AS (
      SELECT doc_a, doc_b FROM pairs
      UNION ALL
      SELECT doc_b AS doc_a, doc_a AS doc_b FROM pairs
    ), reach(doc_id, label) AS (
      SELECT DISTINCT doc_a AS doc_id, doc_a AS label FROM edges
      UNION
      SELECT e.doc_a AS doc_id, r.label
      FROM reach r JOIN edges e ON e.doc_b = r.doc_id
      WHERE r.label < e.doc_a
    )
    SELECT doc_id, MIN(label) AS cluster_id
    FROM reach
    GROUP BY doc_id
    ORDER BY doc_id
    """


@register(
    "q58_dedup_clusters",
    sql=_cc_sql(),
    tags=("dedup", "clustering", "iterative"),
)
def q58_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-components clustering of near-dup pairs: every document in a
    duplicate cluster is labeled with the cluster's minimum doc_id — the
    "keep one representative per cluster" step after LSH candidate discovery.

    Iterative min-label propagation (alternating join + min-agg until
    fixpoint), the standard large-graph CC pattern: each round is one shuffle
    keyed on doc_id; lineage is cut per round via localCheckpoint so plans
    don't grow with iterations. Oracle: a DuckDB ``WITH RECURSIVE`` min-label
    transitive closure over the same q51 edge list (see ``_cc_sql``) —
    hash-checked, not rows-only.
    """
    from ..functions.graph import connected_components

    pairs = q51_dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    return (
        connected_components(pairs)
        .select(F.col("node_id").alias("doc_id"), "cluster_id")
        .orderBy("doc_id")
    )


_SIMHAM_K = 3  # max Hamming distance for a near-dup verdict
_SIMHAM_BANDS = 4  # 8-bit bands of the 32-bit signature
_SIMHAM_BUCKET_CAP = 64  # skew guard, same rationale as _LSH_BUCKET_CAP


def _simhash_hamming_sql() -> str:
    variant_sql = f"""SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {_VARIANT_OFFSET} AS doc_id,
             ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[1:LEN(STRING_SPLIT(text, ' ')) - 5], ' ') AS text
      FROM documents
      WHERE doc_id < {_N_VARIANT_DOCS} AND LEN(STRING_SPLIT(text, ' ')) > 5"""
    return f"""{_simhash_sig_ctes(variant_sql)}
    , bands AS (
      SELECT doc_id, simhash, b.band_idx,
             (simhash >> (8 * b.band_idx)) & 255 AS band_val
      FROM sigs CROSS JOIN (VALUES (0), (1), (2), (3)) AS b(band_idx)
    ), hot AS (
      SELECT band_idx, band_val FROM bands
      GROUP BY band_idx, band_val HAVING COUNT(*) > {_SIMHAM_BUCKET_CAP}
    ), kept AS (
      SELECT bands.* FROM bands
      ANTI JOIN hot ON bands.band_idx = hot.band_idx
                   AND bands.band_val = hot.band_val
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.simhash AS sig_a, b.simhash AS sig_b
      FROM kept a JOIN kept b
        ON a.band_idx = b.band_idx AND a.band_val = b.band_val
           AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(sig_a, sig_b)) AS BIGINT) AS hamming
    FROM cand
    WHERE bit_count(xor(sig_a, sig_b)) <= {_SIMHAM_K}
    ORDER BY doc_a, doc_b
    """


@register(
    "q52b_simhash_hamming",
    sql=_simhash_hamming_sql(),
    tags=("dedup", "simhash", "hamming", "lsh"),
)
def q52b_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-<=k SimHash retrieval: band the 32-bit signature into four
    8-bit bands; by pigeonhole, any pair within Hamming distance 3 agrees
    exactly on at least one band, so a band-value equi-join finds every
    such pair; the bit_count(xor) residual then filters to true near-dups.

    Scale shape: identical to q51's LSH — shuffle keyed by (band, value),
    bucket cap as the skew guard, never an all-pairs product. Production
    note: a 32-bit signature's 8-bit bands give only 256 buckets per band;
    at real corpus sizes use a 64-bit signature with 16-bit bands (65k
    buckets) — the mechanics here are identical."""
    d = table(spark, sf_dir, "documents")
    corpus = d.select("doc_id", "text").unionByName(_variants(d))
    sigs = _spark_simhash_sigs(corpus)
    bands = sigs.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(_SIMHAM_BANDS - 1))).alias("band_idx"),
    ).withColumn(
        "band_val",
        F.expr("(simhash >> (8 * band_idx)) & 255"),
    )
    from pyspark.sql import Window

    wb = Window.partitionBy("band_idx", "band_val")
    kept = (
        bands.withColumn("_n", F.count(F.lit(1)).over(wb))
        .filter(F.col("_n") <= _SIMHAM_BUCKET_CAP)
        .drop("_n")
    )
    a, b = kept.alias("a"), kept.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.expr("CAST(BIT_COUNT(sig_a ^ sig_b) AS BIGINT)")
        )
        .filter(F.col("hamming") <= _SIMHAM_K)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# N-gram Jaccard
# ---------------------------------------------------------------------------


@register(
    "q53_dedup_ngram_jaccard",
    sql=f"""
    WITH positions AS (
      SELECT doc_id, source, text,
             UNNEST(RANGE(1, LENGTH(text) - 1)) AS i
      FROM documents
      WHERE LENGTH(text) >= 3
    ), all_grams AS (
      SELECT DISTINCT doc_id, source, SUBSTRING(text, i, 3) AS gram
      FROM positions
    ), stop_grams AS (
      SELECT source, gram FROM all_grams
      GROUP BY source, gram HAVING COUNT(*) > {_GRAM_DF_CAP}
    ), grams AS (
      SELECT all_grams.* FROM all_grams
      ANTI JOIN stop_grams ON all_grams.source = stop_grams.source
                          AND all_grams.gram = stop_grams.gram
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM grams a JOIN grams b
        ON a.gram = b.gram AND a.source = b.source AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(n_common AS DOUBLE)
             / CAST(sa.n_grams + sb.n_grams - n_common AS DOUBLE) AS jaccard
    FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_common AS DOUBLE)
            / CAST(sa.n_grams + sb.n_grams - n_common AS DOUBLE) >= 0.62
    ORDER BY doc_a, doc_b
    """,
    tags=("dedup", "ngram", "jaccard"),
)
def q53_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-3-gram Jaccard similarity over same-source candidate pairs.

    Scale shape: the gram⨝gram join is keyed by (gram, source) — the blocking
    key bounds the candidate set; the all-pairs product never materializes.
    Stop-grams (document frequency > _GRAM_DF_CAP within a source) are
    removed from every gram set on both engines before sizing and joining,
    so no single key can fan out quadratically with corpus size. Texts
    shorter than 3 chars are excluded on both engines (Spark's SEQUENCE
    would emit a descending range where DuckDB's RANGE is empty).
    Jaccard = |A∩B| / (|A|+|B|-|A∩B|) from exact integer counts.
    """
    d = table(spark, sf_dir, "documents")
    all_grams = (
        d.filter(F.length("text") >= 3)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.expr(
                    "TRANSFORM(SEQUENCE(1, LENGTH(text) - 2), i -> SUBSTRING(text, i, 3))"
                )
            ).alias("gram"),
        )
        .distinct()
    )
    # stop-gram removal (see _GRAM_DF_CAP): the hot-gram list is tiny, so a
    # broadcast anti-join prunes it before both the sizes agg and the join
    stop_grams = (
        all_grams.groupBy("source", "gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > _GRAM_DF_CAP)
        .select("source", "gram")
    )
    grams = all_grams.join(F.broadcast(stop_grams), ["source", "gram"], "left_anti")
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    # size-ratio pruning inside the join: J(A,B) >= t implies
    # min(|A|,|B|) >= t * max(|A|,|B|) (c <= min and c >= t(na+nb)/(1+t)),
    # so pairs violating the ratio can be dropped BEFORE the count-agg —
    # pure candidate pruning, provably output-preserving, and it cuts the
    # intersection shuffle on size-skewed corpora. n_grams rides along via
    # a doc-keyed window (one shuffle, same key as the gram explode).
    from pyspark.sql import Window

    wd = Window.partitionBy("doc_id")
    sized = grams.withColumn("n", F.count(F.lit(1)).over(wd))
    a, b = sized.alias("a"), sized.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # exact integer arithmetic: 0.62 as a double is slightly above
            # 62/100, which could prune an exact-boundary pair (min == 0.62
            # * max with Jaccard exactly 0.62) that the final >= 0.62 filter
            # keeps — a cross-engine divergence at the threshold
            & (F.least("a.n", "b.n") * 100 >= F.greatest("a.n", "b.n") * 62),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_grams").alias("nb"))
    jac = (
        F.col("n_common").cast("double")
        / (F.col("na") + F.col("nb") - F.col("n_common")).cast("double")
    )
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.62)
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------

# Dot products are order-sensitive in floating point, so every pairwise term
# x*y is rounded once (deterministic IEEE double) and summed in DECIMAL —
# associative, hence identical under any partitioning and in both engines.
_DOT_DEC = "DECIMAL(28,18)"


def spark_cosine(a: str, b: str) -> str:
    """Spark SQL cosine between two array<double> columns, decimal-exact."""

    def ssum(x: str, y: str) -> str:
        return (
            f"AGGREGATE(ZIP_WITH({x}, {y}, (p, q) -> CAST(p * q AS {_DOT_DEC})), "
            f"CAST(0 AS {_DOT_DEC}), (acc, v) -> CAST(acc + v AS {_DOT_DEC}))"
        )

    return (
        f"CAST({ssum(a, b)} AS DOUBLE) / "
        f"(SQRT(CAST({ssum(a, a)} AS DOUBLE)) * SQRT(CAST({ssum(b, b)} AS DOUBLE)))"
    )


@register(
    "q54_dedup_embedding_cosine",
    sql=f"""
    WITH base AS (
      SELECT vec_id, label,
             LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
      UNION ALL
      SELECT vec_id + {_VARIANT_OFFSET} AS vec_id, label,
             LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE) * 1.5) AS emb
      FROM embeddings WHERE vec_id < 25
    ), pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
             a.emb AS ea, b.emb AS eb
      FROM base a JOIN base b ON a.label = b.label AND a.vec_id < b.vec_id
    ), indexed AS (
      SELECT vec_a, vec_b, label, ea, eb,
             UNNEST(RANGE(1, LEN(ea) + 1)) AS i
      FROM pairs
    ), terms AS (
      SELECT vec_a, vec_b, label,
             CAST(ea[i] * eb[i] AS {_DOT_DEC}) AS xy,
             CAST(ea[i] * ea[i] AS {_DOT_DEC}) AS xx,
             CAST(eb[i] * eb[i] AS {_DOT_DEC}) AS yy
      FROM indexed
    )
    SELECT vec_a, vec_b, label
    FROM terms
    GROUP BY vec_a, vec_b, label
    HAVING CAST(SUM(xy) AS DOUBLE)
             / (SQRT(CAST(SUM(xx) AS DOUBLE)) * SQRT(CAST(SUM(yy) AS DOUBLE))) >= 0.999
    ORDER BY vec_a, vec_b
    """,
    tags=("dedup", "embedding", "cosine"),
)
def q54_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup: cosine ≥ 0.999 pairs, blocked by label.

    The label acts as the blocking key (in production: an LSH or IVF bucket),
    so the pair space is per-bucket, not global. Cosine runs entirely JVM-side
    as a ZIP_WITH/AGGREGATE expression over the array column — no Python UDF.
    """
    e = table(spark, sf_dir, "embeddings")
    orig = e.select(
        "vec_id",
        "label",
        F.expr("TRANSFORM(embedding, x -> CAST(x AS DOUBLE))").alias("emb"),
    )
    variants = (
        e.filter(F.col("vec_id") < 25)
        .select(
            (F.col("vec_id") + _VARIANT_OFFSET).alias("vec_id"),
            "label",
            F.expr("TRANSFORM(embedding, x -> CAST(x AS DOUBLE) * 1.5)").alias("emb"),
        )
    )
    base = orig.unionByName(variants)
    a, b = base.alias("a"), base.alias("b")
    cos = spark_cosine("a.emb", "b.emb")
    return (
        a.join(b, (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").alias("label"),
            F.expr(cos).alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.999)
        .select("vec_a", "vec_b", "label")
        .orderBy("vec_a", "vec_b")
    )


@register(
    "q86_chunk_dedup",
    sql="""
    WITH words AS (
      SELECT doc_id, STRING_SPLIT(text, ' ') AS ws
      FROM documents
    ), chunks AS (
      SELECT doc_id,
             ARRAY_TO_STRING(ws[(i - 1) * 5 + 1 : i * 5], ' ') AS chunk
      FROM (SELECT doc_id, ws,
                   UNNEST(RANGE(1, CAST(CEIL(LEN(ws) / 5.0) AS BIGINT) + 1)) AS i
            FROM words)
    ), freq AS (
      SELECT chunk,
             COUNT(*) AS n_copies,
             COUNT(DISTINCT doc_id) AS n_docs,
             MIN(doc_id) AS first_doc
      FROM chunks
      GROUP BY chunk
    )
    SELECT n_copies,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_cross_doc,
           MIN(first_doc) AS min_first_doc
    FROM freq
    GROUP BY n_copies
    ORDER BY n_copies
    """,
    tags=("dedup", "chunk", "paragraph"),
)
def q86_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document (chunk/paragraph-level) exact dedup: split every doc
    into 5-word chunks and histogram chunk multiplicity — the operator that
    catches repeated boilerplate paragraphs exact whole-doc dedup misses.

    Scale shape: chunking is a per-row explode (no shuffle); the frequency
    table is one hash agg keyed by chunk (map-side combined), and the
    histogram is a second tiny agg. Dedup action at scale: keep
    first_doc's copy, drop the rest — same keyed shuffle."""
    d = table(spark, sf_dir, "documents")
    chunks = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "TRANSFORM(SEQUENCE(1, CAST(CEIL(SIZE(SPLIT(text, ' ')) / 5.0) AS INT)), "
                "i -> ARRAY_JOIN(SLICE(SPLIT(text, ' '), (i - 1) * 5 + 1, 5), ' '))"
            )
        ).alias("chunk"),
    )
    freq = chunks.groupBy("chunk").agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.min("doc_id").alias("first_doc"),
    )
    return (
        freq.groupBy("n_copies")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_cross_doc"),
            F.min("first_doc").alias("min_first_doc"),
        )
        .orderBy("n_copies")
    )


_SIM60_BITS = 60  # production-width signature (stays positive in BIGINT)
# Pigeonhole: a guarantee for Hamming distance <= k needs MORE than k bands
# (k differing bits can touch at most k bands, leaving one intact). With
# k = 5 that means 6 bands — 6 x 10 bits; 1024 buckets per band still dwarfs
# q52b's 256.
_SIM60_BAND_BITS = 10  # 6 bands of 10 bits -> 1024 buckets per band
_SIM60_BANDS = 6
_SIM60_K = 5  # max Hamming distance at 60 bits; < _SIM60_BANDS, guaranteed


def _simhash60_sql() -> str:
    variant_sql = f"""SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {_VARIANT_OFFSET} AS doc_id,
             ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[1:LEN(STRING_SPLIT(text, ' ')) - 5], ' ') AS text
      FROM documents
      WHERE doc_id < {_N_VARIANT_DOCS} AND LEN(STRING_SPLIT(text, ' ')) > 5"""
    mask = (1 << _SIM60_BAND_BITS) - 1
    band_values = ", ".join(f"({i})" for i in range(_SIM60_BANDS))
    return f"""{_simhash_sig_ctes(variant_sql, bits=_SIM60_BITS)}
    , bands AS (
      SELECT doc_id, simhash, b.band_idx,
             (simhash >> ({_SIM60_BAND_BITS} * b.band_idx)) & {mask} AS band_val
      FROM sigs CROSS JOIN (VALUES {band_values}) AS b(band_idx)
    ), hot AS (
      SELECT band_idx, band_val FROM bands
      GROUP BY band_idx, band_val HAVING COUNT(*) > {_SIMHAM_BUCKET_CAP}
    ), kept AS (
      SELECT bands.* FROM bands
      ANTI JOIN hot ON bands.band_idx = hot.band_idx
                   AND bands.band_val = hot.band_val
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.simhash AS sig_a, b.simhash AS sig_b
      FROM kept a JOIN kept b
        ON a.band_idx = b.band_idx AND a.band_val = b.band_val
           AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(sig_a, sig_b)) AS BIGINT) AS hamming
    FROM cand
    WHERE bit_count(xor(sig_a, sig_b)) <= {_SIM60_K}
    ORDER BY doc_a, doc_b
    """


@register(
    "q52c_simhash60_hamming",
    sql=_simhash60_sql(),
    tags=("dedup", "simhash", "hamming", "lsh", "scale-path"),
)
def q52c_simhash60_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production-width SimHash retrieval: 60-bit signatures (two combined
    MD5-derived 32-bit hashes; top 4 bits unused so the value stays
    positive in BIGINT on both engines), banded into six 10-bit bands —
    1024 buckets per band instead of q52b's 256, which is what keeps
    bucket populations (and thus the self-join) small on corpora far
    beyond the fixture. By pigeonhole any pair within Hamming distance 5
    shares a full band (5 differing bits touch at most 5 of the 6 bands);
    bit_count(xor) <= 5 is the residual."""
    d = table(spark, sf_dir, "documents")
    corpus = d.select("doc_id", "text").unionByName(_variants(d))
    sigs = _spark_simhash_sigs(corpus, bits=_SIM60_BITS)
    mask = (1 << _SIM60_BAND_BITS) - 1
    bands = sigs.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(_SIM60_BANDS - 1))).alias("band_idx"),
    ).withColumn(
        "band_val",
        F.expr(f"(simhash >> ({_SIM60_BAND_BITS} * band_idx)) & {mask}"),
    )
    from pyspark.sql import Window

    wb = Window.partitionBy("band_idx", "band_val")
    kept = (
        bands.withColumn("_n", F.count(F.lit(1)).over(wb))
        .filter(F.col("_n") <= _SIMHAM_BUCKET_CAP)
        .drop("_n")
    )
    a, b = kept.alias("a"), kept.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.expr("CAST(BIT_COUNT(sig_a ^ sig_b) AS BIGINT)")
        )
        .filter(F.col("hamming") <= _SIM60_K)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# Semantic (embedding-level) dedup — the pipeline operator as a driver query
# ---------------------------------------------------------------------------

_SEM_BANDS = 4
_SEM_BITS = 8  # per band; 32 signature bits total
_SEM_NBITS = _SEM_BANDS * _SEM_BITS
_SEM_CAP = 64
_SEM_THRESHOLD = 0.98
_SEM_N_VARIANTS = 25  # vec_id < 25 get two scaled clones each


def _sem_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The semantic-family fixture corpus: embeddings plus two scaled
    clones (×1.5, ×2.25 — cosine-1.0 piles of three) for each of the
    first ``_SEM_N_VARIANTS`` vectors. Shared by q90 and q266 and
    mirrored verbatim by the oracle's ``corpus`` CTE."""
    e = table(spark, sf_dir, "embeddings")
    orig = e.select(
        "vec_id",
        F.expr("TRANSFORM(embedding, x -> CAST(x AS DOUBLE))").alias("embedding"),
    )

    def clones(offset: int, scale: str) -> DataFrame:
        return e.filter(F.col("vec_id") < _SEM_N_VARIANTS).select(
            (F.col("vec_id") + offset).alias("vec_id"),
            F.expr(f"TRANSFORM(embedding, x -> CAST(x AS DOUBLE) * {scale})").alias(
                "embedding"
            ),
        )

    return orig.unionByName(clones(_VARIANT_OFFSET, "1.5")).unionByName(
        clones(2 * _VARIANT_OFFSET, "2.25")
    )


def _sem_scored_ctes() -> str:
    """Shared oracle CTE chain for the semantic-dedup family: corpus
    (embeddings + two scaled clone piles) → SRP projections (integer-
    quantized BIGINT folds, shared ``SRP_SCALE``) → full signatures →
    the operator's candidate levels (anchor stars, capped buckets,
    hot-bucket fallback) → exact DECIMAL(28,18) full-precision cosine
    per candidate pair (``scored``). Consumed by BOTH q90 (dedup
    decisions) and q266 (store-verifier audit), so the audit scores
    exactly the universe the operator decides on — mirrored Spark-side
    by `text.pipeline.semantic_candidate_scores`."""
    from ..functions.hashing import SRP_SCALE

    h = duckdb_hash32(
        "CONCAT(CAST(j AS VARCHAR), ':', CAST(pos AS VARCHAR))", "srp"
    )
    return f"""
    WITH RECURSIVE corpus AS (
      SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
      UNION ALL
      SELECT vec_id + {_VARIANT_OFFSET},
             LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE) * 1.5)
      FROM embeddings WHERE vec_id < {_SEM_N_VARIANTS}
      UNION ALL
      SELECT vec_id + {2 * _VARIANT_OFFSET},
             LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE) * 2.25)
      FROM embeddings WHERE vec_id < {_SEM_N_VARIANTS}
    ), elems AS (
      SELECT vec_id, i - 1 AS pos, emb[i] AS v
      FROM (SELECT vec_id, emb, UNNEST(RANGE(1, LEN(emb) + 1)) AS i
            FROM corpus)
    ), hyper AS (
      SELECT j, pos, ({h} % 1001) - 500 AS h
      FROM (SELECT UNNEST(RANGE(0, {_SEM_NBITS})) AS j)
      CROSS JOIN (SELECT DISTINCT pos FROM elems)
    ), proj AS (
      SELECT vec_id, j,
             SUM(CAST(FLOOR(v * h * {SRP_SCALE}) AS BIGINT)) AS proj
      FROM elems JOIN hyper USING (pos)
      GROUP BY vec_id, j
    ), sigs AS (
      SELECT vec_id,
             STRING_AGG(CASE WHEN proj >= 0 THEN '1' ELSE '0' END, ''
                        ORDER BY j) AS fullsig
      FROM proj GROUP BY vec_id
    ), star AS (
      SELECT MIN(vec_id) OVER (PARTITION BY fullsig) AS id_a,
             vec_id AS id_b
      FROM sigs
    ), bands AS (
      SELECT vec_id, CAST(j // {_SEM_BITS} AS INT) AS band,
             SUM((CASE WHEN proj >= 0 THEN 1 ELSE 0 END)
                 << CAST(j % {_SEM_BITS} AS INT)) AS bval
      FROM proj GROUP BY vec_id, band
    ), bstat AS (
      SELECT vec_id, band, bval,
             COUNT(*) OVER (PARTITION BY band, bval) AS bn,
             MIN(vec_id) OVER (PARTITION BY band, bval) AS bmin
      FROM bands
    ), cand AS (
      SELECT DISTINCT id_a, id_b FROM (
        SELECT id_a, id_b FROM star WHERE id_a != id_b
        UNION ALL
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM bstat a JOIN bstat b
          ON a.band = b.band AND a.bval = b.bval AND a.vec_id < b.vec_id
        WHERE a.bn <= {_SEM_CAP} AND b.bn <= {_SEM_CAP}
        UNION ALL
        SELECT bmin AS id_a, vec_id AS id_b
        FROM bstat WHERE bn > {_SEM_CAP} AND vec_id != bmin
      )
    ), norm_terms AS (
      SELECT vec_id, emb, UNNEST(RANGE(1, LEN(emb) + 1)) AS i FROM corpus
    ), base AS (
      SELECT vec_id, ANY_VALUE(emb) AS emb,
             SQRT(CAST(SUM(CAST(emb[i] * emb[i] AS {_DOT_DEC})) AS DOUBLE))
               AS nrm
      FROM norm_terms GROUP BY vec_id
    ), pair_terms AS (
      SELECT id_a, id_b, ea, eb, na, nb, UNNEST(RANGE(1, LEN(ea) + 1)) AS i
      FROM (SELECT c.id_a, c.id_b, a.emb AS ea, b.emb AS eb,
                   a.nrm AS na, b.nrm AS nb
            FROM cand c
              JOIN base a ON a.vec_id = c.id_a
              JOIN base b ON b.vec_id = c.id_b)
    ), scored AS (
      SELECT id_a, id_b,
             CAST(SUM(CAST(ea[i] * eb[i] AS {_DOT_DEC})) AS DOUBLE)
               / (ANY_VALUE(na) * ANY_VALUE(nb)) AS cosine
      FROM pair_terms GROUP BY id_a, id_b
    )
    """


def _semantic_dedup_sql() -> str:
    """DuckDB oracle for ``text.pipeline.drop_semantic_duplicates``:
    the shared candidate/score chain (`_sem_scored_ctes`) plus the
    threshold gate and the q58-style ``WITH RECURSIVE`` min-label
    connected components. The kept set is the corpus minus every node
    whose component minimum is not itself."""
    return _sem_scored_ctes() + f""", edges AS (
      SELECT id_a, id_b FROM scored WHERE cosine >= {_SEM_THRESHOLD}
      UNION ALL
      SELECT id_b AS id_a, id_a AS id_b
      FROM scored WHERE cosine >= {_SEM_THRESHOLD}
    ), reach(vec_id, label) AS (
      SELECT DISTINCT id_a AS vec_id, id_a AS label FROM edges
      UNION
      SELECT e.id_a AS vec_id, r.label
      FROM reach r JOIN edges e ON e.id_b = r.vec_id
      WHERE r.label < e.id_a
    ), dupes AS (
      SELECT vec_id FROM reach GROUP BY vec_id
      HAVING MIN(label) != vec_id
    )
    SELECT c.vec_id
    FROM corpus c ANTI JOIN dupes d ON c.vec_id = d.vec_id
    ORDER BY c.vec_id
    """


@register(
    "q90_semantic_dedup",
    sql=_semantic_dedup_sql(),
    tags=("dedup", "semantic", "embedding", "pipeline", "clustering"),
)
def q90_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-level (semantic) dedup, exercising the REAL pipeline
    operator ``text.pipeline.drop_semantic_duplicates`` end to end: the
    corpus is the embeddings table plus two planted scaled clones
    (×1.5, ×2.25 — cosine 1.0 piles of three) for each of the first
    {n} vectors; the operator must collapse every pile to its
    minimum-id representative while leaving the mutually-distant
    fixture vectors untouched. Output is the kept id set — a full
    value-hash over it verifies the dropped set exactly.

    Scale shape (the operator's own): SRP signatures map-side; level-1
    anchor stars shuffle one row per vector keyed by full signature
    (linear on duplicate piles); level-2 shuffles (band, bval) keys
    with ≤ cap²/2 pairs per small bucket and anchor-star fallback on
    hot buckets; exact decimal cosine gates edges; CC is O(diameter)
    shuffles. No all-pairs product anywhere.
    """
    from ..text.pipeline import drop_semantic_duplicates

    corpus = _sem_corpus(spark, sf_dir)
    kept = drop_semantic_duplicates(
        corpus,
        threshold=_SEM_THRESHOLD,
        id_col="vec_id",
        vec_col="embedding",
        srp_bands=_SEM_BANDS,
        srp_bits=_SEM_BITS,
        bucket_cap=_SEM_CAP,
    )
    return kept.select("vec_id").orderBy("vec_id")


# ---------------------------------------------------------------------------
# q266 — graded parity audit of the incremental semantic store's
# QUANTIZED verifier (text/incremental_semantic.py): store-side dedup
# decisions must equal full-precision decisions on the fixture corpus.
# ---------------------------------------------------------------------------


def _q266_sql() -> str:
    """Oracle: the shared candidate/score chain, plus the STORE's
    verifier leg — the kept side (``id_a``, what the store holds)
    round-tripped through the int8 affine quantizer
    (`similarity/quantize.py`, mirrored arithmetic step for step:
    per-vector min/max range, scale (mx-mn)/255, ROUND half-away level,
    dequant mn + level·scale) and re-scored against the full-precision
    new side. Output: one census row over every candidate pair —
    decision counts under both verifiers, disagreements, and the
    measured cosine error in integer micro."""
    return _sem_scored_ctes() + f""", qparams AS (
      SELECT vec_id,
             LIST_MIN(emb) AS q_mn,
             CASE WHEN LIST_MAX(emb) = LIST_MIN(emb) THEN CAST(0 AS DOUBLE)
                  ELSE (LIST_MAX(emb) - LIST_MIN(emb)) / 255.0 END AS q_scale
      FROM corpus
    ), deq AS (
      SELECT c.vec_id,
             LIST_TRANSFORM(c.emb, x -> q.q_mn +
                 CAST(ROUND(CASE WHEN q.q_scale = 0 THEN 0
                                 ELSE (x - q.q_mn) / q.q_scale END)
                      AS DOUBLE) * q.q_scale) AS emb
      FROM corpus c JOIN qparams q USING (vec_id)
    ), dnorm_terms AS (
      SELECT vec_id, emb, UNNEST(RANGE(1, LEN(emb) + 1)) AS i FROM deq
    ), dbase AS (
      SELECT vec_id, ANY_VALUE(emb) AS emb,
             SQRT(CAST(SUM(CAST(emb[i] * emb[i] AS {_DOT_DEC})) AS DOUBLE))
               AS nrm
      FROM dnorm_terms GROUP BY vec_id
    ), store_pair_terms AS (
      SELECT id_a, id_b, ea, eb, na, nb, UNNEST(RANGE(1, LEN(ea) + 1)) AS i
      FROM (SELECT c.id_a, c.id_b, a.emb AS ea, b.emb AS eb,
                   a.nrm AS na, b.nrm AS nb
            FROM cand c
              JOIN dbase a ON a.vec_id = c.id_a
              JOIN base b ON b.vec_id = c.id_b)
    ), store_scored AS (
      SELECT id_a, id_b,
             CAST(SUM(CAST(ea[i] * eb[i] AS {_DOT_DEC})) AS DOUBLE)
               / (ANY_VALUE(na) * ANY_VALUE(nb)) AS s_cosine
      FROM store_pair_terms GROUP BY id_a, id_b
    ), census AS (
      SELECT f.cosine AS cf, s.s_cosine AS cs
      FROM scored f JOIN store_scored s USING (id_a, id_b)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN cf >= {_SEM_THRESHOLD} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_full,
           CAST(SUM(CASE WHEN cs >= {_SEM_THRESHOLD} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_store,
           CAST(SUM(CASE WHEN (cf >= {_SEM_THRESHOLD})
                          != (cs >= {_SEM_THRESHOLD})
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_disagree,
           CAST(MAX(FLOOR(ABS(cf - cs) * 1000000)) AS BIGINT)
               AS max_err_micro,
           CAST(SUM(FLOOR(ABS(cf - cs) * 1000000)) AS BIGINT)
               AS sum_err_micro
    FROM census
    """


@register(
    "q266_semantic_store_verifier_audit",
    sql=_q266_sql(),
    tags=("dedup", "semantic", "incremental", "audit", "quantize"),
)
def q266_semantic_store_verifier_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Graded parity audit of the incremental semantic store's verifier
    (`text/incremental_semantic.py`): the store keeps int8-quantized
    embeddings and verifies candidate cosines with the KEPT side
    dequantized — this census pins, pair by pair over the operator's
    own candidate universe (`text.pipeline.semantic_candidate_scores` —
    the q90 levels), that the quantized verifier reaches the SAME
    dedup decisions as full precision, and measures the cosine error it
    actually pays (max and total, integer micro). The module's
    documented bound is O(1e-3) at d=64; on this fixture the decision
    disagreement count is 0 (drill-asserted) and the oracle hash pins
    every census value, so any quantizer or verifier drift — a changed
    rounding mode, a lost affine term — breaks this query before it
    silently weakens the store.

    Scale shape: signatures and quantization are map-side; candidates
    shuffle (band, bval) and signature keys only (capped buckets); both
    verifier legs touch candidate PAIRS, never a corpus product — the
    same shape as the store's own batch step."""
    from ..similarity.knn import _with_norm, cosine_expr
    from ..similarity.quantize import quantize_int8
    from ..text.incremental_semantic import _dequant_expr
    from ..text.pipeline import semantic_candidate_scores

    corpus = _sem_corpus(spark, sf_dir)
    scores = semantic_candidate_scores(
        corpus,
        id_col="vec_id",
        vec_col="embedding",
        srp_bands=_SEM_BANDS,
        srp_bits=_SEM_BITS,
        bucket_cap=_SEM_CAP,
    )
    base = corpus.select(
        "vec_id",
        F.expr("TRANSFORM(embedding, x -> CAST(x AS DOUBLE))").alias("_v"),
    )
    deq = quantize_int8(base, "_v").select(
        "vec_id", F.expr(_dequant_expr()).alias("_dv")
    )
    deqn = _with_norm(deq, "_dv").select(
        F.col("vec_id").alias("id_a"),
        F.col("_dv"),
        F.col("_nrm").alias("_dn"),
    )
    legs = (
        scores.select("id_a", "id_b", "_cos", "_vb", "_nb")
        .join(deqn, "id_a")
        .withColumn("_scos", F.expr(cosine_expr("_dv", "_vb", "_dn", "_nb")))
    )
    t = _SEM_THRESHOLD
    err = "CAST(FLOOR(ABS(_cos - _scos) * 1000000) AS BIGINT)"
    return legs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.expr(f"SUM(CASE WHEN _cos >= {t} THEN 1 ELSE 0 END)")
        .cast("bigint")
        .alias("n_dup_full"),
        F.expr(f"SUM(CASE WHEN _scos >= {t} THEN 1 ELSE 0 END)")
        .cast("bigint")
        .alias("n_dup_store"),
        F.expr(
            f"SUM(CASE WHEN (_cos >= {t}) != (_scos >= {t})"
            " THEN 1 ELSE 0 END)"
        )
        .cast("bigint")
        .alias("n_disagree"),
        F.expr(f"MAX({err})").alias("max_err_micro"),
        F.expr(f"SUM({err})").cast("bigint").alias("sum_err_micro"),
    )


# ---------------------------------------------------------------------------
# Content-defined chunking (CDC)
# ---------------------------------------------------------------------------

_CDC_WIN = 8  # rolling-window width, characters
_CDC_DIV = 64  # boundary divisor -> ~64-char expected chunk length


def _cdc_window_hash(text_col: str, pos_col: str) -> str:
    """The shared CDC rolling hash (functions/hashing.py) at this module's
    window width — q93 and text/cdc.py must cut identically."""
    from ..functions.hashing import cdc_window_hash

    return cdc_window_hash(text_col, pos_col, _CDC_WIN)


@register(
    "q93_cdc_chunk_dedup",
    sql=f"""
    WITH docs AS (
      SELECT doc_id, source, text FROM documents
      WHERE doc_id < 200 AND length(text) >= {_CDC_WIN}
    ), pos AS (
      SELECT doc_id, text,
             UNNEST(generate_series(1, length(text) - {_CDC_WIN - 1})) AS p
      FROM docs
    ), cuts AS (
      SELECT DISTINCT doc_id, end_pos FROM (
        SELECT doc_id, p + {_CDC_WIN - 1} AS end_pos
        FROM pos WHERE {_cdc_window_hash('text', 'p')} % {_CDC_DIV} = 0
        UNION ALL
        SELECT doc_id, length(text) AS end_pos FROM docs) u
    ), spans AS (
      SELECT doc_id, end_pos,
             COALESCE(LAG(end_pos) OVER (PARTITION BY doc_id ORDER BY end_pos),
                      0) + 1 AS start_pos
      FROM cuts
    ), chunks AS (
      SELECT d.source,
             md5(substr(d.text, CAST(s.start_pos AS INT),
                        CAST(s.end_pos - s.start_pos + 1 AS INT))) AS chunk_hash,
             s.end_pos - s.start_pos + 1 AS chunk_len
      FROM spans s JOIN docs d USING (doc_id)
    )
    SELECT source,
           COUNT(*) AS n_chunks,
           COUNT(DISTINCT chunk_hash) AS n_unique_chunks,
           CAST(SUM(chunk_len) AS BIGINT) AS total_chars,
           MAX(chunk_len) AS max_chunk_len
    FROM chunks
    GROUP BY source
    ORDER BY source
    """,
    tags=("dedup", "cdc", "chunking"),
)
def q93_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking + chunk-level dedup: cut each document where
    the polynomial hash of the trailing 8-char window ≡ 0 (mod 64) — the
    Rabin/Gear-CDC boundary rule, so an insertion early in a document shifts
    at most one chunk instead of re-aligning every fixed-size block (q86's
    failure mode). Chunks are identified by md5; per-source output reports
    chunk count, unique-chunk count, and size stats.

    The rolling hash is a pure-BIGINT codepoint polynomial (no libm, no
    engine-specific hash), so boundaries — and therefore chunk md5s — are
    bit-identical in Spark and DuckDB.

    Scale shape: the position explode (rows = corpus characters) is narrow —
    boundary filtering happens before any exchange, so only ~1/64 of
    positions survive to the doc_id-keyed window; chunk extraction joins the
    tiny cut list back to the doc text; the final agg is a two-level
    (source-keyed) combine. One corpus scan, two small shuffles.
    """
    from pyspark.sql import Window

    docs = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") < 200) & (F.length("text") >= _CDC_WIN))
        .select("doc_id", "source", "text")
    )
    pos = docs.select(
        "doc_id",
        "text",
        F.explode(
            F.sequence(F.lit(1), F.length("text") - (_CDC_WIN - 1))
        ).alias("p"),
    )
    bounds = pos.filter(
        F.expr(f"({_cdc_window_hash('text', 'p')}) % {_CDC_DIV} = 0")
    ).select("doc_id", (F.col("p") + (_CDC_WIN - 1)).alias("end_pos"))
    cuts = bounds.unionByName(
        docs.select("doc_id", F.length("text").cast("bigint").alias("end_pos"))
    ).distinct()
    w = Window.partitionBy("doc_id").orderBy("end_pos")
    spans = cuts.select(
        "doc_id",
        "end_pos",
        (F.coalesce(F.lag("end_pos").over(w), F.lit(0)) + 1).alias("start_pos"),
    )
    # broadcast of document TEXT is safe ONLY because this oracle query is
    # bounded to the doc_id < 200 fixture slice; the production CDC API
    # (text/cdc.py::chunk_documents_cdc) key-joins spans to docs instead
    chunks = spans.join(F.broadcast(docs), "doc_id").select(
        "source",
        F.md5(
            F.expr(
                "substr(text, CAST(start_pos AS INT),"
                " CAST(end_pos - start_pos + 1 AS INT))"
            )
        ).alias("chunk_hash"),
        (F.col("end_pos") - F.col("start_pos") + 1).alias("chunk_len"),
    )
    return (
        chunks.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.countDistinct("chunk_hash").alias("n_unique_chunks"),
            F.sum("chunk_len").alias("total_chars"),
            F.max("chunk_len").alias("max_chunk_len"),
        )
        .orderBy("source")
    )


@register(
    "q165_cdc_novelty",
    sql=f"""
    WITH docs AS (
      SELECT doc_id, text FROM documents
      WHERE doc_id < 200 AND length(text) >= {_CDC_WIN}
    ), pos AS (
      SELECT doc_id, text,
             UNNEST(generate_series(1, length(text) - {_CDC_WIN - 1})) AS p
      FROM docs
    ), cuts AS (
      SELECT DISTINCT doc_id, end_pos FROM (
        SELECT doc_id, p + {_CDC_WIN - 1} AS end_pos
        FROM pos WHERE {_cdc_window_hash('text', 'p')} % {_CDC_DIV} = 0
        UNION ALL
        SELECT doc_id, length(text) AS end_pos FROM docs) u
    ), spans AS (
      SELECT doc_id, end_pos,
             COALESCE(LAG(end_pos) OVER (PARTITION BY doc_id ORDER BY end_pos),
                      0) + 1 AS start_pos
      FROM cuts
    ), chunks AS (
      SELECT s.doc_id, s.start_pos,
             md5(substr(d.text, CAST(s.start_pos AS INT),
                        CAST(s.end_pos - s.start_pos + 1 AS INT))) AS chunk_hash,
             s.end_pos - s.start_pos + 1 AS chunk_len
      FROM spans s JOIN docs d USING (doc_id)
    ), flagged AS (
      SELECT doc_id, chunk_len,
             ROW_NUMBER() OVER (PARTITION BY chunk_hash
                                ORDER BY doc_id, start_pos) AS rk
      FROM chunks
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
           CAST(SUM(CASE WHEN rk = 1 THEN chunk_len ELSE 0 END)
                AS BIGINT) AS novel_chars,
           CAST(SUM(CASE WHEN rk = 1 THEN chunk_len ELSE 0 END) * 1000000
                // SUM(chunk_len) AS BIGINT) AS novelty_ppm
    FROM flagged
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    tags=("dedup", "cdc", "novelty", "chunking"),
)
def q165_cdc_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC chunk-level novelty per document: a chunk is NOVEL iff its hash
    first occurs in this document (corpus order = (doc_id, chunk offset)),
    and a document's novelty is the fraction of its characters inside
    novel chunks, in exact integer ppm. The batch analog — and the oracle
    pin — of ``text/cdc.py::incremental_cdc_batch``'s per-doc stats: a
    re-crawled boilerplate page scores ~0, fresh content ~10⁶. Runs the
    production API (`chunk_documents_cdc`, keyed span→text join) under
    the DuckDB oracle, so the API's cut positions and hashes — not a
    parallel reimplementation — are what the driver verifies.

    Scale shape: the API's chunking plan (map-side boundary filter, one
    id-keyed window, one keyed join) plus ONE chunk_hash-keyed window for
    first-occurrence attribution and a doc_id-keyed final agg."""
    from pyspark.sql import Window

    from ..text.cdc import chunk_documents_cdc

    docs = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") < 200) & (F.length("text") >= _CDC_WIN))
        .select("doc_id", "text")
    )
    chunks = chunk_documents_cdc(docs, win=_CDC_WIN, div=_CDC_DIV)
    w = Window.partitionBy("chunk_hash").orderBy("doc_id", "chunk_idx")
    flagged = chunks.withColumn("rk", F.row_number().over(w))
    novel_len = F.when(F.col("rk") == 1, F.col("chunk_len")).otherwise(F.lit(0))
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("rk") == 1, 1).otherwise(0)).alias("n_novel"),
            F.sum(novel_len).alias("novel_chars"),
            F.expr(
                "SUM(CASE WHEN rk = 1 THEN chunk_len ELSE 0 END) * 1000000"
                " DIV SUM(chunk_len)"
            ).alias("novelty_ppm"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Exact-substring (repeated token-window) span dedup
# ---------------------------------------------------------------------------

_XS_W = 8  # token-window width for repeated-span detection
_XS_PLANT_MOD = 17  # doc_id % 17 == 2 get the probe window planted


@register(
    "q97_exact_substr_spans",
    sql=f"""
    WITH probe AS (
      SELECT ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[1:{_XS_W}], ' ') AS g0
      FROM documents WHERE doc_id = 0
    ), seeded AS (
      SELECT doc_id, source,
             CASE WHEN doc_id % {_XS_PLANT_MOD} = 2 AND doc_id <> 0
                  THEN text || ' ' || g0 ELSE text END AS text
      FROM documents CROSS JOIN probe
    ), toks AS (
      SELECT doc_id, source, STRING_SPLIT(text, ' ') AS ws,
             LEN(STRING_SPLIT(text, ' ')) AS n_tok
      FROM seeded
    ), pos AS (
      SELECT doc_id, i,
             {duckdb_hash32(f"ARRAY_TO_STRING(ws[i:i+{_XS_W - 1}], ' ')", "xs")} AS gh
      FROM (SELECT doc_id, ws,
                   UNNEST(RANGE(1, n_tok - {_XS_W - 2})) AS i
            FROM toks WHERE n_tok >= {_XS_W})
    ), dup AS (
      SELECT doc_id, i FROM (
        SELECT doc_id, i, COUNT(*) OVER (PARTITION BY gh) AS c FROM pos)
      WHERE c >= 2
    ), covered AS (
      SELECT DISTINCT doc_id, i + u.j AS p
      FROM dup, UNNEST(RANGE(0, {_XS_W})) AS u(j)
    ), per_doc AS (
      SELECT doc_id, COUNT(*) AS dup_tok FROM covered GROUP BY doc_id
    )
    SELECT t.source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN p.dup_tok IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_docs,
           CAST(COALESCE(SUM(p.dup_tok), 0) AS BIGINT) AS dup_tokens,
           CAST(SUM(t.n_tok) AS BIGINT) AS total_tokens
    FROM toks t LEFT JOIN per_doc p ON t.doc_id = p.doc_id
    GROUP BY t.source
    ORDER BY t.source
    """,
    tags=("dedup", "exact-substr", "spans", "window"),
)
def q97_exact_substr_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring span dedup (the ExactSubstr operator of
    "Deduplicating Training Data Makes Language Models Better", Lee et
    al. 2022): find every {_XS_W}-token window occurring >= 2 times
    ANYWHERE in the corpus, merge each document's duplicated windows into
    maximal spans, and report per-source duplicated-token totals — the
    token-level complement of the document-level families (q50-q54): it
    catches boilerplate and quotation reuse inside otherwise-unique
    documents. Docs with doc_id % 17 == 2 get the probe window planted so
    the detector is observable on the clean fixture.

    Scale shape: windows shuffle ONCE keyed by a 32-bit portable gram
    hash (3 ints per row — the gram string itself never leaves the map
    side), a count-over-hash window marks repeats, and span merging is
    gaps-and-islands over each document's duplicate starts (running-max
    window over a doc-keyed exchange) — O(starts) per doc, versus the
    oracle's w-times position explode, which is the naive form this plan
    deliberately avoids. Like q53, the token-count shuffle is intrinsic
    to exact semantics; the suffix-array single-node form in the paper is
    replaced by hash-window grouping, which distributes.
    """
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    probe = d.filter(F.col("doc_id") == 0).select(
        F.expr(f"ARRAY_JOIN(SLICE(SPLIT(text, ' '), 1, {_XS_W}), ' ')").alias("g0")
    )
    seeded = d.join(F.broadcast(probe)).select(
        "doc_id",
        "source",
        F.when(
            (F.col("doc_id") % _XS_PLANT_MOD == 2) & (F.col("doc_id") != 0),
            F.concat_ws(" ", F.col("text"), F.col("g0")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    toks = seeded.select(
        "doc_id",
        "source",
        F.split("text", " ").alias("ws"),
        F.size(F.split("text", " ")).alias("n_tok"),
    )
    pos = (
        toks.filter(F.col("n_tok") >= _XS_W)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"TRANSFORM(SEQUENCE(1, n_tok - {_XS_W - 1}), "
                    f"i -> STRUCT(i AS i, "
                    f"ARRAY_JOIN(SLICE(ws, i, {_XS_W}), ' ') AS gram))"
                )
            ).alias("w"),
        )
        .select(
            "doc_id",
            F.col("w.i").alias("i"),
            F.expr(spark_hash32("w.gram", "xs")).alias("gh"),
        )
    )
    dup = (
        pos.withColumn("c", F.count(F.lit(1)).over(Window.partitionBy("gh")))
        .filter(F.col("c") >= 2)
        .select("doc_id", "i")
    )
    wdoc = Window.partitionBy("doc_id").orderBy("i")
    prev_end = F.max(F.col("i") + (_XS_W - 1)).over(
        wdoc.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = dup.withColumn(
        "is_new", F.when(prev_end.isNull() | (F.col("i") > prev_end), 1).otherwise(0)
    ).withColumn(
        "island",
        F.sum("is_new").over(wdoc.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_doc = (
        islands.groupBy("doc_id", "island")
        .agg((F.max("i") + (_XS_W - 1) - F.min("i") + 1).alias("span_tok"))
        .groupBy("doc_id")
        .agg(F.sum("span_tok").alias("dup_tok"))
    )
    return (
        toks.join(per_doc, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("dup_tok").isNotNull(), 1).otherwise(0)).alias(
                "n_dup_docs"
            ),
            F.coalesce(F.sum("dup_tok"), F.lit(0)).cast("bigint").alias("dup_tokens"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# First-seen novelty scoring (keep-first attribution)
# ---------------------------------------------------------------------------

_NV_W = 8  # token-window width
_NV_PPM = 800_000  # low-novelty flag threshold (80% as parts-per-million)


@register(
    "q99_novelty_score",
    sql=f"""
    WITH toks AS (
      SELECT doc_id, source, STRING_SPLIT(text, ' ') AS ws,
             LEN(STRING_SPLIT(text, ' ')) AS n_tok
      FROM documents
    ), pos AS (
      SELECT doc_id,
             {duckdb_hash32(f"ARRAY_TO_STRING(ws[i:i+{_NV_W - 1}], ' ')", "nv")} AS gh
      FROM (SELECT doc_id, ws,
                   UNNEST(RANGE(1, n_tok - {_NV_W - 2})) AS i
            FROM toks WHERE n_tok >= {_NV_W})
    ), attributed AS (
      SELECT doc_id, MIN(doc_id) OVER (PARTITION BY gh) AS first_doc
      FROM pos
    ), per_doc AS (
      SELECT doc_id,
             COUNT(*) AS n_win,
             CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT)
               AS n_novel
      FROM attributed GROUP BY doc_id
    )
    SELECT t.source,
           COUNT(*) AS n_docs,
           CAST(SUM(p.n_win) AS BIGINT) AS total_windows,
           CAST(SUM(p.n_novel) AS BIGINT) AS novel_windows,
           CAST(SUM(CASE WHEN p.n_novel * 1000000 < {_NV_PPM} * p.n_win
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_low_novelty
    FROM toks t JOIN per_doc p ON t.doc_id = p.doc_id
    GROUP BY t.source
    ORDER BY t.source
    """,
    tags=("dedup", "novelty", "keep-first"),
)
def q99_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-seen novelty scoring: every 8-token window is attributed to
    the LOWEST doc_id containing it (the keep-first rule incremental
    dedup pipelines apply), and each document is scored by the fraction
    of its windows it saw first. Later crawls of recycled content score
    low and get flagged (< 80% novel) — the ranking signal behind
    "keep the canonical copy, drop the scrapes", complementing q97
    (which measures duplication but does not pick a survivor).

    The fixture corpus has natural repeated 8-grams (small word
    vocabulary), so no contamination planting is needed — the operator
    runs on the raw table.

    Scale shape: same single gram-hash-keyed exchange as q97 (3 ints per
    window, gram strings never leave the map side) with min-over-window
    attribution instead of count; the per-doc rollup is a map-combined
    aggregation on doc_id. Deterministic: min(doc_id) needs no
    tie-break."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        F.split("text", " ").alias("ws"),
        F.size(F.split("text", " ")).alias("n_tok"),
    )
    pos = (
        toks.filter(F.col("n_tok") >= _NV_W)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"TRANSFORM(SEQUENCE(1, n_tok - {_NV_W - 1}), "
                    f"i -> ARRAY_JOIN(SLICE(ws, i, {_NV_W}), ' '))"
                )
            ).alias("gram"),
        )
        .select("doc_id", F.expr(spark_hash32("gram", "nv")).alias("gh"))
    )
    attributed = pos.select(
        "doc_id",
        F.min("doc_id").over(Window.partitionBy("gh")).alias("first_doc"),
    )
    per_doc = attributed.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_win"),
        F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_novel"),
    )
    return (
        toks.join(per_doc, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_win").cast("bigint").alias("total_windows"),
            F.sum("n_novel").cast("bigint").alias("novel_windows"),
            F.sum(
                F.when(
                    F.col("n_novel") * 1_000_000 < _NV_PPM * F.col("n_win"), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_low_novelty"),
        )
        .orderBy("source")
    )


@register(
    "q135_duplication_report",
    sql=f"""{_simhash_sig_ctes()}
    , clusters AS (
      SELECT simhash, COUNT(*) AS cluster_size
      FROM sigs GROUP BY simhash
    )
    SELECT cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(cluster_size) AS BIGINT) AS n_docs,
           CAST(SUM(cluster_size) - COUNT(*) AS BIGINT) AS n_removable
    FROM clusters
    GROUP BY cluster_size
    ORDER BY cluster_size
    """,
    tags=("dedup", "simhash", "report", "histogram"),
)
def q135_duplication_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The duplication census run BEFORE any dedup pass: the histogram of
    near-dup cluster sizes (identical 32-bit SimHash) with, per size, how
    many documents sit in such clusters and how many a keep-one policy
    would remove — the numbers that decide whether dedup is worth a full
    pass at all (n_removable summed = the corpus's duplication overhead).

    Scale shape: signatures from the shared kernel, then two nested
    counts — signature-keyed (combines map-side) and size-keyed (key
    space = distinct cluster sizes, tiny). Nothing pairwise, no text
    past the first aggregation. The same census over q52c's 60-bit
    production signatures or exact MD5 fingerprints (q50) is a one-line
    swap of the signature source."""
    d = table(spark, sf_dir, "documents")
    clusters = (
        _spark_simhash_sigs(d.select("doc_id", "text"))
        .groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
    )
    return (
        clusters.groupBy("cluster_size")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
            F.sum("cluster_size").cast("bigint").alias("n_docs"),
            (F.sum("cluster_size") - F.count(F.lit(1)))
            .cast("bigint")
            .alias("n_removable"),
        )
        .orderBy("cluster_size")
    )


# ---------------------------------------------------------------------------
# q152 — keep-best-copy canonical selection
# ---------------------------------------------------------------------------
# Dedup policy, not just dedup mechanics: when a cluster holds several
# near-identical copies, WHICH one survives matters — min-id ("first
# seen", append-stable) vs best-quality ("most complete copy", what a
# curation pass actually wants). This registers the longest-copy policy
# (quality stand-in: n_chars; `annotate_quality`'s score slots into the
# same ORDER BY) over exact-SimHash clusters, reporting per source how
# much survives and where the two policies pick DIFFERENT canonicals —
# the auditable delta of switching policy. Programmatic twin:
# `text/pipeline.py::drop_near_duplicates(keep="longest")`.


@register(
    "q152_keep_best_copy",
    sql=f"""{_simhash_sig_ctes()}
    , meta AS (
      SELECT s.doc_id, s.simhash, c.source, LENGTH(c.text) AS n_chars
      FROM sigs s JOIN corpus_meta c ON c.doc_id = s.doc_id
    ), ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY simhash
                                ORDER BY n_chars DESC, doc_id) AS rk,
             MIN(doc_id) OVER (PARTITION BY simhash) AS min_id
      FROM meta
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(CASE WHEN rk = 1 THEN 1 END) AS BIGINT) AS n_kept,
           CAST(COUNT(CASE WHEN rk > 1 THEN 1 END) AS BIGINT) AS n_dropped,
           CAST(SUM(CASE WHEN rk = 1 THEN n_chars ELSE 0 END) AS BIGINT)
             AS kept_chars,
           CAST(COUNT(CASE WHEN rk = 1 AND doc_id != min_id THEN 1 END)
                AS BIGINT) AS n_policy_divergent
    FROM ranked
    GROUP BY source
    ORDER BY source
    """.replace(
        "SELECT doc_id, text FROM documents",
        "SELECT doc_id, text FROM media_corpus",
    ).replace(
        "WITH corpus AS (",
        """WITH media_corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 20000000 AS doc_id,
             text || ' extra trailing context words' AS text
      FROM documents WHERE doc_id % 20 = 0
    ), corpus_meta AS (
      SELECT doc_id, text,
             CASE WHEN doc_id >= 20000000 THEN 'clones' ELSE
               (SELECT d.source FROM documents d WHERE d.doc_id = media_corpus.doc_id)
             END AS source
      FROM media_corpus
    ), corpus AS (""",
    ),
    tags=("dedup", "simhash", "policy", "curation"),
)
def q152_keep_best_copy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-best-copy dedup: per exact-SimHash cluster the LONGEST copy
    survives (ties → lower id), against a corpus where every 20th
    document has a planted longer superset copy — the policy keeps the
    superset where min-id would keep the original, and
    ``n_policy_divergent`` counts exactly those flips per source.

    Scale shape: signatures from the shared kernel (one doc-keyed agg),
    then one simhash-keyed window pass and a per-source rollup — nothing
    pairwise; policy choice is an ORDER BY swap, free at any scale."""
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    clones = d.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 20000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra trailing context words")).alias(
            "text"
        ),
        F.lit("clones").alias("source"),
    )
    corpus = d.unionByName(clones)
    sigs = _spark_simhash_sigs(corpus.select("doc_id", "text"))
    meta = sigs.join(
        corpus.select("doc_id", "source", F.length("text").alias("n_chars")),
        "doc_id",
    )
    w = Window.partitionBy("simhash").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    wm = Window.partitionBy("simhash")
    ranked = meta.withColumn("rk", F.row_number().over(w)).withColumn(
        "min_id", F.min("doc_id").over(wm)
    )
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count(F.when(F.col("rk") == 1, 1)).cast("bigint").alias("n_kept"),
            F.count(F.when(F.col("rk") > 1, 1)).cast("bigint").alias("n_dropped"),
            F.sum(F.when(F.col("rk") == 1, F.col("n_chars")).otherwise(0))
            .cast("bigint")
            .alias("kept_chars"),
            F.count(
                F.when((F.col("rk") == 1) & (F.col("doc_id") != F.col("min_id")), 1)
            )
            .cast("bigint")
            .alias("n_policy_divergent"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q171 — LSH banding precision audit (exact vs estimated Jaccard)
# ---------------------------------------------------------------------------
# The monitoring query a production LSH deployment runs on a sample: for
# every candidate pair the banding surfaces, the EXACT shingle-set Jaccard
# next to the signature ESTIMATE — false positives (candidates whose true
# overlap is low) quantify wasted verify work, and the est−exact gap
# audits the signature width. Both values in exact integer ppm, so the
# whole report hash-matches; the texts are re-read ONLY for the bounded
# candidate set (the audit sample), never corpus-wide.


@register(
    "q171_lsh_precision_audit",
    sql=(
        _minhash_jaccard_sql()
        .split("SELECT doc_a, doc_b,")[0]
        + f""", shingle_sets AS (
      SELECT DISTINCT doc_id, h FROM shingled
    ), set_sizes AS (
      SELECT doc_id, COUNT(*) AS n_sh FROM shingle_sets GROUP BY doc_id
    ), inter AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
      FROM cand c
        JOIN shingle_sets sa ON sa.doc_id = c.doc_a
        JOIN shingle_sets sb ON sb.doc_id = c.doc_b AND sb.h = sa.h
      GROUP BY c.doc_a, c.doc_b
    )
    SELECT c.doc_a, c.doc_b,
           CAST(({" + ".join(f"(CASE WHEN a.mh_{i} = b.mh_{i} THEN 1 ELSE 0 END)" for i in range(_N_SEEDS))})
                * 1000000 // {_N_SEEDS} AS BIGINT) AS est_ppm,
           CAST(COALESCE(i.n_inter, 0) * 1000000
                // (za.n_sh + zb.n_sh - COALESCE(i.n_inter, 0))
                AS BIGINT) AS exact_ppm,
           CAST(ABS(({" + ".join(f"(CASE WHEN a.mh_{i} = b.mh_{i} THEN 1 ELSE 0 END)" for i in range(_N_SEEDS))})
                * 1000000 // {_N_SEEDS}
                - COALESCE(i.n_inter, 0) * 1000000
                  // (za.n_sh + zb.n_sh - COALESCE(i.n_inter, 0)))
                AS BIGINT) AS abs_err_ppm
    FROM cand c
      JOIN sigs a ON a.doc_id = c.doc_a
      JOIN sigs b ON b.doc_id = c.doc_b
      JOIN set_sizes za ON za.doc_id = c.doc_a
      JOIN set_sizes zb ON zb.doc_id = c.doc_b
      LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
    ORDER BY c.doc_a, c.doc_b
    """
    ),
    tags=("dedup", "minhash", "lsh", "audit", "quality"),
)
def q171_lsh_precision_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banding-quality audit over q51's LSH candidates: per candidate
    pair, the signature-estimated Jaccard next to the exact shingle-set
    Jaccard and their absolute gap (integer ppm). Low exact_ppm rows are
    banding false positives; the est−exact spread audits whether
    {seeds} minhash components are enough for the corpus.

    Scale shape: candidates come from the banded join (never all-pairs);
    the exact-Jaccard stage joins distinct shingle hashes ONLY for docs
    in the candidate set — the audit cost scales with candidates, not
    corpus. Uncapped buckets here mirror the oracle exactly; production
    candidate generation keeps q51's bucket cap."""
    d = table(spark, sf_dir, "documents")
    corpus = d.select("doc_id", "text").unionByName(_variants(d))
    shingled = (
        corpus.withColumn("words", F.split("text", " "))
        .filter(F.size("words") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "TRANSFORM(SEQUENCE(1, SIZE(words) - 2),"
                    " i -> ARRAY_JOIN(SLICE(words, i, 3), ' '))"
                )
            ).alias("shingle"),
        )
        .select("doc_id", F.expr(spark_hash32("shingle", "mh")).alias("h"))
    )
    sigs = shingled.groupBy("doc_id").agg(
        *[
            F.expr(f"MIN({universal_hash('h', i)})").alias(f"mh_{i}")
            for i in range(_N_SEEDS)
        ]
    )
    cand = lsh_candidate_pairs(_spark_bands(sigs), bucket_cap=None)
    shingle_sets = shingled.distinct()
    set_sizes = shingle_sets.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_sh")
    )
    sa = shingle_sets.select(F.col("doc_id").alias("doc_a"), "h")
    sb = shingle_sets.select(F.col("doc_id").alias("doc_b"), "h")
    inter = (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "h"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    agree = " + ".join(
        f"(CASE WHEN a_mh_{i} = b_mh_{i} THEN 1 ELSE 0 END)"
        for i in range(_N_SEEDS)
    )
    siga = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh_{i}").alias(f"a_mh_{i}") for i in range(_N_SEEDS)],
    )
    sigb = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh_{i}").alias(f"b_mh_{i}") for i in range(_N_SEEDS)],
    )
    za = set_sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    zb = set_sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    est = f"({agree}) * 1000000 DIV {_N_SEEDS}"
    exact = (
        "COALESCE(n_inter, 0) * 1000000"
        " DIV (n_a + n_b - COALESCE(n_inter, 0))"
    )
    return (
        cand.join(siga, "doc_a")
        .join(sigb, "doc_b")
        .join(za, "doc_a")
        .join(zb, "doc_b")
        .join(inter, ["doc_a", "doc_b"], "left")
        .select(
            "doc_a",
            "doc_b",
            F.expr(f"CAST({est} AS BIGINT)").alias("est_ppm"),
            F.expr(f"CAST({exact} AS BIGINT)").alias("exact_ppm"),
            F.expr(f"CAST(ABS({est} - {exact}) AS BIGINT)").alias(
                "abs_err_ppm"
            ),
        )
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# q174 — asymmetric n-gram containment (sub-document duplication)
# ---------------------------------------------------------------------------
# Jaccard (q53) misses the quote-inclusion case: a short document wholly
# embedded in a much longer one has tiny union-normalized similarity but
# containment ~1. Containment(A in B) = |A∩B| / |A| over distinct char
# 8-gram sets — the deduped-training-corpus signal for "this page is a
# fragment of that page".
_CONTAIN_W = 8  # char-gram width
_CONTAIN_DF_CAP = 16  # grams present in more docs than this are dropped
_CONTAIN_MILLI = 500  # keep pairs with containment >= 0.5


def containment_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = _CONTAIN_W,
    df_cap: int = _CONTAIN_DF_CAP,
) -> DataFrame:
    """All ordered containment candidate pairs ``(doc_a, doc_b, n_a,
    n_common, containment_milli)`` over distinct char-``width``-gram
    sets, with ``doc_a`` always the smaller-gram-set side (ties by id)
    and containment = |A∩B|/|A| in exact integer milli-units. The q174
    kernel, unfiltered — `text/pipeline.py::drop_contained_duplicates`
    consumes it as a curation step. Scale guards as q174: DF-capped
    gram join, direction filter before the count aggregation."""
    from pyspark.sql import Window

    base = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    all_grams = (
        base.filter(F.length("text") >= width)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"TRANSFORM(SEQUENCE(1, LENGTH(text) - {width - 1}),"
                    f" i -> SUBSTRING(text, i, {width}))"
                )
            ).alias("gram"),
        )
        .distinct()
    )
    stop_grams = (
        all_grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > df_cap)
        .select("gram")
    )
    grams = all_grams.join(F.broadcast(stop_grams), "gram", "left_anti")
    # gram-set sizes ride along via a doc-keyed window (q53's idiom) so
    # the smaller-side direction filter lives IN the join condition —
    # the 2x mirrored pair space is pruned before the count aggregation
    # and no post-agg size joins are needed
    wd = Window.partitionBy("doc_id")
    sized = grams.withColumn("n", F.count(F.lit(1)).over(wd))
    a, b = sized.alias("a"), sized.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (
                (F.col("a.n") < F.col("b.n"))
                | (
                    (F.col("a.n") == F.col("b.n"))
                    & (F.col("a.doc_id") < F.col("b.doc_id"))
                )
            ),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n").alias("na"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return inter.select(
        "doc_a",
        "doc_b",
        F.col("na").cast("bigint").alias("n_a"),
        F.col("n_common").cast("bigint"),
        F.expr("CAST(1000 * n_common DIV na AS BIGINT)").alias(
            "containment_milli"
        ),
    )


@register(
    "q174_ngram_containment",
    sql=f"""
    WITH positions AS (
      SELECT doc_id, text, UNNEST(RANGE(1, LENGTH(text) - {_CONTAIN_W - 2})) AS i
      FROM documents WHERE LENGTH(text) >= {_CONTAIN_W}
    ), all_grams AS (
      SELECT DISTINCT doc_id, SUBSTRING(text, i, {_CONTAIN_W}) AS gram
      FROM positions
    ), stop_grams AS (
      SELECT gram FROM all_grams GROUP BY gram HAVING COUNT(*) > {_CONTAIN_DF_CAP}
    ), grams AS (
      SELECT all_grams.* FROM all_grams ANTI JOIN stop_grams USING (gram)
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(sa.n AS BIGINT) AS n_a,
           CAST(n_common AS BIGINT) AS n_common,
           CAST(1000 * n_common // sa.n AS BIGINT) AS containment_milli
    FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
    WHERE (sa.n < sb.n OR (sa.n = sb.n AND doc_a < doc_b))
      AND 1000 * n_common // sa.n >= {_CONTAIN_MILLI}
    ORDER BY doc_a, doc_b
    """,
    tags=("dedup", "ngram", "containment"),
)
def q174_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment pairs: (doc_a, doc_b) where at least half of
    doc_a's distinct char-8-gram set also appears in the (larger) doc_b —
    the sub-document-duplication signal Jaccard (q53) structurally misses.
    Containment is exact integer milli-units from distinct-gram counts;
    the smaller-gram-set side is always doc_a (ties broken by id).

    Scale shape (mirrors q53's guards): the gram⨝gram join is keyed by
    gram with a document-frequency cap (> {_CONTAIN_DF_CAP} docs ⇒
    dropped from every set on both engines) so no single gram fans out
    quadratically; 8-char grams are selective enough that surviving
    buckets are near-singletons. The asymmetric n_a < n_b direction
    filter halves the pair space before the count aggregation.
    """
    d = table(spark, sf_dir, "documents")
    return (
        containment_pairs(d)
        .filter(F.col("containment_milli") >= _CONTAIN_MILLI)
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# q176 — curated containment dedup (q174 x q152 composition)
# ---------------------------------------------------------------------------
# The ordering bug this guards against: run containment BEFORE curation and
# a fragment can be deleted because of container B, then B dies in curation
# — the content vanishes from the corpus entirely. The composed policy
# drops a fragment ONLY when a containing document itself survives
# curation; a fragment whose every container died is RESCUED as the sole
# remaining copy. Curation here = source blocklist + keep-best-copy
# (q152's longest-wins rank over exact-SimHash clusters); containment =
# q174's kernel. The planted corpus exercises every verdict class:
# clones (longer same-cluster copies that beat their originals), spam
# containers (blocked source), fragments of both.
_CUR_CLONE_SUFFIX = " extra trailing context words"
_CUR_BLOCKED = "spam"


def _q176_corpus_sql() -> str:
    return f"""SELECT doc_id, text, source FROM documents
      UNION ALL
      SELECT doc_id + 20000000, text || '{_CUR_CLONE_SUFFIX}', 'clones'
      FROM documents WHERE doc_id % 20 = 0
      UNION ALL
      SELECT doc_id + 40000000, SUBSTRING(REVERSE(text), 1, 220), 'spam'
      FROM documents WHERE doc_id % 25 = 0
      UNION ALL
      SELECT doc_id + 30000000, SUBSTRING(text, 1, 160), 'fragments'
      FROM documents WHERE doc_id % 10 = 0
      UNION ALL
      SELECT doc_id + 50000000, SUBSTRING(REVERSE(text), 1, 140), 'fragments'
      FROM documents WHERE doc_id % 25 = 0"""


@register(
    "q176_curated_containment",
    sql=f"""{_simhash_sig_ctes(_q176_corpus_sql())}
    , meta AS (
      SELECT c.doc_id, LENGTH(c.text) AS n_chars, s.simhash
      FROM corpus c JOIN sigs s USING (doc_id)
      WHERE c.source <> '{_CUR_BLOCKED}'
    ), ranked AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (PARTITION BY simhash
                                ORDER BY n_chars DESC, doc_id) AS rk
      FROM meta
    ), survivors AS (
      SELECT doc_id FROM ranked WHERE rk = 1
    ), positions AS (
      SELECT doc_id, text, UNNEST(RANGE(1, LENGTH(text) - {_CONTAIN_W - 2})) AS i
      FROM corpus WHERE LENGTH(text) >= {_CONTAIN_W}
    ), all_grams AS (
      SELECT DISTINCT doc_id, SUBSTRING(text, i, {_CONTAIN_W}) AS gram
      FROM positions
    ), stop_grams AS (
      SELECT gram FROM all_grams GROUP BY gram HAVING COUNT(*) > {_CONTAIN_DF_CAP}
    ), grams AS (
      SELECT all_grams.* FROM all_grams ANTI JOIN stop_grams USING (gram)
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    ), pairs AS (
      SELECT doc_a, doc_b
      FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
      WHERE (sa.n < sb.n OR (sa.n = sb.n AND doc_a < doc_b))
        AND 1000 * n_common // sa.n >= {_CONTAIN_MILLI}
    ), flags AS (
      SELECT doc_a,
             MAX(CASE WHEN s.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS has_surv
      FROM pairs LEFT JOIN survivors s ON s.doc_id = pairs.doc_b
      GROUP BY doc_a
    ), verdicts AS (
      SELECT c.source, LENGTH(c.text) AS n_chars,
             CASE WHEN sv.doc_id IS NULL THEN 'curation_dropped'
                  WHEN f.has_surv = 1 THEN 'contained_dropped'
                  WHEN f.doc_a IS NOT NULL THEN 'rescued'
                  ELSE 'kept' END AS verdict
      FROM corpus c
        LEFT JOIN survivors sv ON sv.doc_id = c.doc_id
        LEFT JOIN flags f ON f.doc_a = c.doc_id
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(CASE WHEN verdict = 'curation_dropped' THEN 1 END)
                AS BIGINT) AS n_curation_dropped,
           CAST(COUNT(CASE WHEN verdict = 'contained_dropped' THEN 1 END)
                AS BIGINT) AS n_contained_dropped,
           CAST(COUNT(CASE WHEN verdict = 'rescued' THEN 1 END)
                AS BIGINT) AS n_rescued,
           CAST(COUNT(CASE WHEN verdict IN ('rescued', 'kept') THEN 1 END)
                AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN verdict IN ('rescued', 'kept')
                         THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
    FROM verdicts
    GROUP BY source
    ORDER BY source
    """,
    tags=("dedup", "containment", "policy", "curation"),
)
def q176_curated_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment dedup composed with curation (q174 x q152): a fragment
    is dropped only when a containing document SURVIVES curation (source
    blocklist + longest-wins keep-best-copy over exact-SimHash clusters);
    a fragment whose every container died in curation is rescued as the
    sole remaining copy, and the per-source verdict census makes the
    policy auditable (n_rescued > 0 is the proof the composition differs
    from naive containment-then-curation ordering).

    Planted corpus: clones (longer cluster-mates that beat their
    originals under keep-best — their fragments still drop because the
    clone survives and gram-contains the prefix), spam containers
    (reversed text under a blocked source), and fragments of both. The
    spam fragments' only containers are blocked, so they surface as
    rescued.

    Scale shape: q152's rank (one simhash-keyed window) + q174's
    containment kernel (DF-capped gram join, direction predicate inside
    the join condition) + two id-keyed semi/left joins for the verdict —
    nothing new beyond the two proven shapes. The programmatic twin is
    `text/pipeline.py::drop_contained_duplicates(survivors=...)`.
    """
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    clones = d.filter(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 20000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(_CUR_CLONE_SUFFIX)).alias("text"),
        F.lit("clones").alias("source"),
    )
    spam = d.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 40000000).alias("doc_id"),
        F.expr("SUBSTRING(REVERSE(text), 1, 220)").alias("text"),
        F.lit(_CUR_BLOCKED).alias("source"),
    )
    frag_base = d.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 30000000).alias("doc_id"),
        F.expr("SUBSTRING(text, 1, 160)").alias("text"),
        F.lit("fragments").alias("source"),
    )
    frag_spam = d.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + 50000000).alias("doc_id"),
        F.expr("SUBSTRING(REVERSE(text), 1, 140)").alias("text"),
        F.lit("fragments").alias("source"),
    )
    corpus = (
        d.unionByName(clones)
        .unionByName(spam)
        .unionByName(frag_base)
        .unionByName(frag_spam)
    )

    unblocked = corpus.filter(F.col("source") != _CUR_BLOCKED)
    sigs = _spark_simhash_sigs(unblocked.select("doc_id", "text"))
    meta = sigs.join(
        unblocked.select("doc_id", F.length("text").alias("n_chars")), "doc_id"
    )
    w = Window.partitionBy("simhash").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    survivors = (
        meta.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("doc_id")
    )

    pairs = containment_pairs(corpus).filter(
        F.col("containment_milli") >= _CONTAIN_MILLI
    )
    flags = (
        pairs.join(
            survivors.select(F.col("doc_id").alias("doc_b")).withColumn(
                "surv", F.lit(1)
            ),
            "doc_b",
            "left",
        )
        .groupBy("doc_a")
        .agg(F.max(F.coalesce(F.col("surv"), F.lit(0))).alias("has_surv"))
    )

    verdicts = (
        corpus.join(
            survivors.withColumn("is_surv", F.lit(1)), "doc_id", "left"
        )
        .join(flags.withColumnRenamed("doc_a", "doc_id"), "doc_id", "left")
        .select(
            "source",
            F.length("text").alias("n_chars"),
            F.when(F.col("is_surv").isNull(), F.lit("curation_dropped"))
            .when(F.col("has_surv") == 1, F.lit("contained_dropped"))
            .when(F.col("has_surv").isNotNull(), F.lit("rescued"))
            .otherwise(F.lit("kept"))
            .alias("verdict"),
        )
    )
    kept = F.col("verdict").isin("rescued", "kept")
    return (
        verdicts.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count(F.when(F.col("verdict") == "curation_dropped", 1))
            .cast("bigint")
            .alias("n_curation_dropped"),
            F.count(F.when(F.col("verdict") == "contained_dropped", 1))
            .cast("bigint")
            .alias("n_contained_dropped"),
            F.count(F.when(F.col("verdict") == "rescued", 1))
            .cast("bigint")
            .alias("n_rescued"),
            F.count(F.when(kept, 1)).cast("bigint").alias("n_kept"),
            F.sum(F.when(kept, F.col("n_chars")).otherwise(0))
            .cast("bigint")
            .alias("kept_chars"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q180 — normalization-aware MinHash LSH (q178's canon text feeding q51)
# ---------------------------------------------------------------------------
# q178 showed canonicalization exposes reformatted exact copies; q180 runs
# the FULL near-dup rung over the canonical form, so one LSH pass catches
# both classes at once: reformatted copies (case/punctuation decoration —
# invisible to raw MinHash because every shingle hash changes) collide in
# all bands as canon-exact pairs, and genuinely edited near-dups (trailing
# truncation) collide as before. The pair class disambiguates, so a
# curation policy can auto-drop canon-exact pairs and route near pairs to
# keep-best scoring.
_NORM_DECOR_OFFSET = 2_000_000  # decorated-copy ids (variants use 1e6)


def _norm_minhash_sql() -> str:
    from .textops import _DUCK_NORM_TEXT

    mins = ",\n             ".join(
        f"MIN({universal_hash('h', i)}) AS mh_{i}" for i in range(_N_SEEDS)
    )
    band_rows = "\n      UNION ALL\n".join(
        "      SELECT doc_id, {b} AS band_idx, MD5(CONCAT_WS(',', {cols})) AS band_hash FROM sigs".format(
            b=b,
            cols=", ".join(
                f"CAST(mh_{b * _ROWS + r} AS VARCHAR)" for r in range(_ROWS)
            ),
        )
        for b in range(_BANDS)
    )
    return f"""
    WITH raw AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {_VARIANT_OFFSET} AS doc_id,
             ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[1:LEN(STRING_SPLIT(text, ' ')) - 5], ' ') AS text
      FROM documents
      WHERE doc_id < {_N_VARIANT_DOCS} AND LEN(STRING_SPLIT(text, ' ')) > 5
      UNION ALL
      SELECT doc_id + {_NORM_DECOR_OFFSET} AS doc_id,
             '** ' || UPPER(text) || ' **' AS text
      FROM documents WHERE doc_id % 15 = 0
    ), corpus AS (
      SELECT doc_id, {_DUCK_NORM_TEXT.format(col="text")} AS text FROM raw
    ), positions AS (
      SELECT doc_id, STRING_SPLIT(text, ' ') AS words,
             UNNEST(RANGE(1, LEN(STRING_SPLIT(text, ' ')) - 1)) AS i
      FROM corpus
      WHERE LEN(STRING_SPLIT(text, ' ')) >= 3
    ), shingled AS (
      SELECT doc_id,
             {duckdb_hash32("ARRAY_TO_STRING(words[i:i+2], ' ')", 'mh')} AS h
      FROM positions
    ), sigs AS (
      SELECT doc_id,
             {mins}
      FROM shingled
      GROUP BY doc_id
    ), bands AS (
{band_rows}
    ), hot AS (
      SELECT band_idx, band_hash FROM bands
      GROUP BY band_idx, band_hash HAVING COUNT(*) > {_LSH_BUCKET_CAP}
    ), kept AS (
      SELECT bands.* FROM bands
      ANTI JOIN hot ON bands.band_idx = hot.band_idx
                   AND bands.band_hash = hot.band_hash
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM kept a JOIN kept b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
           AND a.doc_id < b.doc_id
    )
    SELECT p.doc_a, p.doc_b,
           CASE WHEN ca.text = cb.text THEN 'canon_exact' ELSE 'near' END
             AS pair_class
    FROM pairs p
    JOIN corpus ca ON ca.doc_id = p.doc_a
    JOIN corpus cb ON cb.doc_id = p.doc_b
    ORDER BY doc_a, doc_b
    """


@register(
    "q180_normalized_minhash_pairs",
    sql=_norm_minhash_sql(),
    tags=("dedup", "minhash", "lsh", "normalization"),
)
def q180_normalized_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs over CANONICAL text (q178's lowercase →
    strip-punctuation → collapse-runs chain) via q51's MinHash+LSH
    pipeline, with planted reformatted copies (every 15th doc re-added
    uppercased + decorated) and q51's trailing-truncation variants. Each
    pair is classed: ``canon_exact`` (identical after canonicalization —
    raw MinHash would MISS these, every shingle hash changes under
    case/punctuation edits) vs ``near`` (surviving genuine edits).

    Scale shape: canonicalization is one map-side codegen expression on
    the existing corpus scan — the signature/band/bucket-join pipeline
    and its skew guards are exactly q51's, so the extra coverage costs
    no new shuffle. The class join touches only candidate pairs (LSH
    output, tiny vs corpus), keyed by doc_id.
    """
    from .textops import SPARK_NORM_TEXT

    d = table(spark, sf_dir, "documents")
    decorated = d.filter(F.col("doc_id") % 15 == 0).select(
        (F.col("doc_id") + _NORM_DECOR_OFFSET).alias("doc_id"),
        F.concat(F.lit("** "), F.upper("text"), F.lit(" **")).alias("text"),
    )
    raw = (
        d.select("doc_id", "text").unionByName(_variants(d)).unionByName(decorated)
    )
    corpus = raw.select(
        "doc_id", F.expr(SPARK_NORM_TEXT.format(col="text")).alias("text")
    )
    bands = _spark_bands(_spark_sigs(corpus))
    pairs = lsh_candidate_pairs(bands)
    ca = corpus.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("_ta"))
    cb = corpus.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("_tb"))
    return (
        pairs.join(ca, "doc_a")
        .join(cb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.when(F.col("_ta") == F.col("_tb"), F.lit("canon_exact"))
            .otherwise(F.lit("near"))
            .alias("pair_class"),
        )
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# q190 — cluster-canonical keep-best dedup (CC × keep-best composed)
# ---------------------------------------------------------------------------
# The standard fuzzy-dedup keep rule production corpora actually ship
# (SlimPajama/RefinedWeb style): LSH candidate pairs → connected
# components → ONE survivor per cluster, chosen by quality (longest copy,
# ties to the smaller id) rather than by the arbitrary min-id label. q58
# builds the clusters and q152 scores exact-signature groups; this is the
# composition — the survivor choice runs over the TRANSITIVE near-dup
# cluster, so a chain a~b~c keeps one doc even when a and c never pair.


def _cluster_keep_best_sql() -> str:
    """CC min-label fixpoint (see ``_cc_sql``) joined back to document
    lengths, then keep-best ranking per cluster. ``corpus2`` re-declares
    the q51 corpus (base docs + variants) because the pairs body's own
    ``corpus`` CTE is scoped inside the nested WITH."""
    pairs_body = _minhash_sql().replace("ORDER BY doc_a, doc_b", "")
    return f"""
    WITH RECURSIVE pairs AS (
      {pairs_body}
    ), edges AS (
      SELECT doc_a, doc_b FROM pairs
      UNION ALL
      SELECT doc_b AS doc_a, doc_a AS doc_b FROM pairs
    ), reach(doc_id, label) AS (
      SELECT DISTINCT doc_a AS doc_id, doc_a AS label FROM edges
      UNION
      SELECT e.doc_a AS doc_id, r.label
      FROM reach r JOIN edges e ON e.doc_b = r.doc_id
      WHERE r.label < e.doc_a
    ), cc AS (
      SELECT doc_id, MIN(label) AS cluster_id FROM reach GROUP BY doc_id
    ), corpus2 AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {_VARIANT_OFFSET} AS doc_id,
             ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[1:LEN(STRING_SPLIT(text, ' ')) - 5], ' ') AS text
      FROM documents
      WHERE doc_id < {_N_VARIANT_DOCS} AND LEN(STRING_SPLIT(text, ' ')) > 5
    ), members AS (
      SELECT cc.doc_id, cc.cluster_id, LEN(c.text) AS n_chars
      FROM cc JOIN corpus2 c ON c.doc_id = cc.doc_id
    ), ranked AS (
      SELECT doc_id, cluster_id, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY cluster_id
               ORDER BY n_chars DESC, doc_id ASC
             ) AS rk
      FROM members
    )
    SELECT cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(MAX(CASE WHEN rk = 1 THEN doc_id END) AS BIGINT) AS kept_id,
           CAST(MAX(CASE WHEN rk = 1 THEN n_chars END) AS BIGINT) AS kept_chars,
           CAST(SUM(CASE WHEN rk > 1 THEN n_chars ELSE 0 END) AS BIGINT)
             AS dropped_chars,
           CAST(MAX(CASE WHEN rk = 1 AND doc_id <> cluster_id
                         THEN 1 ELSE 0 END) AS BIGINT) AS policy_divergent
    FROM ranked
    GROUP BY cluster_id
    ORDER BY cluster_id
    """


@register(
    "q190_cluster_keep_best",
    sql=_cluster_keep_best_sql(),
    tags=("dedup", "clustering", "keep-best", "iterative"),
)
def q190_cluster_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One survivor per transitive near-dup cluster: q51's LSH pairs →
    q58's connected components → q152's keep-best policy (longest copy,
    ties to the smaller id) ranked over the WHOLE cluster. Per cluster:
    member count, the surviving doc and its length, the characters
    dropped, and whether quality ranking diverged from the min-id label
    the CC algorithm would naively keep (here the variants are truncated
    copies, so the longer ORIGINAL survives even when the variant's
    synthetic id is not the label).

    Scale shape: clusters come from the iterative min-label propagation
    (O(diameter) shuffles, lineage cut per round); the length join keys
    on doc_id (no pairwise work — member rows, not pairs); the keep-best
    pass is ONE window over cluster_id. At 100 TB the cluster_id shuffle
    is bounded by the near-dup member count, a small fraction of the
    corpus, and the bucket cap bounds any single cluster's fan-in.
    """
    from ..functions.graph import connected_components
    from pyspark.sql import Window

    pairs = q51_dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    cc = connected_components(pairs).select(
        F.col("node_id").alias("doc_id"), "cluster_id"
    )
    d = table(spark, sf_dir, "documents")
    corpus = d.select("doc_id", "text").unionByName(_variants(d))
    members = cc.join(
        corpus.select("doc_id", F.length("text").alias("n_chars")), "doc_id"
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    ranked = members.withColumn("rk", F.row_number().over(w))
    return (
        ranked.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.max(F.when(F.col("rk") == 1, F.col("doc_id")))
            .cast("bigint")
            .alias("kept_id"),
            F.max(F.when(F.col("rk") == 1, F.col("n_chars")))
            .cast("bigint")
            .alias("kept_chars"),
            # DECIMAL(38,0) sum: per-member lengths are driver-bounded
            # here, but at 100 TB a boilerplate mega-cluster's BIGINT sum
            # could wrap silently vs the oracle's HUGEINT promotion
            F.sum(
                F.expr(
                    "CAST(CASE WHEN rk > 1 THEN n_chars ELSE 0 END"
                    " AS DECIMAL(38,0))"
                )
            )
            .cast("bigint")
            .alias("dropped_chars"),
            F.max(
                F.when(
                    (F.col("rk") == 1) & (F.col("doc_id") != F.col("cluster_id")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("policy_divergent"),
        )
        .orderBy("cluster_id")
    )


_SPLIT_MOD = 10
_SPLIT_TRAIN = 8  # hash % 10 < 8 -> train (80/20)


def _split_sql() -> str:
    """DuckDB oracle for q192: the q51 corpus, near-dup clusters from the
    _cc_sql recursive closure, and BOTH split policies (naive per-doc hash
    vs cluster-inherited hash) summarized with their cross-split leak
    counts."""
    pairs_body = _minhash_sql().replace("ORDER BY doc_a, doc_b", "")
    doc_h = duckdb_hash32("CAST(doc_id AS STRING)", "split")
    clu_h = duckdb_hash32("CAST(cluster_id AS STRING)", "split")
    return f"""
    WITH RECURSIVE pairs AS (
      {pairs_body}
    ), edges AS (
      SELECT doc_a, doc_b FROM pairs
      UNION ALL
      SELECT doc_b AS doc_a, doc_a AS doc_b FROM pairs
    ), reach(doc_id, label) AS (
      SELECT DISTINCT doc_a AS doc_id, doc_a AS label FROM edges
      UNION
      SELECT e.doc_a AS doc_id, r.label
      FROM reach r JOIN edges e ON e.doc_b = r.doc_id
      WHERE r.label < e.doc_a
    ), cc AS (
      SELECT doc_id, MIN(label) AS cluster_id FROM reach GROUP BY doc_id
    ), universe AS (
      SELECT doc_id FROM documents
      UNION ALL
      SELECT doc_id + {_VARIANT_OFFSET} AS doc_id
      FROM documents
      WHERE doc_id < {_N_VARIANT_DOCS} AND LEN(STRING_SPLIT(text, ' ')) > 5
    ), clustered AS (
      -- cluster_id must materialize in its OWN CTE: referencing the
      -- alias inside the same SELECT binds to cc.cluster_id (NULL for
      -- unpaired docs), and DuckDB's CONCAT skips NULL args, collapsing
      -- every unpaired doc onto one constant hash
      SELECT u.doc_id, COALESCE(cc.cluster_id, u.doc_id) AS cluster_id
      FROM universe u LEFT JOIN cc USING (doc_id)
    ), assign AS (
      SELECT doc_id,
             CASE WHEN {doc_h} % {_SPLIT_MOD} < {_SPLIT_TRAIN}
                  THEN 'train' ELSE 'eval' END AS split_doc,
             CASE WHEN {clu_h} % {_SPLIT_MOD} < {_SPLIT_TRAIN}
                  THEN 'train' ELSE 'eval' END AS split_cluster
      FROM clustered
    ), counts AS (
      SELECT
        SUM(CASE WHEN split_doc = 'train' THEN 1 ELSE 0 END) AS doc_train,
        SUM(CASE WHEN split_doc = 'eval' THEN 1 ELSE 0 END) AS doc_eval,
        SUM(CASE WHEN split_cluster = 'train' THEN 1 ELSE 0 END) AS clu_train,
        SUM(CASE WHEN split_cluster = 'eval' THEN 1 ELSE 0 END) AS clu_eval
      FROM assign
    ), leaks AS (
      SELECT
        SUM(CASE WHEN a.split_doc != b.split_doc THEN 1 ELSE 0 END) AS doc_leak,
        SUM(CASE WHEN a.split_cluster != b.split_cluster THEN 1 ELSE 0 END)
          AS clu_leak
      FROM pairs p
        JOIN assign a ON a.doc_id = p.doc_a
        JOIN assign b ON b.doc_id = p.doc_b
    )
    SELECT 'doc_hash' AS policy,
           CAST(doc_train AS BIGINT) AS n_train,
           CAST(doc_eval AS BIGINT) AS n_eval,
           CAST(doc_leak AS BIGINT) AS leaked_pairs
    FROM counts, leaks
    UNION ALL
    SELECT 'cluster_hash' AS policy,
           CAST(clu_train AS BIGINT) AS n_train,
           CAST(clu_eval AS BIGINT) AS n_eval,
           CAST(clu_leak AS BIGINT) AS leaked_pairs
    FROM counts, leaks
    ORDER BY policy
    """


@register(
    "q192_leakage_safe_split",
    sql=_split_sql(),
    tags=("curation", "split", "dedup", "leakage"),
)
def q192_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/eval split audit: the naive per-doc hash split
    (80/20) strands near-duplicate pairs across the boundary — eval docs
    whose near-twin sits in train are contaminated — while the
    cluster-inherited split (hash the CC cluster id, every member
    inherits) leaks ZERO pairs by construction. One row per policy:
    split sizes + cross-split near-dup pair count; the doc_hash row's
    nonzero ``leaked_pairs`` is the measured case for cluster-aware
    splitting.

    Scale shape: clusters ride q58's O(diameter) min-label CC over q51's
    banded candidate pairs (never all-pairs); split assignment is one
    map-side portable-hash expression over the doc universe (a
    left join against the CC table, which holds only paired docs); the
    leak audit joins the pair list to assignments keyed on doc_id — the
    pair list is the small side (near-dup population, not the corpus).
    All counts are single partial-aggregated scalars.
    """
    from ..functions.graph import connected_components

    d = table(spark, sf_dir, "documents")
    corpus = d.select("doc_id", "text").unionByName(_variants(d))
    # pairs feed BOTH the CC iteration and the final leak join; assign
    # feeds three branches (the counts agg and both pair sides) — without
    # the checkpoints each consumer re-runs the full LSH pipeline
    # (measured 4.9 -> 3.6 s, values identical)
    pairs = lsh_candidate_pairs(_spark_bands(_spark_sigs(corpus))).localCheckpoint(
        eager=False
    )
    cc = connected_components(pairs).select(
        F.col("node_id").alias("doc_id"), "cluster_id"
    )
    doc_h = spark_hash32("CAST(doc_id AS STRING)", "split")
    clu_h = spark_hash32("CAST(cluster_id AS STRING)", "split")
    split = (
        lambda h: f"CASE WHEN {h} % {_SPLIT_MOD} < {_SPLIT_TRAIN} "
        f"THEN 'train' ELSE 'eval' END"
    )
    assign = (
        corpus.select("doc_id")
        .join(cc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
        )
        .select(
            "doc_id",
            F.expr(split(doc_h)).alias("split_doc"),
            F.expr(split(clu_h)).alias("split_cluster"),
        )
        .localCheckpoint(eager=False)
    )
    counts = assign.agg(
        F.sum(F.when(F.col("split_doc") == "train", 1).otherwise(0))
        .cast("bigint")
        .alias("doc_train"),
        F.sum(F.when(F.col("split_doc") == "eval", 1).otherwise(0))
        .cast("bigint")
        .alias("doc_eval"),
        F.sum(F.when(F.col("split_cluster") == "train", 1).otherwise(0))
        .cast("bigint")
        .alias("clu_train"),
        F.sum(F.when(F.col("split_cluster") == "eval", 1).otherwise(0))
        .cast("bigint")
        .alias("clu_eval"),
    )
    a = assign.select(
        F.col("doc_id").alias("doc_a"),
        F.col("split_doc").alias("sd_a"),
        F.col("split_cluster").alias("sc_a"),
    )
    b = assign.select(
        F.col("doc_id").alias("doc_b"),
        F.col("split_doc").alias("sd_b"),
        F.col("split_cluster").alias("sc_b"),
    )
    leaks = (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .agg(
            F.sum(F.when(F.col("sd_a") != F.col("sd_b"), 1).otherwise(0))
            .cast("bigint")
            .alias("doc_leak"),
            F.sum(F.when(F.col("sc_a") != F.col("sc_b"), 1).otherwise(0))
            .cast("bigint")
            .alias("clu_leak"),
        )
    )
    both = counts.crossJoin(leaks)  # two 1-row aggregates
    return both.selectExpr(
        "STACK(2, "
        "'doc_hash', doc_train, doc_eval, doc_leak, "
        "'cluster_hash', clu_train, clu_eval, clu_leak) "
        "AS (policy, n_train, n_eval, leaked_pairs)"
    ).orderBy("policy")


def _agreement_sql() -> str:
    """DuckDB oracle for q194: the three pair sets as nested CTEs (each
    builder's own WITH is scoped inside its CTE), flattened to per-pair
    method flags, reduced to one totals row, unpivoted to method pairs."""
    mh = _minhash_sql().replace("ORDER BY doc_a, doc_b", "")
    sh = _simhash_hamming_sql().replace("ORDER BY doc_a, doc_b", "")
    s6 = _simhash60_sql().replace("ORDER BY doc_a, doc_b", "")
    ppm = (
        "CAST(CAST({both} AS HUGEINT) * 1000000 "
        "// NULLIF({a} + {b} - {both}, 0) AS BIGINT)"
    )
    return f"""
    WITH mh AS (
      {mh}
    ), sh AS (
      {sh}
    ), s6 AS (
      {s6}
    ), tagged AS (
      SELECT doc_a, doc_b, 'minhash_lsh' AS method FROM mh
      UNION ALL
      SELECT doc_a, doc_b, 'simhash32' AS method FROM sh
      UNION ALL
      SELECT doc_a, doc_b, 'simhash60' AS method FROM s6
    ), flags AS (
      SELECT doc_a, doc_b,
             MAX(CASE WHEN method = 'minhash_lsh' THEN 1 ELSE 0 END) AS f_m,
             MAX(CASE WHEN method = 'simhash32' THEN 1 ELSE 0 END) AS f_h,
             MAX(CASE WHEN method = 'simhash60' THEN 1 ELSE 0 END) AS f_c
      FROM tagged GROUP BY doc_a, doc_b
    ), tot AS (
      SELECT SUM(f_m) AS n_m, SUM(f_h) AS n_h, SUM(f_c) AS n_c,
             SUM(f_m * f_h) AS n_mh, SUM(f_m * f_c) AS n_mc,
             SUM(f_h * f_c) AS n_hc
      FROM flags
    )
    SELECT 'minhash_lsh' AS method_a, 'simhash32' AS method_b,
           CAST(n_m AS BIGINT) AS n_a, CAST(n_h AS BIGINT) AS n_b,
           CAST(n_mh AS BIGINT) AS n_both,
           {ppm.format(both="n_mh", a="n_m", b="n_h")} AS agreement_ppm
    FROM tot
    UNION ALL
    SELECT 'minhash_lsh', 'simhash60',
           CAST(n_m AS BIGINT), CAST(n_c AS BIGINT), CAST(n_mc AS BIGINT),
           {ppm.format(both="n_mc", a="n_m", b="n_c")}
    FROM tot
    UNION ALL
    SELECT 'simhash32', 'simhash60',
           CAST(n_h AS BIGINT), CAST(n_c AS BIGINT), CAST(n_hc AS BIGINT),
           {ppm.format(both="n_hc", a="n_h", b="n_c")}
    FROM tot
    ORDER BY method_a, method_b
    """


@register(
    "q194_dedup_method_agreement",
    sql=_agreement_sql(),
    tags=("dedup", "audit", "minhash", "simhash"),
)
def q194_dedup_method_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-method dedup agreement audit: the Jaccard overlap (ppm) of
    the near-dup pair sets flagged by MinHash-LSH (q51), 32-bit SimHash
    Hamming (q52b), and 60-bit SimHash Hamming (q52c) over the SAME
    variant corpus — the calibration table that tells a pipeline owner
    whether a cheaper method can substitute for an expensive one, and
    catches a silent recall collapse in any single method (its agreement
    rows crater together).

    Composes the REGISTERED queries (the q182 discipline: audits consume
    the exact code paths they audit). Scale shape: each pair set is
    banded/bucket-capped by its own query; the flag table is one
    (doc_a, doc_b)-keyed aggregation over their union — linear in
    flagged pairs, never corpus-shaped — and the totals collapse to a
    single row before the 3-row unpivot. The ppm division is
    DECIMAL(38,0)/HUGEINT per the overflow idiom (pair counts at 100 TB
    exceed the BIGINT*1e6 edge).
    """
    sets = {
        "minhash_lsh": q51_dedup_minhash_lsh(spark, sf_dir),
        "simhash32": q52b_simhash_hamming(spark, sf_dir),
        "simhash60": q52c_simhash60_hamming(spark, sf_dir),
    }
    tagged = None
    for name, df in sets.items():
        t = df.select("doc_a", "doc_b", F.lit(name).alias("method"))
        tagged = t if tagged is None else tagged.unionByName(t)
    flags = tagged.groupBy("doc_a", "doc_b").agg(
        F.max(F.when(F.col("method") == "minhash_lsh", 1).otherwise(0)).alias(
            "f_m"
        ),
        F.max(F.when(F.col("method") == "simhash32", 1).otherwise(0)).alias(
            "f_h"
        ),
        F.max(F.when(F.col("method") == "simhash60", 1).otherwise(0)).alias(
            "f_c"
        ),
    )
    tot = flags.agg(
        F.sum("f_m").alias("n_m"),
        F.sum("f_h").alias("n_h"),
        F.sum("f_c").alias("n_c"),
        F.sum(F.col("f_m") * F.col("f_h")).alias("n_mh"),
        F.sum(F.col("f_m") * F.col("f_c")).alias("n_mc"),
        F.sum(F.col("f_h") * F.col("f_c")).alias("n_hc"),
    )
    ppm = (
        "CAST(CAST({both} AS DECIMAL(38,0)) * 1000000 "
        "DIV NULLIF({a} + {b} - {both}, 0) AS BIGINT)"
    )
    return tot.selectExpr(
        "STACK(3, "
        "'minhash_lsh', 'simhash32', CAST(n_m AS BIGINT), "
        f"CAST(n_h AS BIGINT), CAST(n_mh AS BIGINT), "
        f"{ppm.format(both='n_mh', a='n_m', b='n_h')}, "
        "'minhash_lsh', 'simhash60', CAST(n_m AS BIGINT), "
        f"CAST(n_c AS BIGINT), CAST(n_mc AS BIGINT), "
        f"{ppm.format(both='n_mc', a='n_m', b='n_c')}, "
        "'simhash32', 'simhash60', CAST(n_h AS BIGINT), "
        f"CAST(n_c AS BIGINT), CAST(n_hc AS BIGINT), "
        f"{ppm.format(both='n_hc', a='n_h', b='n_c')}) "
        "AS (method_a, method_b, n_a, n_b, n_both, agreement_ppm)"
    ).orderBy("method_a", "method_b")


# ---------------------------------------------------------------------------
# q223 — copy-direction census (who originates, who republishes)
# ---------------------------------------------------------------------------
# q130 counts cross-source duplication symmetrically; licensing and
# crawl-policy decisions need the DIRECTION: for every exact-duplicate
# group spanning sources, which source holds the EARLIEST copy (doc_id
# is ingest order on this fixture — first-seen attribution, q99's
# convention) and which sources republish it. Output: per
# (origin_source, copy_source) pair, distinct duplicated texts and
# total republished copies — the provenance matrix a source-quota
# policy reads before down-weighting a mirror site. The clean fixture
# has no exact cross-source copies, so mirrors are PLANTED in-plan:
# every 25th document is republished verbatim by the "next" source
# (doc_id + offset keeps ingest order), and every 125th twice — the
# census must attribute all of them to the true origin.
_Q223_OFF = 70_000_000


@register(
    "q223_copy_direction",
    sql=f"""
    WITH corpus AS (
      SELECT doc_id, source, text FROM documents
      UNION ALL
      SELECT doc_id + {_Q223_OFF},
             'mirror_' || CAST((doc_id % 3) AS VARCHAR) AS source, text
      FROM documents WHERE doc_id % 25 = 0
      UNION ALL
      SELECT doc_id + {2 * _Q223_OFF}, 'mirror_deep' AS source, text
      FROM documents WHERE doc_id % 125 = 0
    ), hashed AS (
      SELECT doc_id, source,
             {duckdb_hash32("text", "cd")} AS h
      FROM corpus
    ), firsts AS (
      SELECT h, MIN(doc_id) AS first_doc
      FROM hashed GROUP BY h HAVING COUNT(*) > 1
    ), origin AS (
      SELECT f.h, d.source AS origin_source
      FROM firsts f JOIN hashed d ON d.doc_id = f.first_doc
    ), copies AS (
      SELECT o.origin_source, d.source AS copy_source, o.h,
             COUNT(*) AS n_copies
      FROM origin o
        JOIN hashed d ON d.h = o.h
      WHERE d.doc_id > (SELECT first_doc FROM firsts WHERE firsts.h = o.h)
      GROUP BY o.origin_source, d.source, o.h
    )
    SELECT origin_source, copy_source,
           CAST(COUNT(*) AS BIGINT) AS n_texts,
           CAST(SUM(n_copies) AS BIGINT) AS n_copies
    FROM copies
    GROUP BY origin_source, copy_source
    ORDER BY origin_source, copy_source
    """,
    tags=("dedup", "provenance", "census"),
)
def q223_copy_direction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Provenance matrix of exact duplication (module comment): per
    (origin source, republishing source), how many distinct texts and
    how many later copies — first-seen attribution by doc_id.

    Scale shape: one hash-keyed aggregation finds multi-copy groups
    (8-byte portable hashes on the wire, q50's discipline), the
    origin lookup is a keyed join on the tiny multi-copy set, and the
    census is a |sources|²-bounded rollup. Nothing corpus-sized ever
    joins to itself.
    """
    base = table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    mirrors = base.filter(F.col("doc_id") % 25 == 0).select(
        (F.col("doc_id") + _Q223_OFF).alias("doc_id"),
        F.concat(F.lit("mirror_"), (F.col("doc_id") % 3).cast("string")).alias(
            "source"
        ),
        "text",
    )
    deep = base.filter(F.col("doc_id") % 125 == 0).select(
        (F.col("doc_id") + 2 * _Q223_OFF).alias("doc_id"),
        F.lit("mirror_deep").alias("source"),
        "text",
    )
    d = (
        base.unionByName(mirrors)
        .unionByName(deep)
        .select(
            "doc_id", "source", F.expr(spark_hash32("text", "cd")).alias("h")
        )
    )
    firsts = (
        d.groupBy("h")
        .agg(F.min("doc_id").alias("first_doc"), F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .select("h", "first_doc")
    )
    origin = firsts.join(
        d.select(F.col("doc_id").alias("first_doc"), F.col("source").alias("origin_source")),
        "first_doc",
    )
    copies = (
        d.join(origin, "h")
        .filter(F.col("doc_id") > F.col("first_doc"))
        .groupBy("origin_source", F.col("source").alias("copy_source"), "h")
        .agg(F.count(F.lit(1)).alias("n_copies"))
    )
    return (
        copies.groupBy("origin_source", "copy_source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_texts"),
            F.sum("n_copies").cast("bigint").alias("n_copies"),
        )
        .orderBy("origin_source", "copy_source")
    )


# ---------------------------------------------------------------------------
# q225 — dedup threshold sensitivity curve (the tuning table)
# ---------------------------------------------------------------------------
# Every dedup deployment asks the same question before committing a
# threshold: how many pairs — and how many DOCUMENTS, under keep-min-id
# survivorship — does each candidate threshold remove? q53 reports the
# pairs at one pinned threshold; this sweeps the exact-Jaccard kernel
# across five thresholds in one pass (jaccard in exact integer milli,
# 1000·|A∩B| DIV |A∪B|) and reports the removal curve. The elbow in
# n_docs_dropped is where the threshold goes.
_Q225_THRESHOLDS = (500, 600, 700, 800, 900)


@register(
    "q225_dedup_threshold_curve",
    sql=f"""
    WITH positions AS (
      SELECT doc_id, source, text,
             UNNEST(RANGE(1, LENGTH(text) - 1)) AS i
      FROM documents
      WHERE LENGTH(text) >= 3
    ), all_grams AS (
      SELECT DISTINCT doc_id, source, SUBSTRING(text, i, 3) AS gram
      FROM positions
    ), stop_grams AS (
      SELECT source, gram FROM all_grams
      GROUP BY source, gram HAVING COUNT(*) > {_GRAM_DF_CAP}
    ), grams AS (
      SELECT all_grams.* FROM all_grams
      ANTI JOIN stop_grams ON all_grams.source = stop_grams.source
                          AND all_grams.gram = stop_grams.gram
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM grams a JOIN grams b
        ON a.gram = b.gram AND a.source = b.source AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ), scored AS (
      SELECT doc_a, doc_b,
             1000 * n_common // (sa.n_grams + sb.n_grams - n_common)
               AS j_milli
      FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
    ), thresholds AS (
      SELECT UNNEST(ARRAY[{", ".join(str(t) for t in _Q225_THRESHOLDS)}])
        AS threshold_milli
    )
    SELECT t.threshold_milli,
           CAST(COUNT(*) FILTER (s.j_milli >= t.threshold_milli) AS BIGINT)
             AS n_pairs,
           CAST(COUNT(DISTINCT CASE WHEN s.j_milli >= t.threshold_milli
                                    THEN s.doc_b END) AS BIGINT)
             AS n_docs_dropped
    FROM thresholds t LEFT JOIN scored s ON s.j_milli >= t.threshold_milli
    GROUP BY t.threshold_milli
    ORDER BY t.threshold_milli
    """,
    tags=("dedup", "ngram", "jaccard", "calibration", "exact-integer"),
)
def q225_dedup_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Removal curve of the exact n-gram-Jaccard dedup across five
    candidate thresholds: qualifying pairs and keep-min-id documents
    dropped per threshold (module comment).

    Scale shape: one pass of q53's kernel (gram-blocked, stop-gram
    capped, the all-pairs product never materializes) scores every
    candidate pair ONCE in exact integer milli; the five-threshold
    census is a broadcast 5-row join over the scored pair list — the
    sweep costs one dedup pass, not five.
    """
    d = table(spark, sf_dir, "documents")
    all_grams = (
        d.filter(F.length("text") >= 3)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.expr(
                    "TRANSFORM(SEQUENCE(1, LENGTH(text) - 2),"
                    " i -> SUBSTRING(text, i, 3))"
                )
            ).alias("gram"),
        )
        .distinct()
    )
    stop = (
        all_grams.groupBy("source", "gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > _GRAM_DF_CAP)
        .select("source", "gram")
    )
    grams = all_grams.join(stop, ["source", "gram"], "left_anti")
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    a, b = grams.alias("a"), grams.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    scored = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_grams", "ga"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_grams", "gb"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.expr("1000 * n_common DIV (ga + gb - n_common)").alias("j_milli"),
        )
    )
    thresholds = spark.range(1).selectExpr(
        f"EXPLODE(ARRAY({', '.join(str(t) for t in _Q225_THRESHOLDS)}))"
        " AS threshold_milli"
    )
    return (
        F.broadcast(thresholds)
        .join(scored, F.col("j_milli") >= F.col("threshold_milli"), "left")
        .groupBy("threshold_milli")
        .agg(
            F.count(F.col("j_milli")).cast("bigint").alias("n_pairs"),
            F.countDistinct(
                F.when(
                    F.col("j_milli") >= F.col("threshold_milli"),
                    F.col("doc_b"),
                )
            )
            .cast("bigint")
            .alias("n_docs_dropped"),
        )
        .orderBy("threshold_milli")
    )


# ---------------------------------------------------------------------------
# q226 — containment threshold sensitivity curve (q225's asymmetric twin)
# ---------------------------------------------------------------------------
# q225 tunes the SYMMETRIC (Jaccard) threshold; sub-document duplication
# tunes separately — a pull-quote is 95 % contained at any Jaccard, and
# the fragment-removal threshold decides how aggressive
# `drop_contained_duplicates` is. One pass of q174's kernel scores every
# directed candidate pair in exact milli; the census reports, per
# threshold, qualifying pairs and distinct FRAGMENTS removed (the doc_a
# side — containment drops the smaller set by construction).
_Q226_THRESHOLDS = (300, 500, 700, 900)


@register(
    "q226_containment_threshold_curve",
    sql=f"""
    WITH positions AS (
      SELECT doc_id, text, UNNEST(RANGE(1, LENGTH(text) - {_CONTAIN_W - 2})) AS i
      FROM documents WHERE LENGTH(text) >= {_CONTAIN_W}
    ), all_grams AS (
      SELECT DISTINCT doc_id, SUBSTRING(text, i, {_CONTAIN_W}) AS gram
      FROM positions
    ), stop_grams AS (
      SELECT gram FROM all_grams GROUP BY gram HAVING COUNT(*) > {_CONTAIN_DF_CAP}
    ), grams AS (
      SELECT all_grams.* FROM all_grams ANTI JOIN stop_grams USING (gram)
    ), sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    ), scored AS (
      SELECT doc_a, 1000 * n_common // sa.n AS c_milli
      FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
      WHERE (sa.n < sb.n OR (sa.n = sb.n AND doc_a < doc_b))
    ), thresholds AS (
      SELECT UNNEST(ARRAY[{", ".join(str(t) for t in _Q226_THRESHOLDS)}])
        AS threshold_milli
    )
    SELECT t.threshold_milli,
           CAST(COUNT(s.c_milli) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT CASE WHEN s.c_milli >= t.threshold_milli
                                    THEN s.doc_a END) AS BIGINT)
             AS n_fragments_dropped
    FROM thresholds t LEFT JOIN scored s ON s.c_milli >= t.threshold_milli
    GROUP BY t.threshold_milli
    ORDER BY t.threshold_milli
    """,
    tags=("dedup", "containment", "calibration", "exact-integer"),
)
def q226_containment_threshold_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Removal curve of asymmetric containment dedup across four
    thresholds: qualifying directed pairs and distinct fragments dropped
    per threshold (module comment) — the `drop_contained_duplicates`
    tuning table beside q225's Jaccard curve.

    Scale shape: ONE pass of q174's kernel (DF-capped gram join,
    direction filter before the count aggregation) scores every
    candidate pair; the four-threshold census is a broadcast 4-row join
    over the scored list.
    """
    d = table(spark, sf_dir, "documents")
    scored = containment_pairs(d).select("doc_a", "containment_milli")
    thresholds = spark.range(1).selectExpr(
        f"EXPLODE(ARRAY({', '.join(str(t) for t in _Q226_THRESHOLDS)}))"
        " AS threshold_milli"
    )
    return (
        F.broadcast(thresholds)
        .join(
            scored,
            F.col("containment_milli") >= F.col("threshold_milli"),
            "left",
        )
        .groupBy("threshold_milli")
        .agg(
            F.count(F.col("containment_milli"))
            .cast("bigint")
            .alias("n_pairs"),
            F.countDistinct(
                F.when(
                    F.col("containment_milli") >= F.col("threshold_milli"),
                    F.col("doc_a"),
                )
            )
            .cast("bigint")
            .alias("n_fragments_dropped"),
        )
        .orderBy("threshold_milli")
    )


# ---------------------------------------------------------------------------
# q232 — connected components as TWO chained recursive CTEs, one statement,
# both engines (the r08 verdict's second recursion shape)
# ---------------------------------------------------------------------------
# q58 pins the iterative kernel against DuckDB's recursive-UNION closure;
# Spark 4's recursion supports UNION ALL only, where a naive min-label
# walk re-walks cycles forever (or explodes combinatorially under a hop
# guard on the fixture's 22-doc cluster). This shape is safe on BOTH
# engines by construction — the classic hook/contract decomposition:
#
# 1. ``ptr``: every node points at the minimum of its closed neighborhood
#    (one grouped min — the "hook").
# 2. ``chase`` (recursion 1): follow pointers to the local minimum. The
#    pointer value strictly DECREASES per hop, so UNION ALL terminates
#    unaided and each node contributes exactly one row per hop — linear,
#    cycle-proof.
# 3. ``cedges``: contract each edge to the two local minima it bridges —
#    the condensed graph, a few nodes per duplicate cluster.
# 4. ``walk`` (recursion 2): min-label closure with the label<node prune
#    and a hop guard, now over the TINY condensed graph where the guard
#    is comfortably above any condensed diameter.
# 5. labels = closure minimum of each node's local-minimum root.
#
# The statement text is IDENTICAL on Spark and DuckDB (only the pairs
# relation name differs — q228's device), and a pytest drill pins the
# three-way agreement: this recursion == the iterative kernel
# (functions/graph.py, i.e. q58's output) == the oracle, at all scales.

# Bounds the closure walk over the CONDENSED graph (local minima per
# duplicate cluster — a handful of nodes). A condensed diameter beyond
# the guard would stop labels short of the component minimum IDENTICALLY
# on both engines, so the oracle hash cannot catch it; the drill
# (tests/test_graph.py::test_q232_hop_guard_covers_condensed_diameter)
# therefore checks the output against verify_cc_fixpoint — a
# fixture-independent convergence proof — as well as the kernel.
_Q232_MAX_HOPS = 12


def _q232_body(rel: str) -> str:
    """Everything after WITH RECURSIVE — shared verbatim by both engines;
    ``rel`` is the near-dup pairs relation (doc_a, doc_b)."""
    return f"""edges AS (
      SELECT doc_a, doc_b FROM {rel}
      UNION ALL
      SELECT doc_b AS doc_a, doc_a AS doc_b FROM {rel}
    ), ptr AS (
      SELECT doc_a AS node, LEAST(doc_a, MIN(doc_b)) AS nxt
      FROM edges GROUP BY doc_a
    ), chase (node, cur) AS (
      SELECT node, nxt FROM ptr
      UNION ALL
      SELECT c.node, p.nxt
      FROM chase c JOIN ptr p ON p.node = c.cur
      WHERE p.nxt < c.cur
    ), root AS (
      SELECT node, MIN(cur) AS root FROM chase GROUP BY node
    ), cedges AS (
      SELECT DISTINCT ra.root AS doc_a, rb.root AS doc_b
      FROM edges e JOIN root ra ON ra.node = e.doc_a
                   JOIN root rb ON rb.node = e.doc_b
      WHERE ra.root <> rb.root
    ), walk (doc_id, label, hops) AS (
      SELECT doc_a AS doc_id, doc_a AS label, 0 FROM cedges
      UNION ALL
      SELECT c.doc_a, w.label, w.hops + 1
      FROM walk w JOIN cedges c ON c.doc_b = w.doc_id
      WHERE w.label < c.doc_a AND w.hops < {_Q232_MAX_HOPS}
    ), closure AS (
      SELECT doc_id, MIN(label) AS cmin FROM walk GROUP BY doc_id
    )
    SELECT r.node AS doc_id,
           CAST(COALESCE(c.cmin, r.root) AS BIGINT) AS cluster_id
    FROM root r LEFT JOIN closure c ON c.doc_id = r.root
    ORDER BY doc_id
    """


@register(
    "q232_dedup_clusters_recursive",
    sql=(
        "WITH RECURSIVE pairs AS ("
        + _minhash_sql().replace("ORDER BY doc_a, doc_b", "")
        + "), "
        + _q232_body("pairs")
    ),
    tags=("dedup", "clustering", "recursive-cte", "iterative"),
)
def q232_dedup_clusters_recursive(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q58's connected components computed by Spark's own WITH RECURSIVE
    (module comment above: pointer-chase to local minima, then min-label
    closure on the condensed graph — both recursions UNION ALL-safe),
    running the same statement text as the DuckDB oracle over q51's
    near-dup pairs.

    Scale shape: recursion 1 is out-degree-1 pointer chasing (rows =
    chain lengths, strictly decreasing so self-terminating); recursion 2
    walks a condensed graph whose size is the number of LOCAL minima per
    duplicate cluster — a handful — so the hop-guarded closure never
    touches corpus-sized state. The heavy lifting (pair generation) is
    q51's banded LSH, outside both recursions."""
    # materialize the edge list ONCE — the recursive plan references the
    # pairs relation from every iteration of both recursions, and without
    # this the whole LSH banding pipeline re-executes per step (the same
    # rationale as connected_components' localCheckpoint; measured 34 s →
    # 5 s at sf0.1)
    pairs = (
        q51_dedup_minhash_lsh(spark, sf_dir)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    pairs.createOrReplaceTempView("q232_pairs")
    return spark.sql("WITH RECURSIVE " + _q232_body("q232_pairs"))
