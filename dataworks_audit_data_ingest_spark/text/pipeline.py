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
from ..functions.localrel import local_rows_df

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
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep: str = "min_id",
    transitive: bool = False,
) -> DataFrame:
    """Keep one representative per near-dup cluster: MinHash-LSH candidate
    pairs (q51's signature pipeline) reduced to a keep/drop decision — a row
    is dropped if any BETTER row shares an LSH bucket.

    ``keep`` picks the canonical copy: ``"min_id"`` (the oracle-pinned
    default — first-seen wins, stable under appends) or ``"longest"``
    (the curation policy — among near-identical copies keep the most
    complete one; ties break on the lower id). q152 runs the longest
    policy under the oracle over exact-signature clusters.

    ``transitive=False`` (default) is a one-round approximation of full
    connected components (q58): ideal for curation where clusters are
    shallow; chains longer than one hop keep one extra representative
    rather than over-deleting. ``transitive=True`` runs the pairs
    through connected components and ranks the keep policy over each
    TRANSITIVE cluster, so a chain a~b~c keeps exactly one survivor even
    though a and c never share a bucket — q190 registers exactly this
    composition (CC × keep-best) under the DuckDB oracle. The transitive
    path pays O(cluster-graph diameter) extra shuffles over the pair
    list (bounded by the near-dup population, not the corpus) and
    applies q51's bucket cap to pair generation.
    """
    from ..queries.dedup import _spark_bands, _spark_sigs

    base = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    if keep not in ("min_id", "longest"):
        raise ValueError(f"unknown keep policy {keep!r}: min_id | longest")
    bands = _spark_bands(_spark_sigs(base))
    lens = base.select("doc_id", F.length("text").alias("_len"))
    if transitive:
        from pyspark.sql import Window

        from ..functions.graph import connected_components
        from ..queries.dedup import lsh_candidate_pairs

        pairs = lsh_candidate_pairs(bands)
        members = connected_components(pairs).select(
            F.col("node_id").alias("doc_id"), "cluster_id"
        )
        if keep == "longest":
            members = members.join(lens, "doc_id")
            order = [F.desc("_len"), F.asc("doc_id")]
        else:
            order = [F.asc("doc_id")]
        w = Window.partitionBy("cluster_id").orderBy(*order)
        dropped = (
            members.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") > 1)
            .select(F.col("doc_id").alias(id_col))
        )
        return docs.join(dropped, id_col, "left_anti")
    if keep == "longest":
        bands = bands.join(lens, "doc_id")
    a, b = bands.alias("a"), bands.alias("b")
    same_bucket = (F.col("a.band_idx") == F.col("b.band_idx")) & (
        F.col("a.band_hash") == F.col("b.band_hash")
    )
    if keep == "min_id":
        b_better = F.col("a.doc_id") > F.col("b.doc_id")
    else:
        b_better = (F.col("b._len") > F.col("a._len")) | (
            (F.col("b._len") == F.col("a._len"))
            & (F.col("b.doc_id") < F.col("a.doc_id"))
        )
    dropped = (
        a.join(b, same_bucket & b_better)
        .select(F.col("a.doc_id").alias(id_col))
        .distinct()
    )
    return docs.join(dropped, id_col, "left_anti")


def drop_contained_duplicates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold_milli: int = 500,
    gram_width: int = 8,
    df_cap: int = 16,
    survivors: DataFrame | None = None,
) -> DataFrame:
    """Remove documents whose distinct char-gram set is at least
    ``threshold_milli``/1000 contained in a LARGER document's set — the
    sub-document-duplication step (fragments, pull-quotes, partial
    re-crawls of pages already kept) that :func:`drop_near_duplicates`'
    symmetric Jaccard misses by construction: a short fragment embedded
    in a long page has near-zero union-normalized similarity but
    containment ~1. q174 runs the same kernel
    (`queries/dedup.py::containment_pairs`) under the DuckDB oracle.

    The SMALLER side of every qualifying pair is dropped, so the kept
    set is exactly the documents not ≥-threshold contained in any larger
    one — kept or dropped. At ``threshold_milli=1000`` (exact subset)
    containment is transitive, so dropped content provably survives
    through its largest container; at lower thresholds a chain A⊂~B⊂~C
    can drop both A and B while A is below threshold against the kept C
    — one-round semantics that can over-delete relative to the ideal,
    the same trade :func:`drop_near_duplicates` documents for multi-hop
    LSH clusters. Raise the threshold (or run the pairs through
    `functions/graph.py` connected components with a keep-max policy)
    when chain-loss matters.

    ``survivors`` composes this step with an upstream curation pass
    (keep-best-copy, quality gate, source blocklist — q176 registers the
    composition under the oracle): when given, a fragment is dropped
    ONLY when a containing document is itself a survivor, and the
    result is ``survivors`` minus those fragments. Without it, the
    naive ordering (containment before curation) can delete a fragment
    because of container B and then lose B to curation — the content
    vanishes entirely. With it, a fragment whose every container died
    in curation is RESCUED: it stays as the sole remaining copy.
    Candidate pairs are still computed over ``docs`` (the full corpus)
    so the survivor check is an explicit join, not an implicit
    recomputation with different stop-gram statistics.

    Scale: inherits q174's guards — gram-keyed join under a document
    frequency cap (no quadratic fan-out), direction filter before the
    count aggregation; the drop-id set is distinct ids only.
    """
    from ..queries.dedup import containment_pairs

    pairs = containment_pairs(
        docs, id_col=id_col, text_col=text_col, width=gram_width, df_cap=df_cap
    ).filter(F.col("containment_milli") >= threshold_milli)
    if survivors is not None:
        surviving_ids = survivors.select(F.col(id_col).alias("doc_b"))
        dropped = (
            pairs.join(surviving_ids, "doc_b", "left_semi")
            .select(F.col("doc_a").alias(id_col))
            .distinct()
        )
        return survivors.join(dropped, id_col, "left_anti")
    dropped = pairs.select(F.col("doc_a").alias(id_col)).distinct()
    return docs.join(dropped, id_col, "left_anti")


def token_budget_sample(
    docs: DataFrame,
    budget_tokens: int,
    text_col: str = "text",
    order_seed: str = "budget",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic sample of documents filling a token budget: order by the
    content hash (reproducible shuffle, q64's primitive), take documents
    until the running token total reaches the budget.

    Scale shape (the r08 verdict's one weak component, fixed): a running
    sum over a GLOBAL window is a single-task sort of the whole corpus —
    the text column would ride through a SinglePartition exchange. This
    form is a distributed two-phase prefix sum instead:

    1. project each row to ``(id, _h, _n_tok)`` — the text column never
       enters any exchange;
    2. derive a range bucket ``_pid = _h DIV (2^32 / n_buckets)`` —
       monotone in ``_h`` by construction (no sampling, so the bucketing
       is deterministic and the same rows always land together);
    3. one aggregate pass computes per-bucket token totals; the driver
       folds them into per-bucket offsets (n_buckets rows — tiny);
    4. buckets whose offset already exceeds the budget are dropped
       BEFORE the sort, so the per-bucket rank window only shuffles rows
       that can still be selected;
    5. ``running = offset + per-bucket prefix sum`` over
       ``Window.partitionBy(_pid).orderBy(_h, id)`` — n_buckets parallel
       sorts of slim rows instead of one global sort of the corpus;
    6. survivors semi-join back to ``docs`` on ``id_col`` to restore the
       full rows.

    The global order is (``_h``, ``id_col``) — identical for any
    n_buckets, so the same corpus and budget always select the same set,
    across runs, partitionings and cluster sizes. ``id_col`` must be
    unique per row (it is the join-back key and the order tiebreak).
    """
    spark = docs.sparkSession
    words = F.split(F.col(text_col), " ")
    h = F.expr(spark_hash32(text_col, order_seed))
    n_buckets = max(1, spark.sparkContext.defaultParallelism)
    width = max(1, (1 << 32) // n_buckets)
    # NULL-text rows never qualify (their running sum was NULL under the
    # retired window form too — same selection); materialize the slim
    # projection ONCE so the totals pass and the window pass don't each
    # re-execute the corpus scan + hash (two corpus reads total: this
    # one, and the final join-back for the full rows).
    slim = (
        docs.filter(F.col(text_col).isNotNull())
        .select(
            F.col(id_col),
            h.alias("_h"),
            F.size(words).alias("_n_tok"),
        )
        .withColumn("_pid", F.expr(f"_h DIV {width}"))
        .localCheckpoint()
    )
    totals = slim.groupBy("_pid").agg(F.sum("_n_tok").alias("_tot")).collect()
    acc = 0
    offsets = []
    for r in sorted(totals, key=lambda r: r["_pid"]):
        offsets.append((int(r["_pid"]), acc))
        acc += int(r["_tot"])
    off_df = local_rows_df(spark, offsets or [], "_pid bigint, _off bigint")
    w = (
        Window.partitionBy("_pid")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    picked = (
        slim.join(F.broadcast(off_df), "_pid")
        .filter(F.col("_off") < budget_tokens)
        .withColumn("_running", F.sum("_n_tok").over(w) + F.col("_off"))
        .filter(F.col("_running") <= budget_tokens)
        .select(id_col)
    )
    return docs.join(picked, id_col, "left_semi")


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Strip emails and planted phone patterns (q80's regex pass as a
    stage): pure JVM map, adds ``n_pii_hits`` provenance."""
    from ..queries.curation import _EMAIL_RE, _PHONE_RE

    clean = F.regexp_replace(
        F.regexp_replace(F.col(text_col), _EMAIL_RE, "[EMAIL]"),
        _PHONE_RE,
        "[PHONE]",
    )
    before = F.length(F.col(text_col))
    return docs.withColumn("_clean", clean).select(
        *[c for c in docs.columns if c != text_col],
        F.col("_clean").alias(text_col),
        (before - F.length("_clean")).alias("n_pii_chars_removed"),
    )


def drop_contaminated(
    docs: DataFrame,
    benchmark: DataFrame,
    ngram: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove documents sharing any word ``ngram``-gram with the benchmark
    set (q82's semantics as a stage). The benchmark gram set is broadcast —
    nothing corpus-sized shuffles on the gram key."""

    def grams(df: DataFrame, keep_id: bool) -> DataFrame:
        cols = [F.col(id_col)] if keep_id else []
        return (
            df.filter(F.size(F.split(text_col, " ")) >= ngram)
            .select(
                *cols,
                F.explode(
                    F.expr(
                        f"TRANSFORM(SEQUENCE(1, SIZE(SPLIT({text_col}, ' ')) - {ngram - 1}), "
                        f"i -> ARRAY_JOIN(SLICE(SPLIT({text_col}, ' '), i, {ngram}), ' '))"
                    )
                ).alias("gram"),
            )
            .distinct()
        )

    bench_grams = grams(benchmark, keep_id=False)
    hits = (
        grams(docs, keep_id=True)
        .join(F.broadcast(bench_grams), "gram", "left_semi")
        .select(id_col)
        .distinct()
    )
    return docs.join(hits, id_col, "left_anti")


def allocate_source_budget(
    docs: DataFrame,
    budget_docs: int,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-sampled source allocation: split a global document
    budget across sources proportionally to the SQUARE ROOT of each
    source's token mass (the standard α=0.5 sampling temperature that
    up-weights small sources relative to raw proportions), rounded to
    integers that sum EXACTLY to the budget via Hamilton's
    largest-remainder method.

    Output (one row per source, broadcast-sized):
    ``source, n_docs, n_tokens, weight, alloc_docs`` — all BIGINT.
    ``weight = floor(sqrt(n_tokens))``; ``alloc_docs = (budget·w) DIV W``
    plus one extra for the ``budget − Σ base`` sources with the largest
    remainders (ties broken on source ascending). Every step is integer
    or a correctly-rounded sqrt of an integer, so allocations are
    deterministic and engine-portable (q233's oracle hash).

    Scale shape: one corpus scan with map-side partial aggregation down
    to |sources| rows; the remainder ranking runs on that tiny table.
    The allocation drives `cap_per_source`/`enforce_source_quota`
    downstream — this computes the quotas those operators enforce.

    Edge contracts: a corpus whose summed weight is ZERO (every source's
    token mass under 1 — empty or null texts) raises a clear error at
    execution rather than a silent NULL/DIV-by-zero allocation. And
    ``alloc_docs`` is a QUOTA, not a guarantee: a small source can be
    allocated more documents than it has (``alloc_docs > n_docs``) —
    temperature sampling up-weights small sources by design, and the
    downstream cap operators simply take everything such a source has;
    the global budget is then an upper bound, not an exact hit."""
    per_src = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        # an all-null-text source must weigh ZERO, not NULL — a NULL
        # weight would slip past the zero-weight guard and NULL its
        # allocation silently
        F.coalesce(
            F.sum(F.size(F.split(F.col(text_col), " "))), F.lit(0)
        )
        .cast("bigint")
        .alias("n_tokens"),
    )
    w = per_src.withColumn(
        "weight",
        F.expr("CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT)"),
    )
    tot = Window.partitionBy()
    ranked = (
        w.withColumn("_W", F.sum("weight").over(tot))
        # zero-weight corpus: DIV NULL would silently NULL every
        # allocation (or error opaquely under ANSI) — fail loud instead
        .withColumn(
            "base",
            F.expr(
                "CASE WHEN _W <= 0 THEN CAST(raise_error("
                "'allocate_source_budget: summed source weight is zero"
                " (every source has zero token mass) — no proportional"
                " allocation exists') AS BIGINT)"
                f" ELSE ({budget_docs} * weight) DIV _W END"
            ),
        )
        .withColumn("rem", F.expr(f"({budget_docs} * weight) % _W"))
        .withColumn("_spare", F.lit(budget_docs) - F.sum("base").over(tot))
        .withColumn(
            "_rr",
            F.row_number().over(
                Window.orderBy(F.desc("rem"), F.asc("source"))
            ),
        )
    )
    return ranked.select(
        "source",
        "n_docs",
        "n_tokens",
        "weight",
        (
            F.col("base")
            + F.when(F.col("_rr") <= F.col("_spare"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("alloc_docs"),
    ).orderBy("source")


def mix_sources(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 1.0,
    id_col: str = "doc_id",
    source_col: str = "source",
    seed: str = "mix",
) -> DataFrame:
    """Deterministic per-source downsampling to target mixing rates (q83's
    sampler as a stage): a document survives iff its portable MD5-uniform
    on ``id_col`` falls under its source's rate — reproducible across
    engines, re-runs, and partitionings."""
    rate = F.lit(default_rate)
    for src, r in rates.items():
        rate = F.when(F.col(source_col) == src, F.lit(float(r))).otherwise(rate)
    u = (
        F.expr(spark_hash32(f"CAST({id_col} AS STRING)", seed)) % 10000
    ) / 10000.0
    return docs.withColumn("_rate", rate).filter(u < F.col("_rate")).drop("_rate")


def drop_semantic_duplicates(
    docs: DataFrame,
    threshold: float = 0.98,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    srp_bands: int = 4,
    srp_bits: int = 8,
    bucket_cap: int = 64,
) -> DataFrame:
    """Embedding-level (semantic) dedup: documents whose EMBEDDINGS are
    near-identical collapse to one representative even when their text
    differs (paraphrases, templated rewrites) — the complement of
    :func:`drop_near_duplicates`' lexical MinHash.

    Candidate generation is two-level, both levels bounded:

    1. **Exact-signature anchor stars**: all vectors sharing the FULL
       32-bit SRP signature (near-identical vectors agree on ~every
       sign bit) pair with the group's minimum id — a pile of c exact
       near-duplicates emits c-1 pairs, never c²/2. This is the level
       that handles the giant template/boilerplate pile, the input this
       stage exists for, in linear work.
    2. **Capped banded buckets**: per (band, bval) bucket of the 4×8
       banding, all-pairs WITHIN buckets of at most ``bucket_cap``
       members (q51's hot-bucket discipline — a hot bucket is hash
       collisions, not duplicates; the real piles were already linked
       by level 1). Catches cross-signature near-dups whose few
       flipped bits land inside one band. Buckets OVER the cap are not
       dropped: they degrade to an anchor star against the bucket's
       minimum id (c-1 pairs, like level 1), so a >cap pile of
       paraphrases whose full signatures differ still links through
       its anchor — transitively completed by the CC step — without
       ever paying the c²/2 all-pairs cost.

    Exact decimal cosine then keeps pairs at/above ``threshold``
    (approximation lives ONLY in candidate selection); connected
    components (`functions/graph.py`, q58's kernel) collapse transitive
    chains across buckets and levels; the minimum id per cluster
    survives.

    Recall: a 0.98-cosine pair flips each of the 32 sign bits with
    p ≈ 0.036, so P(some 8-bit band survives intact) ≈ 99.6% — and
    tighter duplicates (the common case) approach 100% with level 1
    alone. At scale: signatures are map-side; level-1 shuffles one row
    per vector keyed by signature; level-2 shuffles (band, bval) keys
    with ≤ cap²/2 pairs per bucket; CC costs O(cluster diameter)
    shuffles (near-dup clusters are shallow)."""
    from ..functions.graph import connected_components

    scored = semantic_candidate_scores(
        docs,
        id_col=id_col,
        vec_col=vec_col,
        srp_bands=srp_bands,
        srp_bits=srp_bits,
        bucket_cap=bucket_cap,
    )
    edges = scored.filter(F.col("_cos") >= threshold).select("id_a", "id_b")
    dupes = (
        connected_components(edges, src="id_a", dst="id_b")
        .filter(F.col("node_id") != F.col("cluster_id"))
        .select(F.col("node_id").alias(id_col))
    )
    return docs.join(dupes, id_col, "left_anti")


def semantic_candidate_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    srp_bands: int = 4,
    srp_bits: int = 8,
    bucket_cap: int = 64,
) -> DataFrame:
    """The operator's candidate universe with exact-decimal cosines:
    ``(id_a, id_b, _cos)`` for every level-1 anchor-star, capped-bucket,
    and hot-bucket-fallback pair (see :func:`drop_semantic_duplicates`,
    whose edge set is exactly ``_cos >= threshold`` over this frame).
    Exposed so audits (q266's store-verifier parity census) score the
    SAME pair universe the dedup decision runs on — a reimplementation
    could silently drift."""
    from pyspark.sql import Window

    from ..similarity.knn import _srp_bands_expr, _with_norm, cosine_expr

    base = _with_norm(
        docs.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")),
        "_v",
    ).select("_id", "_v", F.col("_nrm").alias("_n"))
    proj, stack = _srp_bands_expr("_v", srp_bands, srp_bits, "srp")
    n_bits = srp_bands * srp_bits
    fullsig = "CONCAT(" + ", ".join(
        f"CASE WHEN _sig[{j}] >= 0 THEN '1' ELSE '0' END" for j in range(n_bits)
    ) + ")"
    sigged = base.withColumn("_sig", F.expr(proj))
    # level 1: anchor star per exact full signature
    w_sig = Window.partitionBy("_fullsig")
    star = (
        sigged.withColumn("_fullsig", F.expr(fullsig))
        .withColumn("_anchor", F.min("_id").over(w_sig))
        .filter(F.col("_id") != F.col("_anchor"))
        .select(F.col("_anchor").alias("id_a"), F.col("_id").alias("id_b"))
    )
    # level 2: all-pairs inside small (band, bval) buckets; over-cap
    # buckets degrade to an anchor star vs the bucket minimum (c-1 pairs)
    bands = (
        sigged.select("_id", F.expr(stack))
        .withColumn("_bn", F.count(F.lit(1)).over(Window.partitionBy("band", "bval")))
        .withColumn("_bmin", F.min("_id").over(Window.partitionBy("band", "bval")))
    )
    small = bands.filter(F.col("_bn") <= bucket_cap)
    bucket_pairs = (
        small.alias("a")
        .join(small.alias("b"), ["band", "bval"])
        .filter(F.col("a._id") < F.col("b._id"))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
    )
    big_star = (
        bands.filter((F.col("_bn") > bucket_cap) & (F.col("_id") != F.col("_bmin")))
        .select(F.col("_bmin").alias("id_a"), F.col("_id").alias("id_b"))
    )
    cand = star.union(bucket_pairs).union(big_star).distinct()
    return (
        cand.join(
            base.select(
                F.col("_id").alias("id_a"),
                F.col("_v").alias("_va"),
                F.col("_n").alias("_na"),
            ),
            "id_a",
        )
        .join(
            base.select(
                F.col("_id").alias("id_b"),
                F.col("_v").alias("_vb"),
                F.col("_n").alias("_nb"),
            ),
            "id_b",
        )
        .withColumn("_cos", F.expr(cosine_expr("_va", "_vb", "_na", "_nb")))
    )


def cap_per_source(
    docs: DataFrame,
    max_docs: int,
    id_col: str = "doc_id",
    source_col: str = "source",
    seed: str = "quota",
    prethin: bool = False,
    prethin_target: int | None = None,
) -> DataFrame:
    """Absolute per-source cap (q88's quota sampler as a stage): keep at
    most ``max_docs`` documents per source, chosen by portable-hash rank —
    the "no domain dominates" bound composed before :func:`mix_sources`
    (mix sets the ratio; this bounds the head regardless of corpus skew).
    Deterministic across engines, re-runs, and partitionings.

    Two execution paths, **identical output** (pinned by
    ``tests/test_text_pipeline.py``):

    - ``prethin=False`` (default, the q88 oracle pin): one shuffle keyed
      by ``source_col`` with an exact window rank. Spark 4's map-side
      ``WindowGroupLimit`` bounds each task's contribution to
      ``max_docs`` rows per source, but the per-source reducer still
      receives up to ``max_docs × num_map_tasks`` rows — fine until the
      task count is huge.
    - ``prethin=True`` (the 100 TB path): two-pass hash-threshold. The
      hash is uniform on [0, 2³²) by construction (MD5-derived), so a
      per-source threshold ``t = 2³² · target / n`` keeps an expected
      ``target = max_docs + 4√max_docs + 16`` rows; the ``h < t`` filter
      runs MAP-SIDE (thresholds broadcast), so each reducer receives
      ~``target`` rows per source — independent of corpus size AND task
      count. A verify step counts survivors per source and routes any
      under-covered source (binomial undershoot — probability ~1e-4 per
      source at the 4σ+16 slack) through the exact path, making the
      output unconditionally identical to the window form, not
      probabilistically. Cost: one extra map-combined count scan (reduces
      to one row per source) — the price that deletes the hot-source
      reducer bound.

    The source domain (one row per source for counts/thresholds) is
    assumed broadcast-small — true for web-domain/provenance keys; for
    an unbounded key, bucket it first."""
    from pyspark.sql import Window

    h = F.expr(spark_hash32(f"CAST({id_col} AS STRING)", seed))
    w = Window.partitionBy(source_col).orderBy("_qh", F.col(id_col))
    if not prethin:
        return (
            docs.withColumn("_qh", h)
            .withColumn("_qr", F.row_number().over(w))
            .filter(F.col("_qr") <= max_docs)
            .drop("_qh", "_qr")
        )
    target = (
        prethin_target
        if prethin_target is not None
        else max_docs + 4 * int(max_docs**0.5) + 16
    )
    hashed = docs.withColumn("_qh", h)
    counts = hashed.groupBy(source_col).agg(F.count(F.lit(1)).alias("_qn"))
    thr = counts.withColumn(
        "_qthr",
        F.when(F.col("_qn") <= F.lit(max_docs), F.lit(1 << 32)).otherwise(
            F.least(
                F.lit(1 << 32),
                F.ceil(F.lit(float(1 << 32)) * F.lit(target) / F.col("_qn")),
            )
        ),
    )
    thinned = hashed.join(F.broadcast(thr), source_col).filter(
        F.col("_qh") < F.col("_qthr")
    )
    # verify: a source is covered iff the thin kept at least
    # min(max_docs, n) rows — the true top-max_docs by (hash, id) are
    # then guaranteed to be among the survivors (h < t is a prefix of
    # the hash order). Under-covered sources fall back to the exact scan.
    cover = thinned.groupBy(source_col).agg(F.count(F.lit(1)).alias("_qm"))
    bad = (
        counts.join(cover, source_col, "left")  # a zero-survivor source has no cover row
        .filter(
            F.coalesce(F.col("_qm"), F.lit(0))
            < F.least(F.lit(max_docs), F.col("_qn"))
        )
        .select(source_col)
    )
    pool_cols = [*docs.columns, "_qh"]
    pool = (
        thinned.select(*pool_cols)
        .join(F.broadcast(bad), source_col, "left_anti")
        .unionByName(
            hashed.select(*pool_cols).join(
                F.broadcast(bad), source_col, "left_semi"
            )
        )
    )
    return (
        pool.withColumn("_qr", F.row_number().over(w))
        .filter(F.col("_qr") <= max_docs)
        .drop("_qh", "_qr")
    )


def pack_sequences(
    docs: DataFrame,
    budget_tokens: int,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "pack",
) -> DataFrame:
    """Assign each document to a fixed-token-budget training sequence —
    the scale form of q85's packing: documents hash into ``n_buckets``
    independent packing streams, and the running-sum window is
    PARTITIONED by bucket, so no single task ever sees the whole corpus.
    Sequence ids are globally unique as (bucket, local_seq) pairs encoded
    into one BIGINT. Deterministic across runs and partitionings.

    Adds ``seq_id`` and ``n_tok`` columns; callers group by ``seq_id`` to
    materialize the packed rows."""
    h = F.expr(spark_hash32(f"CAST({id_col} AS STRING)", seed))
    toks = docs.withColumn("_h", h).withColumn(
        "_bucket", (F.col("_h") % n_buckets).cast("int")
    ).withColumn("n_tok", F.size(F.split(F.col(text_col), " ")))
    w = (
        Window.partitionBy("_bucket")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    placed = toks.withColumn("_cum", F.sum("n_tok").over(w))
    local_seq = F.floor(
        (F.col("_cum") - F.col("n_tok")).cast("double") / budget_tokens
    ).cast("bigint")
    return placed.withColumn(
        "seq_id", F.col("_bucket").cast("bigint") * 1_000_000_000 + local_seq
    ).drop("_h", "_bucket", "_cum")


def temperature_allocation(
    docs: DataFrame,
    total: int,
    temperature: float = 0.5,
    source_col: str = "source",
) -> DataFrame:
    """Exact document-count allocation for temperature-based source
    mixing: weight each source ``c_i^T / Σ c_j^T`` (T < 1 flattens the
    source distribution — the multilingual-corpus rebalancing move), then
    convert weights to integer seat counts with the largest-remainder
    method so the allocations sum to EXACTLY ``total``.

    Returns (source, n_docs, alloc, oversampled): ``oversampled`` marks
    sources whose allocation exceeds their inventory — the consumer
    decides between repeating examples (epoch > 1 for that source) and
    capping (`resample_to_allocation` caps).

    ``temperature`` is restricted to {0.5, 1.0, 2.0}: √, identity, and
    square are the powers whose cross-engine determinism is guaranteed
    (IEEE sqrt is correctly rounded; integer products are exact) —
    arbitrary ``pow`` is not portably rounded and would break the oracle
    contract. The weight sum runs in DECIMAL (order-free exact), floors
    and fractional remainders are IEEE-identical, remainder ties break on
    the source name.

    Scale shape: everything after the per-source count (one map-combined
    shuffle to |sources| rows) is arithmetic on a broadcast-sized table —
    the allocation itself is free at any corpus size."""
    if temperature not in (0.5, 1.0, 2.0):
        raise ValueError("temperature must be 0.5, 1.0, or 2.0 (portable powers)")
    from pyspark.sql import Window

    counts = docs.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_docs"))
    if temperature == 0.5:
        w_expr = "SQRT(CAST(n_docs AS DOUBLE))"
    elif temperature == 1.0:
        w_expr = "CAST(n_docs AS DOUBLE)"
    else:
        w_expr = "CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE)"
    weighted = counts.withColumn("_w", F.expr(w_expr))
    sums = weighted.agg(
        F.sum(F.expr("CAST(_w AS DECIMAL(28,18))")).cast("double").alias("_s")
    )
    quoted = (
        weighted.crossJoin(F.broadcast(sums))
        .withColumn("_quota", F.lit(total) * F.col("_w") / F.col("_s"))
        .withColumn("_floor", F.floor("_quota").cast("bigint"))
        .withColumn("_frac", F.col("_quota") - F.floor("_quota"))
    )
    floors = quoted.agg(F.sum("_floor").alias("_fsum"))
    w_rank = Window.orderBy(F.desc("_frac"), F.asc(source_col))
    return (
        quoted.crossJoin(F.broadcast(floors))
        .withColumn("_rk", F.row_number().over(w_rank))
        .select(
            source_col,
            "n_docs",
            (
                F.col("_floor")
                + F.when(F.col("_rk") <= F.lit(total) - F.col("_fsum"), 1).otherwise(0)
            ).cast("bigint").alias("alloc"),
        )
        .withColumn("oversampled", F.col("alloc") > F.col("n_docs"))
    )


def resample_to_allocation(
    docs: DataFrame,
    allocation: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    seed: str = "mix",
) -> DataFrame:
    """Keep ``min(alloc, n_docs)`` documents per source, chosen by
    portable-hash rank — `cap_per_source` with a per-source cap taken
    from a `temperature_allocation` table instead of one constant.
    Repeating oversampled sources (alloc > inventory) is a loader
    concern (epoch multiplicity), not a corpus rewrite — this keeps the
    corpus a subset of its input."""
    from pyspark.sql import Window

    h = F.expr(spark_hash32(f"CAST({id_col} AS STRING)", seed))
    w = Window.partitionBy(source_col).orderBy("_qh", F.col(id_col))
    return (
        docs.withColumn("_qh", h)
        .join(F.broadcast(allocation.select(source_col, "alloc")), source_col)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= F.col("alloc"))
        .drop("_qh", "_rk", "alloc")
    )


def strip_boilerplate_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 20,
) -> DataFrame:
    """CCNet-style boilerplate removal (q193's API twin): drop every LINE
    that appears in >= ``min_docs`` distinct documents (nav bars, cookie
    banners, footers), reassemble each document from its surviving lines
    in original order, and drop documents left empty. All other columns
    pass through unchanged; ``text_col`` is replaced by the cleaned text.

    Scale shape: line document-frequency is one line-keyed partial
    aggregation; the boilerplate set (df >= threshold) is tiny and
    broadcast into the removal anti-join; reassembly is one doc-keyed
    aggregation with per-group payload bounded by the document's own
    line count. At 100 TB, pre-hash lines so the df exchange carries
    8-byte keys, and keep the df table incremental across crawls via the
    chunk-store pattern (incremental/store.py).
    """
    lined = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_i", "_line"),
    )
    bp = (
        lined.groupBy("_line")
        .agg(F.countDistinct("_id").alias("_df"))
        .filter(F.col("_df") >= min_docs)
        .select("_line")
    )
    rebuilt = (
        lined.join(F.broadcast(bp), "_line", "left_anti")
        .groupBy("_id")
        .agg(
            F.array_join(
                F.expr(
                    "TRANSFORM(ARRAY_SORT(COLLECT_LIST(STRUCT(_i, _line))),"
                    " x -> x._line)"
                ),
                "\n",
            ).alias("_clean")
        )
    )
    return (
        docs.join(rebuilt, F.col(id_col) == F.col("_id"), "inner")
        .drop("_id")
        .withColumn(text_col, F.col("_clean"))
        .drop("_clean")
        .filter(F.length(text_col) > 0)
    )


def assign_leakage_safe_splits(
    docs: DataFrame,
    pairs: DataFrame | None = None,
    id_col: str = "doc_id",
    splits: tuple[tuple[str, int], ...] = (("train", 8), ("eval", 2)),
    seed: str = "split",
    labels: DataFrame | None = None,
) -> DataFrame:
    """Assign every document a split such that NO near-dup pair straddles
    a boundary (q192's remedy as the reusable API): connected components
    over ``pairs`` give each near-dup cluster one id, the split is a
    portable hash of THAT id (members inherit), and unpaired documents
    hash their own id. ``splits`` are (name, weight) bucket shares —
    weights are integer bucket counts out of their sum, so the default
    is the 80/20 split. Returns ``docs`` plus a ``split`` column.

    Scale shape: clusters ride the O(diameter) min-label CC over the
    banded pair list (never corpus-shaped); assignment is one left join
    against the CC table (which holds only paired docs) plus map-side
    hash arithmetic.

    ``labels`` skips the CC recompute: pass a precomputed
    ``(node_id, cluster_id)`` table — in a standing crawl, the
    incremental CC store's MIN fold (`incremental/cc.py::read_cc_labels`,
    drill-pinned equal to batch CC over every pair surfaced) — so the
    split derives from maintained state instead of an O(diameter)
    recompute per refresh; exactly one of ``pairs``/``labels`` must be
    given. ``examples/crawl_refresh_pipeline.py`` runs the labels form.
    """
    from ..functions.graph import connected_components
    from ..functions.hashing import spark_hash32

    if (pairs is None) == (labels is None):
        raise ValueError("pass exactly one of pairs / labels")

    total = sum(w for _, w in splits)
    if total <= 0 or any(w < 0 for _, w in splits):
        raise ValueError(f"split weights must be non-negative, sum > 0: {splits!r}")
    h = spark_hash32("CAST(_cluster AS STRING)", seed)
    expr, lo = "CASE", 0
    for name, w in splits:
        expr += (
            f" WHEN ({h}) % {total} >= {lo}"
            f" AND ({h}) % {total} < {lo + w} THEN '{name}'"
        )
        lo += w
    expr += " END"

    if labels is not None:
        cc = labels.select(F.col("node_id").alias(id_col), "cluster_id")
    else:
        cc = connected_components(
            pairs.select("doc_a", "doc_b").distinct()
        ).select(F.col("node_id").alias(id_col), "cluster_id")
    return (
        docs.join(cc, id_col, "left")
        .withColumn("_cluster", F.coalesce("cluster_id", F.col(id_col)))
        .drop("cluster_id")
        .withColumn("split", F.expr(expr))
        .drop("_cluster")
    )


def annotate_compressibility(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compression ratio in ppm — the classic
    cheap-model quality signal (highly repetitive/templated text
    compresses far below natural prose; binary-ish noise barely
    compresses at all). Complements q81's duplicate-n-gram fraction with
    a signal that sees ALL redundancy structure, not just 3-gram repeats.

    ``ratio_ppm = 1e6 · compressed_len / raw_len`` over UTF-8 bytes
    (empty text ⇒ 1e6, i.e. "incompressible": there is nothing to win).
    Runs as Arrow-batched ``mapInPandas`` (the sanctioned Python-kernel
    regime: zlib has no SQL expression) joined back by id, so the UDF
    moves only (id, two lengths) — the text column never round-trips
    through Python back into the plan. Deterministic for a fixed zlib
    ``level`` (same library version either side of a shuffle, one
    compressor instance per Arrow batch).
    """
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [
            StructField("_id", LongType()),
            StructField("raw_len", LongType()),
            StructField("comp_len", LongType()),
        ]
    )

    def measure(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            raw = pdf[text_col].fillna("").str.encode("utf-8")
            yield pd.DataFrame(
                {
                    "_id": pdf[id_col],
                    "raw_len": raw.str.len(),
                    "comp_len": raw.map(
                        lambda b: len(zlib.compress(b, level))
                    ),
                }
            )

    lens = docs.select(id_col, text_col).mapInPandas(measure, schema=schema)
    ratio = (
        "CAST(CASE WHEN raw_len = 0 THEN 1000000 ELSE "
        "CAST(comp_len AS DECIMAL(38,0)) * 1000000 DIV raw_len END AS BIGINT)"
    )
    return docs.join(
        lens.select("_id", F.expr(ratio).alias("compress_ratio_ppm")),
        F.col(id_col) == F.col("_id"),
    ).drop("_id")


def interleave_for_training(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    source_col: str = "source",
    seed: str = "interleave",
    mode: str = "stride",
) -> DataFrame:
    """Deterministic global training order with sources spread evenly —
    the last-mile op between curation and shard writing: a model should
    not see a million rows of one source in a block (ordering bias), and
    the order must be REPLAY-STABLE so a resumed/re-run job trains on
    the identical sequence.

    ``mode="stride"`` (exact): within each source, rows get a seeded
    hash order (rank 1..n_s); the global key is rank·N DIV n_s — source
    s occupies every (N/n_s)-th slot, so EVERY window of W consecutive
    rows contains ≈ W·n_s/N rows of each source, deterministically. The
    product runs in DECIMAL(38,0) (rank·N can pass 2^63 at corpus
    scale). Cost: the per-source rank is a per-source sort — this is a
    real total-order materialization, the same single intentional
    global shuffle class as `sinks.write_training_shards`; run it once
    per corpus freeze, not per experiment.

    ``mode="hash"`` (statistical): the key is the seeded row hash alone
    — map-side, no sort, each window's composition is proportional only
    in expectation. The right choice when the corpus is re-frozen often.

    Returns ``docs`` + ``order_key`` (BIGINT; train in ascending
    (order_key, source, id) order — both tie-breaks deterministic).
    """
    h = F.expr(
        spark_hash32(f"CAST({id_col} AS STRING)", seed)
    )
    if mode == "hash":
        return docs.withColumn("order_key", h)
    if mode != "stride":
        raise ValueError(f"unknown mode {mode!r}")
    w_rank = Window.partitionBy(source_col).orderBy(h.asc(), F.col(id_col))
    w_src = Window.partitionBy(source_col)
    total = docs.agg(F.count(F.lit(1)).alias("_n"))
    return (
        docs.crossJoin(F.broadcast(total))
        .withColumn("_rn", F.row_number().over(w_rank))
        .withColumn("_ns", F.count(F.lit(1)).over(w_src))
        .withColumn(
            "order_key",
            F.expr(
                "CAST(CAST(_rn AS DECIMAL(38,0)) * _n DIV _ns AS BIGINT)"
            ),
        )
        .drop("_rn", "_ns", "_n")
    )


def annotate_gopher_rules(
    docs: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """Gopher-style surface-form quality rules (Rae et al. 2021,
    arXiv:2112.11446 — the MassiveText filter set), the complement of
    q81's repetition rules and q61's stopword/length features:

    - ``fail_word_count``    words < 50 or > 100,000
    - ``fail_mean_word_len`` mean word length outside [3, 10]
    - ``fail_symbol_ratio``  ('#' + '...') per word > 0.1
    - ``fail_bullet_lines``  > 90 % of lines start with a bullet
    - ``fail_ellipsis_lines``> 30 % of lines end with '...'
    - ``fail_alpha_words``   < 80 % of words contain a letter

    plus ``gopher_verdict`` ('keep' unless any rule fails). All rules
    are map-side whole-stage-codegen expressions over the split arrays
    (no shuffle, no Python); thresholds are the paper's. ASCII-only
    bullet forms ('- ', '* ') keep Java/RE2/DuckDB regex semantics
    identical across engines.
    """
    words = f"FILTER(SPLIT({text_col}, ' '), w -> w != '')"
    lines = f"SPLIT({text_col}, '\\n')"
    nw = f"SIZE({words})"
    d = docs.withColumn("g_n_words", F.expr(nw).cast("bigint")).withColumn(
        "g_word_chars",
        F.expr(
            f"AGGREGATE(TRANSFORM({words}, w -> LENGTH(w)), 0L, (a, v) -> a + v)"
        ),
    ).withColumn(
        "g_n_lines", F.expr(f"SIZE({lines})").cast("bigint")
    ).withColumn(
        "g_bullet_lines",
        F.expr(
            f"SIZE(FILTER({lines}, l -> l LIKE '- %' OR l LIKE '* %'))"
        ).cast("bigint"),
    ).withColumn(
        "g_ellipsis_lines",
        F.expr(f"SIZE(FILTER({lines}, l -> l LIKE '%...'))").cast("bigint"),
    ).withColumn(
        "g_symbols",
        F.expr(
            f"LENGTH({text_col}) - LENGTH(REPLACE({text_col}, '#', ''))"
            f" + (LENGTH({text_col}) - LENGTH(REPLACE({text_col}, '...', ''))) DIV 3"
        ).cast("bigint"),
    ).withColumn(
        "g_alpha_words",
        F.expr(
            f"SIZE(FILTER({words}, w -> w RLIKE '[A-Za-z]'))"
        ).cast("bigint"),
    )
    d = (
        d.withColumn(
            "fail_word_count",
            (F.col("g_n_words") < 50) | (F.col("g_n_words") > 100_000),
        )
        .withColumn(
            "fail_mean_word_len",
            (F.col("g_n_words") > 0)
            & (
                (F.col("g_word_chars") < 3 * F.col("g_n_words"))
                | (F.col("g_word_chars") > 10 * F.col("g_n_words"))
            ),
        )
        .withColumn(
            "fail_symbol_ratio",
            (F.col("g_n_words") > 0)
            & (F.col("g_symbols") * 10 > F.col("g_n_words")),
        )
        .withColumn(
            "fail_bullet_lines",
            F.col("g_bullet_lines") * 10 > F.col("g_n_lines") * 9,
        )
        .withColumn(
            "fail_ellipsis_lines",
            F.col("g_ellipsis_lines") * 10 > F.col("g_n_lines") * 3,
        )
        .withColumn(
            "fail_alpha_words",
            F.col("g_alpha_words") * 10 < F.col("g_n_words") * 8,
        )
    )
    any_fail = (
        F.col("fail_word_count")
        | F.col("fail_mean_word_len")
        | F.col("fail_symbol_ratio")
        | F.col("fail_bullet_lines")
        | F.col("fail_ellipsis_lines")
        | F.col("fail_alpha_words")
    )
    return d.withColumn(
        "gopher_verdict", F.when(any_fail, "drop").otherwise("keep")
    )


def chunk_passages(
    docs: DataFrame,
    *,
    window: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cut documents into overlapping fixed word windows (``window``
    words every ``stride`` — stride < window gives symmetric overlap so
    no boundary severs a span): the retrieval/pretraining counterpart
    to content-defined chunking (`text/cdc.py`). Returns one row per
    passage: (id_col, passage_idx, w_start (1-based), n_words,
    passage_text). A document shorter than one window yields exactly
    one passage (the whole document); empty docs yield one empty
    passage row (filter upstream if unwanted).

    Scale shape: one map-side SEQUENCE explode per document — fan-out
    ≈ words/stride, no shuffle; q216 registers the span arithmetic
    under the DuckDB oracle via a shared-constant hash census.
    """
    if stride <= 0 or window <= 0 or stride > window:
        raise ValueError("need 0 < stride <= window")
    ws = f"SPLIT({text_col}, ' ')"
    n_psg = (
        f"GREATEST(CAST(CEIL((SIZE({ws}) - {window}) / {stride}.0) AS INT), 0)"
    )
    return docs.select(
        id_col,
        F.posexplode(
            F.expr(
                f"TRANSFORM(SEQUENCE(0, {n_psg}), "
                f"i -> ARRAY_JOIN(SLICE({ws}, 1 + i * {stride}, {window}), ' '))"
            )
        ).alias("passage_idx", "passage_text"),
    ).select(
        id_col,
        F.col("passage_idx").cast("bigint").alias("passage_idx"),
        (F.col("passage_idx") * stride + 1).cast("bigint").alias("w_start"),
        F.expr(
            "CAST(SIZE(FILTER(SPLIT(passage_text, ' '), w -> w != '')) AS BIGINT)"
        ).alias("n_words"),
        "passage_text",
    )


def rank_normalize_scores(
    docs: DataFrame,
    score_col: str,
    *,
    by: str = "source",
    out_col: str = "score_pct_milli",
) -> DataFrame:
    """Per-group rank normalization of a quality score — the remedy for
    the q219 finding that one global threshold starves whole sources:
    ``out_col`` = the document's exact percentile WITHIN its group in
    milli units (rank·1000 DIV n_group, integer division end-to-end —
    deterministic, integer-exact at any group size; ties share the
    MINIMUM rank per RANK semantics), so ``filter("score_pct_milli >=
    300")`` drops the bottom 30 % of EVERY group instead of the bottom
    30 % of the pooled distribution.

    Scale shape: one rank window per group partition — the same
    exchange any per-group top-k pays; at 100 TB the approximate twin
    is the q110 histogram-cutoff route (compute per-group cutoffs from
    the value support, broadcast, compare map-side — q219's exact
    construction), which avoids the full per-group sort at the cost of
    bucket-edge resolution.
    """
    w = Window.partitionBy(by).orderBy(F.col(score_col))
    n = Window.partitionBy(by)
    return (
        docs.withColumn("_rnk", F.rank().over(w).cast("bigint"))
        .withColumn("_n", F.count(F.lit(1)).over(n))
        # Integer DIV, never a double product: exact at any rank·1000
        # magnitude (a double round-trip drifts past 2^53).
        .withColumn(out_col, F.expr("CAST(_rnk * 1000 DIV _n AS BIGINT)"))
        .drop("_rnk", "_n")
    )
