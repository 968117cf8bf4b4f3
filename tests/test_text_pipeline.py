"""Composable curation API tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.tables import table
from dataworks_audit_data_ingest_spark.text import (
    annotate_quality,
    drop_near_duplicates,
    token_budget_sample,
)

SF = "/root/testdata/sf0.001"


def test_annotate_quality_matches_query_semantics(spark):
    d = table(spark, SF, "documents")
    out = annotate_quality(d)
    assert {"n_tokens", "stopword_ratio", "quality_verdict"} <= set(out.columns)
    verdicts = {r.quality_verdict for r in out.select("quality_verdict").distinct().collect()}
    assert verdicts <= {"keep", "drop"}
    kept = out.filter("quality_verdict = 'keep'")
    assert 0 < kept.count() < d.count()
    assert kept.agg(F.min("n_tokens")).first()[0] >= 40


def test_drop_near_duplicates_removes_planted_variant(spark):
    d = table(spark, SF, "documents").select("doc_id", "text")
    variant = d.filter(F.col("doc_id") == 0).select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.expr("ARRAY_JOIN(SLICE(SPLIT(text, ' '), 1, SIZE(SPLIT(text, ' ')) - 3), ' ')").alias("text"),
    )
    corpus = d.unionByName(variant)
    kept = drop_near_duplicates(corpus)
    ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert 0 in ids  # original representative kept
    assert 10_000 not in ids  # planted near-dup dropped
    # determinism: second run keeps the identical set
    ids2 = {r.doc_id for r in drop_near_duplicates(corpus).select("doc_id").collect()}
    assert ids == ids2


def test_token_budget_sample_is_deterministic_and_bounded(spark):
    d = table(spark, SF, "documents")
    s1 = token_budget_sample(d, budget_tokens=5_000)
    s2 = token_budget_sample(d, budget_tokens=5_000)
    ids1 = sorted(r.doc_id for r in s1.select("doc_id").collect())
    ids2 = sorted(r.doc_id for r in s2.select("doc_id").collect())
    assert ids1 == ids2 and ids1
    total = s1.select(F.sum(F.size(F.split("text", " ")))).first()[0]
    assert total <= 5_000
    # a bigger budget strictly extends the same prefix (hash order is stable)
    ids_big = sorted(r.doc_id for r in token_budget_sample(d, 10_000).select("doc_id").collect())
    assert set(ids1) <= set(ids_big)


def test_redact_pii_stage(spark):
    rows = [(1, "src", "mail me at bob@example.com today"), (2, "src", "clean text")]
    d = spark.createDataFrame(rows, "doc_id long, source string, text string")
    from dataworks_audit_data_ingest_spark.text.pipeline import redact_pii

    got = {r.doc_id: r for r in redact_pii(d).collect()}
    assert "[EMAIL]" in got[1].text and got[1].n_pii_chars_removed > 0
    assert got[2].text == "clean text" and got[2].n_pii_chars_removed == 0


def test_drop_contaminated_stage(spark):
    from dataworks_audit_data_ingest_spark.text.pipeline import drop_contaminated

    bench = spark.createDataFrame(
        [(100, "held out secret eval prompt with eight exact words")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            (1, "prefix held out secret eval prompt with eight exact words suffix"),
            (2, "a completely unrelated training document with enough words here"),
        ],
        "doc_id long, text string",
    )
    kept = [r.doc_id for r in drop_contaminated(corpus, bench).collect()]
    assert kept == [2]


def test_mix_sources_stage_is_deterministic(spark):
    from dataworks_audit_data_ingest_spark.tables import table
    from dataworks_audit_data_ingest_spark.text.pipeline import mix_sources

    d = table(spark, SF, "documents")
    r1 = {r.doc_id for r in mix_sources(d, {"src0": 1.0, "src1": 0.0}, 0.5).collect()}
    r2 = {r.doc_id for r in mix_sources(d, {"src0": 1.0, "src1": 0.0}, 0.5).collect()}
    assert r1 == r2
    by_src = (
        mix_sources(d, {"src0": 1.0, "src1": 0.0}, 0.5)
        .groupBy("source").count().collect()
    )
    counts = {r.source: r["count"] for r in by_src}
    total = {r.source: r["count"] for r in d.groupBy("source").count().collect()}
    assert counts.get("src0") == total["src0"]  # rate 1.0 keeps all
    assert "src1" not in counts  # rate 0.0 drops all
    # default 0.5 keeps roughly half of the others
    others_kept = sum(v for k, v in counts.items() if k not in ("src0", "src1"))
    others_total = sum(v for k, v in total.items() if k not in ("src0", "src1"))
    assert 0.3 * others_total < others_kept < 0.7 * others_total


def test_pack_sequences_fills_budget_and_is_deterministic(spark):
    from dataworks_audit_data_ingest_spark.text.pipeline import pack_sequences

    d = table(spark, SF, "documents")
    p1 = pack_sequences(d, budget_tokens=256, n_buckets=8)
    p2 = pack_sequences(d, budget_tokens=256, n_buckets=8)
    a1 = sorted(map(tuple, p1.select("doc_id", "seq_id").collect()))
    assert a1 == sorted(map(tuple, p2.select("doc_id", "seq_id").collect()))
    # every doc packed exactly once
    assert len(a1) == d.count()
    # sequence fill: every closed sequence's tokens reach the budget at its
    # start boundary (start-offset assignment: seq token sum >= budget is
    # only guaranteed for sequences that were closed by a successor)
    sums = {
        r.seq_id: r.t
        for r in p1.groupBy("seq_id").agg(F.sum("n_tok").alias("t")).collect()
    }
    # invariant of start-offset packing: an interior sequence spans at
    # least budget - (straddle of its first doc) tokens, and each bucket
    # has exactly one tail sequence that may be short
    assert all(t > 0 for t in sums.values())
    max_tok = p1.agg(F.max("n_tok")).first()[0]
    short = [t for t in sums.values() if t < 256 - max_tok]
    assert len(short) <= 8, (len(short), len(sums), max_tok)


def test_pack_sequences_window_is_bucket_partitioned(spark):
    """The plan must not contain an unpartitioned global-sort window."""
    from dataworks_audit_data_ingest_spark.text.pipeline import pack_sequences

    d = table(spark, SF, "documents")
    plan = pack_sequences(d, 256)._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    # the Window's partition spec includes the bucket column
    import re

    win = plan[plan.index("Window") :].splitlines()[0]
    assert "_bucket" in win, win


def test_cap_per_source_bounds_and_matches_q88(spark):
    """cap_per_source keeps <= N docs per source, deterministically, and
    with q88's parameters returns exactly the q88 kept-set."""
    from dataworks_audit_data_ingest_spark.operators import cap_per_source
    from dataworks_audit_data_ingest_spark.queries import all_queries

    d = table(spark, SF, "documents")
    capped = cap_per_source(d, max_docs=10)
    per_src = capped.groupBy("source").count().collect()
    assert all(r["count"] <= 10 for r in per_src)
    got = {(r.doc_id, r.source) for r in capped.select("doc_id", "source").collect()}
    want = {
        (r.doc_id, r.source)
        for r in all_queries()["q88_source_quota"].fn(spark, SF).collect()
    }
    assert got == want
    # deterministic under a different partitioning
    again = {
        (r.doc_id, r.source)
        for r in cap_per_source(d.repartition(7), max_docs=10)
        .select("doc_id", "source")
        .collect()
    }
    assert again == got


def test_drop_semantic_duplicates_collapses_planted_clones(spark):
    """Planted near-identical embeddings (tiny perturbations of a base
    vector) collapse to the minimum-id representative; distant vectors all
    survive; re-running on the deduped set is a no-op."""
    from dataworks_audit_data_ingest_spark.operators import (
        drop_semantic_duplicates,
    )

    emb = table(spark, SF, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    base_rows = emb.filter(F.col("doc_id") < 20).collect()
    # clone doc 3's vector (exactly) under two new high ids, and doc 7's
    # with a last-element nudge small enough to stay above the threshold
    clones = []
    v3 = [float(x) for x in base_rows[3].embedding]
    v7 = [float(x) for x in base_rows[7].embedding]
    v7_nudged = v7[:-1] + [v7[-1] + 1e-4]
    clones.append((100000, v3))
    clones.append((100001, v3))
    clones.append((100002, v7_nudged))
    planted = spark.createDataFrame(
        [(r.doc_id, [float(x) for x in r.embedding]) for r in base_rows]
        + clones,
        "doc_id long, embedding array<double>",
    )
    kept = drop_semantic_duplicates(planted, threshold=0.999)
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert 3 in kept_ids and 100000 not in kept_ids and 100001 not in kept_ids
    assert 7 in kept_ids and 100002 not in kept_ids
    # fixture base vectors are mutually distant: all survive
    assert {r.doc_id for r in base_rows} <= kept_ids
    # idempotent: a second pass removes nothing
    again = drop_semantic_duplicates(kept, threshold=0.999)
    assert again.count() == kept.count()


def test_drop_semantic_duplicates_level2_links_single_bit_flip(spark):
    """A pair differing in exactly ONE signature bit has different full
    signatures, so level 1 (exact-signature stars) cannot link it — only
    the capped banded buckets (level 2) can. Engineer such a pair by
    mirroring the SRP arithmetic in Python and nudging one element just
    enough to flip the smallest-margin projection and no other."""
    import hashlib
    import math

    from dataworks_audit_data_ingest_spark.functions.hashing import SRP_SCALE
    from dataworks_audit_data_ingest_spark.operators import (
        drop_semantic_duplicates,
    )

    def h(j, p):
        digest = hashlib.md5(f"srp|{j}:{p}".encode()).hexdigest()
        return int(digest[:8], 16) % 1001 - 500

    def projections(vec, n_bits=32):
        return [
            sum(math.floor(x * h(j, p) * SRP_SCALE) for p, x in enumerate(vec))
            for j in range(n_bits)
        ]

    base_vec = [
        math.sin(0.1 * (p + 1)) / 8.0 for p in range(64)
    ]  # deterministic, norm ~O(1)
    proj = projections(base_vec)
    j0 = min(range(32), key=lambda j: abs(proj[j]))
    # nudge at the position where j0's hyperplane is strongest
    p0 = max(range(64), key=lambda p: abs(h(j0, p)))
    delta = -2.5 * proj[j0] / (h(j0, p0) * SRP_SCALE)
    flipped = list(base_vec)
    flipped[p0] += delta
    proj2 = projections(flipped)
    flips = [j for j in range(32) if (proj[j] >= 0) != (proj2[j] >= 0)]
    assert flips == [j0], f"engineered nudge flipped {flips}, wanted [{j0}]"
    # the nudge is tiny relative to the vector: cosine stays ~1
    dot = sum(a * b for a, b in zip(base_vec, flipped))
    nrm = math.sqrt(sum(a * a for a in base_vec)) * math.sqrt(
        sum(b * b for b in flipped)
    )
    assert dot / nrm > 0.999

    # distant fillers so the pair's buckets stay under the cap
    emb = table(spark, SF, "embeddings").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    fillers = [
        (r.doc_id, [float(x) for x in r.embedding])
        for r in emb.filter(F.col("doc_id") < 30).collect()
    ]
    df = spark.createDataFrame(
        fillers + [(200000, base_vec), (200001, flipped)],
        "doc_id long, embedding array<double>",
    )
    kept = {
        r.doc_id
        for r in drop_semantic_duplicates(df, threshold=0.999)
        .select("doc_id")
        .collect()
    }
    assert 200000 in kept and 200001 not in kept  # linked by level 2 only


def test_drop_semantic_duplicates_overcap_bucket_anchor_star(spark):
    """A duplicate pile LARGER than bucket_cap whose full signatures
    differ from the anchor's is linked by neither level 1 (signatures
    differ) nor level-2 all-pairs (the shared buckets are over the cap) —
    the over-cap anchor-star fallback must still collapse it. Engineer a
    base vector plus six copies that each flip exactly the same
    single smallest-margin projection bit (so the copies share a full
    signature that differs from the base's), and set bucket_cap=2 so
    every shared (band, bval) bucket of the 7-vector pile is hot."""
    import hashlib
    import math

    from dataworks_audit_data_ingest_spark.functions.hashing import SRP_SCALE
    from dataworks_audit_data_ingest_spark.operators import (
        drop_semantic_duplicates,
    )

    def h(j, p):
        digest = hashlib.md5(f"srp|{j}:{p}".encode()).hexdigest()
        return int(digest[:8], 16) % 1001 - 500

    def projections(vec, n_bits=32):
        return [
            sum(math.floor(x * h(j, p) * SRP_SCALE) for p, x in enumerate(vec))
            for j in range(n_bits)
        ]

    base_vec = [math.sin(0.1 * (p + 1)) / 8.0 for p in range(64)]
    proj = projections(base_vec)
    j0 = min(range(32), key=lambda j: abs(proj[j]))
    p0 = max(range(64), key=lambda p: abs(h(j0, p)))
    delta = -2.5 * proj[j0] / (h(j0, p0) * SRP_SCALE)
    copies = []
    for k in range(6):
        c = list(base_vec)
        c[p0] += delta * (1.0 + 0.15 * k)
        pk = projections(c)
        flips = [j for j in range(32) if (proj[j] >= 0) != (pk[j] >= 0)]
        assert flips == [j0], f"copy {k} flipped {flips}, wanted [{j0}]"
        dot = sum(a * b for a, b in zip(base_vec, c))
        nrm = math.sqrt(sum(a * a for a in base_vec)) * math.sqrt(
            sum(b * b for b in c)
        )
        assert dot / nrm > 0.999
        copies.append((k + 1, c))
    df = spark.createDataFrame(
        [(0, base_vec)] + copies, "doc_id long, embedding array<double>"
    )
    kept = {
        r.doc_id
        for r in drop_semantic_duplicates(df, threshold=0.999, bucket_cap=2)
        .select("doc_id")
        .collect()
    }
    assert kept == {0}, (
        f"over-cap pile must collapse to the anchor, kept {kept}"
    )


def test_cap_per_source_prethin_matches_exact_on_skew(spark):
    """The hash-threshold pre-thin (the 100 TB path) is output-identical
    to the exact window form on an engineered skewed corpus: one hot
    source holding ~8x the others, plus a source entirely under the cap."""
    from pyspark.sql import functions as F

    from dataworks_audit_data_ingest_spark.operators import cap_per_source

    d = table(spark, SF, "documents").select("doc_id", "source")
    hot = d.filter(F.col("source") == d.select("source").first().source)
    skewed = d.unionByName(
        hot.select(
            (F.col("doc_id") + 500_000).alias("doc_id"),
            F.lit("hot_source").alias("source"),
        )
    )
    for _ in range(3):  # hot_source ends up ~8x any natural source
        skewed = skewed.unionByName(
            skewed.filter(F.col("source") == "hot_source").select(
                (F.col("doc_id") + 1_000_000).alias("doc_id"), "source"
            )
        )
    tiny = spark.createDataFrame(
        [(9_000_000 + i, "tiny_source") for i in range(3)],
        "doc_id long, source string",
    )
    skewed = skewed.unionByName(tiny)
    exact = {
        (r.doc_id, r.source)
        for r in cap_per_source(skewed, max_docs=7).collect()
    }
    thinned = {
        (r.doc_id, r.source)
        for r in cap_per_source(skewed, max_docs=7, prethin=True).collect()
    }
    assert thinned == exact
    assert sum(1 for _, s in exact if s == "tiny_source") == 3  # under cap: all kept


def test_cap_per_source_prethin_fallback_is_still_exact(spark):
    """Force the binomial-undershoot fallback (prethin_target=1 keeps an
    expected ONE row per over-cap source — far under the cap): the verify
    step must route every under-covered source through the exact path, so
    the output is still identical."""
    from dataworks_audit_data_ingest_spark.operators import cap_per_source

    d = table(spark, SF, "documents").select("doc_id", "source")
    exact = {(r.doc_id, r.source) for r in cap_per_source(d, max_docs=10).collect()}
    forced = {
        (r.doc_id, r.source)
        for r in cap_per_source(
            d, max_docs=10, prethin=True, prethin_target=1
        ).collect()
    }
    assert forced == exact


def test_cap_per_source_prethin_filter_is_mapside(spark):
    """The pre-thin's h < t filter must sit on the scan side of the
    window exchange (broadcast-joined thresholds, no shuffle of corpus
    rows before the filter): the plan shows a BroadcastHashJoin and a
    Filter on the threshold column, and the only corpus-sized exchange
    is the final per-source window."""
    from dataworks_audit_data_ingest_spark.operators import cap_per_source

    d = table(spark, SF, "documents").select("doc_id", "source")
    plan = (
        cap_per_source(d, max_docs=10, prethin=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    # the h < t comparison runs map-side: either as a standalone Filter or
    # folded into the broadcast join's non-equi condition — both sit below
    # the window's Exchange (no corpus shuffle precedes the thin)
    thin_lines = [
        ln
        for ln in plan.splitlines()
        if "_qthr" in ln and ("Filter" in ln or "BroadcastHashJoin" in ln)
    ]
    assert thin_lines, plan[:2000]
    # the thin happens before (below) the per-source window exchange
    exch_pos = plan.index("Exchange hashpartitioning(source")
    assert plan.index(thin_lines[0]) > exch_pos


# ---------------------------------------------------------------------------
# temperature_allocation / resample_to_allocation
# ---------------------------------------------------------------------------


def test_temperature_allocation_sums_exactly(spark):
    from dataworks_audit_data_ingest_spark.tables import table
    from dataworks_audit_data_ingest_spark.text.pipeline import (
        temperature_allocation,
    )

    d = table(spark, "/root/testdata/sf0.001", "documents")
    for t in (0.5, 1.0, 2.0):
        alloc = temperature_allocation(d, 137, temperature=t)
        rows = alloc.collect()
        assert sum(r.alloc for r in rows) == 137, (t, rows)
        assert all(r.alloc >= 0 for r in rows)


def test_temperature_one_is_proportional(spark):
    """T=1 largest remainder == Hamilton apportionment of raw counts:
    every alloc within 1 of the real-valued quota."""
    from dataworks_audit_data_ingest_spark.tables import table
    from dataworks_audit_data_ingest_spark.text.pipeline import (
        temperature_allocation,
    )

    d = table(spark, "/root/testdata/sf0.001", "documents")
    total = 200
    rows = temperature_allocation(d, total, temperature=1.0).collect()
    n_all = sum(r.n_docs for r in rows)
    for r in rows:
        quota = total * r.n_docs / n_all
        assert quota - 1 < r.alloc < quota + 1, (r, quota)


def test_temperature_half_flattens(spark):
    """T=0.5 moves every source's share toward uniform relative to T=1:
    the biggest source loses seats, the smallest gains (or holds)."""
    from dataworks_audit_data_ingest_spark.tables import table
    from dataworks_audit_data_ingest_spark.text.pipeline import (
        temperature_allocation,
    )

    d = table(spark, "/root/testdata/sf0.001", "documents")
    a1 = {r.source: r.alloc for r in temperature_allocation(d, 200, 1.0).collect()}
    ah = {r.source: r.alloc for r in temperature_allocation(d, 200, 0.5).collect()}
    ns = {r.source: r.n_docs for r in temperature_allocation(d, 200, 1.0).collect()}
    big = max(ns, key=ns.get)
    small = min(ns, key=ns.get)
    assert ah[big] <= a1[big]
    assert ah[small] >= a1[small]


def test_temperature_rejects_unportable_powers(spark):
    import pytest as _pytest

    from dataworks_audit_data_ingest_spark.tables import table
    from dataworks_audit_data_ingest_spark.text.pipeline import (
        temperature_allocation,
    )

    d = table(spark, "/root/testdata/sf0.001", "documents")
    with _pytest.raises(ValueError, match="portable powers"):
        temperature_allocation(d, 10, temperature=0.7)


def test_resample_to_allocation_caps_per_source(spark):
    from pyspark.sql import functions as F

    from dataworks_audit_data_ingest_spark.tables import table
    from dataworks_audit_data_ingest_spark.text.pipeline import (
        resample_to_allocation,
        temperature_allocation,
    )

    d = table(spark, "/root/testdata/sf0.001", "documents")
    alloc = temperature_allocation(d, 100, temperature=0.5)
    out = resample_to_allocation(d, alloc)
    got = {r.source: r.cnt for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    want = {r.source: min(r.alloc, r.n_docs) for r in alloc.collect()}
    assert got == {k: v for k, v in want.items() if v > 0}
    # deterministic under repartitioning
    out2 = resample_to_allocation(d.repartition(7), alloc)
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in out2.collect()
    )


def test_drop_near_duplicates_longest_policy(spark):
    """keep="longest" keeps the most complete copy of a planted pile;
    min_id keeps the first — both keep exactly one."""
    from pyspark.sql import functions as F

    from dataworks_audit_data_ingest_spark.tables import table
    from dataworks_audit_data_ingest_spark.text.pipeline import (
        drop_near_duplicates,
    )

    d = table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    base = d.limit(30)
    longer = base.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
    )
    corpus = base.unionByName(longer)
    kept_min = {r.doc_id for r in drop_near_duplicates(corpus).collect()}
    kept_long = {
        r.doc_id
        for r in drop_near_duplicates(corpus, keep="longest").collect()
    }
    planted = {r.doc_id for r in longer.collect()}
    # for every planted pair that actually collided (exactly one member
    # survived), min-id must keep the ORIGINAL and longest must keep the
    # CLONE (it is strictly longer)
    n_collided = 0
    for clone_id in planted:
        orig = clone_id - 1_000_000
        if (orig in kept_min) != (clone_id in kept_min):
            n_collided += 1
            assert orig in kept_min and clone_id not in kept_min
            assert clone_id in kept_long and orig not in kept_long
    assert n_collided > 0  # the planted piles did collide
    assert len(kept_long) == len(kept_min)  # same one-per-cluster cardinality

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown keep policy"):
        drop_near_duplicates(corpus, keep="best")


def test_drop_contained_duplicates_removes_fragments(spark):
    """A fragment (strict substring) of a kept page is dropped; an
    unrelated page survives; a chain fragment-of-a-fragment is dropped in
    the same round (the drop set is downward-closed). Near-zero Jaccard
    between fragment and page shows why drop_near_duplicates can't do
    this."""
    from dataworks_audit_data_ingest_spark.text.pipeline import (
        drop_contained_duplicates,
    )

    page = (
        "the quarterly results show steady revenue growth across all regions "
        "with particular strength in the northern markets where the new "
        "product line exceeded every internal forecast by a wide margin "
        "and management expects the momentum to continue through the year"
    )
    frag = page[40:140]            # pull-quote: wholly inside the page
    subfrag = page[60:110]         # fragment of the fragment
    other = (
        "completely different content about gardening tips for growing "
        "tomatoes in containers on a small urban balcony with limited sun"
    )
    docs = spark.createDataFrame(
        [(1, page), (2, frag), (3, subfrag), (4, other)],
        "doc_id bigint, text string",
    )
    kept = drop_contained_duplicates(docs)
    assert sorted(r.doc_id for r in kept.collect()) == [1, 4]
    # threshold high enough that nothing qualifies -> no-op
    kept_all = drop_contained_duplicates(docs, threshold_milli=1001)
    assert kept_all.count() == 4


def test_drop_contained_duplicates_vs_survivors_rescues_orphans(spark):
    """The q176 composition as a pipeline recipe: curation first, then
    containment AGAINST THE SURVIVORS. A fragment whose container
    survives curation is dropped; a fragment whose only container died
    in curation is RESCUED (kept as the sole remaining copy) — the exact
    content-loss case the naive containment-then-curation ordering
    causes. Docs outside the survivor set never reappear."""
    from dataworks_audit_data_ingest_spark.text.pipeline import (
        drop_contained_duplicates,
    )

    page = (
        "the quarterly results show steady revenue growth across all regions "
        "with particular strength in the northern markets where the new "
        "product line exceeded every internal forecast by a wide margin "
        "and management expects the momentum to continue through the year"
    )
    spam_page = (
        "buy cheap watches online best deals free shipping today limited "
        "offer click now for discount prices on luxury brand replicas and "
        "amazing unbeatable wholesale catalog savings every single day"
    )
    frag_of_page = page[40:140]        # container survives -> drop
    frag_of_spam = spam_page[30:130]   # only container is curated away -> rescue
    docs = spark.createDataFrame(
        [
            (1, page, "news"),
            (2, spam_page, "spam"),
            (3, frag_of_page, "quotes"),
            (4, frag_of_spam, "quotes"),
        ],
        "doc_id bigint, text string, source string",
    )
    survivors = docs.filter("source <> 'spam'")  # the curation pass
    final = drop_contained_duplicates(docs, survivors=survivors)
    assert sorted(r.doc_id for r in final.collect()) == [1, 4]

    # naive ordering for contrast: containment over everything first,
    # curation second -> the spam fragment's content is lost entirely
    naive = drop_contained_duplicates(docs).filter("source <> 'spam'")
    assert sorted(r.doc_id for r in naive.collect()) == [1]

    # survivors mode never resurrects a curated-away doc
    assert final.filter("source = 'spam'").count() == 0


def test_drop_near_duplicates_transitive_collapses_chains(spark):
    """A near-dup chain a~b~c (ends never pair with each other) keeps TWO
    docs under the one-round default but exactly ONE under
    ``transitive=True`` — the over-keep the docstring documents, and the
    q190 composition (CC × keep policy) that fixes it. The middle doc
    carries the LARGEST id so neither end sees a better neighbor in one
    round."""
    from pyspark.sql import functions as F

    from dataworks_audit_data_ingest_spark.queries.dedup import (
        _spark_bands,
        _spark_sigs,
        lsh_candidate_pairs,
    )
    from dataworks_audit_data_ingest_spark.tables import table
    from dataworks_audit_data_ingest_spark.text.pipeline import (
        drop_near_duplicates,
    )

    words = (
        table(spark, "/root/testdata/sf0.001", "documents")
        .filter(F.col("doc_id") == 1)
        .first()
        .text.split(" ")
    )
    assert len(words) == 78  # fixture premise for the cut below
    corpus = spark.createDataFrame(
        [
            (1, " ".join(words[:59])),  # head slice ~ full doc
            (2, " ".join(words[19:])),  # tail slice ~ full doc
            (3, " ".join(words)),  # the full doc: chain middle, max id
        ],
        "doc_id bigint, text string",
    )
    # precondition pinned: the LSH surfaces exactly the chain 1~3~2 —
    # a hashing/banding change that breaks it fails here, not silently
    pairs = sorted(
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(
            _spark_bands(_spark_sigs(corpus))
        ).collect()
    )
    assert pairs == [(1, 3), (2, 3)]

    one_round = {
        r.doc_id for r in drop_near_duplicates(corpus).collect()
    }
    assert one_round == {1, 2}  # middle dropped, both ends survive

    cc_min = {
        r.doc_id
        for r in drop_near_duplicates(corpus, transitive=True).collect()
    }
    assert cc_min == {1}  # one survivor per TRANSITIVE cluster

    cc_long = {
        r.doc_id
        for r in drop_near_duplicates(
            corpus, keep="longest", transitive=True
        ).collect()
    }
    assert cc_long == {3}  # the full doc is the longest copy

    # singleton docs (no pairs) are untouched by the transitive path
    lone = spark.createDataFrame(
        [(9, "entirely unrelated words about nothing shared at all here")],
        "doc_id bigint, text string",
    )
    both = corpus.unionByName(lone)
    kept = {
        r.doc_id
        for r in drop_near_duplicates(both, transitive=True).collect()
    }
    assert 9 in kept and kept == {1, 9}


def test_leakage_safe_split_semantics(spark):
    """q192's point, pinned as semantics rather than oracle equality: the
    cluster-inherited split leaks ZERO near-dup pairs by construction,
    the naive per-doc hash split leaks some on this fixture (variants
    guarantee near-dup pairs exist), and both policies assign the whole
    universe."""
    from dataworks_audit_data_ingest_spark.queries import all_queries

    rows = {
        r.policy: r
        for r in all_queries()["q192_leakage_safe_split"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    }
    assert rows["cluster_hash"].leaked_pairs == 0
    assert rows["doc_hash"].leaked_pairs > 0
    assert (
        rows["cluster_hash"].n_train + rows["cluster_hash"].n_eval
        == rows["doc_hash"].n_train + rows["doc_hash"].n_eval
    )
    # both splits are non-degenerate (nobody gets an empty eval set)
    for r in rows.values():
        assert r.n_train > 0 and r.n_eval > 0


def test_strip_boilerplate_lines_matches_q193(spark):
    """The API twin reproduces q193's per-doc cleaned text exactly (pinned
    via the same portable hash) on the same planted corpus, passes
    untouched docs through byte-identical, and preserves non-text
    columns."""
    from dataworks_audit_data_ingest_spark.functions.hashing import (
        spark_hash32,
    )
    from dataworks_audit_data_ingest_spark.queries import all_queries
    from dataworks_audit_data_ingest_spark.queries.curation import (
        _bp_corpus_case,
    )
    from dataworks_audit_data_ingest_spark.tables import table
    from dataworks_audit_data_ingest_spark.text.pipeline import (
        strip_boilerplate_lines,
    )

    sf = "/root/testdata/sf0.001"
    header, footer = _bp_corpus_case()
    corpus = table(spark, sf, "documents").selectExpr(
        "doc_id",
        f"CONCAT_WS(CHR(10), {header}, text, {footer}) AS text",
        "source",
    )
    cleaned = strip_boilerplate_lines(corpus)
    got = {
        r.doc_id: r.h
        for r in cleaned.selectExpr(
            "doc_id", f"{spark_hash32('text', 'bp')} AS h"
        ).collect()
    }
    q = all_queries()["q193_boilerplate_lines"].fn(spark, sf)
    want = {r.doc_id: r.clean_hash for r in q.collect()}
    # every doc q193 reports as affected has the identical cleaned text
    assert {k: got[k] for k in want} == want
    # untouched docs (no header/footer) pass through byte-identical
    untouched = corpus.filter(
        "doc_id % 3 != 0 AND doc_id % 2 != 0"
    ).exceptAll(cleaned.filter("doc_id % 3 != 0 AND doc_id % 2 != 0"))
    assert untouched.count() == 0
    assert "source" in cleaned.columns


def test_assign_leakage_safe_splits_three_way(spark):
    """The split API: members of a pair-connected cluster always share a
    split (3-way weights too), unpaired docs spread over all splits, and
    invalid weights raise."""
    import pytest

    from dataworks_audit_data_ingest_spark.text import (
        assign_leakage_safe_splits,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id bigint, text string"
    )
    # a chain cluster {0,1,2} and a pair {10, 11}
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "doc_a bigint, doc_b bigint"
    )
    out = assign_leakage_safe_splits(
        docs, pairs, splits=(("train", 8), ("val", 1), ("test", 1))
    )
    got = {r.doc_id: r.split for r in out.collect()}
    assert len(got) == 200 and all(v is not None for v in got.values())
    assert got[0] == got[1] == got[2]
    assert got[10] == got[11]
    # all three splits are populated (200 unpaired hash ids spread)
    assert {"train", "val", "test"} <= set(got.values())
    # weights roughly honored: train is the bulk
    from collections import Counter

    c = Counter(got.values())
    assert c["train"] > c["val"] and c["train"] > c["test"]

    with pytest.raises(ValueError, match="non-negative"):
        assign_leakage_safe_splits(docs, pairs, splits=(("a", -1), ("b", 2)))


def test_annotate_compressibility_orders_by_redundancy(spark):
    """Templated text scores far below natural-ish prose; incompressible
    short noise scores near or above 1e6; empty text pins to 1e6; other
    columns pass through."""
    from dataworks_audit_data_ingest_spark.text.pipeline import (
        annotate_compressibility,
    )

    docs = spark.createDataFrame(
        [
            (1, "spam " * 400, "a"),
            (2, " ".join(f"w{i * 7919 % 1000} t{i * 104729 % 997}" for i in range(400)), "b"),
            (3, "", "c"),
            (4, "zq", "d"),
        ],
        "doc_id bigint, text string, source string",
    )
    got = {r.doc_id: r for r in annotate_compressibility(docs).collect()}
    assert got[1].compress_ratio_ppm < got[2].compress_ratio_ppm
    assert got[1].compress_ratio_ppm < 100_000  # 'spam '*400 collapses
    assert got[3].compress_ratio_ppm == 1_000_000
    assert got[4].compress_ratio_ppm >= 1_000_000  # zlib header > 2 bytes
    assert got[2].source == "b"
    # deterministic across runs
    again = {
        r.doc_id: r.compress_ratio_ppm
        for r in annotate_compressibility(docs).collect()
    }
    assert again == {k: v.compress_ratio_ppm for k, v in got.items()}


def test_select_dsir_replay_stable_and_target_enriched(spark):
    from dataworks_audit_data_ingest_spark.text import select_dsir

    d = table(spark, SF, "documents")
    target = F.col("source") == "src0"
    k = 60
    s1 = select_dsir(d, target, k)
    rows1 = sorted(tuple(r) for r in s1.collect())
    assert len(rows1) == k
    assert set(s1.columns) == {
        "doc_id", "source", "n_tokens", "ratio_bits", "weight", "priority",
    }
    # replay-stable: a second build over a different partitioning of the
    # SAME corpus selects the identical subset with identical priorities
    s2 = select_dsir(d.repartition(13), target, k)
    assert rows1 == sorted(tuple(r) for r in s2.collect())
    # weights are the rank-preserving positive shift of ratio_bits
    w = {r.doc_id: (r.ratio_bits, r.weight) for r in s1.collect()}
    deltas = {bits - weight for bits, weight in w.values()}
    assert len(deltas) == 1 and all(weight >= 1 for _, weight in w.values())
    # sampling ∝ weight: the selected set is target-enriched vs the corpus
    base = d.filter(target).count() / d.count()
    got = sum(1 for r in s1.collect() if r.source == "src0") / k
    assert got > base


def test_select_dsir_matches_registered_query_oracle_kernel(spark):
    # The q203 registration consumes the same builders; pin API == query.
    from dataworks_audit_data_ingest_spark.queries import REGISTRY
    from dataworks_audit_data_ingest_spark.text import select_dsir

    d = table(spark, SF, "documents")
    api = select_dsir(d, F.col("source") == "src0", 40)
    q = REGISTRY["q203_dsir_selection"].fn(spark, SF)
    assert sorted(map(tuple, api.collect())) == sorted(map(tuple, q.collect()))


def test_interleave_for_training_evenness_and_stability(spark):
    from dataworks_audit_data_ingest_spark.text.pipeline import (
        interleave_for_training,
    )

    d = table(spark, SF, "documents").select("doc_id", "source")
    out = interleave_for_training(d)
    rows = out.collect()
    n = len(rows)
    ns = {}
    for r in rows:
        ns[r.source] = ns.get(r.source, 0) + 1
    # replay-stable under repartitioning
    again = interleave_for_training(d.repartition(7))
    assert sorted((r.doc_id, r.order_key) for r in rows) == sorted(
        (r.doc_id, r.order_key) for r in again.collect()
    )
    # stride evenness: every tenth of the order carries each source's
    # proportional share, off by at most 1
    bands = {}
    for r in rows:
        b = (r.order_key - 1) * 10 // n
        bands.setdefault((b, r.source), 0)
        bands[(b, r.source)] += 1
    for (b, s), cnt in bands.items():
        assert abs(cnt - ns[s] / 10) <= 1, (b, s, cnt, ns[s])
    # hash mode: map-side key, still deterministic
    h1 = sorted((r.doc_id, r.order_key) for r in interleave_for_training(d, mode="hash").collect())
    h2 = sorted((r.doc_id, r.order_key) for r in interleave_for_training(d.repartition(5), mode="hash").collect())
    assert h1 == h2


def test_annotate_gopher_rules_each_rule_isolates(spark):
    from dataworks_audit_data_ingest_spark.text.pipeline import (
        annotate_gopher_rules,
    )

    good = " ".join(f"the word{i} is fine" for i in range(20))  # 80 words
    rows = [
        (0, good),
        (1, "too few words"),
        (2, ("#x " * 80).strip()),
        (3, "\n".join("- item" for _ in range(19)) + "\ntail " + good),
        (4, "\n".join("so it goes..." for _ in range(9)) + "\n" + good),
        (5, ("1234 5678 " * 30).strip()),
        (6, ("extraordinarily " * 60).strip()),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in annotate_gopher_rules(d).collect()}
    assert got[0].gopher_verdict == "keep"
    assert got[1].fail_word_count and got[1].gopher_verdict == "drop"
    assert got[2].fail_symbol_ratio
    assert got[5].fail_alpha_words
    assert got[6].fail_mean_word_len
    # bullet/ellipsis rules fire on line fractions
    b = annotate_gopher_rules(
        spark.createDataFrame(
            [(0, "\n".join("- b" for _ in range(20)))], "doc_id long, text string"
        )
    ).first()
    assert b.fail_bullet_lines
    e = annotate_gopher_rules(
        spark.createDataFrame(
            [(0, "\n".join("go on..." for _ in range(10)))],
            "doc_id long, text string",
        )
    ).first()
    assert e.fail_ellipsis_lines


def test_chunk_passages_spans_and_overlap(spark):
    from dataworks_audit_data_ingest_spark.text.pipeline import chunk_passages
    import pytest as _pytest

    text = " ".join(f"w{i}" for i in range(100))
    d = spark.createDataFrame([(1, text), (2, "short doc")],
                              "doc_id long, text string")
    out = sorted(
        chunk_passages(d, window=64, stride=48).collect(),
        key=lambda r: (r.doc_id, r.passage_idx),
    )
    one = [r for r in out if r.doc_id == 1]
    # 100 words, window 64, stride 48 -> passages at 1 and 49
    assert [(r.w_start, r.n_words) for r in one] == [(1, 64), (49, 52)]
    # overlap region is identical text in both passages
    assert one[0].passage_text.split()[48:] == one[1].passage_text.split()[:16]
    # reconstruction: stitching first passage + tail of second == doc
    stitched = one[0].passage_text.split() + one[1].passage_text.split()[16:]
    assert " ".join(stitched) == text
    short = [r for r in out if r.doc_id == 2]
    assert len(short) == 1 and short[0].n_words == 2
    with _pytest.raises(ValueError):
        chunk_passages(d, window=10, stride=11)


def test_rank_normalize_scores_equalizes_keep_rates(spark):
    from dataworks_audit_data_ingest_spark.text.pipeline import (
        rank_normalize_scores,
    )

    d = table(spark, SF, "documents").select("doc_id", "source", "n_chars")
    out = rank_normalize_scores(d, "n_chars")
    kept = out.filter("score_pct_milli >= 300")
    per_src = {
        r.source: (r.kept, r.total)
        for r in out.groupBy("source")
        .agg(
            F.sum(F.expr("CASE WHEN score_pct_milli >= 300 THEN 1 ELSE 0 END")).alias("kept"),
            F.count("*").alias("total"),
        )
        .collect()
    }
    # every source keeps ~70% (integer rank edges allow small slack)
    for src, (k, t) in per_src.items():
        assert abs(k / t - 0.7) < 0.1, (src, k, t)
    # deterministic under repartitioning
    again = rank_normalize_scores(d.repartition(9), "n_chars")
    assert sorted((r.doc_id, r.score_pct_milli) for r in out.collect()) == sorted(
        (r.doc_id, r.score_pct_milli) for r in again.collect()
    )
    assert kept.count() > 0


def test_token_budget_sample_matches_global_window_form(spark):
    """The distributed two-phase prefix sum is pinned output-identical to
    the r08 single-window form (VERDICT r08 item 1), and its plan carries
    no full-corpus SinglePartition window."""
    from pyspark.sql import Window
    from dataworks_audit_data_ingest_spark.functions.hashing import (
        spark_hash32,
    )

    d = table(spark, SF, "documents")
    for budget in (1_000, 5_000, 50_000):
        new = token_budget_sample(d, budget_tokens=budget)
        # the retired global-window construction, inline as the oracle
        w = (
            Window.orderBy("_h", "text")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        old = (
            d.withColumn("_h", F.expr(spark_hash32("text", "budget")))
            .withColumn("_n_tok", F.size(F.split("text", " ")))
            .withColumn("_running", F.sum("_n_tok").over(w))
            .filter(F.col("_running") <= budget)
        )
        assert sorted(r.doc_id for r in new.select("doc_id").collect()) == (
            sorted(r.doc_id for r in old.select("doc_id").collect())
        )


def test_token_budget_sample_plan_has_no_single_partition_window(spark):
    d = table(spark, SF, "documents")
    plan = token_budget_sample(d, budget_tokens=5_000)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "SinglePartition" not in plan


def test_token_budget_sample_partition_invariant(spark):
    d = table(spark, SF, "documents")
    a = sorted(
        r.doc_id
        for r in token_budget_sample(d, 5_000).select("doc_id").collect()
    )
    b = sorted(
        r.doc_id
        for r in token_budget_sample(d.repartition(13), 5_000)
        .select("doc_id")
        .collect()
    )
    assert a == b and a


def test_allocate_source_budget_sums_exactly_and_tempers(spark):
    from dataworks_audit_data_ingest_spark.text.pipeline import (
        allocate_source_budget,
    )

    d = table(spark, SF, "documents")
    for budget in (7, 100, 1001):
        out = allocate_source_budget(d, budget).collect()
        assert sum(r.alloc_docs for r in out) == budget
        assert all(r.alloc_docs >= 0 for r in out)
    # temperature property: allocation shares sit BETWEEN uniform and
    # raw token-mass-proportional shares (sqrt compresses the range)
    out = allocate_source_budget(d, 10_000).collect()
    toks = {r.source: r.n_tokens for r in out}
    alloc = {r.source: r.alloc_docs for r in out}
    total_t = sum(toks.values())
    n = len(out)
    for s in toks:
        raw = toks[s] / total_t
        got = alloc[s] / 10_000
        lo, hi = sorted((raw, 1 / n))
        assert lo - 0.02 <= got <= hi + 0.02, (s, raw, got)
    # partition invariance
    again = allocate_source_budget(d.repartition(9), 10_000).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_assign_splits_from_maintained_labels_identical(spark, tmp_path):
    """The labels form (incremental CC store) assigns the IDENTICAL
    split as the pairs form — the crawl-refresh example's rewiring."""
    from dataworks_audit_data_ingest_spark.incremental.cc import (
        read_cc_labels,
        update_cc_store,
    )
    from dataworks_audit_data_ingest_spark.text.pipeline import (
        assign_leakage_safe_splits,
    )

    d = table(spark, SF, "documents").select("doc_id", "text", "source")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    store = str(tmp_path / "cc")
    update_cc_store(spark, store, pairs.filter("doc_a < 10"), "0")
    update_cc_store(spark, store, pairs.filter("doc_a >= 10"), "1")
    via_pairs = sorted(
        (r.doc_id, r.split)
        for r in assign_leakage_safe_splits(d, pairs).collect()
    )
    via_labels = sorted(
        (r.doc_id, r.split)
        for r in assign_leakage_safe_splits(
            d, labels=read_cc_labels(spark, store)
        ).collect()
    )
    assert via_pairs == via_labels

    import pytest as _pytest

    with _pytest.raises(ValueError, match="exactly one"):
        assign_leakage_safe_splits(d)
    with _pytest.raises(ValueError, match="exactly one"):
        assign_leakage_safe_splits(
            d, pairs, labels=read_cc_labels(spark, store)
        )


def test_token_budget_sample_tolerates_null_text(spark):
    """NULL-text rows never qualify and never crash the two-phase form
    (they had a NULL running sum — i.e. were dropped — under the
    retired global-window form too)."""
    d = table(spark, SF, "documents").select("doc_id", "text")
    with_nulls = d.unionByName(
        spark.createDataFrame(
            [(990001, None), (990002, None)], "doc_id long, text string"
        )
    )
    base = sorted(
        r.doc_id
        for r in token_budget_sample(d, 5_000).select("doc_id").collect()
    )
    got = sorted(
        r.doc_id
        for r in token_budget_sample(with_nulls, 5_000)
        .select("doc_id")
        .collect()
    )
    assert got == base  # same selection, null rows silently excluded


def test_allocate_source_budget_zero_weight_raises(spark):
    """ADVICE r09: a corpus whose every source has zero token mass must
    fail LOUD (raise_error in the allocation expression), not emit NULL
    allocations via DIV-by-zero; and a single all-null-text source must
    weigh zero, not NULL."""
    import pytest

    from dataworks_audit_data_ingest_spark.text.pipeline import (
        allocate_source_budget,
    )

    docs = spark.createDataFrame(
        [("a", None), ("b", None)], "source string, text string"
    )
    with pytest.raises(Exception, match="summed source weight is zero"):
        allocate_source_budget(docs, 10).collect()

    # mixed corpus: the null-text source weighs 0 and allocates 0 —
    # never NULL — while the real source takes the full budget
    mixed = spark.createDataFrame(
        [("a", None), ("b", " ".join(["tok"] * 100))],
        "source string, text string",
    )
    rows = {r.source: r for r in allocate_source_budget(mixed, 10).collect()}
    assert rows["a"].weight == 0 and rows["a"].alloc_docs == 0
    assert rows["b"].alloc_docs == 10
