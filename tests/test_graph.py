"""`functions/graph.py::connected_components` on engineered graphs the
near-dup suites never produce: long paths (diameter >> 3), the max_iter
exhaustion warning, and the rounds-to-converge observability hook that
PERF.md's O(diameter) claim cites."""

from __future__ import annotations

import warnings

from pyspark.sql import functions as F  # noqa: F401

from dataworks_audit_data_ingest_spark.functions.graph import (
    connected_components,
)


def _path_edges(spark, n: int, offset: int = 0):
    """A path graph 0-1-2-...-(n-1): diameter n-1, worst case for
    one-hop min-label propagation."""
    return spark.createDataFrame(
        [(offset + i, offset + i + 1) for i in range(n - 1)],
        "doc_a long, doc_b long",
    )


def test_cc_deep_chain_converges_and_rounds_track_diameter(spark):
    """A 12-node path (diameter 11) must collapse to component minimum 0
    within the default max_iter=20, and the measured fixpoint rounds must
    sit in the O(diameter) band — not O(1) (which would mean the chain
    wasn't actually propagated) and not max_iter (which would mean no
    early exit)."""
    stats: dict = {}
    labels = connected_components(_path_edges(spark, 12), stats=stats)
    got = {(r.node_id, r.cluster_id) for r in labels.collect()}
    assert got == {(i, 0) for i in range(12)}
    assert stats["converged"] is True
    # min-label needs ~diameter one-hop rounds; early-exit detection adds 1.
    # Propagation halves remaining distance only for the doubling variants —
    # this kernel is one-hop, so rounds ∈ [ceil(diam/2), diam+1] depending
    # on which endpoint carries the minimum; pin the band.
    assert 6 <= stats["rounds"] <= 12, stats


def test_cc_two_deep_chains_stay_separate(spark):
    """Two disjoint 8-node paths resolve to their own minima — labels
    never bleed across components even over many rounds."""
    edges = _path_edges(spark, 8).unionByName(_path_edges(spark, 8, offset=100))
    labels = connected_components(edges)
    got = {(r.node_id, r.cluster_id) for r in labels.collect()}
    want = {(i, 0) for i in range(8)} | {(100 + i, 100) for i in range(8)}
    assert got == want


def test_cc_max_iter_exhaustion_warns_not_silently_mislabels(spark):
    """A 30-node path cannot reach fixpoint in 4 rounds: the kernel must
    warn (never silently return non-minimum labels as if converged) and
    report converged=False through the stats hook."""
    stats: dict = {}
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        connected_components(
            _path_edges(spark, 30), max_iter=4, stats=stats
        ).collect()
    assert stats["converged"] is False and stats["rounds"] == 4
    assert any("max_iter" in str(w.message) for w in caught)


def test_cc_deep_chain_with_raised_max_iter(spark):
    """The documented remedy works: the same 30-node path converges once
    max_iter clears the diameter."""
    stats: dict = {}
    labels = connected_components(_path_edges(spark, 30), max_iter=40, stats=stats)
    assert stats["converged"] is True
    assert {r.cluster_id for r in labels.collect()} == {0}
    assert stats["rounds"] <= 31


def test_cc_star_contraction_matches_label_on_paths_and_real_edges(spark):
    """The O(log n) star-contraction kernel and the O(diameter) min-label
    kernel are output-identical: on a deep path (diameter 59), on two
    disjoint paths, and on the real q51 near-dup pair graph."""
    from dataworks_audit_data_ingest_spark.queries.dedup import (
        q51_dedup_minhash_lsh,
    )

    deep = _path_edges(spark, 60)
    want = {(r.node_id, r.cluster_id) for r in connected_components(deep, max_iter=80).collect()}
    got = {
        (r.node_id, r.cluster_id)
        for r in connected_components(deep, method="star").collect()
    }
    assert got == want

    two = _path_edges(spark, 9).unionByName(_path_edges(spark, 9, offset=50))
    assert {
        (r.node_id, r.cluster_id)
        for r in connected_components(two, method="star").collect()
    } == {(i, 0) for i in range(9)} | {(50 + i, 50) for i in range(9)}

    real = q51_dedup_minhash_lsh(spark, "/root/testdata/sf0.001").select(
        "doc_a", "doc_b"
    )
    want_real = {
        (r.node_id, r.cluster_id) for r in connected_components(real).collect()
    }
    got_real = {
        (r.node_id, r.cluster_id)
        for r in connected_components(real, method="star").collect()
    }
    assert got_real == want_real


def test_cc_star_contraction_rounds_are_logarithmic(spark):
    """On a 60-node path (diameter 59, where min-label needs 60 rounds)
    star contraction must stabilize in O(log n) double rounds — the
    entire point of the kernel."""
    stats: dict = {}
    labels = connected_components(
        _path_edges(spark, 60), method="star", max_iter=15, stats=stats
    )
    assert stats["converged"] is True
    assert {r.cluster_id for r in labels.collect()} == {0}
    assert stats["rounds"] <= 9, stats  # log2(60) ~ 6 double rounds + detect


# ---------------------------------------------------------------------------
# pagerank_integer
# ---------------------------------------------------------------------------


def _pagerank_reference(edges, iters, scale=10**12, damp=85):
    """Pure-Python mirror of the kernel's fixed-point spec."""
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    outw = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0) + w
    r = {v: scale // n for v in nodes}
    base = (100 - damp) * scale // (100 * n)
    for _ in range(iters):
        c = {v: 0 for v in nodes}
        for s, d, w in edges:
            c[d] += r[s] * w // outw[s]
        r = {v: base + damp * c[v] // 100 for v in nodes}
    return r


def test_pagerank_matches_pure_python_reference(spark):
    """Kernel output is bit-identical to the sequential fixed-point spec on
    a weighted graph with a dangling node (d receives but never emits)."""
    from dataworks_audit_data_ingest_spark.functions.graph import pagerank_integer

    edges = [
        ("a", "b", 3),
        ("a", "c", 1),
        ("b", "c", 2),
        ("c", "a", 1),
        ("b", "d", 5),
    ]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    got = {r.node: r.rank_scaled for r in pagerank_integer(df, iterations=4).collect()}
    assert got == _pagerank_reference(edges, iters=4)


def test_pagerank_sink_accumulates_rank(spark):
    """A pure sink pointed at by everything must outrank its feeders, and
    ranks must be partition-layout independent (fixed-point arithmetic)."""
    from dataworks_audit_data_ingest_spark.functions.graph import pagerank_integer

    edges = [(f"u{i}", "hub", 1) for i in range(8)] + [("hub", "u0", 1)]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    one = {r.node: r.rank_scaled for r in pagerank_integer(df).collect()}
    shuffled = {
        r.node: r.rank_scaled
        for r in pagerank_integer(df.repartition(13)).collect()
    }
    assert one == shuffled
    assert one["hub"] > max(v for k, v in one.items() if k != "hub")


def test_pagerank_overflow_guard_and_normalization(spark):
    """A weight that would overflow r*w raises with guidance; the opt-in
    per-source normalization brings it back in range and preserves the
    rank ORDERING of the unnormalized small-weight graph."""
    import pytest

    from dataworks_audit_data_ingest_spark.functions.graph import pagerank_integer

    huge = spark.createDataFrame(
        [("a", "b", 10**13), ("b", "a", 1)], "src string, dst string, w long"
    )
    with pytest.raises(ValueError, match="normalize_weights"):
        pagerank_integer(huge)
    ranked = {
        r.node: r.rank_scaled
        for r in pagerank_integer(huge, normalize_weights=True).collect()
    }
    assert set(ranked) == {"a", "b"}

    # ordering parity on a graph expressible both ways
    small = spark.createDataFrame(
        [("a", "b", 3), ("a", "c", 1), ("b", "c", 2), ("c", "a", 1)],
        "src string, dst string, w long",
    )
    plain = pagerank_integer(small).collect()
    norm = pagerank_integer(small, normalize_weights=True).collect()
    order = lambda rows: [r.node for r in sorted(rows, key=lambda r: -r.rank_scaled)]
    assert order(plain) == order(norm)


# ---------------------------------------------------------------------------
# triangle_count
# ---------------------------------------------------------------------------


def _tc(spark, edges):
    from dataworks_audit_data_ingest_spark.functions.graph import triangle_count

    df = spark.createDataFrame(edges, "u long, v long")
    return triangle_count(df).first()


def test_triangle_count_complete_k4(spark):
    """K4: 4 triangles, 12 wedges, closure = 10000 (every wedge closes)."""
    edges = [(a, b) for a in range(4) for b in range(4) if a < b]
    r = _tc(spark, edges)
    assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (4, 6, 12, 4)
    assert r.closure_bps == 10000


def test_triangle_count_star_has_none(spark):
    """Hub-and-spoke: many wedges, zero triangles — the chaining shape
    q146's closure metric is built to expose."""
    edges = [(0, i) for i in range(1, 9)]
    r = _tc(spark, edges)
    assert r.n_triangles == 0
    assert r.n_wedges == 8 * 7 // 2
    assert r.closure_bps == 0


def test_triangle_count_canonicalizes_input(spark):
    """Reversed duplicates, self-loops, and double edges collapse to the
    simple undirected graph before counting."""
    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1), (3, 1)]
    r = _tc(spark, edges)
    assert (r.n_edges, r.n_triangles) == (3, 1)


def test_triangle_count_matches_bruteforce_on_random_graph(spark):
    import itertools
    import random

    rnd = random.Random(42)
    nodes = list(range(30))
    edges = [(a, b) for a, b in itertools.combinations(nodes, 2) if rnd.random() < 0.2]
    adj = set(edges)
    want = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in adj and (b, c) in adj and (a, c) in adj
    )
    r = _tc(spark, edges)
    assert r.n_triangles == want


def test_q232_recursive_cc_three_way_agreement(spark):
    """Three implementations, one answer: Spark WITH RECURSIVE (q232) ==
    iterative min-label kernel == star-contraction kernel, on the real
    q51 edge lists at two scales. (The DuckDB leg is the driver's oracle
    hash for q232 — same statement text.)"""
    from dataworks_audit_data_ingest_spark.queries.dedup import (
        q232_dedup_clusters_recursive,
        q51_dedup_minhash_lsh,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rec = sorted(
            (r.doc_id, r.cluster_id)
            for r in q232_dedup_clusters_recursive(spark, sf).collect()
        )
        pairs = q51_dedup_minhash_lsh(spark, sf).select("doc_a", "doc_b")
        for method in ("label", "star"):
            kern = sorted(
                (r.node_id, r.cluster_id)
                for r in connected_components(pairs, method=method).collect()
            )
            assert rec == kern, f"{sf} method={method}"
        assert rec


def test_q232_hop_guard_covers_condensed_diameter(spark):
    """The walk recursion's hop guard must exceed the condensed-graph
    diameter at the LARGEST fixture scale, or labels silently stop short
    of the component minimum (identically on both engines — the oracle
    would not catch it; this drill is the guard's guard)."""
    from dataworks_audit_data_ingest_spark.queries.dedup import (
        q232_dedup_clusters_recursive,
        q51_dedup_minhash_lsh,
    )

    from dataworks_audit_data_ingest_spark.functions.scripted import (
        verify_cc_fixpoint,
    )

    sf = "/root/testdata/sf0.1"
    out = q232_dedup_clusters_recursive(spark, sf).localCheckpoint()
    rec = sorted((r.doc_id, r.cluster_id) for r in out.collect())
    pairs = q51_dedup_minhash_lsh(spark, sf).select("doc_a", "doc_b")
    kern = sorted(
        (r.node_id, r.cluster_id)
        for r in connected_components(pairs).collect()
    )
    assert rec == kern
    # fixture-independent guard: kernel equality only proves THIS edge
    # list's condensed diameter fits the guard — the fixpoint check
    # proves the returned labels are converged minima in their own right
    assert verify_cc_fixpoint(
        spark,
        out.withColumnRenamed("doc_id", "node_id"),
        pairs,
    )


def test_scripted_cc_four_way_agreement(spark):
    """FOUR independent connected-components implementations, one
    answer: SQL-scripting fixpoint == min-label kernel == star kernel ==
    Spark recursive CTE (q232), on a deep path graph and on the real q51
    pairs."""
    from dataworks_audit_data_ingest_spark.functions.scripted import (
        scripted_connected_components,
    )
    from dataworks_audit_data_ingest_spark.queries.dedup import (
        q232_dedup_clusters_recursive,
        q51_dedup_minhash_lsh,
    )

    # engineered: a path (deep for its size) + a triangle + a pair
    path = [(i, i + 1) for i in range(10, 15)]
    clique = [(30, 31), (31, 32), (30, 32)]
    pairs = spark.createDataFrame(
        path + clique + [(50, 51)], "doc_a long, doc_b long"
    )
    scripted = sorted(
        (r.node_id, r.cluster_id)
        for r in scripted_connected_components(spark, pairs).collect()
    )
    for method in ("label", "star"):
        kern = sorted(
            (r.node_id, r.cluster_id)
            for r in connected_components(pairs, method=method).collect()
        )
        assert scripted == kern, method
    assert scripted[0] == (10, 10) and dict(scripted)[14] == 10

    # real pairs: scripted == kernel == the recursive-CTE registry query
    sf = "/root/testdata/sf0.001"
    real = q51_dedup_minhash_lsh(spark, sf).select("doc_a", "doc_b")
    s2 = sorted(
        (r.node_id, r.cluster_id)
        for r in scripted_connected_components(spark, real).collect()
    )
    rec = sorted(
        (r.doc_id, r.cluster_id)
        for r in q232_dedup_clusters_recursive(spark, sf).collect()
    )
    assert s2 == rec and s2


def test_scripted_cc_warns_on_exhaustion(spark):
    """max_iter below the diameter: the scripted form must WARN (not
    silently return mid-iteration labels) — the kernel's contract."""
    import warnings as _warnings

    from dataworks_audit_data_ingest_spark.functions.scripted import (
        scripted_connected_components,
        verify_cc_fixpoint,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 108)], "doc_a long, doc_b long"
    )
    with _warnings.catch_warnings(record=True) as rec:
        _warnings.simplefilter("always")
        out = scripted_connected_components(spark, chain, max_iter=2)
        assert any("max_iter" in str(w.message) for w in rec)
    assert not verify_cc_fixpoint(spark, out, chain)


def test_scripted_cc_concurrent_calls_do_not_clobber(spark):
    """ADVICE r09: two concurrent scripted fixpoints on ONE SparkSession
    must not clobber each other's temp views or race the session-wide
    scripting flag (per-call view namespace + refcounted conf toggle);
    the namespace is dropped and the flag restored afterwards."""
    import threading

    from dataworks_audit_data_ingest_spark.functions.scripted import (
        scripted_connected_components,
    )

    before = spark.conf.get("spark.sql.scripting.enabled", "false")
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(10, 16)], "doc_a long, doc_b long"
    )
    other = spark.createDataFrame(
        [(30, 31), (31, 32), (30, 32), (40, 41)],
        "doc_a long, doc_b long",
    )
    results: dict[str, list] = {}
    errs: list[Exception] = []

    def run(name, pairs):
        try:
            results[name] = sorted(
                (r.node_id, r.cluster_id)
                for r in scripted_connected_components(spark, pairs).collect()
            )
        except Exception as e:  # noqa: BLE001 — surfaced via errs
            errs.append(e)

    threads = [
        threading.Thread(target=run, args=("chain", chain)),
        threading.Thread(target=run, args=("other", other)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    assert results["chain"] == [(i, 10) for i in range(10, 17)]
    assert results["other"] == [
        (30, 30), (31, 30), (32, 30), (40, 40), (41, 40),
    ]
    # no leaked views, flag restored
    leftover = [
        t.name
        for t in spark.catalog.listTables()
        if t.name.startswith("cc_scripted")
    ]
    assert leftover == []
    assert spark.conf.get("spark.sql.scripting.enabled", "false") == before


def test_scripted_cc_concurrent_across_sessions(spark):
    """Self-review r10: the scripting-flag refcount is PER SESSION — a
    concurrent call on a second SparkSession must still enable the flag
    there (a process-global depth would skip it) and each session's conf
    is restored independently."""
    import threading

    from dataworks_audit_data_ingest_spark.functions.scripted import (
        scripted_connected_components,
    )

    other = spark.newSession()
    before_a = spark.conf.get("spark.sql.scripting.enabled", "false")
    before_b = other.conf.get("spark.sql.scripting.enabled", "false")
    pairs_a = spark.createDataFrame(
        [(i, i + 1) for i in range(10, 14)], "doc_a long, doc_b long"
    )
    pairs_b = other.createDataFrame(
        [(60, 61), (61, 62)], "doc_a long, doc_b long"
    )
    results: dict[str, list] = {}
    errs: list[Exception] = []

    def run(name, sess, pairs):
        try:
            results[name] = sorted(
                (r.node_id, r.cluster_id)
                for r in scripted_connected_components(sess, pairs).collect()
            )
        except Exception as e:  # noqa: BLE001 — surfaced via errs
            errs.append(e)

    threads = [
        threading.Thread(target=run, args=("a", spark, pairs_a)),
        threading.Thread(target=run, args=("b", other, pairs_b)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    assert results["a"] == [(i, 10) for i in range(10, 15)]
    assert results["b"] == [(60, 60), (61, 60), (62, 60)]
    assert spark.conf.get("spark.sql.scripting.enabled", "false") == before_a
    assert other.conf.get("spark.sql.scripting.enabled", "false") == before_b
