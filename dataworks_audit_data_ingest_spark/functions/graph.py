"""Distributed graph primitives used by the dedup family.

Two connected-components kernels behind one contract ((node_id,
cluster_id), cluster id = component minimum):

- ``method="label"`` — one-hop min-label propagation (alternating join +
  min-agg until fixpoint). One shuffle per round, O(diameter) rounds.
  The right kernel for near-dup graphs, which are stars/cliques of
  diameter ≤ 2-3 (fixpoint in 3-4 rounds).
- ``method="star"`` — the alternating large-star/small-star contraction
  (the published MapReduce CC algorithm: Kiveris et al., "Connected
  Components in MapReduce and Beyond", SoCC'14): each round rewires
  every node's larger (large-star) or not-larger (small-star) neighbors
  onto its neighborhood minimum — two grouped-min + join passes per
  round — and the edge set converges to disjoint stars around component
  minima in O(log n) rounds REGARDLESS of diameter. The kernel for
  genuinely deep graphs (long chains, social/link graphs) where
  O(diameter) rounds would dominate.

Both cut lineage per round via ``localCheckpoint`` so plans don't grow
with iterations, exit at the observed fixpoint, and are deterministic.
PERF.md's CC section quantifies rounds for both on engineered path
graphs (label: diameter+1; star: ~log).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
    stats: dict | None = None,
    method: str = "label",
) -> DataFrame:
    """(node_id, cluster_id) for every node appearing in ``edges``; the
    cluster id is the component's minimum node id. Input edges may be
    directed — both directions are added internally.

    ``method="label"`` (default): one-hop min-label propagation —
    fixpoint in at most ``diameter`` rounds plus one detection round
    (measured on an engineered path graph in ``tests/test_graph.py``;
    PERF.md quantifies rounds/wall). Near-dup graphs are stars/cliques
    (diameter ≤ 2-3); for genuinely deep graphs either raise
    ``max_iter`` — the exhaustion warning below fires rather than
    silently mislabeling — or switch to ``method="star"``, the
    large-star/small-star contraction that converges in O(log n) rounds
    independent of diameter (same output, equivalence-tested).
    Pass ``stats={}`` to receive ``{"rounds": n, "converged": bool}``
    back (observability hook; no effect on the result)."""
    if method == "star":
        return _cc_star_contraction(edges, src, dst, max_iter, stats)
    pairs = edges.select(src, dst)
    # materialize the edge list ONCE — without this, the entire upstream
    # edge-producing plan (LSH banding, cosine verification, ...) would
    # re-execute inside every iteration's join
    both = pairs.union(
        pairs.select(F.col(dst).alias(src), F.col(src).alias(dst))
    ).localCheckpoint(eager=True)
    nodes = both.select(F.col(src).alias("node_id")).distinct()
    labels = nodes.withColumn("label", F.col("node_id"))
    converged = False
    rounds = 0
    for _ in range(max_iter):  # diameter bound; fixpoint reached far earlier
        rounds += 1
        neigh = (
            both.join(labels, both[dst] == labels.node_id)
            .groupBy(F.col(src).alias("node_id"))
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neigh, "node_id", "left")
            .select(
                "node_id",
                F.least(F.col("label"), F.coalesce("nlabel", "label")).alias(
                    "label"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node_id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if stats is not None:
        stats["rounds"] = rounds
        stats["converged"] = converged
    if not converged:
        import warnings

        warnings.warn(
            f"connected_components hit max_iter={max_iter} before fixpoint; "
            "labels may not be component minima — raise max_iter for graphs "
            "with diameter beyond it",
            stacklevel=2,
        )
    return labels.select("node_id", F.col("label").alias("cluster_id"))


def _cc_star_contraction(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int,
    stats: dict | None,
) -> DataFrame:
    """Alternating large-star/small-star CC (Kiveris et al., SoCC'14).

    Working state is the undirected edge set stored as symmetric directed
    pairs (u, v). Per half-round, with m(u) = min({u} ∪ Γ(u)):

    - **large-star** rewires every strictly-larger neighbor onto the
      minimum: emit (v, m(u)) for v ∈ Γ(u), v > u — plus (u, m(u)) to
      keep u attached. Cuts long tails onto local minima.
    - **small-star** rewires every not-larger neighbor onto the minimum:
      emit (v, m(u)) for v ∈ Γ(u), v ≤ u, and (u, m(u)). Merges the
      local minima themselves.

    Each half-round is one grouped min (shuffle keyed by u) + one join;
    the edge set is re-symmetrized, self-loops dropped, and the loop
    exits when a large+small double round leaves the undirected edge set
    unchanged — at that point every component is a star around its
    minimum and the center IS the component minimum (the algorithm's
    invariant), so labels read off the final edges directly. O(log n)
    double rounds on any topology — the deep-graph complement to
    min-label's O(diameter) (PERF.md measures both on path graphs)."""
    pairs = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    cur = (
        pairs.union(pairs.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    all_nodes = cur.select(F.col("u").alias("node_id")).distinct().localCheckpoint(
        eager=True
    )

    def half_round(sym: DataFrame, large: bool) -> DataFrame:
        m = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        joined = sym.join(m, "u")
        keep = F.col("v") > F.col("u") if large else F.col("v") <= F.col("u")
        rewired = joined.filter(keep).select(F.col("v").alias("a"), F.col("m").alias("b"))
        anchor = m.select(F.col("u").alias("a"), F.col("m").alias("b"))
        out = rewired.union(anchor).filter(F.col("a") != F.col("b")).distinct()
        # re-symmetrize for the next half-round's neighborhood views
        return (
            out.select(F.col("a").alias("u"), F.col("b").alias("v"))
            .union(out.select(F.col("b").alias("u"), F.col("a").alias("v")))
            .distinct()
        )

    converged = False
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        nxt = half_round(half_round(cur, large=True), large=False).localCheckpoint(
            eager=True
        )
        changed = (
            nxt.exceptAll(cur).limit(1).count() + cur.exceptAll(nxt).limit(1).count()
        )
        cur = nxt
        if changed == 0:
            converged = True
            break
    if stats is not None:
        stats["rounds"] = rounds
        stats["converged"] = converged
    if not converged:
        import warnings

        warnings.warn(
            f"connected_components(method='star') hit max_iter={max_iter} "
            "before the edge set stabilized; labels may not be component "
            "minima — raise max_iter",
            stacklevel=3,
        )
    # final state: disjoint stars around component minima. Every non-center
    # node's single neighbor is the minimum; centers label themselves.
    labels = cur.groupBy("u").agg(F.min("v").alias("mv")).select(
        F.col("u").alias("node_id"),
        F.least(F.col("u"), F.col("mv")).alias("cluster_id"),
    )
    return all_nodes.join(labels, "node_id", "left").select(
        "node_id", F.coalesce("cluster_id", F.col("node_id")).alias("cluster_id")
    )


def pagerank_integer(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    iterations: int = 3,
    scale: int = 10**12,
    damping_pct: int = 85,
    normalize_weights: bool = False,
) -> DataFrame:
    """Weighted PageRank in scaled integer arithmetic: returns
    ``(node, rank_scaled)`` where ranks start at ``scale DIV n`` and each
    iteration applies

        r'(v) = (100-d)*scale DIV (100*n)
              + d * Σ_u floor(r(u)*w(u,v) / W(u)) DIV 100

    with ``W(u)`` the total outgoing weight of ``u`` and ``d`` the damping
    percentage. Every step is BIGINT floor division — deterministic under
    any partitioning and identical across engines, which is what lets a
    fixed-iteration run be hash-checked against a SQL oracle (same policy
    as the q92/q103 fixed-point features). Dangling nodes (no out-edges)
    contribute nothing — their mass decays rather than redistributing, a
    documented variant choice that keeps the update strictly local to
    edges.

    Scale shape: the edge list is materialized once (localCheckpoint, same
    rationale as ``connected_components``); each iteration is one
    src-keyed broadcast-or-shuffle join of the rank vector onto edges plus
    one dst-keyed sum — O(iterations) shuffles of (node, rank) pairs, no
    step ever holds more than the rank vector per partition group.
    BIGINT headroom: r*w < 2^63 requires max edge weight < 9e6 at
    scale=1e12 — ENFORCED: the kernel raises if the bound is violated.
    Heavier graphs pass ``normalize_weights=True`` to rescale each edge
    to ``(w * 10^6) DIV W(u)`` first; the quotient still divides by the
    (new) per-source total, so ranks are unchanged up to the floor
    rounding the rescale introduces — an approximation, which is why it
    is opt-in rather than silent.
    """
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), F.col(weight).alias("w")
    ).localCheckpoint(eager=True)
    if normalize_weights:
        # Approximate by design (docstring): the ratio runs in doubles so
        # arbitrarily heavy weights can't overflow the rescale itself —
        # deterministic (IEEE ops on identical inputs), then back to the
        # BIGINT domain the exact fixed-point iterations require.
        outw0 = e.groupBy("src").agg(
            F.sum(F.col("w").cast("double")).alias("ow0")
        )
        e = (
            e.join(outw0, "src")
            .select(
                "src",
                "dst",
                F.expr(
                    "CAST(FLOOR(CAST(w AS DOUBLE) / ow0 * 1000000) AS BIGINT)"
                ).alias("w"),
            )
            .filter(F.col("w") > 0)
            .localCheckpoint(eager=True)
        )
    max_w = e.agg(F.max("w")).collect()[0][0]
    if max_w is not None and max_w * scale >= 2**63:
        raise ValueError(
            f"pagerank_integer: max edge weight {max_w} overflows BIGINT at "
            f"scale={scale}; pass normalize_weights=True or lower the scale"
        )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    base = (100 - damping_pct) * scale // (100 * n)
    outw = e.groupBy("src").agg(F.sum("w").alias("ow"))
    ew = e.join(outw, "src")
    ranks = nodes.withColumn("r", F.lit(scale // n).cast("long"))
    for _ in range(iterations):
        contribs = (
            ew.join(ranks, ew.src == ranks.node)
            .select(F.col("dst").alias("node"), F.expr("(r * w) DIV ow").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(f"({damping_pct} * coalesce(c, 0)) DIV 100")
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.col("r").cast("bigint").alias("rank_scaled"))


def triangle_count(
    edges: DataFrame, src: str = "u", dst: str = "v"
) -> DataFrame:
    """One-row triangle census of an undirected graph:
    (n_nodes, n_edges, n_wedges, n_triangles, closure_bps).

    The ordered-edge algorithm (Schank & Wagner 2005; the standard
    distributed form): canonicalize each edge low→high, build wedges
    ``(a<b<c)`` from two edges sharing their lower endpoint, close them
    against the edge set. Each triangle is counted exactly once (at its
    smallest vertex), so the join volume is O(Σ deg_low²) — the m^{3/2}
    bound — instead of the naive 3× over-count. ``n_wedges`` is the full
    path-of-length-2 count Σ C(deg, 2) (from the degree table, no join),
    and ``closure_bps = 10⁴·3·triangles / wedges`` is the global
    clustering coefficient in basis points — exact integer division.

    At 100 TB: two shuffles keyed by vertex (degree count, wedge build)
    plus one edge-keyed join to close wedges. Heavy-hitter vertices
    dominate via deg²; cap or sample super-nodes upstream if the degree
    distribution is unbounded (the dedup-graph use never is — bucket
    caps bound degrees by construction)."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    counts = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.expr("d * (d - 1) DIV 2")).alias("n_wedges"),
    )
    e1 = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
    wedges = e1.join(e2, "a").filter(F.col("b") < F.col("c"))
    tri = wedges.join(
        e.select(F.col("u").alias("b"), F.col("v").alias("c")), ["b", "c"]
    ).agg(F.count(F.lit(1)).alias("n_triangles"))
    return (
        e.agg(F.count(F.lit(1)).alias("n_edges"))
        .crossJoin(counts)
        .crossJoin(tri)
        .select(
            F.col("n_nodes").cast("bigint").alias("n_nodes"),
            F.col("n_edges").cast("bigint").alias("n_edges"),
            F.col("n_wedges").cast("bigint").alias("n_wedges"),
            F.col("n_triangles").cast("bigint").alias("n_triangles"),
            F.expr(
                "CASE WHEN n_wedges > 0 THEN 10000 * 3 * n_triangles DIV n_wedges "
                "ELSE 0 END"
            ).cast("bigint").alias("closure_bps"),
        )
    )
