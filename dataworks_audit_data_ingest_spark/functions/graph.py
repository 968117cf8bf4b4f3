"""Distributed graph primitives used by the dedup family.

`connected_components` is iterative min-label propagation (alternating
join + min-agg until fixpoint) — the standard large-graph CC pattern.
Each round is ONE shuffle keyed on the node id; lineage is cut per round
via ``localCheckpoint`` so plans don't grow with iterations, and the loop
exits at the observed fixpoint, so total cost is O(graph diameter)
shuffles — near-dup clusters are shallow (stars/cliques), so 2-3 rounds
in practice.
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
) -> DataFrame:
    """(node_id, cluster_id) for every node appearing in ``edges``; the
    cluster id is the component's minimum node id. Input edges may be
    directed — both directions are added internally.

    Convergence: one-hop min-label propagation reaches fixpoint in at
    most ``diameter`` rounds plus one detection round (measured on an
    engineered path graph in ``tests/test_functions.py``; PERF.md
    quantifies rounds/wall). Near-dup graphs are stars/cliques
    (diameter ≤ 2-3); for genuinely deep graphs raise ``max_iter`` —
    the exhaustion warning below fires rather than silently mislabeling.
    Pass ``stats={}`` to receive ``{"rounds": n, "converged": bool}``
    back (observability hook; no effect on the result)."""
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
