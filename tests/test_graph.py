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
