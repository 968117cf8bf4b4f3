"""Incremental connected components (`incremental/cc.py`): incremental
labels == batch CC over the union after every batch, replay-idempotent
(same-batch AND later-batch replays), compaction-safe, merge-only."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.functions.graph import (
    connected_components,
)
from dataworks_audit_data_ingest_spark.incremental.cc import (
    read_cc_labels,
    update_cc_store,
)
from dataworks_audit_data_ingest_spark.incremental.store import (
    compact_store,
)

# three batches engineered to exercise: fresh components, a brand-new
# component, a cross-batch MERGE (2-3 unites {1,2} and {3,4} under 1),
# a chain extension, and a no-op duplicate edge
BATCHES = {
    "1": [(1, 2), (5, 6)],
    "2": [(3, 4), (8, 9)],
    "3": [(2, 3), (9, 10), (5, 6)],
}


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "doc_a long, doc_b long")


def _union_df(spark, upto):
    pairs = [p for b in sorted(BATCHES) if b <= upto for p in BATCHES[b]]
    return _edges_df(spark, pairs)


def _labels(df):
    return sorted((r.node_id, r.cluster_id) for r in df.collect())


def test_incremental_equals_batch_cc_after_every_batch(spark, tmp_path):
    store = str(tmp_path / "cc_store")
    for b in sorted(BATCHES):
        update_cc_store(spark, store, _edges_df(spark, BATCHES[b]), b)
        got = _labels(read_cc_labels(spark, store))
        want = _labels(
            connected_components(_union_df(spark, b)).select(
                "node_id", "cluster_id"
            )
        )
        assert got == want, f"divergence after batch {b}"
    # the merge actually happened: 4's label is 1, through 2-3
    final = dict(_labels(read_cc_labels(spark, store)))
    assert final[4] == 1 and final[3] == 1 and final[2] == 1
    assert final[6] == 5 and final[10] == 8


def test_replay_is_idempotent(spark, tmp_path):
    store = str(tmp_path / "cc_store")
    for b in sorted(BATCHES):
        update_cc_store(spark, store, _edges_df(spark, BATCHES[b]), b)
    before = _labels(read_cc_labels(spark, store))
    # same-batch replay (crash between store write and sink write)
    update_cc_store(spark, store, _edges_df(spark, BATCHES["3"]), "3")
    assert _labels(read_cc_labels(spark, store)) == before
    # LATER-batch replay (checkpoint restart re-runs batch 2 after 3
    # landed): the monotone MIN fold keeps the store consistent
    update_cc_store(spark, store, _edges_df(spark, BATCHES["2"]), "2")
    assert _labels(read_cc_labels(spark, store)) == before


def test_compaction_preserves_labels(spark, tmp_path):
    store = str(tmp_path / "cc_store")
    for b in sorted(BATCHES):
        update_cc_store(spark, store, _edges_df(spark, BATCHES[b]), b)
    before = _labels(read_cc_labels(spark, store))
    removed = compact_store(spark, store, exclude=("3",))
    assert removed >= 1
    assert _labels(read_cc_labels(spark, store)) == before


def test_merge_only_delta_shape(spark, tmp_path):
    """The delta touches ONLY merged components and new nodes — untouched
    components write no rows (the merge-only property)."""
    store = str(tmp_path / "cc_store")
    update_cc_store(spark, store, _edges_df(spark, BATCHES["1"]), "1")
    update_cc_store(spark, store, _edges_df(spark, BATCHES["2"]), "2")
    delta = update_cc_store(
        spark, store, _edges_df(spark, [(2, 3)]), "3"
    )
    rows = dict(_labels(delta))
    # {3,4} relabel to 1; 1/2 already carry 1; {5,6},{8,9} untouched
    assert rows == {3: 1, 4: 1}


def test_fixture_pairs_three_batch_split(spark, tmp_path):
    """Real edge list: q51's minhash pairs at sf0.001 split into three
    hash batches — incremental union == batch kernel."""
    from dataworks_audit_data_ingest_spark.queries.dedup import (
        q51_dedup_minhash_lsh,
    )

    pairs = q51_dedup_minhash_lsh(spark, "/root/testdata/sf0.001").select(
        "doc_a", "doc_b"
    ).localCheckpoint(eager=True)
    store = str(tmp_path / "cc_store")
    for b in range(3):
        part = pairs.filter(F.expr(f"pmod(hash(doc_a, doc_b), 3) = {b}"))
        update_cc_store(spark, store, part, str(b))
    got = _labels(read_cc_labels(spark, store))
    want = _labels(
        connected_components(pairs).select("node_id", "cluster_id")
    )
    assert got == want and got


def test_composes_with_incremental_lexical_dedup(spark, tmp_path):
    """The crawl-refresh composition: each batch's dup_pairs from the
    incremental signature store fold straight into the CC label store —
    incremental cluster labels == batch CC over every pair any batch
    surfaced, without re-reading historical text."""
    from dataworks_audit_data_ingest_spark.tables import table
    from dataworks_audit_data_ingest_spark.text.incremental_dedup import (
        incremental_dedup_batch,
    )

    docs = table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    sig_store = str(tmp_path / "sig_store")
    cc_store = str(tmp_path / "cc_store")
    all_pairs = []
    for b in range(3):
        batch = docs.filter(F.expr(f"pmod(doc_id, 3) = {b}"))
        _, dup_pairs = incremental_dedup_batch(
            spark, sig_store, batch, str(b)
        )
        dup_pairs = dup_pairs.localCheckpoint(eager=True)
        all_pairs.append(dup_pairs)
        update_cc_store(spark, cc_store, dup_pairs, str(b))
    union = all_pairs[0]
    for p in all_pairs[1:]:
        union = union.unionByName(p)
    got = _labels(read_cc_labels(spark, cc_store))
    want = _labels(
        connected_components(union).select("node_id", "cluster_id")
    )
    assert got == want and got


def test_empty_batch_and_self_loops_are_noops(spark, tmp_path):
    store = str(tmp_path / "cc_store")
    update_cc_store(spark, store, _edges_df(spark, BATCHES["1"]), "1")
    before = _labels(read_cc_labels(spark, store))
    # empty edge batch: no state change
    update_cc_store(spark, store, _edges_df(spark, []), "2")
    assert _labels(read_cc_labels(spark, store)) == before
    # self-loops neither merge nor crash
    update_cc_store(spark, store, _edges_df(spark, [(5, 5)]), "3")
    after = dict(_labels(read_cc_labels(spark, store)))
    assert after[5] == 5 and after[6] == 5


def test_forget_repairs_split_and_min_reference(spark, tmp_path):
    """Forgetting a node that is BOTH a component minimum and a cut
    vertex: its id vanishes from node_id AND cluster_id columns, the
    component splits correctly, untouched components keep their rows,
    and a re-run converges (idempotent)."""
    from dataworks_audit_data_ingest_spark.incremental.cc import (
        forget_ids_from_cc_store,
    )

    store = str(tmp_path / "cc_store")
    # component {1,2,3} is a path 2-1-3 (1 = min AND cut vertex);
    # {5,6} untouched control
    edges = [(1, 2), (1, 3), (5, 6)]
    update_cc_store(spark, store, _edges_df(spark, edges), "0")
    before = dict(_labels(read_cc_labels(spark, store)))
    assert before == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}

    surviving = _edges_df(spark, [(5, 6)])  # post-erasure edge list
    audit = str(tmp_path / "audit")
    out = forget_ids_from_cc_store(
        spark, store, [1], surviving, audit_path=audit
    )
    assert out == {"nodes_forgotten": 1, "members_relabeled": 2}
    after = _labels(read_cc_labels(spark, store))
    # 1 gone everywhere; 2 and 3 split into singletons; control intact
    assert after == [(2, 2), (3, 3), (5, 5), (6, 5)]
    # the erased id appears in NO row, either column
    raw = spark.read.parquet(store)
    assert raw.filter("node_id = 1 OR cluster_id = 1").count() == 0
    # idempotent re-run
    out2 = forget_ids_from_cc_store(spark, store, [1], surviving)
    assert _labels(read_cc_labels(spark, store)) == after
    # audit row landed
    detail = spark.read.parquet(audit).collect()[0]
    assert detail.operation == "forget_ids_from_cc_store"
    assert detail.n_affected == 1


def test_forget_keeps_connected_remainder_together(spark, tmp_path):
    """Forgetting a NON-cut member: the rest of the component stays one
    cluster, relabeled to its new minimum."""
    from dataworks_audit_data_ingest_spark.incremental.cc import (
        forget_ids_from_cc_store,
    )

    store = str(tmp_path / "cc_store")
    # triangle {1,2,3}: removing 1 leaves 2-3 connected
    edges = [(1, 2), (2, 3), (1, 3)]
    update_cc_store(spark, store, _edges_df(spark, edges), "0")
    surviving = _edges_df(spark, [(2, 3)])
    forget_ids_from_cc_store(spark, store, [1], surviving)
    assert _labels(read_cc_labels(spark, store)) == [(2, 2), (3, 2)]


def test_forget_crash_between_stage_and_erase_resumes(
    spark, tmp_path, monkeypatch
):
    """ADVICE r09 (medium): a crash AFTER the repair rows are staged but
    BEFORE the erase runs must not lose memberships. The re-run recovers
    the member set from the pending sidecar, completes the erase, and
    settles (sidecar deleted)."""
    from pathlib import Path

    import dataworks_audit_data_ingest_spark.incremental.forget as fmod
    from dataworks_audit_data_ingest_spark.incremental.cc import (
        forget_ids_from_cc_store,
    )

    store = str(tmp_path / "cc_store")
    update_cc_store(
        spark, store, _edges_df(spark, [(1, 2), (1, 3), (5, 6)]), "0"
    )
    surviving = _edges_df(spark, [(5, 6)])

    real = fmod.forget_matching_from_store

    def boom(*a, **k):
        raise RuntimeError("injected crash before erase")

    monkeypatch.setattr(fmod, "forget_matching_from_store", boom)
    try:
        forget_ids_from_cc_store(spark, store, [1], surviving)
        raise AssertionError("injected crash did not fire")
    except RuntimeError:
        pass
    # mid-protocol state: sidecar + staged partition exist, old rows
    # intact — readers still see the PRE-forget labels
    pend = [p for p in Path(store).iterdir() if "_forget_pending_" in p.name]
    assert len(pend) == 1
    assert dict(_labels(read_cc_labels(spark, store))) == {
        1: 1, 2: 1, 3: 1, 5: 5, 6: 5,
    }

    # re-run with the real erase: converges to the repaired state
    monkeypatch.setattr(fmod, "forget_matching_from_store", real)
    out = forget_ids_from_cc_store(spark, store, [1], surviving)
    assert out["members_relabeled"] == 2
    assert _labels(read_cc_labels(spark, store)) == [
        (2, 2), (3, 3), (5, 5), (6, 5),
    ]
    raw = spark.read.parquet(store)
    assert raw.filter("node_id = 1 OR cluster_id = 1").count() == 0
    assert not [
        p for p in Path(store).iterdir() if "_forget_pending_" in p.name
    ]


def test_forget_crash_mid_erase_resumes(spark, tmp_path, monkeypatch):
    """Crash HALFWAY through the erase (subject's rows gone, members'
    rows still carrying the old label): the labels alone can no longer
    name every member — the sidecar must carry the re-run through."""
    from pathlib import Path

    import dataworks_audit_data_ingest_spark.incremental.forget as fmod
    from dataworks_audit_data_ingest_spark.incremental.cc import (
        forget_ids_from_cc_store,
    )

    store = str(tmp_path / "cc_store")
    # min AND cut vertex is the subject; component minimum is node 1
    update_cc_store(
        spark, store, _edges_df(spark, [(1, 2), (1, 3), (5, 6)]), "0"
    )
    surviving = _edges_df(spark, [(5, 6)])

    real = fmod.forget_matching_from_store

    def partial_then_boom(spark2, sp, ids_df, **kw):
        # erase only the SUBJECT's rows, then crash — members 2 and 3
        # survive with cluster_id=1, a label no node_id row backs
        real(spark2, sp, ids_df.filter("node_id = 1"), **kw)
        raise RuntimeError("injected crash mid-erase")

    monkeypatch.setattr(fmod, "forget_matching_from_store", partial_then_boom)
    try:
        forget_ids_from_cc_store(spark, store, [1], surviving)
        raise AssertionError("injected crash did not fire")
    except RuntimeError:
        pass

    monkeypatch.setattr(fmod, "forget_matching_from_store", real)
    forget_ids_from_cc_store(spark, store, [1], surviving)
    assert _labels(read_cc_labels(spark, store)) == [
        (2, 2), (3, 3), (5, 5), (6, 5),
    ]
    raw = spark.read.parquet(store)
    assert raw.filter("node_id = 1 OR cluster_id = 1").count() == 0
    assert not [
        p for p in Path(store).iterdir() if "_forget_pending_" in p.name
    ]


def test_settled_forget_replay_never_resplits_grown_clusters(
    spark, tmp_path
):
    """After a COMPLETED forget, later batches may legitimately re-grow a
    repaired member's cluster; replaying the old (settled) request must
    be a no-op — NOT a re-split from stale staged state."""
    from dataworks_audit_data_ingest_spark.incremental.cc import (
        forget_ids_from_cc_store,
    )

    store = str(tmp_path / "cc_store")
    update_cc_store(
        spark, store, _edges_df(spark, [(1, 2), (1, 3)]), "0"
    )
    surviving0 = _edges_df(spark, [])
    forget_ids_from_cc_store(spark, store, [1], surviving0)
    assert _labels(read_cc_labels(spark, store)) == [(2, 2), (3, 3)]
    # a later batch reconnects 2 into a new component with 9
    update_cc_store(spark, store, _edges_df(spark, [(2, 9)]), "1")
    grown = _labels(read_cc_labels(spark, store))
    assert dict(grown)[9] == 2
    # stale replay of the settled request: labels untouched
    forget_ids_from_cc_store(
        spark, store, [1], _edges_df(spark, [(2, 9)])
    )
    assert _labels(read_cc_labels(spark, store)) == grown


def test_forget_bridge_then_later_batches_then_readd(spark, tmp_path):
    """VERDICT r09 #4 — the full deletion COMPOSITION: forget a bridge
    node (component splits), keep folding later batches, pin store
    labels == batch CC over the surviving-edge union at every step, then
    re-add the forgotten subject and assert it participates fresh
    (un-ghosted) without resurrecting erased history."""
    from dataworks_audit_data_ingest_spark.incremental.cc import (
        forget_ids_from_cc_store,
    )

    store = str(tmp_path / "cc_store")
    # batch 0: path 2-7-3 plus control {20,21}; 7 is the bridge
    b0 = [(2, 7), (7, 3), (20, 21)]
    update_cc_store(spark, store, _edges_df(spark, b0), "0")
    assert dict(_labels(read_cc_labels(spark, store)))[3] == 2

    # forget the bridge: component must split
    surviving0 = _edges_df(spark, [(20, 21)])
    forget_ids_from_cc_store(spark, store, [7], surviving0)
    assert _labels(read_cc_labels(spark, store)) == [
        (2, 2), (3, 3), (20, 20), (21, 20),
    ]

    # later batches keep folding: 3 joins a NEW component with 9;
    # labels == batch CC over surviving past edges + new edges
    b1 = [(3, 9), (40, 41)]
    update_cc_store(spark, store, _edges_df(spark, b1), "1")
    want = _labels(
        connected_components(
            _edges_df(spark, [(20, 21)] + b1)
        ).select("node_id", "cluster_id")
    )
    got = [
        (n, c)
        for n, c in _labels(read_cc_labels(spark, store))
        if n != 2  # 2 is a singleton only the store knows (edge erased)
    ]
    assert got == want
    full = dict(_labels(read_cc_labels(spark, store)))
    assert full[2] == 2 and full[9] == 3  # split held across batches

    # the subject's id never resurfaced as a label anywhere
    raw = spark.read.parquet(store)
    assert raw.filter("node_id = 7 OR cluster_id = 7").count() == 0

    # re-add / un-ghost: the same subject id arrives in a new batch and
    # participates as a fresh node — merged by current rules, with no
    # memory of its erased memberships (2 stays split off)
    update_cc_store(spark, store, _edges_df(spark, [(7, 40)]), "2")
    after = dict(_labels(read_cc_labels(spark, store)))
    assert after[7] == 7 and after[40] == 7 and after[41] == 7
    assert after[2] == 2 and after[3] == 3 and after[9] == 3


def test_second_forget_of_same_ids_keeps_first_repair(spark, tmp_path):
    """Self-review r10: two temporally distinct forgets of the SAME id
    set must stage DISTINCT partitions — an id-derived partition name
    would let the second forget dynamic-overwrite the first repair's
    still-live rows (the members' ONLY rows), silently dropping them
    from the label store."""
    from dataworks_audit_data_ingest_spark.incremental.cc import (
        forget_ids_from_cc_store,
    )

    store = str(tmp_path / "cc_store")
    update_cc_store(spark, store, _edges_df(spark, [(1, 2), (1, 3)]), "0")
    forget_ids_from_cc_store(spark, store, [1], _edges_df(spark, []))
    assert _labels(read_cc_labels(spark, store)) == [(2, 2), (3, 3)]

    # the subject returns in a later batch with a new companion
    update_cc_store(spark, store, _edges_df(spark, [(1, 9)]), "1")
    assert dict(_labels(read_cc_labels(spark, store)))[9] == 1

    # second forget of the SAME ids, non-empty member set this time
    forget_ids_from_cc_store(spark, store, [1], _edges_df(spark, []))
    # 9 relabeled to itself AND the first repair's rows survived
    assert _labels(read_cc_labels(spark, store)) == [
        (2, 2), (3, 3), (9, 9),
    ]
    raw = spark.read.parquet(store)
    assert raw.filter("node_id = 1 OR cluster_id = 1").count() == 0


def test_corrupt_pending_sidecar_is_regenerated(spark, tmp_path):
    """A partial sidecar (crash DURING the initial sidecar write — i.e.
    before any store mutation) must be treated as absent: deleted and
    regenerated, with the forget completing normally from the intact
    labels."""
    from pathlib import Path

    from dataworks_audit_data_ingest_spark.incremental.cc import (
        forget_ids_from_cc_store,
    )

    store = str(tmp_path / "cc_store")
    update_cc_store(
        spark, store, _edges_df(spark, [(1, 2), (1, 3), (5, 6)]), "0"
    )
    # plant a corrupt (unreadable-as-parquet) sidecar for ids [1]
    import hashlib

    digest = hashlib.md5(b"1").hexdigest()[:12]
    bad = Path(store) / f"_forget_pending_{digest}"
    bad.mkdir()
    (bad / "part-00000.parquet").write_bytes(b"not parquet")

    out = forget_ids_from_cc_store(
        spark, store, [1], _edges_df(spark, [(5, 6)])
    )
    assert out == {"nodes_forgotten": 1, "members_relabeled": 2}
    assert _labels(read_cc_labels(spark, store)) == [
        (2, 2), (3, 3), (5, 5), (6, 5),
    ]
    assert not bad.exists()  # settled: sidecar gone
