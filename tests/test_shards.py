"""Training shard writer (`sinks/shards.py`): lossless coverage, balance,
single-file deterministic layout, manifest integrity, and epoch
re-ordering properties."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.sinks.shards import (
    epoch_shard_order,
    epoch_sort_key,
    read_manifest,
    read_shard,
    verify_shards,
    write_training_shards,
)
from dataworks_audit_data_ingest_spark.tables import table

SF = "/root/testdata/sf0.001"
N = 4


def _write(spark, tmp_path):
    d = table(spark, SF, "documents")
    path = str(tmp_path / "shards")
    man = write_training_shards(d, path, N, id_col="doc_id", size_col="n_chars")
    return d, path, man


def test_shards_partition_input_losslessly(spark, tmp_path):
    d, path, man = _write(spark, tmp_path)
    back = spark.read.parquet(path)
    assert back.count() == d.count() == man["total_rows"]
    got = sorted(r.doc_id for r in back.select("doc_id").collect())
    want = sorted(r.doc_id for r in d.select("doc_id").collect())
    assert got == want
    # every doc in exactly one shard
    assert back.select("doc_id").distinct().count() == len(got)


def test_shards_balanced_and_single_file(spark, tmp_path):
    _, path, man = _write(spark, tmp_path)
    sizes = [v["n_rows"] for v in man["shards"].values()]
    mean = sum(sizes) / N
    assert max(sizes) < 2 * mean and min(sizes) > mean / 2, sizes
    for k in range(N):
        files = glob.glob(f"{path}/shard={k}/*.parquet")
        assert len(files) == 1, files


def test_epoch0_file_order_is_the_hash_order(spark, tmp_path):
    """Rows inside a shard file are stored in (shard_ord, id) order — a
    loader that streams the file gets the epoch-0 shuffle for free."""
    _, path, _ = _write(spark, tmp_path)
    rows = (
        spark.read.parquet(f"{path}/shard=0").select("shard_ord", "doc_id").collect()
    )
    keys = [(r.shard_ord, r.doc_id) for r in rows]
    assert keys == sorted(keys)
    # and the order is not the trivial id order (it IS shuffled)
    ids = [r.doc_id for r in rows]
    assert ids != sorted(ids)


def test_manifest_verifies_and_detects_tamper(spark, tmp_path):
    _, path, man = _write(spark, tmp_path)
    assert verify_shards(spark, path)
    m = read_manifest(path)
    assert m == man
    import json
    from pathlib import Path

    m["shards"]["0"]["checksum"] += 1
    Path(path, "_shards_manifest.json").write_text(json.dumps(m))
    assert not verify_shards(spark, path)


def test_rewrite_is_deterministic(spark, tmp_path):
    d = table(spark, SF, "documents")
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = write_training_shards(d, p1, N)
    m2 = write_training_shards(d.repartition(7), p2, N)
    assert m1 == m2
    r1 = [tuple(r) for r in spark.read.parquet(f"{p1}/shard=1").collect()]
    r2 = [tuple(r) for r in spark.read.parquet(f"{p2}/shard=1").collect()]
    assert r1 == r2  # including stored order


def test_epoch_reordering_is_a_permutation_and_differs(spark, tmp_path):
    _, path, _ = _write(spark, tmp_path)
    order1 = epoch_shard_order(N, 1)
    assert sorted(order1) == list(range(N))
    assert epoch_shard_order(N, 0) == list(range(N))
    assert epoch_shard_order(N, 1) == order1  # stable
    e0 = [r.doc_id for r in read_shard(spark, path, 0, epoch=0).select("doc_id").collect()]
    e1 = [r.doc_id for r in read_shard(spark, path, 0, epoch=1).select("doc_id").collect()]
    assert sorted(e0) == sorted(e1)
    assert e0 != e1  # different epoch, different order


def test_epoch_sort_key_matches_stored_order_for_epoch0(spark):
    d = table(spark, SF, "documents").limit(50)
    from dataworks_audit_data_ingest_spark.sinks.shards import shard_assignment

    a = shard_assignment(d, "doc_id", N)
    chk = a.withColumn("k0", epoch_sort_key("doc_id", 0)).filter(
        F.col("k0") != F.col("shard_ord")
    )
    assert chk.count() == 0


def test_failed_rewrite_preserves_previous_shards(spark, tmp_path, monkeypatch):
    """Crash-safety: a failure at swap time leaves the v1 shard set fully
    readable and manifest-consistent (the staged dir is discarded)."""
    import dataworks_audit_data_ingest_spark.sinks.writers as wr

    d = table(spark, SF, "documents")
    path = str(tmp_path / "cs")
    man1 = write_training_shards(d, path, N)
    v1 = sorted(map(tuple, spark.read.parquet(path).collect()))

    def boom(*a, **k):
        raise RuntimeError("injected swap failure")

    monkeypatch.setattr(wr, "_swap_partition_dirs", boom)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="injected swap failure"):
        write_training_shards(d.limit(50), path, N)
    monkeypatch.undo()

    # previous data intact, manifest still verifies, no stray staging dirs
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == v1
    from dataworks_audit_data_ingest_spark.sinks.shards import read_manifest

    assert read_manifest(path) == man1
    assert verify_shards(spark, path)
    import os

    assert not [x for x in os.listdir(path) if x.startswith(".staged_")]


def test_rewrite_removes_emptied_and_stale_shards(spark, tmp_path):
    """A rewrite is a FULL replacement: shard=K dirs the new data doesn't
    produce (emptied shard, or a smaller n_shards) must not survive with
    stale rows — previously they did until verify_shards flagged them."""
    import os

    d = table(spark, SF, "documents")
    path = str(tmp_path / "re")
    write_training_shards(d, path, N)

    # rewrite with a single row: exactly one shard is non-empty
    man2 = write_training_shards(d.limit(1), path, N)
    present = {x for x in os.listdir(path) if x.startswith("shard=")}
    want = {
        f"shard={k}" for k, v in man2["shards"].items() if v["n_rows"] > 0
    }
    assert present == want and len(present) == 1
    assert verify_shards(spark, path)
    assert spark.read.parquet(path).count() == 1

    # rewrite with fewer shards: the tail dirs disappear too
    man3 = write_training_shards(d, path, 2)
    present = {x for x in os.listdir(path) if x.startswith("shard=")}
    assert present == {"shard=0", "shard=1"}
    assert verify_shards(spark, path)
    assert spark.read.parquet(path).count() == man3["total_rows"] == d.count()


def test_read_shard_order_is_total_under_split_reads(spark, tmp_path):
    """read_shard must return ONE partition in a true total order even when
    the shard file is larger than spark.sql.files.maxPartitionBytes (the
    default 128 MB splits a 0.5–2 GB shard into several input splits; a
    bare sortWithinPartitions would interleave independently-sorted
    blocks). The coalesce(1) inside read_shard makes the local sort a
    global order for every epoch."""
    _, path, _ = _write(spark, tmp_path)
    man = read_manifest(path)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
        for epoch in (0, 1):
            df = read_shard(spark, path, 0, epoch=epoch)
            assert df.rdd.getNumPartitions() == 1
            got = [r.doc_id for r in df.select("doc_id").collect()]
            exp = [
                r.doc_id
                for r in spark.read.parquet(f"{path}/shard=0")
                .orderBy(epoch_sort_key(man["id_col"], epoch), F.col(man["id_col"]))
                .collect()
            ]
            assert got == exp, f"epoch {epoch} order not total"
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_read_shard_of_emptied_shard_returns_empty_frame(spark, tmp_path):
    """After a rewrite empties a shard, its shard=K directory is cleaned
    up but the manifest still lists it with n_rows=0; read_shard must
    return an EMPTY frame with the dataset schema (matching a non-empty
    shard's columns exactly) instead of raising path-not-found, so a
    loader iterating range(n_shards) from the manifest never crashes."""
    d = table(spark, SF, "documents")
    path = str(tmp_path / "re")
    write_training_shards(d, path, N)
    man = write_training_shards(d.limit(1), path, N)
    empties = [int(k) for k, v in man["shards"].items() if v["n_rows"] == 0]
    fulls = [int(k) for k, v in man["shards"].items() if v["n_rows"] > 0]
    assert empties and fulls
    got = read_shard(spark, path, empties[0])
    assert got.count() == 0
    assert got.columns == read_shard(spark, path, fulls[0]).columns


def test_read_shard_when_every_shard_is_empty(spark, tmp_path):
    """A rewrite with an empty corpus leaves NO parquet file anywhere —
    the root read has nothing to infer a schema from. read_shard must
    rebuild the empty frame from the schema the manifest recorded at
    write time (same columns as a populated shard), and verify_shards
    must agree with the all-zero manifest instead of crashing."""
    d = table(spark, SF, "documents")
    path = str(tmp_path / "empty_all")
    write_training_shards(d, path, N)
    cols = read_shard(spark, path, 0).columns
    man = write_training_shards(d.limit(0), path, N)
    assert man["total_rows"] == 0
    for k in range(N):
        got = read_shard(spark, path, k, epoch=1)  # epoch sort must not crash
        assert got.count() == 0
        assert got.columns == cols
    assert verify_shards(spark, path)


def test_read_shard_stale_manifest_returns_epoch_order(spark, tmp_path):
    """Crash window write_training_shards documents: partitions swapped,
    manifest not yet rewritten. A shard the STALE manifest calls empty
    but that actually holds rows must still come back in the documented
    deterministic permutation (the empty branch applies the same epoch
    sort), so a loader that missed the verify_shards check never sees an
    undefined order."""
    import json as _json
    from pathlib import Path as _P

    from dataworks_audit_data_ingest_spark.sinks.shards import MANIFEST_NAME

    d = table(spark, SF, "documents")
    path = str(tmp_path / "stale")
    write_training_shards(d, path, N)
    for epoch in (0, 2):
        want = [r.doc_id for r in read_shard(spark, path, 1, epoch=epoch).collect()]
        # simulate the stale window: manifest says shard 1 is empty
        mp = _P(path, MANIFEST_NAME)
        man = _json.loads(mp.read_text())
        true_entry = man["shards"]["1"]
        man["shards"]["1"] = {"n_rows": 0, "checksum": 0}
        mp.write_text(_json.dumps(man))
        try:
            got = [r.doc_id for r in read_shard(spark, path, 1, epoch=epoch).collect()]
            assert got == want and len(got) == true_entry["n_rows"] > 0
            assert not verify_shards(spark, path)  # staleness is loud
        finally:
            man["shards"]["1"] = true_entry
            mp.write_text(_json.dumps(man))


def test_rendezvous_minimal_disruption_and_determinism(spark):
    """HRW's defining property: growing the shard count by one moves
    ONLY the documents the new shard wins (~1/(n+1) of the corpus);
    every other assignment is unchanged. Modulo placement moves almost
    everything under the same change — pinned side by side. Plus
    determinism across partitionings."""
    from dataworks_audit_data_ingest_spark.sinks.shards import (
        rendezvous_shard,
    )
    from dataworks_audit_data_ingest_spark.tables import table

    d = table(spark, "/root/testdata/sf0.001", "documents").select("doc_id")
    n = 8
    a = {
        r.doc_id: r.s8
        for r in d.withColumn("s8", rendezvous_shard("doc_id", n)).collect()
    }
    b = {
        r.doc_id: r.s9
        for r in d.withColumn(
            "s9", rendezvous_shard("doc_id", n + 1)
        ).collect()
    }
    moved = {k for k in a if a[k] != b[k]}
    # everything that moved went TO the new shard — nothing reshuffled
    # among the old shards
    assert moved and all(b[k] == n for k in moved)
    # and the move is ~1/(n+1): generous band, deterministic fixture
    frac = len(moved) / len(a)
    assert 0.03 < frac < 0.30, frac
    # modulo placement under the same change moves the majority
    from dataworks_audit_data_ingest_spark.sinks.shards import (
        shard_assignment,
    )

    m8 = {r.doc_id: r.shard for r in shard_assignment(d, "doc_id", n).collect()}
    m9 = {
        r.doc_id: r.shard
        for r in shard_assignment(d, "doc_id", n + 1).collect()
    }
    assert sum(1 for k in m8 if m8[k] != m9[k]) / len(m8) > 0.5

    # partition-layout independence
    c = {
        r.doc_id: r.s8
        for r in d.repartition(13)
        .withColumn("s8", rendezvous_shard("doc_id", n))
        .collect()
    }
    assert c == a
    # all shards in range and non-empty on the fixture
    assert set(a.values()) == set(range(n))
