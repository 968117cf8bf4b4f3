"""Training shard writer — the last stage of a curation pipeline: lay the
corpus out as N deterministic, balanced, pseudo-randomly ordered shards
that a data loader can stream per epoch.

Training wants three properties that a plain ``df.write.parquet`` does not
give:

- **Global shuffle, reproducibly.** Examples must arrive in an order
  uncorrelated with the corpus layout (source, crawl date, …), and the
  SAME order on every rerun/backfill. A seeded RNG over rows gives
  neither under re-partitioning; a portable hash of the id gives both:
  ``shard = h(id) mod N``, within-shard order = ``(h(id), id)``.
- **Balanced shards.** The hash spreads ids uniformly, so shard sizes
  concentrate around n/N (binomial); the manifest records exact counts
  so a loader can detect drift.
- **A manifest.** Per-shard row counts, char volume, and an integer
  checksum (sum of id hashes — order-free, overflow-safe in Python) let
  any consumer verify a shard without reading the corpus twice, and make
  shard sets diffable across pipeline versions.

Layout: ``path/shard=K/part-*.parquet`` — one file per shard (each shard
is written by exactly one task), rows pre-sorted in the epoch-0 order.
Later epochs re-order without rewriting: :func:`epoch_shard_order`
permutes the shard list and :func:`epoch_sort_key` re-keys rows within a
shard, both pure hash functions of (seed, epoch).

At 100 TB: one shuffle total (the repartition to shards — unavoidable,
it IS the global shuffle), each task streams one shard to one file;
shard count should target 0.5–2 GB per file. The manifest aggregation
rides the same shuffle's output. The oracle-checked q142 registers the
manifest computation itself.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..functions.hashing import spark_hash32

MANIFEST_NAME = "_shards_manifest.json"


def shard_assignment(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    seed: str = "shards",
) -> DataFrame:
    """Input columns plus ``shard`` (int) and ``shard_ord`` (bigint) — the
    deterministic placement and within-shard order. Pure map-side
    arithmetic; safe to recompute anywhere (no state, no RNG)."""
    h = F.expr(spark_hash32(f"CAST({id_col} AS STRING)", seed))
    return df.withColumn("shard", F.pmod(h, F.lit(n_shards)).cast("int")).withColumn(
        "shard_ord", h
    )


def rendezvous_shard(
    id_col: str, n_shards: int, seed: str = "hrw"
) -> F.Column:
    """Highest-random-weight (rendezvous) shard assignment: the shard
    whose portable hash of ``(shard, id)`` is the maximum, ties to the
    lower shard. Same determinism contract as `shard_assignment`, but
    ELASTIC: growing ``n_shards`` by one moves ONLY the ~1/(n+1) of
    documents the new shard now wins — modulo placement reshuffles
    nearly everything (drill-pinned). That is what makes it the
    re-shardable routing for a standing 100 TB corpus: a capacity change
    triggers a 1/(n+1) move, not a full rewrite.

    Pure map-side per-row arithmetic — n candidate hashes folded to an
    argmax inside one expression, no explode, no shuffle."""
    cand = (
        f"TRANSFORM(SEQUENCE(0, {n_shards - 1}), s -> STRUCT("
        + spark_hash32(
            f"CONCAT(CAST(s AS STRING), '#', CAST({id_col} AS STRING))",
            seed,
        )
        + " AS h, -s AS ns))"
    )
    return F.expr(f"CAST(-ARRAY_MAX({cand}).ns AS INT)")


def epoch_sort_key(id_col: str, epoch: int, seed: str = "shards") -> F.Column:
    """Within-shard order for a later epoch — re-hash with the epoch mixed
    into the seed. Epoch 0 equals the stored file order."""
    if epoch == 0:
        return F.expr(spark_hash32(f"CAST({id_col} AS STRING)", seed))
    return F.expr(
        spark_hash32(f"CAST({id_col} AS STRING)", f"{seed}|epoch{epoch}")
    )


def epoch_shard_order(n_shards: int, epoch: int, seed: str = "shards") -> list[int]:
    """The order a loader should visit shards in epoch ``epoch`` — a
    deterministic permutation keyed by (seed, epoch). Uses the same MD5
    family as the row hashes; epoch 0 is ascending (the write order)."""
    import hashlib

    if epoch == 0:
        return list(range(n_shards))

    def key(s: int) -> tuple[int, int]:
        digest = hashlib.md5(
            f"{seed}|epoch{epoch}|{s}".encode()
        ).hexdigest()[:8]
        return int(digest, 16), s

    return sorted(range(n_shards), key=key)


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    seed: str = "shards",
    size_col: str | None = None,
) -> dict:
    """Write the shard layout and manifest; returns the manifest dict.

    One ``repartition(n_shards, shard)`` — the single, intentional global
    shuffle — then each task sorts its shard by ``(shard_ord, id)`` and
    writes one file under ``shard=K/``. The write stages to a dot-hidden
    sibling and swaps per-shard atomically (writers.py's crash-safe
    machinery): a failure mid-write leaves the PREVIOUS shard set fully
    intact — a training run may be streaming it at that moment. A crash
    in the gap between swap and manifest write leaves new shards with the
    old manifest, which ``verify_shards`` flags loudly (checksums
    mismatch) rather than silently serving. The manifest records
    per-shard ``n_rows``, optional ``total_size`` (sum of ``size_col``),
    and ``checksum`` = exact Python-int sum of the row hashes."""
    import os
    import shutil

    from .writers import _partition_dirs, _stage_dir, _swap_partition_dirs

    assigned = shard_assignment(df, id_col, n_shards, seed)
    # stage + atomic per-shard swap (writers.py's crash-safe machinery):
    # a failure mid-write must never destroy the previous shard set — a
    # training run may be streaming it at that very moment
    staged = _stage_dir(path)
    try:
        (
            # sort leads with the partition column: the dynamic-partition
            # writer requires rows ordered by `shard` and would inject its
            # own (unstable) sort otherwise, clobbering within-shard order
            assigned.repartition(n_shards, "shard")
            .sortWithinPartitions("shard", "shard_ord", id_col)
            .write.mode("overwrite")
            .partitionBy("shard")
            .parquet(staged)
        )
        staged_rels = set(_partition_dirs(staged, 1))
        _swap_partition_dirs(staged, path, 1)
        # a rewrite is a FULL replacement of the shard set: any
        # pre-existing shard=K dir the staged output did not produce
        # (shard emptied by the new data, or a smaller n_shards) would
        # otherwise survive with stale rows — silently wrong until
        # verify_shards runs. Remove them with the same aside-then-delete
        # discipline as forget.py's fully-emptied-partition case.
        for rel in _partition_dirs(path, 1):
            if rel not in staged_rels and rel.startswith("shard="):
                dest = os.path.join(path, rel)
                aside = os.path.join(path, "." + rel + ".old")
                if os.path.exists(aside):
                    shutil.rmtree(aside)
                os.rename(dest, aside)
                shutil.rmtree(aside, ignore_errors=True)
    except BaseException:
        shutil.rmtree(staged, ignore_errors=True)
        raise
    finally:
        shutil.rmtree(staged, ignore_errors=True)
    stats = (
        assigned.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("shard_ord").alias("checksum"),
            *(
                [F.sum(size_col).alias("total_size")]
                if size_col
                else []
            ),
        )
        .collect()
    )
    shards = {
        int(r.shard): {
            "n_rows": int(r.n_rows),
            "checksum": int(r.checksum),
            **({"total_size": int(r.total_size)} if size_col else {}),
        }
        for r in stats
    }
    manifest = {
        "n_shards": n_shards,
        "seed": seed,
        "id_col": id_col,
        "total_rows": sum(s["n_rows"] for s in shards.values()),
        # the dataset schema as the reader sees it (data cols + shard_ord;
        # `shard` is the partition column and never appears in a direct
        # shard=K read) — lets read_shard return a correctly-typed empty
        # frame even when EVERY shard is empty and the root parquet read
        # has no file to infer from
        "schema": assigned.drop("shard").schema.jsonValue(),
        "shards": {str(k): shards.get(k, {"n_rows": 0, "checksum": 0}) for k in range(n_shards)},
    }
    Path(path, MANIFEST_NAME).write_text(json.dumps(manifest, indent=1))
    return manifest


def read_manifest(path: str) -> dict:
    return json.loads(Path(path, MANIFEST_NAME).read_text())


def read_shard(
    spark: SparkSession, path: str, shard: int, epoch: int = 0, seed: str = "shards"
) -> DataFrame:
    """One shard in its epoch order. The read is coalesced to ONE partition
    before the local sort: Spark splits parquet files at
    ``spark.sql.files.maxPartitionBytes`` (128 MB default), so a 0.5–2 GB
    shard reads as several input splits and a bare ``sortWithinPartitions``
    would return independently-sorted blocks interleaved, not the
    documented deterministic permutation (epoch 0 only survived because
    splits preserve file order). ``coalesce(1)`` merges the splits without
    a shuffle — one shard is one loader's sequential stream, so
    single-partition is the consumption shape anyway — and makes the
    within-partition sort a true total order for every epoch.

    A shard the manifest RECORDS as empty (``n_rows == 0`` — e.g. after a
    rewrite that emptied it, where stale-shard cleanup removed its
    ``shard=K`` directory) returns an EMPTY DataFrame with the dataset
    schema instead of raising path-not-found, so a loader iterating
    ``range(n_shards)`` from the manifest never crashes on a gap. The
    schema comes from a root read (partition column dropped — a direct
    ``shard=K`` read never carries it), which matches the non-empty
    branch's column order exactly; if EVERY shard is empty (no parquet
    file anywhere for the root read to infer from) the empty frame is
    rebuilt from the schema the manifest recorded at write time. The
    manifest-empty branch still applies the epoch sort: if the manifest
    is stale (crash between the partition swap and the manifest write)
    and the shard actually holds rows, they come back in the documented
    deterministic permutation — and ``verify_shards`` flags the
    staleness loudly. A shard id the manifest does NOT
    list raises KeyError: that is a caller bug (wrong n_shards, stale
    manifest from another dataset version) and an empty frame there
    would silently truncate the corpus."""
    man = read_manifest(path)
    if str(shard) not in man["shards"]:
        raise KeyError(
            f"shard {shard} not in manifest ({len(man['shards'])} shards "
            f"recorded at {path})"
        )
    if man["shards"][str(shard)].get("n_rows", 0) == 0:
        try:
            df = (
                spark.read.parquet(path)
                .filter(F.col("shard") == shard)
                .drop("shard")
                .coalesce(1)
            )
        except AnalysisException:
            # EVERY shard empty ⇒ the root holds no parquet file to infer
            # a schema from ("Unable to infer schema"); rebuild the empty
            # frame from the schema the manifest recorded at write time.
            # Manifests predating the schema field re-raise the original.
            if "schema" not in man:
                raise
            df = spark.createDataFrame(
                [], StructType.fromJson(man["schema"])
            ).coalesce(1)
        # fall through to the SAME epoch sort as the non-empty branch:
        # harmless on a truly empty frame, and if the manifest is stale
        # (crash in write_training_shards' swap→manifest window) the rows
        # actually present still come back in the deterministic
        # permutation instead of undefined order
    else:
        df = spark.read.parquet(f"{path}/shard={shard}").coalesce(1)
    if epoch == 0:
        return df.sortWithinPartitions("shard_ord", man["id_col"])
    return df.sortWithinPartitions(
        epoch_sort_key(man["id_col"], epoch, seed), F.col(man["id_col"])
    )


def verify_shards(spark: SparkSession, path: str) -> bool:
    """Recompute counts + checksums from the files and compare to the
    manifest — the loader-side integrity check."""
    man = read_manifest(path)
    try:
        got = {
            int(r.shard): (int(r.n_rows), int(r.checksum))
            for r in spark.read.parquet(path)
            .groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("shard_ord").alias("checksum"))
            .collect()
        }
    except AnalysisException:
        # no parquet file at all (every shard empty): the files agree
        # with the manifest iff the manifest also records zero rows
        got = {}
    want = {
        int(k): (v["n_rows"], v["checksum"])
        for k, v in man["shards"].items()
        if v["n_rows"]
    }
    return got == want
