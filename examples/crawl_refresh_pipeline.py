"""A multi-day crawl refresh in one runnable file — the maintenance loop a
100 TB corpus actually lives in:

  1. **Incremental boilerplate removal** — each day's batch runs through
     `text.incremental_boilerplate.strip_boilerplate_batch`: line
     document-frequency accumulates in a persistent additive store, so a
     site template that no single day could convict crosses the
     threshold mid-history and is stripped from that day FORWARD (day 1
     keeps it, later days don't — prospective classification).
  2. **Incremental near-dup dedup** — the cleaned batch dedups against
     everything already ingested via the MinHash-LSH signature store
     (`text.incremental_dedup`), never re-reading historical text; a
     re-crawled page (same content, new doc id) is caught cross-batch.
  3. **Scheduled store maintenance, composed in its safe order** — both
     stores compact first (`incremental.store.compact_store`: O(1)
     partition count for the long-lived job, latest replayable batch
     excluded), THEN the committed archive is re-cleaned against the
     now-compacted df store (`recurate_history`: day 1 shipped with the
     template because the evidence was still thin — the archive
     converges). Recurating after the fold is sound because compaction
     preserves the merged df exactly; the streaming twin of this
     composition (`streaming.boilerplate_job.maintain_boilerplate_store`,
     exclude derived from the checkpoint) is drill-tested against an
     uncompacted control byte-for-byte.
  4. **Leakage-safe split + shards** — the accumulated unique corpus is
     split train/eval by CLUSTER-inherited hash (near-dup pairs from the
     dedup rounds → connected components → hash the cluster id), so no
     near-dup pair straddles the boundary (q192's remedy, executed on
     pipeline state instead of recomputed pairs); the train split lands
     as manifest-verified training shards.

Every step is the at-scale shape: boilerplate travels as 8-byte line
hashes, dedup state is bands (not text), the split decision is map-side
hash arithmetic, and the shard write is the single intentional global
shuffle.

Run:  python examples/crawl_refresh_pipeline.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.incremental.cc import (
    read_cc_labels,
    update_cc_store,
)
from dataworks_audit_data_ingest_spark.incremental.store import (
    commit_batch_partition,
    compact_store,
)
from dataworks_audit_data_ingest_spark.sinks import (
    verify_shards,
    write_training_shards,
)
from dataworks_audit_data_ingest_spark.tables import table
from dataworks_audit_data_ingest_spark.text.incremental_boilerplate import (
    recurate_history,
    strip_boilerplate_batch,
)
from dataworks_audit_data_ingest_spark.text.pipeline import (
    assign_leakage_safe_splits,
)
from dataworks_audit_data_ingest_spark.text.incremental_dedup import (
    incremental_dedup_batch,
)

SF = "/root/testdata/sf0.001"
TEMPLATE = "copyright example site all rights reserved"
BP_MIN_DOCS = 60  # ~42 planted per day: day 1 below, day 2 crosses
N_SHARDS = 4
RECRAWL_OFFSET = 1_000_000


def _days(spark):
    """Three daily batches from the documents fixture; every doc_id % 4
    page carries the site template as a footer line, and day 3 re-crawls
    30 of day 1's pages under fresh ids (truncated tail — a near-dup,
    not an exact dup)."""
    docs = table(spark, SF, "documents").select(
        "doc_id", "text", "source", "n_chars"
    )
    with_footer = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat_ws("\n", F.col("text"), F.lit(TEMPLATE)),
        ).otherwise(F.col("text")),
    )
    days = [
        with_footer.filter(F.col("doc_id") % 3 == d) for d in range(3)
    ]
    recrawl = (
        days[0]
        .filter((F.col("doc_id") < 90) & (F.size(F.split("text", " ")) > 5))
        .select(
            (F.col("doc_id") + RECRAWL_OFFSET).alias("doc_id"),
            F.expr(
                "ARRAY_JOIN(SLICE(SPLIT(text, ' '), 1,"
                " SIZE(SPLIT(text, ' ')) - 5), ' ')"
            ).alias("text"),
            "source",
            "n_chars",
        )
    )
    days[2] = days[2].unionByName(recrawl)
    return days


def run(spark, workdir: str) -> dict:
    audit: dict = {}
    bp_store = f"{workdir}/line_df_store"
    sig_store = f"{workdir}/sig_store"
    cc_store = f"{workdir}/cc_store"

    # ------------------------------------------------------------------
    # 1+2. the daily loop: strip boilerplate, dedup against history
    # ------------------------------------------------------------------
    template_kept, all_pairs, uniques = [], None, None
    for day, batch in enumerate(_days(spark)):
        cleaned = strip_boilerplate_batch(
            spark, bp_store, batch, str(day), min_docs=BP_MIN_DOCS
        )
        template_kept.append(
            cleaned.filter(F.col("text").contains(TEMPLATE)).count()
        )
        unique_docs, dup_pairs = incremental_dedup_batch(
            spark, sig_store, cleaned, str(day)
        )
        unique_docs = unique_docs.localCheckpoint()
        dup_pairs = dup_pairs.localCheckpoint()
        # fold today's pairs into the persisted min-label store — the
        # standing cluster view (merge-only; incremental/cc.py). The
        # in-memory union below exists only for the audit counters and
        # the leak check; the SPLIT no longer needs it.
        update_cc_store(spark, cc_store, dup_pairs, str(day))
        all_pairs = (
            dup_pairs
            if all_pairs is None
            else all_pairs.unionByName(dup_pairs)
        )
        uniques = (
            unique_docs
            if uniques is None
            else uniques.unionByName(unique_docs)
        )
    audit["template_kept_per_day"] = template_kept
    audit["recrawl_dups_caught"] = all_pairs.filter(
        F.col("doc_b") >= RECRAWL_OFFSET
    ).count()
    audit["n_unique"] = uniques.count()

    # ------------------------------------------------------------------
    # 3. scheduled maintenance, composed in its safe order: compact the
    #    stores FIRST (O(1) partition count; the latest committed day
    #    stays excluded — a manually driven job's most recent batch is
    #    the one a crash-restart could replay), THEN recurate history
    #    against the compacted store. Compaction preserves the merged df
    #    exactly, so the recuration outcome is identical either side of
    #    the fold (the streaming drill pins this against an uncompacted
    #    control).
    # ------------------------------------------------------------------
    commit_batch_partition(uniques, f"{workdir}/archive", "all")
    audit["bp_partitions_folded"] = compact_store(
        spark, bp_store, exclude=("2",)
    )
    audit["sig_partitions_folded"] = compact_store(
        spark, sig_store, exclude=("2",)
    )
    audit["recurated_docs"] = recurate_history(
        spark, f"{workdir}/archive", bp_store, min_docs=BP_MIN_DOCS
    )
    archive = spark.read.parquet(f"{workdir}/archive")
    audit["template_in_archive"] = archive.filter(
        F.col("text").contains(TEMPLATE)
    ).count()
    uniques = archive.drop("batch_id")

    # ------------------------------------------------------------------
    # 4. cluster-inherited split (no near-dup straddles) + train shards
    # ------------------------------------------------------------------
    # split from the MAINTAINED cluster labels (drill-pinned equal to
    # batch CC over every pair surfaced) — no O(diameter) recompute.
    # A corpus with zero near-dup pairs has no label store yet
    # (read_cc_labels -> None): every doc is its own cluster, which the
    # pairs form expresses with the (empty) pair list.
    cc_labels = read_cc_labels(spark, cc_store)
    assign = assign_leakage_safe_splits(
        uniques.select("doc_id", "text", "source", "n_chars"),
        **(
            {"labels": cc_labels}
            if cc_labels is not None
            else {"pairs": all_pairs}
        ),
    ).localCheckpoint()
    sd = {r.split: r.n for r in assign.groupBy("split").agg(F.count("*").alias("n")).collect()}
    audit["n_train"], audit["n_eval"] = sd.get("train", 0), sd.get("eval", 0)
    a = assign.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sa"))
    b = assign.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sb"))
    audit["split_leaked_pairs"] = (
        all_pairs.join(a, "doc_a").join(b, "doc_b").filter("sa != sb").count()
    )

    shard_path = f"{workdir}/train_shards"
    manifest = write_training_shards(
        assign.filter("split = 'train'").select(
            "doc_id", "text", "source", "n_chars"
        ),
        shard_path,
        N_SHARDS,
        id_col="doc_id",
        size_col="n_chars",
    )
    audit["shard_rows"] = manifest["total_rows"]
    audit["shards_verified"] = verify_shards(spark, shard_path)
    return audit


if __name__ == "__main__":
    import tempfile

    from dataworks_audit_data_ingest_spark.session import get_spark

    spark = get_spark("crawl-refresh-pipeline")
    with tempfile.TemporaryDirectory() as d:
        out = run(spark, d)
    for k, v in out.items():
        print(f"{k}: {v}")
