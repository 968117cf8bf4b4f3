"""Incremental boilerplate df store: additivity, prospective threshold
crossing, replay idempotency, compaction (incl. the crash window)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.incremental.store import (
    compact_store,
)
from dataworks_audit_data_ingest_spark.text.incremental_boilerplate import (
    line_df_batch,
    read_line_df,
    strip_boilerplate_batch,
)

BP = "subscribe to our newsletter"
MIN_DOCS = 20


def _batch(spark, batch_no, n_with_bp=8, n_plain=4):
    """n_with_bp docs carrying the boilerplate line + n_plain without;
    doc ids are globally unique across batches, bodies are unique."""
    rows = []
    base = batch_no * 1000
    for i in range(n_with_bp):
        rows.append(
            (base + i, f"unique body {base + i} alpha\n{BP}\ntail {base + i}")
        )
    for i in range(n_plain):
        rows.append((base + 100 + i, f"plain body {base + 100 + i} beta"))
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_df_store_is_additive(spark, tmp_path):
    """Three committed batches merge to the same df table as one batch
    holding all the docs."""
    store = str(tmp_path / "bp_store")
    batches = [_batch(spark, b) for b in range(3)]
    for b, df in enumerate(batches):
        strip_boilerplate_batch(spark, store, df, str(b), min_docs=MIN_DOCS)
    merged = {
        r.line_hash: r.df for r in read_line_df(spark, store).collect()
    }
    union = batches[0].unionByName(batches[1]).unionByName(batches[2])
    want = {
        r.line_hash: r.df for r in line_df_batch(union).collect()
    }
    assert merged == want


def test_threshold_crossing_is_prospective(spark, tmp_path):
    """8 bp docs per batch, threshold 20: batches 0 and 1 keep the line
    (df 8, then 16), batch 2 strips it (24) — evidence accumulates, and
    classification fires from the crossing batch onward."""
    store = str(tmp_path / "bp_store")
    kept_bp = []
    for b in range(3):
        cleaned = strip_boilerplate_batch(
            spark, store, _batch(spark, b), str(b), min_docs=MIN_DOCS
        )
        kept_bp.append(
            cleaned.filter(F.col("text").contains(BP)).count()
        )
    assert kept_bp == [8, 8, 0]


def test_saturating_batch_fires_immediately(spark, tmp_path):
    """A batch whose OWN df crosses the threshold strips in that same
    batch — classification sees the in-flight contribution too."""
    store = str(tmp_path / "bp_store")
    big = _batch(spark, 0, n_with_bp=MIN_DOCS, n_plain=2)
    cleaned = strip_boilerplate_batch(
        spark, store, big, "0", min_docs=MIN_DOCS
    )
    assert cleaned.filter(F.col("text").contains(BP)).count() == 0
    # bodies survive: every bp doc keeps its two non-template lines
    survivors = cleaned.filter("doc_id < 100")
    assert survivors.count() == MIN_DOCS
    assert survivors.filter(
        ~F.col("text").startswith("unique body")
    ).count() == 0


def test_replay_is_idempotent(spark, tmp_path):
    """Re-running a committed batch (crash-after-commit replay) returns
    the identical cleaned output and leaves the merged df unchanged —
    the store read excludes the batch's own partition."""
    store = str(tmp_path / "bp_store")
    for b in range(2):
        strip_boilerplate_batch(
            spark, store, _batch(spark, b), str(b), min_docs=MIN_DOCS
        )
    before = {
        r.line_hash: r.df for r in read_line_df(spark, store).collect()
    }
    replay = strip_boilerplate_batch(
        spark, store, _batch(spark, 1), "1", min_docs=MIN_DOCS
    )
    after = {
        r.line_hash: r.df for r in read_line_df(spark, store).collect()
    }
    assert after == before
    assert replay.filter(F.col("text").contains(BP)).count() == 8


def test_compaction_preserves_df_and_survives_crash_window(spark, tmp_path):
    """compact_store folds the df partitions without changing the merged
    table; a crash BETWEEN compaction's write and delete steps (folded
    rows AND originals both present) still reads exactly once thanks to
    the (src_batch, line_hash) row identity."""
    store = str(tmp_path / "bp_store")
    for b in range(3):
        strip_boilerplate_batch(
            spark, store, _batch(spark, b), str(b), min_docs=MIN_DOCS
        )
    before = {
        r.line_hash: r.df for r in read_line_df(spark, store).collect()
    }

    # simulate the crash window: write the folded partition by hand,
    # leave the originals in place
    whole = spark.read.parquet(store).drop("batch_id")
    (
        whole.withColumn("batch_id", F.lit("__compacted__"))
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(store)
    )
    crashed = {
        r.line_hash: r.df for r in read_line_df(spark, store).collect()
    }
    assert crashed == before

    # real compaction from the crashed state converges too
    removed = compact_store(spark, store)
    assert removed >= 3
    after = {
        r.line_hash: r.df for r in read_line_df(spark, store).collect()
    }
    assert after == before

    # and the next batch keeps accumulating on top of the folded state
    cleaned = strip_boilerplate_batch(
        spark, store, _batch(spark, 3), "3", min_docs=MIN_DOCS
    )
    assert cleaned.filter(F.col("text").contains(BP)).count() == 0


def test_columns_pass_through_and_empty_docs_drop(spark, tmp_path):
    """Non-text columns survive; a doc that is ONLY boilerplate is
    dropped once the line crosses the threshold."""
    store = str(tmp_path / "bp_store")
    rows = [(i, BP, "src%d" % (i % 3)) for i in range(MIN_DOCS)] + [
        (100, "real content here", "src0")
    ]
    batch = spark.createDataFrame(
        rows, "doc_id bigint, text string, source string"
    )
    cleaned = strip_boilerplate_batch(
        spark, store, batch, "0", min_docs=MIN_DOCS
    )
    got = cleaned.collect()
    assert [r.doc_id for r in got] == [100]
    assert got[0].source == "src0"


def test_recurate_history_cleans_earlier_batches(spark, tmp_path):
    """The retroactive half: after the template crosses the threshold at
    batch 2, recuration strips it from batches 0 and 1 too; the df store
    (the evidence) is untouched; a second pass changes nothing."""
    from dataworks_audit_data_ingest_spark.incremental.store import (
        commit_batch_partition,
    )
    from dataworks_audit_data_ingest_spark.text.incremental_boilerplate import (
        recurate_history,
    )

    store = str(tmp_path / "bp_store")
    out = str(tmp_path / "cleaned")
    for b in range(3):
        cleaned = strip_boilerplate_batch(
            spark, store, _batch(spark, b), str(b), min_docs=MIN_DOCS
        )
        commit_batch_partition(cleaned, out, str(b))

    history = spark.read.parquet(out)
    n_history = history.count()
    assert history.filter(F.col("text").contains(BP)).count() == 16  # b0+b1

    df_before = {
        r.line_hash: r.df for r in read_line_df(spark, store).collect()
    }
    changed = recurate_history(spark, out, store, min_docs=MIN_DOCS)
    assert changed == 16

    after = spark.read.parquet(out)
    assert after.filter(F.col("text").contains(BP)).count() == 0
    # bodies survive — nothing was dropped, only the template line left
    assert after.count() == n_history
    df_after = {
        r.line_hash: r.df for r in read_line_df(spark, store).collect()
    }
    assert df_after == df_before

    # idempotent: the second pass rewrites nothing
    assert recurate_history(spark, out, store, min_docs=MIN_DOCS) == 0


def test_recurate_history_drops_docs_left_empty(spark, tmp_path):
    """A committed doc that was ONLY boilerplate disappears from history
    on recuration (counted as changed), and an empty store is a no-op."""
    from dataworks_audit_data_ingest_spark.incremental.store import (
        commit_batch_partition,
    )
    from dataworks_audit_data_ingest_spark.text.incremental_boilerplate import (
        recurate_history,
    )

    store = str(tmp_path / "bp_store")
    out = str(tmp_path / "cleaned")
    assert recurate_history(spark, str(tmp_path / "absent_out"), store) == 0

    # batch 0: 10 docs that are ONLY the template + 2 plain — below the
    # threshold, everything is kept verbatim
    rows = [(i, BP) for i in range(10)] + [(100, "real content")]
    b0 = spark.createDataFrame(rows, "doc_id bigint, text string")
    cleaned = strip_boilerplate_batch(spark, store, b0, "0", min_docs=MIN_DOCS)
    commit_batch_partition(cleaned, out, "0")
    assert spark.read.parquet(out).count() == 11

    # batch 1 saturates the template past the threshold
    b1 = spark.createDataFrame(
        [(200 + i, f"body {i}\n{BP}") for i in range(MIN_DOCS)],
        "doc_id bigint, text string",
    )
    cleaned = strip_boilerplate_batch(spark, store, b1, "1", min_docs=MIN_DOCS)
    commit_batch_partition(cleaned, out, "1")

    changed = recurate_history(spark, out, store, min_docs=MIN_DOCS)
    assert changed == 10  # the template-only docs vanish from history
    after = spark.read.parquet(out)
    assert after.filter("doc_id < 100").count() == 0
    assert after.filter("doc_id = 100").count() == 1
