"""Bucketed co-located joins (shuffle-free fact-fact join), streaming
late-data drop semantics, and small-file compaction.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.tables import table

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Both fact tables bucketed+sorted on the join key ⇒ the sort-merge
    join reads co-located buckets with NO Exchange — the recurring-workload
    answer to the orders⋈lineitem shuffle at 100 TB (PERF.md)."""
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    assert warehouse  # native catalog present
    o = table(spark, SF, "orders")
    li = table(spark, SF, "lineitem")
    for df, name, key in ((o, "b_orders", "o_orderkey"), (li, "b_lineitem", "l_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        # a previous crashed run can leave the managed location behind
        import shutil
        from urllib.parse import urlparse

        loc = urlparse(warehouse).path or warehouse
        shutil.rmtree(f"{loc}/{name}", ignore_errors=True)
        (
            df.write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(name)
        )
    # disable auto-broadcast so the fact-fact shape (what exists at 100 TB,
    # where neither side broadcasts) is what gets planned here
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("b_orders")
            .join(
                spark.table("b_lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "SelectedBucketsCount: 8 out of 8" in plan
        # the join itself must not shuffle either side (only the tiny final
        # agg exchanges on o_orderstatus)
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # results still correct
    got = {r.o_orderstatus: r.n for r in joined.collect()}
    want = {
        r.o_orderstatus: r.n
        for r in o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_watermark_drops_late_data(spark, tmp_path):
    """Aggregation state for a window is finalized once the watermark passes
    it; an event arriving after that is dropped, not double-counted."""
    src = tmp_path / "late"
    src.mkdir()

    def write_file(name, rows):
        with open(src / name, "w") as f:
            for eid, ts, uid in rows:
                f.write(
                    json.dumps(
                        {
                            "event_id": eid,
                            "ts": ts,
                            "user_id": uid,
                            "event_type": "click",
                            "value": 1.0,
                            "props": "{}",
                        }
                    )
                    + "\n"
                )

    # batch 1: events in hour 00 and hour 05 → watermark advances to 04:50
    write_file("b1.json", [(1, "2024-01-01 00:10:00", 1), (2, "2024-01-01 05:00:00", 1)])
    from dataworks_audit_data_ingest_spark.streaming import stream_events_json

    stream = stream_events_json(spark, str(src), max_files_per_trigger=1)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def drain():
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    # batch 2 (new run, same checkpoint): one punctual event + one VERY late
    # event for the already-finalized hour-00 window
    write_file(
        "b2.json", [(3, "2024-01-01 05:30:00", 1), (4, "2024-01-01 00:20:00", 1)]
    )
    drain()
    rows = {}
    for r in spark.read.parquet(out).collect():
        rows[r.ws.isoformat()] = rows.get(r.ws.isoformat(), 0) + r.n
    # hour-00 window was finalized in run 1 with count 1: event 4 was dropped,
    # never re-emitted or double-counted
    assert rows.get("2024-01-01T00:00:00") == 1


def test_compaction_reduces_files(spark, tmp_path):
    from dataworks_audit_data_ingest_spark.sinks.writers import (
        compact_parquet_partition,
    )

    out = str(tmp_path / "frag")
    ev = table(spark, SF, "events")
    ev.repartition(16).write.parquet(out)
    import glob

    before = len(glob.glob(out + "/*.parquet"))
    n = compact_parquet_partition(spark, out, target_files=2)
    after = len(glob.glob(out + "/*.parquet"))
    assert n == ev.count()
    assert before >= 16 and after <= 2
    assert spark.read.parquet(out).count() == n


def test_compaction_partition_filter_preserves_other_partitions(spark, tmp_path):
    """Compacting ONE day= partition must leave every other partition's
    files byte-untouched and keep the Hive layout (round-2 ADVICE: the old
    path rewrote the whole location with only the filtered rows)."""
    import glob
    import os

    from dataworks_audit_data_ingest_spark.sinks.writers import (
        compact_parquet_partition,
    )

    out = str(tmp_path / "hive")
    ev = table(spark, SF, "events").withColumn("day", F.to_date("ts"))
    ev.repartition(8).write.partitionBy("day").parquet(out)

    days = sorted(d for d in os.listdir(out) if d.startswith("day="))
    assert len(days) >= 2
    target, others = days[0], days[1:]
    total_before = spark.read.parquet(out).count()
    target_rows = spark.read.parquet(out).filter(
        f"day = '{target.split('=')[1]}'"
    ).count()
    other_files_before = {
        d: sorted(
            (p, os.path.getmtime(p))
            for p in glob.glob(os.path.join(out, d, "*.parquet"))
        )
        for d in others
    }
    before_files = len(glob.glob(os.path.join(out, target, "*.parquet")))

    n = compact_parquet_partition(
        spark,
        out,
        target_files=1,
        partition_filter=f"day = '{target.split('=')[1]}'",
        partition_by=("day",),
    )
    assert n == target_rows

    # target partition compacted, layout intact
    after_files = len(glob.glob(os.path.join(out, target, "*.parquet")))
    assert after_files <= before_files and after_files >= 1
    # other partitions byte-untouched (same file names + mtimes)
    for d in others:
        now = sorted(
            (p, os.path.getmtime(p))
            for p in glob.glob(os.path.join(out, d, "*.parquet"))
        )
        assert now == other_files_before[d], f"partition {d} was disturbed"
    # no rows lost anywhere
    assert spark.read.parquet(out).count() == total_before


def test_compaction_requires_partition_by_with_filter(spark, tmp_path):
    from dataworks_audit_data_ingest_spark.sinks.writers import (
        compact_parquet_partition,
    )

    with pytest.raises(ValueError):
        compact_parquet_partition(spark, str(tmp_path), partition_filter="day = '2024-01-01'")


def test_merge_upsert_rewrites_only_touched_partitions(spark, tmp_path):
    """CDC-style merge: updated keys replaced, new keys inserted, and only
    the partitions named by the updates are rewritten."""
    import glob
    import os

    from dataworks_audit_data_ingest_spark.sinks.writers import (
        merge_upsert_partitioned,
    )

    out = str(tmp_path / "ds")
    base = spark.createDataFrame(
        [
            (1, "2024-01-01", "a"),
            (2, "2024-01-01", "b"),
            (3, "2024-01-02", "c"),
            (4, "2024-01-03", "d"),
        ],
        "id long, day string, val string",
    )
    base.write.partitionBy("day").parquet(out)
    untouched_before = sorted(
        (p, os.path.getmtime(p))
        for p in glob.glob(os.path.join(out, "day=2024-01-03", "*.parquet"))
    )

    updates = spark.createDataFrame(
        [
            (2, "2024-01-01", "B2"),  # replaces existing key
            (9, "2024-01-02", "new"),  # inserts new key
        ],
        "id long, day string, val string",
    )
    n = merge_upsert_partitioned(
        spark, out, updates, key_cols=("id",), partition_by=("day",)
    )
    assert n == 4  # 2 rows in each touched partition after merge

    # Hive partition inference types day= back as DATE; compare as strings
    got = {
        (r.id, str(r.day)): r.val for r in spark.read.parquet(out).collect()
    }
    assert got == {
        (1, "2024-01-01"): "a",
        (2, "2024-01-01"): "B2",
        (3, "2024-01-02"): "c",
        (9, "2024-01-02"): "new",
        (4, "2024-01-03"): "d",
    }
    untouched_after = sorted(
        (p, os.path.getmtime(p))
        for p in glob.glob(os.path.join(out, "day=2024-01-03", "*.parquet"))
    )
    assert untouched_after == untouched_before


def test_merge_upsert_order_col_picks_latest(spark, tmp_path):
    from dataworks_audit_data_ingest_spark.sinks.writers import (
        merge_upsert_partitioned,
    )

    out = str(tmp_path / "ds2")
    spark.createDataFrame(
        [(1, "2024-01-01", "old", 1)], "id long, day string, val string, v long"
    ).write.partitionBy("day").parquet(out)
    updates = spark.createDataFrame(
        [(1, "2024-01-01", "mid", 5), (1, "2024-01-01", "latest", 9)],
        "id long, day string, val string, v long",
    )
    merge_upsert_partitioned(
        spark, out, updates, key_cols=("id",), partition_by=("day",), order_col="v"
    )
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1 and rows[0].val == "latest"


def test_compaction_swap_failure_preserves_original_partition(
    spark, tmp_path, monkeypatch
):
    """Crash-safety: if the staged->dest rename fails mid-swap, the original
    partition data must survive (restored from the aside dir) — the old
    copy is never deleted before its replacement is in place."""
    import os


    from dataworks_audit_data_ingest_spark.sinks.writers import (
        compact_parquet_partition,
    )

    out = str(tmp_path / "ds")
    df = spark.createDataFrame(
        [(i, "2024-01-0%d" % (1 + i % 2), "v%d" % i) for i in range(20)],
        "id INT, day STRING, val STRING",
    )
    df.repartition(4).write.partitionBy("day").parquet(out)
    before = {(r.id, r.day, r.val) for r in spark.read.parquet(out).collect()}

    real_rename = os.rename

    def failing_rename(src, dst):
        # fail exactly the staged->dest swap of a partition dir
        if "day=" in os.path.basename(dst) and ".staged_" in src:
            raise OSError("simulated crash during swap")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", failing_rename)
    try:
        compact_parquet_partition(
            spark,
            out,
            partition_filter="day = '2024-01-01'",
            partition_by=("day",),
        )
        raised = False
    except OSError:
        raised = True
    monkeypatch.undo()
    assert raised
    after = {(r.id, r.day, r.val) for r in spark.read.parquet(out).collect()}
    assert after == before  # nothing lost, nothing half-written


def test_compaction_leaves_no_hidden_residue(spark, tmp_path):
    """A successful partition-scoped compaction cleans up its staging and
    aside dirs — only real data entries remain in the dataset root."""
    import os

    from dataworks_audit_data_ingest_spark.sinks.writers import (
        compact_parquet_partition,
    )

    out = str(tmp_path / "ds2")
    df = spark.createDataFrame(
        [(i, "2024-01-0%d" % (1 + i % 3)) for i in range(30)],
        "id INT, day STRING",
    )
    df.repartition(6).write.partitionBy("day").parquet(out)
    compact_parquet_partition(
        spark, out, partition_filter="day = '2024-01-02'", partition_by=("day",)
    )
    hidden = [n for n in os.listdir(out) if n.startswith(".staged_")]
    assert hidden == []
    assert spark.read.parquet(out).count() == 30


def test_multi_partition_swap_failure_rolls_back_all(spark, tmp_path, monkeypatch):
    """A failure on the SECOND partition's swap must roll the first,
    already-swapped partition back to its original data too — no mixed
    old/new dataset, no leaked aside dirs."""
    import os

    from dataworks_audit_data_ingest_spark.sinks.writers import (
        compact_parquet_partition,
    )

    out = str(tmp_path / "ds3")
    df = spark.createDataFrame(
        [(i, "2024-01-0%d" % (1 + i % 2), "v%d" % i) for i in range(20)],
        "id INT, day STRING, val STRING",
    )
    df.repartition(4).write.partitionBy("day").parquet(out)
    before = {(r.id, r.day, r.val) for r in spark.read.parquet(out).collect()}
    files_before = {
        d: sorted(os.listdir(os.path.join(out, d)))
        for d in os.listdir(out)
        if d.startswith("day=")
    }

    real_rename = os.rename
    swaps = {"n": 0}

    def failing_second_swap(src, dst):
        if "day=" in os.path.basename(dst) and ".staged_" in src:
            swaps["n"] += 1
            if swaps["n"] == 2:
                raise OSError("simulated crash on second partition swap")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", failing_second_swap)
    try:
        compact_parquet_partition(spark, out, partition_by=("day",),
                                  partition_filter="day >= '2024-01-01'")
        raised = False
    except OSError:
        raised = True
    monkeypatch.undo()
    assert raised and swaps["n"] == 2  # both partitions attempted
    after = {(r.id, r.day, r.val) for r in spark.read.parquet(out).collect()}
    assert after == before  # full rollback: no mixed old/new state
    files_after = {
        d: sorted(os.listdir(os.path.join(out, d)))
        for d in os.listdir(out)
        if d.startswith("day=")
    }
    assert files_after == files_before  # ORIGINAL files, not a rewrite
    assert [n for n in os.listdir(out) if n.endswith(".old")] == []
