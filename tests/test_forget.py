"""Key erasure (`sinks/forget.py`): only touched partitions rewritten,
fully-erased partitions disappear, counts audit correctly, idempotent."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.sinks.forget import forget_keys
from dataworks_audit_data_ingest_spark.tables import table

SF = "/root/testdata/sf0.001"


def _store(spark, tmp_path):
    ev = table(spark, SF, "events").select(
        "event_id", "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    )
    path = str(tmp_path / "store")
    ev.write.partitionBy("day").parquet(path)
    return path, ev


def test_forget_removes_exactly_the_keys(spark, tmp_path):
    path, ev = _store(spark, tmp_path)
    victims = ev.select("user_id").distinct().limit(3)
    vset = {r.user_id for r in victims.collect()}
    want_removed = ev.filter(F.col("user_id").isin(vset)).count()
    n_before = ev.count()

    man = forget_keys(spark, path, victims, ("user_id",))
    assert man["total_removed"] == want_removed
    back = spark.read.parquet(path)
    assert back.count() == n_before - want_removed
    assert back.filter(F.col("user_id").isin(vset)).count() == 0
    # untouched rows survive bit-for-bit
    got = sorted(r.event_id for r in back.collect())
    want = sorted(
        r.event_id for r in ev.filter(~F.col("user_id").isin(vset)).collect()
    )
    assert got == want


def test_forget_rewrites_only_touched_partitions(spark, tmp_path):
    path, ev = _store(spark, tmp_path)
    # one victim present on only some days
    victim = ev.select("user_id").first().user_id
    days_hit = {
        str(r.day)
        for r in ev.filter(F.col("user_id") == victim).select("day").distinct().collect()
    }
    mtimes_before = {
        d: os.path.getmtime(d) for d in glob.glob(f"{path}/day=*")
    }
    keys = spark.createDataFrame([(victim,)], "user_id long")
    man = forget_keys(spark, path, keys, ("user_id",))
    assert set(man["partitions"]) == {f"day={d}" for d in days_hit}
    for d, t in mtimes_before.items():
        day_val = os.path.basename(d).split("=", 1)[1]
        if day_val not in days_hit:
            assert os.path.getmtime(d) == t, f"untouched partition {d} changed"


def test_forget_is_idempotent(spark, tmp_path):
    path, ev = _store(spark, tmp_path)
    victims = ev.select("user_id").distinct().limit(2)
    forget_keys(spark, path, victims, ("user_id",))
    snapshot = sorted(map(tuple, spark.read.parquet(path).collect()))
    man2 = forget_keys(spark, path, victims, ("user_id",))
    assert man2["total_removed"] == 0
    assert man2["partitions"] == {}
    assert sorted(map(tuple, spark.read.parquet(path).collect())) == snapshot


def test_forget_removes_fully_erased_partition(spark, tmp_path):
    """Users disjoint by day: erasing day-1's users empties exactly that
    partition — it must disappear, not remain as an empty husk."""
    rows = [
        (d * 100 + i, d * 1000 + i % 5, f"2024-01-0{d}")
        for d in (1, 2, 3)
        for i in range(20)
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, day string")
    path = str(tmp_path / "store2")
    ev.write.partitionBy("day").parquet(path)
    day1_users = (
        ev.filter(F.col("day") == "2024-01-01").select("user_id").distinct()
    )
    man = forget_keys(spark, path, day1_users, ("user_id",))
    assert man["partitions_removed"] == 1
    assert man["partitions_rewritten"] == 0
    assert not os.path.exists(f"{path}/day=2024-01-01")
    back = spark.read.parquet(path)
    assert back.count() == 40
    assert back.filter(F.col("day") == "2024-01-01").count() == 0
