"""Streaming HLL register maintenance: micro-batched events land as
register rows, the merged estimate equals a single-pass batch build
(batch boundaries invisible), and replays are idempotent."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.streaming.hll_job import (
    batch_registers,
    hll_microbatch,
    read_distinct_estimates,
    start_hll_stream,
)
from dataworks_audit_data_ingest_spark.tables import table

SF = "/root/testdata/sf0.001"
EVENT_SCHEMA = "user_id long, event_type string, ts timestamp"


def _event_rows(spark):
    return (
        table(spark, SF, "events")
        .select("user_id", "event_type", "ts")
        .collect()
    )


def _write_event_files(src, rows, n_files=3):
    src.mkdir()
    per = (len(rows) + n_files - 1) // n_files
    for i in range(n_files):
        with open(src / f"{i}.json", "w") as f:
            for r in rows[i * per : (i + 1) * per]:
                f.write(
                    json.dumps(
                        {
                            "user_id": r.user_id,
                            "event_type": r.event_type,
                            "ts": r.ts.isoformat(),
                        }
                    )
                    + "\n"
                )


def test_streamed_registers_merge_to_batch_estimate(spark, tmp_path):
    rows = _event_rows(spark)
    _write_event_files(tmp_path / "in", rows)
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .format("json")
        .load(str(tmp_path / "in"))
    )
    q = start_hll_stream(
        stream, str(tmp_path / "store"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(180)
    assert len(q.recentProgress) >= 3

    # merged streamed registers == one-shot registers over all events
    ev = table(spark, SF, "events").select("user_id", "event_type", "ts")
    direct = batch_registers(ev, "CAST(user_id AS STRING)")
    whole = {
        (r.event_type, r.bucket): r.m_j
        for r in direct.groupBy("event_type", "bucket")
        .agg(F.max("m_j").alias("m_j"))
        .collect()
    }
    store = spark.read.parquet(str(tmp_path / "store"))
    merged = {
        (r.event_type, r.bucket): r.m_j
        for r in store.groupBy("event_type", "bucket")
        .agg(F.max("m_j").alias("m_j"))
        .collect()
    }
    assert merged == whole

    # estimates are within the published error bound of exact distinct.
    # At this fixture's cardinality (n < 2.5 m) the raw estimator sits in
    # the documented small-range regime, so apply the linear-counting
    # correction from the stored registers — exactly what the kernel's
    # docstring tells callers the empty-register count is for.
    import math

    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    m = 32
    rsd = 1.04 / (m**0.5)
    zeros = {et: m - sum(1 for (e, _b) in merged if e == et) for et in exact}
    ests = {
        r.event_type: r.est_distinct
        for r in read_distinct_estimates(spark, str(tmp_path / "store")).collect()
    }
    for et, n in exact.items():
        est = ests[et]
        if est < 2.5 * m and zeros[et] > 0:
            est = m * math.log(m / zeros[et])
        assert abs(est - n) / n < 3 * rsd, (et, est, n)


def test_replayed_microbatch_is_idempotent(spark, tmp_path):
    ev = table(spark, SF, "events").select("user_id", "event_type", "ts")
    first = ev.limit(200)
    hll_microbatch(first, 0, str(tmp_path / "store"), "CAST(user_id AS STRING)")
    once = sorted(
        map(tuple, spark.read.parquet(str(tmp_path / "store")).collect())
    )
    hll_microbatch(first, 0, str(tmp_path / "store"), "CAST(user_id AS STRING)")
    twice = sorted(
        map(tuple, spark.read.parquet(str(tmp_path / "store")).collect())
    )
    assert once == twice


def test_day_range_filter_reads_subset(spark, tmp_path):
    ev = table(spark, SF, "events").select("user_id", "event_type", "ts")
    hll_microbatch(ev, 0, str(tmp_path / "store"), "CAST(user_id AS STRING)")
    days = sorted(
        r.day for r in spark.read.parquet(str(tmp_path / "store"))
        .select("day").distinct().collect()
    )
    assert len(days) >= 2  # fixture spans multiple days
    head = read_distinct_estimates(
        spark, str(tmp_path / "store"), where=f"day = '{days[0]}'"
    ).collect()
    assert all(r.est_distinct > 0 for r in head)
    full = read_distinct_estimates(spark, str(tmp_path / "store")).collect()
    # a single day can never estimate above the full period by more than
    # sketch noise on identical registers: day-filtered registers are a
    # subset, so S is larger and the estimate is <=
    one_day = {r.event_type: r.est_distinct for r in head}
    whole = {r.event_type: r.est_distinct for r in full}
    assert all(one_day[k] <= whole[k] for k in one_day)


def test_register_width_mismatch_is_refused(spark, tmp_path):
    """The store records m; reading with a different width raises instead
    of silently applying the wrong alpha/shift."""
    import pytest

    ev = table(spark, SF, "events").select("user_id", "event_type", "ts")
    hll_microbatch(ev, 0, str(tmp_path / "store"), "CAST(user_id AS STRING)", m=32)
    with pytest.raises(ValueError, match="m="):
        read_distinct_estimates(spark, str(tmp_path / "store"), m=16)
