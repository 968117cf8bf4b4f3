"""Skew-aware incremental enrichment join — the standing pipeline path
that consumes a PERSISTED skew report instead of scanning the join key's
histogram per join.

`functions/skew.py` closed the decision loop (histogram → skew_milli →
`maybe_salted_join`), and q124/q173 prove each piece under the oracle —
but a probe per join would re-scan the fact table every run, which is
exactly the cost the persisted-report design exists to avoid. This module
is that design as executed code, on the reference's own cadence
(`audit_data_ingest.py:49-68`: watermark → process new days → commit):

- **Decision**: each run loads one number (`load_skew_milli`) from the
  standing report the PREVIOUS run wrote and passes it to
  `maybe_salted_join` — zero histogram scans in the join plan, pinned by
  test (the probe function is monkeypatched to raise and the job still
  runs).
- **Maintenance**: after the day commits, the run refreshes the report
  from the day it just processed — one `key_skew_report` aggregation
  over data the run already read, amortized into the cadence. The
  refresh is crash-safe (write-staged-then-swap): a crash mid-swap
  leaves either the old report or a LOUD missing-report error on the
  next run, never a silently stale-but-plausible number.
- **Bootstrap**: the first run has no report; it probes the first
  pending day once (documented one-time scan) and persists the result
  before joining, so run 1 already decides from a persisted number.

At 100 TB: the fact side arrives day-partitioned; the report is five
numbers per (table, key). Skew drifts on the ingest cadence (a hot
customer, a bot key), and this job's refresh tracks it at the same
cadence — the day-N decision uses day-(N-1)'s histogram, which is the
freshest information available without paying a probe before the join.
"""

from __future__ import annotations

import logging
import os
import shutil
from collections.abc import Callable
from dataclasses import dataclass
from datetime import date

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.skew import key_skew_report, load_skew_milli, maybe_salted_join
from ..ingest.watermark import find_start_date, update_progress_file
from ..session import tune

logger = logging.getLogger(__name__)


@dataclass
class EnrichmentJoinJob:
    source_path: str  # day-partitionable parquet fact input
    ts_col: str  # event-time column used to derive `day`
    dim_path: str  # parquet dimension input (the enrich side)
    key: str  # equi-join key present on both sides
    output_path: str  # day-partitioned parquet output
    progress_file: str  # watermark store (reference semantics)
    skew_report_path: str  # standing key_skew_report parquet
    salt_buckets: int = 16
    skew_threshold_milli: int = 10_000
    # optional post-join, pre-write transformation (curation, projection)
    transform: Callable[[DataFrame], DataFrame] | None = None


def refresh_skew_report(df: DataFrame, key: str, path: str) -> None:
    """Overwrite the standing report with ``df``'s ``key`` histogram —
    write-staged-then-swap so a reader never sees a half-written report
    and a crash leaves either the previous report intact or a missing
    path that ``load_skew_milli`` refuses loudly (never a silently wrong
    number)."""
    staged = path.rstrip("/") + ".staged"
    aside = path.rstrip("/") + ".old"
    shutil.rmtree(staged, ignore_errors=True)
    key_skew_report(df, key).coalesce(1).write.mode("overwrite").parquet(staged)
    shutil.rmtree(aside, ignore_errors=True)
    if os.path.exists(path):
        os.rename(path, aside)
    os.rename(staged, path)
    shutil.rmtree(aside, ignore_errors=True)


def run_enriched_incremental(
    spark: SparkSession, job: EnrichmentJoinJob
) -> list[date]:
    """Process all days strictly after the watermark, ascending: join each
    day's fact rows to the dimension with the salting decision taken from
    the persisted report, append to the day-partitioned output, commit
    the watermark, then refresh the report from the processed day.

    Returns the committed days. Failure semantics match
    ``runner.run_incremental``: a crash before commit redoes the day
    (dynamic partition overwrite keeps the retry idempotent); a crash
    after commit but before the report refresh leaves the previous
    report standing — one cadence staler, still a valid decision input.
    """
    tune(spark)
    watermark = find_start_date(job.progress_file)
    src = spark.read.parquet(job.source_path).withColumn(
        "day", F.date_trunc("day", F.col(job.ts_col)).cast("date")
    )
    if watermark is not None:
        src = src.filter(F.col("day") > F.lit(watermark))
    days = [r["day"] for r in src.select("day").distinct().orderBy("day").collect()]
    if not days:
        logger.info("enrich: nothing newer than %s", watermark)
        return []

    dim = spark.read.parquet(job.dim_path)
    if not os.path.exists(job.skew_report_path):
        # bootstrap: no standing report yet — probe the FIRST pending day
        # once and persist, so even run 1 joins off a persisted number
        # (and run 2 onward never probes at all)
        logger.info("enrich: bootstrapping skew report at %s", job.skew_report_path)
        refresh_skew_report(
            src.filter(F.col("day") == F.lit(days[0])), job.key, job.skew_report_path
        )

    committed: list[date] = []
    for day in days:
        day_df = src.filter(F.col("day") == F.lit(day))
        milli = load_skew_milli(spark, job.skew_report_path)
        out = maybe_salted_join(
            day_df,
            dim,
            job.key,
            salt_buckets=job.salt_buckets,
            skew_threshold_milli=job.skew_threshold_milli,
            skew_milli=milli,
        )
        if job.transform is not None:
            out = job.transform(out)
        if "day" not in out.columns:
            out = out.withColumn("day", F.lit(day))
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("day")
            .parquet(job.output_path)
        )
        update_progress_file(job.progress_file, day)
        committed.append(day)
        logger.info("enrich: committed %s (skew_milli=%d)", day, milli)
        # refresh AFTER commit: the report is advisory (a decision input),
        # the watermark is the correctness boundary — a crash here costs
        # one cadence of report freshness, never a reprocessed day
        refresh_skew_report(day_df, job.key, job.skew_report_path)
    return committed
