"""Skew-aware incremental enrichment join — the standing pipeline path
that consumes a PERSISTED skew report instead of scanning the join key's
histogram per join.

`functions/skew.py` closed the decision loop (histogram → skew_milli →
`maybe_salted_join`), and q124/q173 prove each piece under the oracle —
but a probe per join would re-scan the fact table every run, which is
exactly the cost the persisted-report design exists to avoid. This module
is that design as executed code, on the reference's own cadence
(`audit_data_ingest.py:49-68`: watermark → process new days → commit),
composed over `runner.run_incremental` so the watermark/commit discipline
lives in exactly one place:

- **Decision**: each day's transform loads one number
  (`load_skew_milli`) from the standing report the PREVIOUS run (or day)
  wrote and passes it to `maybe_salted_join` — zero histogram scans in
  the join plan, pinned by test (the probe function is monkeypatched to
  raise and the job still runs).
- **Maintenance**: the post-commit hook refreshes the report from the
  day just processed — the day's rows are persisted across
  transform+hook, so the refresh rides the same physical scan.
- **Bootstrap**: the first ever day has no report; its transform probes
  that day once (documented one-time scan), persists the result, and
  joins off the persisted number like every later day.

All report filesystem operations go through the Hadoop FS API, so the
report can live on local disk, HDFS, or S3A exactly like the store
(`incremental/store.py`'s discipline).

At 100 TB: the fact side arrives day-partitioned; the report is five
numbers per (table, key). Skew drifts on the ingest cadence (a hot
customer, a bot key), and this job's refresh tracks it at the same
cadence — the day-N decision uses day-(N-1)'s histogram, which is the
freshest information available without paying a probe before the join.
"""

from __future__ import annotations

import logging
from collections.abc import Callable
from dataclasses import dataclass
from datetime import date

from pyspark.sql import DataFrame, SparkSession

from ..functions.skew import key_skew_report, load_skew_milli, maybe_salted_join
from ..session import tune
from .runner import IncrementalJob, run_incremental
from .swap import recover_swapped, staged_overwrite, swapped_exists

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


def report_exists(spark: SparkSession, path: str) -> bool:
    """True when a report directory stands at ``path`` (Hadoop FS, so
    local/HDFS/S3A alike) — the bootstrap predicate shared by the batch
    and streaming rungs."""
    return swapped_exists(spark, path)


def recover_skew_report(spark: SparkSession, path: str) -> bool:
    """Repair the report after a crash inside :func:`refresh_skew_report`'s
    swap window (see `incremental/swap.py` for the protocol); returns
    True when a report stands at ``path`` afterwards. Consuming jobs run
    this before every read."""
    return recover_swapped(spark, path)


def refresh_skew_report(df: DataFrame, key: str, path: str) -> None:
    """Overwrite the standing report with ``df``'s ``key`` histogram via
    the shared write-staged-then-swap protocol (`incremental/swap.py`):
    a reader never sees a half-written report, and a crash inside the
    swap window is repaired by :func:`recover_skew_report` on the next
    run — never a silently wrong number."""
    staged_overwrite(key_skew_report(df, key), path)


def run_enriched_incremental(
    spark: SparkSession, job: EnrichmentJoinJob
) -> list[date]:
    """Process all days strictly after the watermark, ascending: join each
    day's fact rows to the dimension with the salting decision taken from
    the persisted report, append to the day-partitioned output, commit
    the watermark, then refresh the report from the processed day.

    Returns the committed days. Failure semantics are
    ``runner.run_incremental``'s (this IS a run_incremental job): a crash
    before commit redoes the day (dynamic partition overwrite keeps the
    retry idempotent); a crash after commit but before the report refresh
    leaves the previous report standing — one cadence staler, still a
    valid decision input; a crash inside the swap window is repaired by
    :func:`recover_skew_report` on the next run.
    """
    tune(spark)
    recover_skew_report(spark, job.skew_report_path)
    # dim is read lazily on the first pending day: a no-op run (nothing
    # newer than the watermark) must not touch — or require — dim_path
    dim_cache: list[DataFrame] = []
    # transform/hook run strictly paired per day, so one cell suffices to
    # tell the hook "this day's report IS this day's histogram already"
    state = {"bootstrapped": False}

    def transform(day_df: DataFrame) -> DataFrame:
        if not dim_cache:
            dim_cache.append(spark.read.parquet(job.dim_path))
        dim = dim_cache[0]
        # per-day recovery, not just at run start: the PREVIOUS day's
        # post-commit refresh may have crashed inside its swap window
        # (the runner logs and continues by contract) — without this,
        # the next day would misread that state as a fresh deployment
        # and pay a redundant bootstrap probe
        recover_skew_report(spark, job.skew_report_path)
        if not report_exists(spark, job.skew_report_path):
            # bootstrap: no standing report yet — probe THIS day once and
            # persist, so even the first day joins off a persisted number
            # (day_df is persisted by the runner; the probe rides it)
            logger.info(
                "enrich: bootstrapping skew report at %s", job.skew_report_path
            )
            refresh_skew_report(day_df, job.key, job.skew_report_path)
            state["bootstrapped"] = True
        milli = load_skew_milli(spark, job.skew_report_path)
        logger.info("enrich: joining with skew_milli=%d", milli)
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
        return out

    def on_day_committed(day: date, day_df: DataFrame) -> None:
        # refresh AFTER commit: the report is advisory (a decision input),
        # the watermark is the correctness boundary — a crash here costs
        # one cadence of report freshness, never a reprocessed day. The
        # bootstrap day skips it: its report already IS this day's
        # histogram (refreshing again would rewrite it byte-identically)
        if state["bootstrapped"]:
            state["bootstrapped"] = False
            return
        refresh_skew_report(day_df, job.key, job.skew_report_path)

    return run_incremental(
        spark,
        IncrementalJob(
            source_path=job.source_path,
            ts_col=job.ts_col,
            output_path=job.output_path,
            progress_file=job.progress_file,
            transform=transform,
            on_day_committed=on_day_committed,
        ),
    )
