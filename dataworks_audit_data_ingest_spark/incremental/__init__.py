"""Incremental batch analytics runner."""

from .enrich import (  # noqa: F401
    EnrichmentJoinJob,
    recover_skew_report,
    report_exists,
    refresh_skew_report,
    run_enriched_incremental,
)
from .runner import IncrementalJob, run_incremental  # noqa: F401
