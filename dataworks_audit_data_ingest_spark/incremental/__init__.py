"""Incremental batch analytics runner."""

from .runner import IncrementalJob, run_incremental  # noqa: F401
