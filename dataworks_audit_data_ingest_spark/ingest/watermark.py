"""High-watermark progress store — the resume protocol of the reference.

Semantics preserved exactly (SURVEY.md §4 quirks 3-4):
- single line ``YYYY-MM-DD`` (`audit_data_ingest.py:71-73`),
- missing file ⇒ ``None`` ⇒ full reprocess with a warning (`:227-230`),
- malformed date ⇒ hard error (`:220-226`),
- resume comparison is strictly greater — the committed day is never
  reprocessed (`:33`).
"""

from __future__ import annotations

import logging
from datetime import date, datetime
from pathlib import Path

logger = logging.getLogger(__name__)

_FMT = "%Y-%m-%d"


def find_start_date(progress_file: str | Path) -> date | None:
    """Read the last committed day; None means process everything
    (`audit_data_ingest.py:213-232`)."""
    path = Path(progress_file)
    try:
        text = path.read_text().strip()
    except OSError:
        logger.warning(
            "progress file %s unreadable; processing all data", progress_file
        )
        return None
    try:
        return datetime.strptime(text, _FMT).date()
    except ValueError as e:
        raise ValueError(
            f"progress file {progress_file} contains invalid date {text!r}"
        ) from e


def update_progress_file(progress_file: str | Path, completed_date: date) -> None:
    """Commit a completed day — called only after the whole day succeeded
    (`audit_data_ingest.py:65-68,71-73`)."""
    path = Path(progress_file)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(completed_date.strftime(_FMT))
