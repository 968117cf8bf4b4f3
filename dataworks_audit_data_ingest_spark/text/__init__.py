"""Composable text-curation pipeline API."""

from .pipeline import (  # noqa: F401
    annotate_quality,
    drop_contaminated,
    drop_near_duplicates,
    mix_sources,
    redact_pii,
    token_budget_sample,
)
