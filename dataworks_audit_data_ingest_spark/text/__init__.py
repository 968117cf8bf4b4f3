"""Composable text-curation pipeline API."""

from .pipeline import (  # noqa: F401
    annotate_quality,
    drop_near_duplicates,
    token_budget_sample,
)
