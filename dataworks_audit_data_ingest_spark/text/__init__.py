"""Composable text-curation pipeline API."""

from .pipeline import (  # noqa: F401
    annotate_quality,
    cap_per_source,
    drop_contaminated,
    drop_near_duplicates,
    drop_semantic_duplicates,
    mix_sources,
    pack_sequences,
    redact_pii,
    token_budget_sample,
)
