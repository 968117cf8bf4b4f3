"""Composable text-curation pipeline API."""

from .bpe import tokenize_documents, train_bpe, word_frequency_table  # noqa: F401

from .config import STAGES, build_pipeline, run_pipeline  # noqa: F401

from .dsir import (  # noqa: F401
    fit_dsir_model,
    ratio_bits as dsir_ratio_bits,
    score_with_model,
    select_dsir,
)

from .incremental_passages import (  # noqa: F401
    hash_passages,
    incremental_passage_batch,
)

from .incremental_semantic import (  # noqa: F401
    incremental_semantic_batch,
    sign_and_quantize,
)

from .pipeline import (  # noqa: F401
    annotate_compressibility,
    annotate_gopher_rules,
    annotate_quality,
    assign_leakage_safe_splits,
    cap_per_source,
    chunk_passages,
    drop_contained_duplicates,
    drop_contaminated,
    drop_near_duplicates,
    drop_semantic_duplicates,
    interleave_for_training,
    allocate_source_budget,
    mix_sources,
    pack_sequences,
    rank_normalize_scores,
    redact_pii,
    resample_to_allocation,
    strip_boilerplate_lines,
    temperature_allocation,
    token_budget_sample,
)
