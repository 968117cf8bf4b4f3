"""Declarative curation pipelines — run the `text/pipeline.py` stages from
a plain config (dict list / JSON file) instead of hand-written composition.

A data-curation run is usually owned by people iterating on RECIPES, not
code: which stages, what thresholds, which order. Encoding the recipe as
data makes runs diffable, reviewable, and replayable:

    recipe = [
        {"stage": "redact_pii"},
        {"stage": "quality_filter"},
        {"stage": "drop_near_duplicates"},
        {"stage": "cap_per_source", "max_docs": 10_000, "prethin": True},
        {"stage": "token_budget_sample", "budget_tokens": 1_000_000},
    ]
    curated = run_pipeline(docs, recipe)

    curated, audit = run_pipeline(docs, recipe, audit=True)
    # audit = [{"stage": ..., "rows_in": n, "rows_out": m}, ...]

Every stage is a named wrapper over the tested pipeline functions; unknown
stages and misspelled parameters fail at BUILD time (before any Spark job),
with the valid vocabulary in the error. ``audit=True`` counts rows around
each stage — two actions per stage, so it is an opt-in debugging mode, not
the production path (which stays one lazy plan end to end).
"""

from __future__ import annotations

import inspect
import json
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import pipeline as P


def _quality_filter(docs: DataFrame, keep_verdict: str = "keep", **kw) -> DataFrame:
    """annotate_quality + keep-filter in one stage (the common pairing)."""
    return P.annotate_quality(docs, **kw).filter(
        F.col("quality_verdict") == keep_verdict
    )


def _temperature_resample(
    docs: DataFrame,
    total: int,
    temperature: float = 0.5,
    id_col: str = "doc_id",
    source_col: str = "source",
    seed: str = "mix",
) -> DataFrame:
    """temperature_allocation + resample_to_allocation as one stage."""
    alloc = P.temperature_allocation(
        docs, total, temperature=temperature, source_col=source_col
    )
    return P.resample_to_allocation(
        docs, alloc, id_col=id_col, source_col=source_col, seed=seed
    )


# stage vocabulary: name -> callable(df, **params) -> df
STAGES: dict[str, Callable[..., DataFrame]] = {
    "redact_pii": P.redact_pii,
    "quality_filter": _quality_filter,
    "annotate_quality": P.annotate_quality,
    "drop_near_duplicates": P.drop_near_duplicates,
    "drop_contained_duplicates": P.drop_contained_duplicates,
    "drop_semantic_duplicates": P.drop_semantic_duplicates,
    "drop_contaminated": P.drop_contaminated,
    "cap_per_source": P.cap_per_source,
    "mix_sources": P.mix_sources,
    "temperature_resample": _temperature_resample,
    "token_budget_sample": P.token_budget_sample,
    "pack_sequences": P.pack_sequences,
}


def build_pipeline(config: list[dict]) -> Callable[[DataFrame], DataFrame]:
    """Validate a recipe and return the composed transformation.

    Fails fast — unknown stage names and parameters the stage function
    does not accept raise here, before any cluster time is spent."""
    stages: list[tuple[str, Callable[[DataFrame], DataFrame]]] = []
    for i, entry in enumerate(config):
        if "stage" not in entry:
            raise ValueError(f"config[{i}]: missing 'stage' key: {entry}")
        name = entry["stage"]
        if name not in STAGES:
            raise ValueError(
                f"config[{i}]: unknown stage {name!r}; valid stages: "
                f"{sorted(STAGES)}"
            )
        fn = STAGES[name]
        params = {k: v for k, v in entry.items() if k != "stage"}
        sig = inspect.signature(fn)
        has_kwargs = any(
            p.kind is inspect.Parameter.VAR_KEYWORD
            for p in sig.parameters.values()
        )
        if not has_kwargs:
            accepted = set(sig.parameters) - {"docs"}
            bad = set(params) - accepted
            if bad:
                raise ValueError(
                    f"config[{i}] ({name}): unknown parameters {sorted(bad)}; "
                    f"accepted: {sorted(accepted)}"
                )
        stages.append((name, lambda df, fn=fn, params=params: fn(df, **params)))

    def run(df: DataFrame) -> DataFrame:
        for _, step in stages:
            df = step(df)
        return df

    run.stages = stages  # type: ignore[attr-defined]
    return run


def run_pipeline(
    docs: DataFrame, config: list[dict] | str | Path, audit: bool = False
):
    """Run a recipe (inline list or a JSON file path). With ``audit=True``
    returns ``(df, audit_rows)`` — per-stage in/out row counts."""
    if isinstance(config, (str, Path)):
        config = json.loads(Path(config).read_text())
    built = build_pipeline(config)
    if not audit:
        return built(docs)
    rows = []
    df = docs
    n = df.count()
    for name, step in built.stages:  # type: ignore[attr-defined]
        df = step(df)
        m = df.count()
        rows.append({"stage": name, "rows_in": n, "rows_out": m})
        n = m
    return df, rows
