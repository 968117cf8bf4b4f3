"""Dataset card example: all sections populated from registered queries,
reproducible across builds."""

from __future__ import annotations

import importlib.util
from pathlib import Path

_spec = importlib.util.spec_from_file_location(
    "dataset_card",
    Path(__file__).resolve().parent.parent / "examples" / "dataset_card.py",
)
ex = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(ex)

SF = "/root/testdata/sf0.001"


def test_card_sections_and_reproducibility(spark):
    card = ex.build_card(spark, SF)
    assert card["volume"]["n_documents"] == 500
    assert card["volume"]["n_sources"] == 20
    assert card["duplication"]["cluster_size_census"]
    assert card["quality"]["gopher_drop_rate_ppm"] > 0
    assert len(card["quality"]["filter_agreement_kappa"]) == 3
    for r in card["quality"]["filter_agreement_kappa"]:
        assert -1_000_000 <= r["kappa_ppm"] <= 1_000_000
    assert card["contamination"]["n_flagged"] > 0
    gaps = card["selection_fairness"]["per_source_threshold_gap"]
    assert len(gaps) == 20
    # every number is from a registered deterministic query: a second
    # build of the card is identical
    again = ex.build_card(spark, SF)
    assert again == card
