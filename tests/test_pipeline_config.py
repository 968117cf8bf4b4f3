"""Declarative pipeline config (`text/config.py`): recipe == hand
composition, build-time validation, JSON round-trip, audit counts."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.tables import table
from dataworks_audit_data_ingest_spark.text import (
    annotate_quality,
    build_pipeline,
    cap_per_source,
    redact_pii,
    run_pipeline,
)

SF = "/root/testdata/sf0.001"

RECIPE = [
    {"stage": "redact_pii"},
    {"stage": "quality_filter"},
    {"stage": "cap_per_source", "max_docs": 20},
]


def test_recipe_matches_hand_composition(spark):
    d = table(spark, SF, "documents")
    got = run_pipeline(d, RECIPE)
    want = cap_per_source(
        annotate_quality(redact_pii(d)).filter(
            F.col("quality_verdict") == "keep"
        ),
        max_docs=20,
    )
    assert sorted(r.doc_id for r in got.collect()) == sorted(
        r.doc_id for r in want.collect()
    )


def test_unknown_stage_fails_at_build_time(spark):
    with pytest.raises(ValueError, match="unknown stage 'dedupe'"):
        build_pipeline([{"stage": "dedupe"}])


def test_unknown_param_fails_at_build_time(spark):
    with pytest.raises(ValueError, match="unknown parameters \\['max_doc'\\]"):
        build_pipeline([{"stage": "cap_per_source", "max_doc": 10}])


def test_missing_stage_key_fails(spark):
    with pytest.raises(ValueError, match="missing 'stage' key"):
        build_pipeline([{"max_docs": 5}])


def test_json_file_recipe_and_audit(spark, tmp_path):
    d = table(spark, SF, "documents")
    path = tmp_path / "recipe.json"
    path.write_text(json.dumps(RECIPE))
    out, audit = run_pipeline(d, path, audit=True)
    assert [a["stage"] for a in audit] == [e["stage"] for e in RECIPE]
    assert audit[0]["rows_in"] == d.count()
    assert audit[-1]["rows_out"] == out.count()
    # counts chain: each stage's rows_in is the previous rows_out
    for prev, cur in zip(audit, audit[1:]):
        assert cur["rows_in"] == prev["rows_out"]
    # filters only remove
    assert all(a["rows_out"] <= a["rows_in"] for a in audit)


def test_temperature_resample_stage(spark):
    d = table(spark, SF, "documents")
    out = run_pipeline(
        d, [{"stage": "temperature_resample", "total": 80, "temperature": 0.5}]
    )
    assert out.count() <= 80
    assert out.count() > 0


def test_drop_contained_duplicates_stage(spark):
    """The containment-dedup stage is recipe-addressable and matches the
    direct call, including parameter passthrough."""
    from dataworks_audit_data_ingest_spark.text.pipeline import (
        drop_contained_duplicates,
    )

    d = table(spark, SF, "documents").limit(100)
    fn = build_pipeline(
        [{"stage": "drop_contained_duplicates", "threshold_milli": 700}]
    )
    got = sorted(r.doc_id for r in fn(d).select("doc_id").collect())
    want = sorted(
        r.doc_id
        for r in drop_contained_duplicates(d, threshold_milli=700)
        .select("doc_id")
        .collect()
    )
    assert got == want and len(got) <= 100
