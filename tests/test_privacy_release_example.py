"""Privacy release example: ladder output publishes through the k/l
gate, a raw hand-off is refused, the snapshot survives the refusal."""

from __future__ import annotations

import importlib.util
from pathlib import Path

from pyspark.sql import functions as F

_spec = importlib.util.spec_from_file_location(
    "privacy_release_pipeline",
    Path(__file__).resolve().parent.parent
    / "examples"
    / "privacy_release_pipeline.py",
)
ex = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(ex)

SF = "/root/testdata/sf0.001"


def test_gate_passes_ladder_and_refuses_raw(spark, tmp_path):
    from dataworks_audit_data_ingest_spark.functions.privacy import anonymize
    from dataworks_audit_data_ingest_spark.sinks.snapshots import SnapshotTable

    base = ex.release_view(spark, SF)
    t = SnapshotTable(str(tmp_path / "release"))

    released = anonymize(base, ex.LEVELS, "band", ex.K, ex.L)
    ok, failed = ex.gated_publish(t, released)
    assert ok and not failed
    head = t.current_snapshot_id()
    n = t.read(spark).count()
    assert n > 0

    # every published class re-derives k/l from the released rows alone
    census = ex.class_census(t.read(spark)).collect()
    assert all(r.class_rows >= ex.K and r.class_bands >= ex.L for r in census)

    raw = base.selectExpr(
        "CAST(nation_key AS STRING) AS nation_released",
        "segment AS segment_released",
        "CAST(0 AS INT) AS gen_level",
        "band",
    )
    ok, failed = ex.gated_publish(t, raw)
    assert not ok
    assert {r.expectation for r in failed} >= {"k_anonymity"}
    assert t.current_snapshot_id() == head
    assert t.read(spark).count() == n
