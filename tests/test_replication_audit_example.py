"""The replication-audit example as a test: fingerprints localize
exactly the planted divergences (mutation, loss, duplication — in three
different months), the row-level diff explains the mutated month, and
the partition-scoped repair converges the replica. Also drills the
`functions/checksum.py` primitives directly: float rejection and
full-outer divergence shapes."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from examples.replication_audit_pipeline import main as run_example  # noqa: E402
from dataworks_audit_data_ingest_spark.functions.checksum import (  # noqa: E402
    fingerprint_diff,
    table_fingerprint,
)

SF_DIR = "/root/testdata/sf0.001"


def test_example_end_to_end(spark):
    assert run_example(SF_DIR) == 0


def test_float_columns_rejected(spark):
    df = spark.createDataFrame([(1, 1.5)], "k int, v double")
    with pytest.raises(TypeError, match="not engine-portable"):
        table_fingerprint(df, ["k"], ["v"])


def test_diff_shapes_missing_group_and_null_field(spark):
    a = spark.createDataFrame(
        [(1, "x", "p"), (2, "y", None)], "g int, v string, w string"
    )
    b = spark.createDataFrame(
        [(1, "x", "p"), (3, "z", "q")], "g int, v string, w string"
    )
    fa = table_fingerprint(a, ["g"], ["v", "w"])
    fb = table_fingerprint(b, ["g"], ["v", "w"])
    d = {r.g: r for r in fingerprint_diff(fa, fb).collect()}
    # group 1 agrees (including the NULL-field serialization); 2 is
    # a-only, 3 is b-only
    assert set(d) == {2, 3}
    assert d[2].b_rows is None and d[2].a_rows == 1
    assert d[3].a_rows is None and d[3].b_rows == 1
    # NULL serializes as the U+2400 sentinel, so NULL vs empty string IS
    # a detected divergence — and so is NULL moving between fields
    # (CONCAT_WS alone would skip the null, separator included, and
    # collide ('x', NULL) with (NULL, 'x') when values repeat)
    a2 = spark.createDataFrame([(9, "x", None)], "g int, v string, w string")
    b2 = spark.createDataFrame([(9, "x", "")], "g int, v string, w string")
    assert (
        fingerprint_diff(
            table_fingerprint(a2, ["g"], ["v", "w"]),
            table_fingerprint(b2, ["g"], ["v", "w"]),
        ).count()
        == 1
    )
    c2 = spark.createDataFrame([(9, None, "x")], "g int, v string, w string")
    assert (
        fingerprint_diff(
            table_fingerprint(a2, ["g"], ["v", "w"]),
            table_fingerprint(c2, ["g"], ["v", "w"]),
        ).count()
        == 1
    )


def test_null_group_key_matches_its_twin(spark):
    # regression: a NULL-valued audit group must compare null-safely —
    # identical replicas with region=NULL rows would otherwise flag a
    # divergence no repair can ever clear
    rows = [(None, "x"), (None, "y"), (1, "z")]
    a = spark.createDataFrame(rows, "g int, v string")
    b = spark.createDataFrame(rows, "g int, v string")
    assert (
        fingerprint_diff(
            table_fingerprint(a, ["g"], ["v"]),
            table_fingerprint(b, ["g"], ["v"]),
        ).count()
        == 0
    )
    # and a REAL divergence inside the NULL group still surfaces, keyed
    # to the NULL group
    c = spark.createDataFrame(
        [(None, "x"), (None, "CHANGED"), (1, "z")], "g int, v string"
    )
    d = fingerprint_diff(
        table_fingerprint(a, ["g"], ["v"]),
        table_fingerprint(c, ["g"], ["v"]),
    ).collect()
    assert len(d) == 1 and d[0].g is None
