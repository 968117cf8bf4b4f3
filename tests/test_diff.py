"""table_diff: added/removed/modified classification, null-safe column
comparison, unchanged keys omitted, and snapshot-to-snapshot usage."""

from __future__ import annotations

from dataworks_audit_data_ingest_spark.sinks.diff import table_diff
from dataworks_audit_data_ingest_spark.sinks.snapshots import SnapshotTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "k bigint, a string, b bigint")


def test_diff_classification_and_changed_cols(spark):
    old = _df(spark, [(1, "x", 10), (2, "y", 20), (3, "z", 30), (4, None, 40)])
    new = _df(spark, [(1, "x", 10), (2, "y2", 21), (4, "w", 40), (5, "v", 50)])
    got = {
        r.k: (r.change_type, r.changed_cols)
        for r in table_diff(old, new, ["k"]).collect()
    }
    assert got == {
        2: ("modified", "a,b"),
        3: ("removed", ""),
        4: ("modified", "a"),   # NULL -> value is a change
        5: ("added", ""),
    }  # key 1 unchanged: omitted


def test_null_to_null_is_unchanged(spark):
    old = _df(spark, [(1, None, 1)])
    new = _df(spark, [(1, None, 1)])
    assert table_diff(old, new, ["k"]).collect() == []


def test_compare_cols_subset(spark):
    old = _df(spark, [(1, "x", 10)])
    new = _df(spark, [(1, "x", 99)])
    assert table_diff(old, new, ["k"], compare_cols=["a"]).collect() == []
    [r] = table_diff(old, new, ["k"], compare_cols=["b"]).collect()
    assert (r.change_type, r.changed_cols) == ("modified", "b")


def test_diff_between_snapshots(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "t"))
    t.commit_overwrite(_df(spark, [(1, "x", 10), (2, "y", 20)]))
    t.commit_overwrite(_df(spark, [(1, "x", 10), (2, "y", 25), (3, "z", 30)]))
    d = table_diff(
        t.read(spark, snapshot_id=0), t.read(spark, snapshot_id=1), ["k"]
    )
    got = {r.k: r.change_type for r in d.collect()}
    assert got == {2: "modified", 3: "added"}
