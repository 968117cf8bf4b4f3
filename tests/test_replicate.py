"""Z-set replication transport drills (`incremental/replicate.py`):
catch-up shipping is cursor-free and idempotent; a fold-swallowed gap
is flagged for audit and closed by a scoped signed-correction repair;
the repair is net-idempotent."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.incremental import JoinViewSpec
from dataworks_audit_data_ingest_spark.incremental.joinview_cdc import (
    compact_join_view_cdc,
    read_join_view_cdc,
    update_join_view_cdc,
)
from dataworks_audit_data_ingest_spark.incremental.replicate import (
    read_replica,
    repair_replica,
    ship_view_deltas,
)

SPEC = JoinViewSpec(key="k", left_id="lid", right_id="rid")
L = "lid int, k int, lval string"
R = "rid int, k int, rval string"


def _batches(spark, root, n):
    update_join_view_cdc(
        spark, root, "b0", SPEC,
        left_upserts=spark.createDataFrame([(1, 10, "a"), (2, 20, "b")], L),
        right_upserts=spark.createDataFrame(
            [(100, 10, "X"), (101, 20, "Y")], R
        ),
    )
    if n > 1:
        update_join_view_cdc(
            spark, root, "b1", SPEC,
            left_upserts=spark.createDataFrame([(1, 10, "a2")], L),
        )
    if n > 2:
        update_join_view_cdc(
            spark, root, "b2", SPEC,
            left_deletes=spark.createDataFrame([(2, 20)], "lid int, k int"),
        )


def _net(df):
    return sorted(tuple(r) for r in df.collect()) if df is not None else []


def test_catch_up_shipping_is_cursor_free_and_idempotent(spark, tmp_path):
    root = str(tmp_path / "jv")
    replica = str(tmp_path / "replica")
    _batches(spark, root, 1)
    out = ship_view_deltas(spark, root, replica)
    assert out["shipped"] == ["b0"] and not out["audit_recommended"]
    # two more primary batches land while the shipper was away; the
    # replica's own listing is the cursor
    _batches(spark, root, 3)
    out = ship_view_deltas(spark, root, replica)
    assert out["shipped"] == ["b1", "b2"]
    assert _net(read_replica(spark, replica)) == _net(
        read_join_view_cdc(spark, root)
    )
    # re-ship: nothing missing, nothing rewritten
    assert ship_view_deltas(spark, root, replica)["shipped"] == []


def test_fold_swallowed_gap_flagged_and_repaired(spark, tmp_path):
    root = str(tmp_path / "jv")
    replica = str(tmp_path / "replica")
    _batches(spark, root, 3)
    # replica receives NOTHING before the primary folds b0/b1
    compact_join_view_cdc(spark, root, SPEC, exclude=("b2",))
    out = ship_view_deltas(spark, root, replica)
    # only the un-folded tail is shippable; the fold is flagged
    assert out["shipped"] == ["b2"] and out["audit_recommended"]
    assert _net(read_replica(spark, replica)) != _net(
        read_join_view_cdc(spark, root)
    )
    # scoped repair converges (scope = the touched key, as an audit
    # would localize it)
    scope = spark.createDataFrame([(10,)], "k int")
    rep = repair_replica(
        spark, root, replica, "b3_repair", scope=scope, scope_cols=("k",)
    )
    assert rep["correction_rows"] > 0
    # the k=20 slice was never diverged... it was: b0 shipped nothing.
    # close the rest with an unscoped repair and require convergence
    repair_replica(spark, root, replica, "b4_repair")
    assert _net(read_replica(spark, replica)) == _net(
        read_join_view_cdc(spark, root)
    )
    # net-idempotent: a re-run commits zero corrections
    again = repair_replica(spark, root, replica, "b5_repair")
    assert again["correction_rows"] == 0


def test_replica_that_kept_up_unaffected_by_fold(spark, tmp_path):
    root = str(tmp_path / "jv")
    replica = str(tmp_path / "replica")
    _batches(spark, root, 3)
    ship_view_deltas(spark, root, replica)
    compact_join_view_cdc(spark, root, SPEC)
    out = ship_view_deltas(spark, root, replica)
    assert out["shipped"] == [] and out["audit_recommended"]
    assert _net(read_replica(spark, replica)) == _net(
        read_join_view_cdc(spark, root)
    )
