"""FAST smoke coverage of the round-13 thread-pooled CDC paths.

The full CDC drills live in the slow partition (test_join_view_cdc.py,
test_rollup_cdc.py, test_store_compaction.py); this file keeps ONE tiny
end-to-end pass — update (parallel per-side guards + commits) →
signed-feed rollup fold (collapsed driver actions) → 3-store compaction
(thread-pooled folds) → read-back — in the DEFAULT pytest gate, so a
regression in exactly the parallelized code cannot pass the fast run.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.incremental.joinview import JoinViewSpec
from dataworks_audit_data_ingest_spark.incremental.joinview_cdc import (
    compact_join_view_cdc,
    read_join_view_cdc,
    read_join_view_cdc_delta,
    update_join_view_cdc,
)
from dataworks_audit_data_ingest_spark.incremental.rollup_cdc import (
    read_cdc_rollup,
    update_cdc_rollup,
)

SPEC = JoinViewSpec(key="k", left_id="lid", right_id="k", n_buckets=4)


def _left(spark, ids):
    return spark.createDataFrame(
        [(i % 3, i, float(i * 10)) for i in ids], "k bigint, lid bigint, v double"
    )


def _right(spark, ks):
    return spark.createDataFrame([(k, f"seg{k}") for k in ks], "k bigint, seg string")


def test_cdc_update_rollup_compact_roundtrip(spark, tmp_path):
    root = str(tmp_path / "view")
    store = str(tmp_path / "rollup")

    # b0: seed both sides; b1: delete one left row (retraction path)
    c0 = update_join_view_cdc(
        spark, root, "b0", SPEC,
        left_upserts=_left(spark, range(6)), right_upserts=_right(spark, [0, 1, 2]),
    )
    assert c0["view_inserts"] == 6 and c0["view_retractions"] == 0
    for bid in ("b0",):
        feed = read_join_view_cdc_delta(spark, root, bid)
        view = read_join_view_cdc(spark, root)
        r = update_cdc_rollup(
            spark, store, feed, view, bid, group_cols=("seg",), value_expr="v"
        )
        assert r["add_rows"] == 3 and r["snap_rows"] == 0

    c1 = update_join_view_cdc(
        spark, root, "b1", SPEC,
        left_deletes=spark.createDataFrame([(0, 0)], "k bigint, lid bigint"),
    )
    assert c1["view_retractions"] == 1
    feed = read_join_view_cdc_delta(spark, root, "b1")
    view = read_join_view_cdc(spark, root)
    r = update_cdc_rollup(
        spark, store, feed, view, "b1", group_cols=("seg",), value_expr="v"
    )
    assert r["snap_rows"] == 1  # seg0 recomputed, others untouched

    # thread-pooled 3-store compaction, newest batch excluded (replayable)
    folded = compact_join_view_cdc(spark, root, SPEC, exclude=("b1",))
    assert folded == {"left": 1, "right": 1, "view": 1}

    # the maintained report equals the closed form of the final state
    rep = {
        row["seg"]: (row["n"], row["total"])
        for row in read_cdc_rollup(spark, store, ("seg",)).collect()
    }
    # final left rows: lids 1..5 (lid 0 deleted); join on k=lid%3
    expect = {}
    for lid in range(1, 6):
        seg = f"seg{lid % 3}"
        n, tot = expect.get(seg, (0, 0))
        expect[seg] = (n + 1, tot + lid * 10)
    assert rep == expect

    # view read-back equals current_A join current_B
    assert read_join_view_cdc(spark, root).count() == 5


def test_side_guard_errors_still_fire_under_parallel_checks(spark, tmp_path):
    root = str(tmp_path / "view2")
    dup = spark.createDataFrame(
        [(0, 1, 1.0), (1, 1, 2.0)], "k bigint, lid bigint, v double"
    )
    with pytest.raises(ValueError, match="left delta repeats lid"):
        update_join_view_cdc(spark, root, "b0", SPEC, left_upserts=dup)
    clash_ups = _left(spark, [1])
    clash_dels = clash_ups.select("k", "lid")
    update_join_view_cdc(
        spark, root, "b0", SPEC, left_upserts=_left(spark, [1, 2])
    )
    with pytest.raises(ValueError, match="upserts AND deletes the same"):
        update_join_view_cdc(
            spark, root, "b1", SPEC,
            left_upserts=clash_ups.withColumn("v", F.lit(9.0)),
            left_deletes=clash_dels,
        )
