"""Measured study: recompute-on-retract rollup (`incremental/
rollup_cdc.py`) — what the retract path actually costs, conditioned on
how retractions CLUSTER, against the all-additive hot path and a full
per-refresh recompute.

    python tools/rollup_cdc_study.py [sf_dir]

Seeds an orders ⋈ customer CDC view at the given scale and maintains a
(c_mktsegment, o_orderpriority) min/max rollup through three workload
legs:

- **additive**: an insert-only batch — the hot path; no store or view
  read, O(Δ) map-side partials;
- **clustered retract**: deletes confined to ONE (segment, priority)
  group — the recompute input is the net view semi-joined to ONE of
  |groups| (the k/n pruning win, measured as rows entering the
  snapshot aggregation vs the whole view);
- **spraying retract**: deletes touching EVERY group — the honest
  worst case: the recompute input is the whole view once.

Each leg reports wall time, the recompute input rows vs view rows, and
asserts the maintained report equals a from-scratch recompute of the
net view. The comparison row is the full recompute a non-incremental
pipeline would run per refresh.
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from dataworks_audit_data_ingest_spark.incremental.joinview import (  # noqa: E402
    JoinViewSpec,
)
from dataworks_audit_data_ingest_spark.incremental.joinview_cdc import (  # noqa: E402
    read_join_view_cdc,
    read_join_view_cdc_delta,
    update_join_view_cdc,
)
from dataworks_audit_data_ingest_spark.incremental.rollup_cdc import (  # noqa: E402
    read_cdc_rollup,
    update_cdc_rollup,
)
from dataworks_audit_data_ingest_spark.session import tune  # noqa: E402
from dataworks_audit_data_ingest_spark.tables import table  # noqa: E402

CENTS = "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"
GROUPS = ("c_mktsegment", "o_orderpriority")


def _recomputed(view):
    return (
        view.groupBy(*GROUPS)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.expr(CENTS)).cast("bigint").alias("total"),
            F.min(F.expr(CENTS)).cast("bigint").alias("vmin"),
            F.max(F.expr(CENTS)).cast("bigint").alias("vmax"),
        )
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = tune(
        SparkSession.builder.master("local[32]").appName("rollup-cdc-study")
    ).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("c_custkey"),
        "o_totalprice",
        "o_orderpriority",
    )
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    spec = JoinViewSpec(
        key="c_custkey",
        left_id="o_orderkey",
        right_id="c_custkey",
        n_buckets=16,
    )
    tmp = tempfile.mkdtemp(prefix="rcr_study_")
    root, store = f"{tmp}/view", f"{tmp}/rollup"

    def step(bid, **kw):
        t0 = time.perf_counter()
        update_join_view_cdc(spark, root, bid, spec, **kw)
        feed = read_join_view_cdc_delta(spark, root, bid)
        view = read_join_view_cdc(spark, root)
        update_cdc_rollup(
            spark, store, feed, view, bid,
            group_cols=GROUPS, value_expr=CENTS,
        )
        wall = time.perf_counter() - t0
        return wall, feed, view

    # seed: 7/8 of orders (class !=7), all customers
    seed = orders.filter(F.expr("o_orderkey % 8 != 7"))
    wall, _, view = step("b0", left_upserts=seed, right_upserts=cust)
    n_view = view.count()
    n_groups = view.select(*GROUPS).distinct().count()
    print(f"seed: {n_view} view rows, {n_groups} groups, {wall:.1f}s")

    legs = []
    # additive: insert the held-out class
    wall, feed, view = step(
        "b1", left_upserts=orders.filter(F.expr("o_orderkey % 8 = 7"))
    )
    legs.append(("additive", wall, 0, feed.count()))

    # clustered retract: deletes confined to ONE group
    one_group = view.filter(
        (F.col("c_mktsegment") == "BUILDING")
        & (F.col("o_orderpriority") == "5-LOW")
    )
    victims = one_group.filter(F.expr("o_orderkey % 11 = 0")).select(
        "c_custkey", "o_orderkey"
    ).localCheckpoint()
    pre_view_rows = view.count()
    wall, feed, view = step("b2", left_deletes=victims)
    touched = feed.filter(F.col("__diff__") < 0).select(*GROUPS).distinct()
    recompute_in = view.join(
        F.broadcast(touched), on=list(GROUPS), how="left_semi"
    ).count()
    legs.append(("clustered", wall, recompute_in, feed.count()))
    print(
        f"clustered: recompute input {recompute_in} of {pre_view_rows} "
        f"view rows ({100 * recompute_in / pre_view_rows:.1f}%)"
    )

    # spraying retract: deletes in every group
    victims = view.filter(F.expr("o_orderkey % 97 = 0")).select(
        "c_custkey", "o_orderkey"
    ).localCheckpoint()
    pre_view_rows = view.count()
    wall, feed, view = step("b3", left_deletes=victims)
    touched = feed.filter(F.col("__diff__") < 0).select(*GROUPS).distinct()
    recompute_in = view.join(
        F.broadcast(touched), on=list(GROUPS), how="left_semi"
    ).count()
    legs.append(("spraying", wall, recompute_in, feed.count()))
    print(
        f"spraying: recompute input {recompute_in} of {pre_view_rows} "
        f"view rows ({100 * recompute_in / pre_view_rows:.1f}%)"
    )

    # correctness + the full-recompute comparison row
    t0 = time.perf_counter()
    maintained = _rows(read_cdc_rollup(spark, store, GROUPS))
    t_read = time.perf_counter() - t0
    t0 = time.perf_counter()
    full = _rows(_recomputed(view).filter(F.col("n") > 0))
    t_full = time.perf_counter() - t0
    assert maintained == full, "maintained report diverged from recompute"

    print("\nleg        wall_s  recompute_in  feed_rows")
    for name, wall, rin, frows in legs:
        print(f"{name:<10} {wall:6.1f}  {rin:12d}  {frows:9d}")
    print(
        f"\nmaintained-report read {t_read:.1f}s vs full view recompute "
        f"{t_full:.1f}s (report equal: True)"
    )
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
