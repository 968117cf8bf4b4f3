"""Scale-path window variants (q16s / q37s) agree with their exact twins.

q16/q37 pin exact single-task-window semantics for the oracle; q16s/q37s are
the production forms whose plans survive 100 TB (no full-table unpartitioned
window). These tests pin the equivalence that makes the swap safe.
"""

from __future__ import annotations

from dataworks_audit_data_ingest_spark.queries import all_queries

SF = "/root/testdata/sf0.01"
REGISTRY = all_queries()


def test_q37s_matches_exact_ties_semantics(spark):
    """q37s's histogram two-pass rank must equal a plain PERCENT_RANK /
    CUME_DIST with standard ties semantics, row for row."""
    got = {
        r.s_suppkey: (r.bal_pct_rank, r.bal_cume_dist)
        for r in REGISTRY["q37s_distribution_ranks_scale"].fn(spark, SF).collect()
    }
    exact = {
        r.s_suppkey: (r.bal_pct_rank, r.bal_cume_dist)
        for r in spark.sql(
            """
            SELECT s_suppkey,
                   PERCENT_RANK() OVER (ORDER BY s_acctbal) AS bal_pct_rank,
                   CUME_DIST()    OVER (ORDER BY s_acctbal) AS bal_cume_dist
            FROM {s}
            """,
            s=__import__(
                "dataworks_audit_data_ingest_spark.tables", fromlist=["table"]
            ).table(spark, SF, "supplier"),
        ).collect()
    }
    assert got == exact


def test_q37s_plan_has_no_full_table_window(spark):
    """The ordered window must consume the value histogram (post-aggregate),
    never the raw supplier scan: the Window node sits above a HashAggregate
    in the physical plan."""
    df = REGISTRY["q37s_distribution_ranks_scale"].fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    # the window's child subtree below it must contain the aggregate
    win_idx = plan.index("Window")
    assert "HashAggregate" in plan[win_idx:], plan


def test_q16s_buckets_partition_the_table(spark):
    rows = REGISTRY["q16s_acctbal_deciles_scale"].fn(spark, SF).collect()
    from dataworks_audit_data_ingest_spark.tables import table

    total = table(spark, SF, "customer").count()
    assert sum(r.n_customers for r in rows) == total
    deciles = [r.decile for r in rows]
    assert deciles == sorted(deciles) and 1 <= min(deciles) <= max(deciles) <= 10
    # bucket value ranges must be disjoint and ordered
    for lo, hi in zip(rows, rows[1:]):
        assert lo.max_bal <= hi.min_bal


def test_q16s_close_to_exact_ntile(spark):
    """Sketch accuracy 1e5 >> n at test scale, so bucket sizes should match
    exact NTILE within the tie-bunching slack (ties cannot straddle an
    approx boundary, unlike NTILE's arbitrary tie split)."""
    approx = {
        r.decile: r.n_customers
        for r in REGISTRY["q16s_acctbal_deciles_scale"].fn(spark, SF).collect()
    }
    exact = {
        r.decile: r.n_customers
        for r in REGISTRY["q16_acctbal_deciles"].fn(spark, SF).collect()
    }
    n = sum(exact.values())
    for d in exact:
        assert abs(approx.get(d, 0) - exact[d]) <= max(5, n // 100), (
            d,
            approx,
            exact,
        )


def test_q110_bounds_within_one_bin_of_exact(spark):
    """Histogram-quantile boundaries must bracket the exact decile edges
    within one bin width ((vmax-vmin)/B) — the sketch's documented error
    bound."""
    from dataworks_audit_data_ingest_spark.tables import table

    rows = REGISTRY["q110_histogram_quantiles"].fn(spark, SF).collect()
    assert [r.decile for r in rows] == list(range(1, 10))
    bals = sorted(
        float(r.c_acctbal)
        for r in table(spark, SF, "customer").select("c_acctbal").collect()
    )
    n = len(bals)
    vmin, vmax = bals[0], bals[-1]
    bin_width = (vmax - vmin) / 1024 + 0.01
    for r in rows:
        # exact lower decile edge: smallest value v with rank(v)*10 >= p*n
        import math

        exact = bals[math.ceil(r.decile * n / 10) - 1]
        assert abs(r.approx_bal - exact) <= bin_width + 0.01, (r, exact)
    approx = [r.approx_bal for r in rows]
    assert approx == sorted(approx)
