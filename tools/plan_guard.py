"""Plan-regression guard: fingerprint the physical plan of every headline
(bench) query and diff against the committed baseline.

A performance regression at 100 TB is almost always a PLAN change — a lost
broadcast, an extra exchange, Python evaluation sneaking into a hot path —
and wall-clock benchmarks at sf0.1 can hide it inside ambient noise
(PERF.md's ±12 % band). The plan fingerprint is noise-free: counts of the
operators that matter, taken from the pre-execution plan at sf0.001.

    python tools/plan_guard.py            # diff against tools/plan_baseline.json
    python tools/plan_guard.py --update   # rewrite the baseline (reviewed commit)

`tests/test_plan_guard.py` runs the same diff in CI, so a plan regression
fails the suite the moment it is introduced, not one round later in the
bench table.
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BASELINE_PATH = Path(__file__).with_name("plan_baseline.json")
SF = "/root/testdata/sf0.001"

# operator classes whose count changing means the execution strategy changed
_FEATURES = {
    "shuffle_exchanges": r"Exchange (?:hash|range|SinglePartition)",
    "broadcast_exchanges": r"BroadcastExchange|BroadcastQueryStage",
    "sort_merge_joins": r"SortMergeJoin",
    "broadcast_hash_joins": r"BroadcastHashJoin",
    "nested_loop_joins": r"BroadcastNestedLoopJoin|CartesianProduct",
    "python_evals": r"BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas",
    "global_sorts": r"\bSort \[",
    "top_k": r"TakeOrderedAndProject",
}


def fingerprint(plan: str) -> dict[str, int]:
    return {k: len(re.findall(rx, plan)) for k, rx in _FEATURES.items()}


# Stable non-bench shapes worth guarding too (round 10): classic TPC-H
# plans and the Spark 4 SQL-surface queries whose plans must never grow a
# Python eval or lose a broadcast. Round 11 adds the three guardable
# round-10 shapes (q261 checksum, q262 allocation, q263 recursive path);
# round 12 adds q266 (the verifier audit: candidate generation + two
# scoring legs — a stable, Python-eval-free, broadcast-preserving
# shape, unlike its checkpoint-scan siblings).
# Queries materializing temp state (q254/q260/q264/q265/q267/q268/q269
# stores, q255 XML) return checkpoint scans — nothing to guard; their
# plan evidence is the store modules' drills and PERF.md's cross-scale
# shuffle rows.
GUARDED_EXTRAS = (
    "q250_ship_lag_priority",
    "q251_bracket_revenue",
    "q252_listagg_top_customers",
    "q253_groupby_all_census",
    "q256_collated_distinct",
    "q257_try_divide_rates",
    "q258_percentile_within_group",
    "q259_lateral_column_alias",
    "q261_table_checksum",
    "q262_neyman_allocation",
    "q263_cheapest_journey_path",
    "q266_semantic_store_verifier_audit",
)


def current_fingerprints(spark, names=None) -> dict[str, dict[str, int]]:
    from bench import BENCH_QUERIES  # the frozen headline set

    from dataworks_audit_data_ingest_spark.queries import REGISTRY

    out = {}
    for name in names or (tuple(BENCH_QUERIES) + GUARDED_EXTRAS):
        df = REGISTRY[name].fn(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        out[name] = fingerprint(plan)
    return out


def diff(
    base: dict[str, dict[str, int]], cur: dict[str, dict[str, int]]
) -> list[str]:
    problems = []
    for name, feats in cur.items():
        if name not in base:
            problems.append(f"{name}: no baseline (run --update)")
            continue
        for feat, n in feats.items():
            b = base[name].get(feat, 0)
            if n != b:
                problems.append(f"{name}: {feat} {b} -> {n}")
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--update", action="store_true")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from dataworks_audit_data_ingest_spark.session import get_spark

    spark = get_spark("plan-guard")
    cur = current_fingerprints(spark, args.names or None)
    if args.update:
        merged = (
            json.loads(BASELINE_PATH.read_text()) if BASELINE_PATH.exists() else {}
        )
        merged.update(cur)
        BASELINE_PATH.write_text(json.dumps(merged, indent=1, sort_keys=True))
        print(f"baseline updated: {len(cur)} queries -> {BASELINE_PATH}")
        return 0
    base = json.loads(BASELINE_PATH.read_text())
    problems = diff(base, cur)
    for p in problems:
        print("DRIFT", p)
    print(f"{len(cur) - len(problems)}/{len(cur)} plans match baseline")
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
