"""Plan-regression guard (`tools/plan_guard.py`): the physical-plan
fingerprint of every frozen bench query must match the committed baseline
— a lost broadcast or an extra shuffle fails the suite immediately
instead of hiding inside the bench's ambient wall-clock band."""

from __future__ import annotations

import json
from pathlib import Path

BASELINE = Path(__file__).resolve().parent.parent / "tools" / "plan_baseline.json"


def test_headline_plans_match_baseline(spark):
    import sys

    sys.path.insert(0, str(BASELINE.parent.parent))
    from tools.plan_guard import current_fingerprints, diff

    base = json.loads(BASELINE.read_text())
    cur = current_fingerprints(spark)
    problems = diff(base, cur)
    assert not problems, (
        "plan drift (run `python tools/plan_guard.py --update` after "
        f"REVIEWING each change): {problems}"
    )


def test_fingerprint_counts_operators():
    from tools.plan_guard import fingerprint

    plan = (
        "Exchange hashpartitioning(x, 32)\n"
        "SortMergeJoin [a], [b], Inner\n"
        "  Sort [a ASC]\n"
        "BroadcastHashJoin\nBroadcastExchange\n"
        "TakeOrderedAndProject\nArrowEvalPython\n"
    )
    fp = fingerprint(plan)
    assert fp["shuffle_exchanges"] == 1
    assert fp["sort_merge_joins"] == 1
    assert fp["broadcast_hash_joins"] == 1
    assert fp["broadcast_exchanges"] == 1
    assert fp["top_k"] == 1
    assert fp["python_evals"] == 1
    assert fp["global_sorts"] == 1
