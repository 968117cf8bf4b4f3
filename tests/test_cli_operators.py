"""Operator CLI (`operators/__main__.py`): list/run/sql verbs and prefix
resolution, driven in-process."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from dataworks_audit_data_ingest_spark.operators.__main__ import main


def _capture(argv):
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(argv)
    return rc, buf.getvalue()


def test_list_default_and_tag_filter():
    rc, out = _capture([])
    assert rc == 0 and "registered operators" in out and "by family:" in out
    rc, out = _capture(["list", "--tag", "cusum"])
    assert rc == 0 and "q155_cusum_drift" in out and "q01" not in out


def test_run_by_prefix(spark):
    rc, out = _capture(["run", "q139", "--limit", "3"])
    assert rc == 0
    assert "q139_label_balance" in out


def test_sql_verb_and_rows_only():
    rc, out = _capture(["sql", "q104"])
    assert rc == 0 and "FROM documents" in out
    rc, out = _capture(["sql", "q42_approx_distinct_sketch"])
    assert rc == 1 and "rows-only" in out


def test_unknown_name_errors():
    with pytest.raises(SystemExit, match="unknown operator"):
        _capture(["run", "zzz"])
    with pytest.raises(SystemExit, match="prefix matches"):
        _capture(["sql", "q5"])  # ambiguous prefix


# ---------------------------------------------------------------------------
# Rotation planner (tools/rotation.py)
# ---------------------------------------------------------------------------


def test_rotation_plan_orders_never_run_first():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from tools.rotation import PINNED, TOP_N, history, plan

    newest, latest = history()
    assert latest >= 3  # r01–r03 ship with the repo
    top, info = plan()
    assert len(top) == TOP_N
    assert info["registered"] >= 165
    # pins lead, in PINNED order
    pins = [n for n in PINNED]
    assert top[: len(pins)] == pins
    # after the pins: every never-run query precedes every has-run query
    seen_has_run = False
    for n in top[len(pins):]:
        if n in newest:
            seen_has_run = True
        else:
            assert not seen_has_run, f"never-run {n} after a has-run entry"
    # has-run entries are in non-decreasing staleness order
    rounds = [newest[n] for n in top[len(pins):] if n in newest]
    assert rounds == sorted(rounds)


def test_driver_priority_matches_computed_rotation():
    """DRIVER_PRIORITY is load-bearing (the driver only reads the first 50
    entries), so the pasted list must BE the computed rotation — hand-drift
    is a test failure. Compared against the driver history as of
    DRIVER_PRIORITY_AS_OF_ROUND so a newly landed CORRECTNESS_r{N}.json
    doesn't retro-redden the committed list; the next-round self bumps the
    constant when re-pasting."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from tools.rotation import plan

    from dataworks_audit_data_ingest_spark.queries import (
        DRIVER_PRIORITY,
        DRIVER_PRIORITY_AS_OF_ROUND,
    )

    top, _ = plan(as_of=DRIVER_PRIORITY_AS_OF_ROUND)
    assert list(DRIVER_PRIORITY) == top


def test_emitted_slate_leads_with_history_derived_stale_set():
    """The refresh target must come from the CORRECTNESS_r* UNION, never a
    prose note (the r10 STATUS.md note undercounted the r05-stale rows 7
    vs 13 — a rotation derived from it would have starved six queries an
    extra round). Independently recompute the stalest cohort from the raw
    history files and assert the emitted slate leads with exactly that
    set, alphabetical within the cohort."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from tools.rotation import PINNED, history, plan

    from dataworks_audit_data_ingest_spark.queries import (
        DRIVER_PRIORITY_AS_OF_ROUND as AS_OF,
    )
    from dataworks_audit_data_ingest_spark.queries import REGISTRY

    newest, _ = history(as_of=AS_OF)
    emittable = [n for n, q in REGISTRY.items() if q.sql is not None]
    has_run = [n for n in emittable if n in newest and n not in PINNED]
    never = [n for n in emittable if n not in newest and n not in PINNED]
    if not has_run:
        return  # nothing to refresh yet
    floor = min(newest[n] for n in has_run)
    stalest = sorted(n for n in has_run if newest[n] == floor)

    top, _ = plan(as_of=AS_OF)
    refresh_block = top[len(PINNED) + len(never):]
    head = refresh_block[: len(stalest)]
    assert head == stalest[: len(head)], (
        f"slate refresh head {head[:5]}… does not match the history-derived "
        f"r{floor:02d} stale set {stalest[:5]}…"
    )
    # with the r10 history this cohort is the 13 r05 rows; pin the count
    # so a silently shrunken union (missing CORRECTNESS file) is loud
    if AS_OF == 10:
        assert floor == 5 and len(stalest) == 13
