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
    from tools.rotation import TOP_N, history, plan

    newest, latest = history()
    assert latest >= 3  # r01–r03 ship with the repo
    top, info = plan()
    assert len(top) == TOP_N
    assert info["registered"] >= 165
    # every never-run query in the top block precedes every has-run query
    seen_has_run = False
    for n in top:
        if n in newest:
            seen_has_run = True
        else:
            assert not seen_has_run, f"never-run {n} after a has-run entry"
    # has-run entries are in non-decreasing staleness order
    rounds = [newest[n] for n in top if n in newest]
    assert rounds == sorted(rounds)
