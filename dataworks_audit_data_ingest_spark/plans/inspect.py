"""Helpers for asserting physical-plan properties.

The engine's scale guarantees (pushdown, pruning, broadcast, no cartesian)
are behaviors of the *plan*, not of any particular result — these helpers
make them testable (tests/test_plans.py) and inspectable from a REPL:

    >>> from dataworks_audit_data_ingest_spark.plans import formatted_plan
    >>> print(formatted_plan(df))
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """Executed (post-AQE-prepare) physical plan as a string."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """`explain("formatted")` output, returned instead of printed."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def read_schema_columns(df: DataFrame) -> set[str]:
    """Column names the parquet scan actually reads (pruning check)."""
    cols: set[str] = set()
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", formatted_plan(df)):
        cols |= {c.split(":")[0] for c in m.group(1).split(",") if c}
    return cols
