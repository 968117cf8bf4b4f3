"""Declarative data-quality expectations, verified in ONE aggregation pass.

The contract-checking stage of a production pipeline (the idea behind
Deequ / Great Expectations, re-expressed Spark-first): each expectation
contributes one violation-counting aggregate expression; the whole suite
collapses into a single ``agg()`` over the table — one corpus scan, one
partial-aggregated reduction to a single row, regardless of how many
expectations are declared. No per-expectation jobs, no driver-side loops.

    from dataworks_audit_data_ingest_spark.functions.expectations import (
        check_expectations, not_null, unique, in_range, in_set, matches,
        satisfies,
    )
    report = check_expectations(df, [
        not_null("doc_id"),
        unique("doc_id"),
        in_range("n_chars", 1, 10_000_000),
        satisfies("n_chars = LENGTH(text)", name="chars_consistent"),
    ])
    # report: one row per expectation (expectation, n_violations, passed)

Scale note: ``unique`` is the one expensive rule — it needs a distinct
count, which Spark executes as an expand + two-phase aggregate inside the
same job (still one pass over the data, but with a key-wide exchange).
Suites without ``unique`` reduce map-side to a handful of counters per
task. At 100 TB run ``unique`` on the write path where the data is
already clustered by the key, or swap it for a q107-style HLL register
comparison (approximate uniqueness at sketch cost).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One named rule: ``violations`` must be an aggregate expression
    counting offending rows (0 = pass)."""

    name: str
    violations: Column


def not_null(col: str) -> Expectation:
    return Expectation(
        f"not_null({col})", F.count(F.when(F.col(col).isNull(), 1))
    )


def unique(col: str) -> Expectation:
    """Duplicate rows beyond the first occurrence of each value (NULLs are
    not counted — pair with not_null for a key contract)."""
    return Expectation(
        f"unique({col})",
        F.count(col) - F.countDistinct(col),
    )


def in_range(col: str, lo, hi) -> Expectation:
    """NULLs do not violate range/set/regex rules (three-valued logic:
    NOT NULL-comparison is NULL, which WHEN skips) — pair with
    :func:`not_null` when the column must also be present. This matches
    SQL CHECK-constraint semantics and keeps each rule orthogonal."""
    return Expectation(
        f"in_range({col},{lo},{hi})",
        F.count(F.when(~F.col(col).between(lo, hi), 1)),
    )


def in_set(col: str, values: Sequence) -> Expectation:
    return Expectation(
        f"in_set({col})",
        F.count(F.when(~F.col(col).isin(*values), 1)),
    )


def matches(col: str, regex: str, name: str | None = None) -> Expectation:
    return Expectation(
        name or f"matches({col})",
        F.count(F.when(~F.col(col).rlike(regex), 1)),
    )


def satisfies(predicate_sql: str, name: str) -> Expectation:
    """Arbitrary row-level SQL predicate that every row must satisfy."""
    return Expectation(
        name, F.count(F.when(~F.expr(predicate_sql), 1))
    )


def check_expectations(df: DataFrame, rules: Iterable[Expectation]) -> DataFrame:
    """Evaluate the suite in one aggregation; returns one row per rule:
    ``(expectation string, n_violations bigint, passed boolean)``,
    ordered by expectation name.

    The single wide agg row is unpivoted with ``stack`` — a few dozen
    literals, not a data-sized operation."""
    rules = list(rules)
    if not rules:
        raise ValueError("no expectations given")
    wide = df.agg(
        *[r.violations.cast("bigint").alias(f"v_{i}") for i, r in enumerate(rules)]
    )
    stack_args = ", ".join(
        f"'{r.name}', v_{i}" for i, r in enumerate(rules)
    )
    return (
        wide.select(
            F.expr(
                f"stack({len(rules)}, {stack_args}) AS (expectation, n_violations)"
            )
        )
        .select(
            "expectation",
            "n_violations",
            (F.col("n_violations") == 0).alias("passed"),
        )
        .orderBy("expectation")
    )
