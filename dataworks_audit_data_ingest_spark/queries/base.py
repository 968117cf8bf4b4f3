"""Query registration plumbing shared by all query modules."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    sql: str | None  # DuckDB-runnable oracle; None → rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)

    @property
    def doc(self) -> str:
        return (self.fn.__doc__ or "").strip()


REGISTRY: dict[str, Query] = {}


def register(name: str, sql: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: add a (spark, sf_dir) -> DataFrame builder to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, sql=sql, tags=tuple(tags))
        return fn

    return deco


# ---- numeric policy helpers -------------------------------------------------
# Double sums are order-dependent, so any aggregate over a double column is
# computed in DECIMAL (exact, associative — identical under any partitioning).
# The final decimal→double conversion is NOT portable, though: engines round
# high-scale decimals to double differently (observed: DuckDB and Spark differ
# in the last ulp on scale-8 sums). So the decimal result is quantized through
# an exact integer first — ROUND(dec, 4) * 10^4 is integral and < 2^53, its
# BIGINT→DOUBLE cast is exact, and the final /10^4.0 is one identical IEEE
# division in both engines.

DEC = "DECIMAL(18,4)"


def q4(inner: str) -> str:
    """Portable decimal→double: quantize to 4 decimal places exactly."""
    return f"(CAST(CAST(ROUND({inner}, 4) * 10000 AS BIGINT) AS DOUBLE) / 10000.0)"


def q4_col(c):
    """Column-level twin of :func:`q4` for window aggregates."""
    from pyspark.sql import functions as F

    return (F.round(c, 4) * 10000).cast("long").cast("double") / 10000.0


def dsum(col: str, alias: str) -> str:
    """Exact, portable sum of a double column, surfaced as a double."""
    return f"{q4(f'SUM(CAST({col} AS {DEC}))')} AS {alias}"


def davg(col: str, alias: str) -> str:
    """Exact-numerator average of a double column, surfaced as a double."""
    return f"{q4(f'SUM(CAST({col} AS {DEC}))')} / COUNT({col}) AS {alias}"
