"""Bucketed table storage — pre-shuffled layout for exchange-free joins
and aggregations on a recurring key.

A big⋈big equi-join shuffles BOTH sides on the key every time it runs.
When the same join recurs (fact⋈fact daily, dedup-store⋈batch, CDC
merge), the 100 TB answer is to pay the shuffle ONCE at write time:
``df.write.bucketBy(n, key)`` hash-partitions rows into a fixed number of
buckets per (table) and records the layout in the catalog. Every later
join or groupBy on the bucket key reads co-located buckets and skips the
exchange entirely — the plan shows SortMergeJoin with **no Exchange on
either side**. Sorts also vanish when ``sortBy`` matches the join key,
each bucket holds one file, AND
``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` (Spark 3+
keeps scan-order trust behind that flag); without it the remaining Sorts
are per-task and local — cheap next to the eliminated shuffle.

This module wraps the three moves the layout needs:

- :func:`write_bucketed` — write + register (external table at ``path``,
  so no warehouse-dir assumption), one file per bucket by default
  (``single_file_buckets``) which is what lets Spark trust the sort order.
- :func:`aligned` — check two tables share bucket spec (same columns,
  same count) before relying on the exchange-free plan; mismatched specs
  silently fall back to shuffling, which this surfaces loudly.
- :func:`bucket_join` — the join itself (a plain ``.join``), plus
  :func:`exchange_count` so callers/tests can assert the plan held.

Scale notes: pick ``n_buckets`` so one bucket of the LARGER table fits an
executor's read budget (128–512 MB compressed); both tables must use the
SAME count — Spark joins bucketed tables exchange-free only on equal
counts (or one divides the other with bucket coalescing/splitting
enabled). Bucket pruning applies equality filters on the bucket key to
skip whole buckets at scan time — ``WHERE key = x`` reads 1/n of the
table without any partition directory tricks.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from ..plans.inspect import physical_plan


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str] | tuple[str, ...],
    n_buckets: int,
    path: str,
    sort_cols: list[str] | tuple[str, ...] | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
    single_file_buckets: bool = True,
) -> None:
    """Write ``df`` as an external bucketed table at ``path``.

    ``sort_cols`` defaults to ``bucket_cols`` — a bucket sorted by the
    join key lets SortMergeJoin skip its sorts too, but Spark only trusts
    the order when each bucket is a single file, so by default the frame
    is repartitioned on the bucket key first (one task → one file per
    bucket). Pass ``single_file_buckets=False`` for parallel multi-file
    writes when only the exchange (not the sort) elimination matters.

    Atomicity note: ``mode="overwrite"`` on a catalog table is NOT
    crash-safe (Spark drops-then-recreates) — rewrite a bucketed table
    under a versioned name (``t_v2``) and repoint readers, or publish it
    through a `sinks.snapshots.SnapshotTable` whose HEAD swap is atomic.
    The shard/partition sinks stage-and-swap instead; the catalog layer
    is what makes that impossible here."""
    cols = list(bucket_cols)
    sort = list(sort_cols) if sort_cols is not None else cols
    if single_file_buckets:
        df = df.repartition(n_buckets, *cols)
    writer = (
        df.write.format(fmt)
        .mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, *cols)
    )
    if sort:
        writer = writer.sortBy(*sort)
    writer.saveAsTable(table_name)


def bucket_spec(spark: SparkSession, table_name: str) -> tuple[tuple[str, ...], int] | None:
    """(bucket_cols, n_buckets) from the catalog, or None if unbucketed."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table_name}").collect()
    cols: tuple[str, ...] | None = None
    n: int | None = None
    for r in rows:
        if r.col_name == "Num Buckets":
            n = int(r.data_type)
        elif r.col_name == "Bucket Columns":
            cols = tuple(
                c.strip(" `") for c in r.data_type.strip("[]").split(",")
            )
    if cols is None or n is None:
        return None
    return cols, n


def aligned(spark: SparkSession, left: str, right: str) -> bool:
    """True when the two tables' bucket specs make their key join
    exchange-free: same bucket column names (order-sensitive — the hash
    is over the column tuple) and same bucket count."""
    a, b = bucket_spec(spark, left), bucket_spec(spark, right)
    return a is not None and a == b


def bucket_join(
    spark: SparkSession,
    left: str,
    right: str,
    on: list[str] | tuple[str, ...],
    how: str = "inner",
    require_aligned: bool = True,
) -> DataFrame:
    """Join two bucketed tables on their bucket key.

    With ``require_aligned`` (default) a spec mismatch raises instead of
    silently degrading to a shuffled join — at 100 TB that degradation is
    the difference between a metadata-cheap join and re-shuffling both
    tables, and it should be a loud error, not a slow surprise."""
    if require_aligned and not aligned(spark, left, right):
        raise ValueError(
            f"tables {left!r} and {right!r} have different bucket specs; "
            "rewrite one side (write_bucketed) or pass require_aligned=False"
        )
    return spark.table(left).join(spark.table(right), list(on), how)


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the executed plan (0 for a
    co-located bucketed join). Broadcast exchanges don't count — they are
    the cheap kind."""
    plan = physical_plan(df)
    return len(re.findall(r"Exchange (?:hash|range|SinglePartition)", plan))
