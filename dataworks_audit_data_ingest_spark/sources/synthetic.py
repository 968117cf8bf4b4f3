"""Deterministic synthetic-events source — Spark 4's Python Data Source
API exercised as a first-class source (batch + micro-batch streaming).

Why it exists at 100 TB: load- and soak-testing a cluster needs an
input that (a) generates ON the executors — no fixture to stage, no
driver bottleneck, arbitrary volume from a `rows` option — and (b) is
DETERMINISTIC, so two runs (or a run and an oracle) see byte-identical
rows. Every column is a pure function of the row index through the
repo's portable MD5 hash (`functions/hashing.py` family):

    user_id     = h32("u", i) % n_users
    event_type  = TYPES[h32("t", i) % 5]
    value_cents = h32("v", i) % 100000
    ts_us       = BASE_TS_US + (h32("s", i) % 86400) * 1_000_000

which is reproducible in Spark SQL and DuckDB from a bare SEQUENCE/
RANGE — q237 pins the Python source's output against exactly that SQL
regeneration, so the source itself sits under the oracle hash.

Batch shape: `partitions()` splits [0, rows) into `n_partitions` index
ranges — generation fans out across executors with zero input bytes.
Streaming shape: offsets are plain row indices, the reader is the
STATELESS `SimpleDataSourceStreamReader` — each micro-batch receives
the committed start offset and emits the next bounded `rows_per_batch`
chunk, so a continuous trigger advances one chunk per batch, an
`availableNow` drain advances one chunk per drain, and a checkpoint
restart resumes exactly where the last commit stopped with no
reader-side memory of progress (drilled).

This is a SANCTIONED Python scan (the generator must run somewhere);
the rows cross into the JVM once via Arrow and everything downstream is
ordinary columnar Spark. Register per-session with
``spark.dataSource.register(SyntheticEventsDataSource)``.
"""

from __future__ import annotations

import hashlib
import json
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SCHEMA = (
    "event_id bigint, user_id bigint, event_type string,"
    " value_cents bigint, ts_us bigint"
)
TYPES = ("view", "click", "signup", "purchase", "error")
BASE_TS_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z


def h32(seed: str, i: int) -> int:
    """The repo's portable 32-bit hash (first 8 MD5 hex chars), same
    value as `functions.hashing.spark_hash32`/`duckdb_hash32` on the
    string ``f"{seed}|{i}"``."""
    return int(hashlib.md5(f"{seed}|{i}".encode()).hexdigest()[:8], 16)


def gen_row(i: int) -> tuple:
    return (
        i,
        h32("u", i) % 1000,
        TYPES[h32("t", i) % 5],
        h32("v", i) % 100000,
        BASE_TS_US + (h32("s", i) % 86400) * 1_000_000,
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _BatchReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))

    def partitions(self):
        n = max(1, min(self.n_partitions, self.rows or 1))
        step = -(-self.rows // n) if self.rows else 1
        return [
            _RangePartition(lo, min(lo + step, self.rows))
            for lo in range(0, self.rows, step)
        ] or [_RangePartition(0, 0)]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield gen_row(i)


class _StreamReader(SimpleDataSourceStreamReader):
    """Row-index offsets: {"index": n}. STATELESS by construction
    (`SimpleDataSourceStreamReader`): every micro-batch hands ``read``
    the committed start offset, so the reader emits the next bounded
    ``rows_per_batch`` chunk from wherever the checkpoint left off —
    restart-safe with no reader-side memory of progress, and replays of
    a planned batch go through ``readBetweenOffsets`` on the exact
    recorded range."""

    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.rows_per_batch = int(options.get("rows_per_batch", 100))

    def initialOffset(self):
        return {"index": 0}

    def read(self, start: dict):
        lo = start["index"]
        hi = min(self.rows, lo + self.rows_per_batch)
        return iter([gen_row(i) for i in range(lo, hi)]), {"index": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [gen_row(i) for i in range(start["index"], end["index"])]
        )


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events").option("rows", N)`` after
    ``spark.dataSource.register(SyntheticEventsDataSource)``; also
    readable with ``spark.readStream`` (micro-batch offsets)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _BatchReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _StreamReader(self.options)


def register(spark) -> None:
    """Idempotent per-session registration."""
    spark.dataSource.register(SyntheticEventsDataSource)


def duckdb_generation_sql(rows: int) -> str:
    """The SAME rows regenerated in DuckDB from RANGE + the portable
    hash — the q237 oracle twin of the Python generator."""

    def h(seed: str) -> str:
        return (
            f"CAST('0x' || SUBSTRING(MD5(CONCAT('{seed}|',"
            f" CAST(i AS VARCHAR))), 1, 8) AS BIGINT)"
        )

    types = ", ".join(f"'{t}'" for t in TYPES)
    return f"""
    SELECT i AS event_id,
           {h('u')} % 1000 AS user_id,
           [{types}][({h('t')} % 5) + 1] AS event_type,
           {h('v')} % 100000 AS value_cents,
           {BASE_TS_US} + ({h('s')} % 86400) * 1000000 AS ts_us
    FROM (SELECT UNNEST(RANGE({rows})) AS i)
    """


def checkpoint_offset(checkpoint_dir: str) -> int | None:
    """The committed row index in a streaming checkpoint (diagnostics)."""
    from pathlib import Path

    offsets = sorted(
        Path(checkpoint_dir, "offsets").glob("[0-9]*"),
        key=lambda p: int(p.name),
    )
    if not offsets:
        return None
    last = json.loads(offsets[-1].read_text().splitlines()[-1])
    if isinstance(last, str):  # doubly-encoded variant
        last = json.loads(last)
    return last["index"]
