"""Deterministic weighted sampling via integer bottom-k priorities.

Scheme (q183's kernel, `queries/textops.py::q183_weighted_sample`): each
row draws an MD5-derived 32-bit uniform from its id and takes priority
``u * SCALE DIV weight`` — heavier rows draw proportionally smaller
priorities — and the sample is the k smallest priorities. Pure integer
arithmetic (u·10⁶ < 2⁶³) so every engine agrees bit-for-bit; the
integer-exact stand-in for Efraimidis–Spirakis keys (-ln(u)/w), whose
ln() last-ulp behavior is not portable.

Two properties make this the right kernel for distributed AND streaming
use:

- **Mergeable**: bottom-k of a union is bottom-k of the per-part
  bottom-ks — so partitions sample locally and only k rows per partition
  reach the merge (TakeOrderedAndProject does exactly this), and a
  streaming reservoir is maintained by unioning each batch's bottom-k
  with the standing reservoir and re-taking bottom-k.
- **Replay-idempotent**: the priority is a pure function of (id, weight,
  seed) — re-sampling the same rows re-derives the same keys, so a
  replayed micro-batch merges to an identical reservoir.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashing import duckdb_hash32, spark_hash32

PRIORITY_SCALE = 1_000_000
DEFAULT_SEED = "wsamp"


def weighted_priority_expr(
    id_col: str, weight_col: str, seed: str = DEFAULT_SEED
) -> str:
    """Spark SQL expression for the integer sampling priority of a row —
    smaller = more likely sampled; selection probability increases with
    ``weight_col`` (must be > 0; filter zero/negative weights first, a
    zero weight would divide by zero)."""
    u = spark_hash32(f"CAST({id_col} AS STRING)", seed)
    return f"(({u} * {PRIORITY_SCALE}) DIV {weight_col})"


def duckdb_weighted_priority_expr(
    id_col: str, weight_col: str, seed: str = DEFAULT_SEED
) -> str:
    """The same priority in DuckDB SQL — equal by construction (both
    dialects derive the uniform from the identical MD5 prefix and run
    the identical integer product/floor-division), so an oracle built
    from this can never drift from :func:`weighted_priority_expr`."""
    u = duckdb_hash32(f"CAST({id_col} AS VARCHAR)", seed)
    return f"(({u} * {PRIORITY_SCALE}) // {weight_col})"


def weighted_bottom_k(
    df: DataFrame,
    k: int,
    id_col: str,
    weight_col: str,
    seed: str = "wsamp",
) -> DataFrame:
    """The k rows of ``df`` with the smallest sampling priorities
    (deterministic tie-break on ``id_col``), with a ``priority`` column
    attached. Rows with weight <= 0 are excluded (unsampleable).

    Plan shape: one map-side expression + TakeOrderedAndProject — per-
    partition heaps, k rows to the driver-side merge, no global sort.
    """
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn(
            "priority", F.expr(weighted_priority_expr(id_col, weight_col, seed))
        )
        .orderBy("priority", id_col)
        .limit(k)
    )


def merge_reservoirs(
    parts: list[DataFrame], k: int, id_col: str
) -> DataFrame:
    """Bottom-k of a union of bottom-k samples — the mergeability that
    makes the kernel streaming-safe. Inputs must carry the ``priority``
    column.

    Duplicate ids collapse to ONE row, chosen deterministically as the
    per-id minimum priority (row-level ties broken by the remaining
    ORDERABLE columns; map-typed payload columns are skipped — Spark
    cannot order them, and rows identical on every orderable column are
    interchangeable for the sample): a replayed batch re-offers
    identical rows (same priority — the collapse is a no-op), and a
    RE-INGESTED id whose weight changed across batches resolves to its
    most-sampleable version on every engine and partitioning, keeping
    the merge replay-idempotent. (A `dropDuplicates` here would pick a
    partition-order-dependent copy — the nondeterminism this window
    explicitly avoids.)"""
    if not parts:
        raise ValueError("merge_reservoirs: need at least one part")
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    from pyspark.sql import Window

    orderable = [
        f.name
        for f in u.schema.fields
        if f.name != id_col and not f.dataType.typeName().startswith("map")
    ]
    w = Window.partitionBy(id_col).orderBy(
        *[
            F.asc(c)
            for c in ["priority"] + [c for c in orderable if c != "priority"]
        ]
    )
    return (
        u.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
        .orderBy("priority", id_col)
        .limit(k)
    )
