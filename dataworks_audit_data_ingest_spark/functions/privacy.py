"""k-anonymity / l-diversity release gate — multi-step generalization
ladder with suppression as last resort.

q197 (`queries/curation.py`) audits ONE generalization step; a real
release gate walks a HIERARCHY: publish each quasi-identifier (QI) class
at the most specific level that satisfies k-anonymity (class size >= k)
and l-diversity (>= l distinct sensitive values), generalize the rest a
step and retry, suppress whatever still fails at the most general level.

Semantics — iterative residual recoding (the sound local-recoding
variant): levels are processed most-specific first; at each level a
class releases iff the thresholds hold over the rows STILL UNRELEASED at
that point, and released rows leave the pool. Counting residual rows —
not all rows sharing the coarse class — matters: a coarse class can look
k-large only because of rows that already released at a finer level, and
publishing its residual would then leak. Every published class therefore
holds >= k rows and >= l sensitive values among exactly the rows
published in it, by construction.

A level is a mapping {qi_column_name: sql_expr_or_None}: the expression
(dialect-portable SQL over the input columns) giving the column's
generalized value at that level, None meaning fully suppressed ('*' in
the release). Level 0 is the identity mapping. Expressions double as the
class key AND the published display, so grouping and output cannot
disagree. Example ladder over customers (nation joined to its region
beforehand):

    levels = [
        {"nation": "CAST(nation_key AS STRING)", "segment": "segment"},
        {"nation": "CAST(nation_key AS STRING)", "segment": None},
        {"nation": "CONCAT('region=', CAST(region_key AS STRING))",
         "segment": None},
    ]

Scale shape: the ladder never touches data rows. One partial-aggregated
shuffle builds the (QI-combo x sensitive) base table — the same exchange
q197 pays — and the level walk iterates on THAT (class-count rows, KBs at
any corpus size): per level one class-table aggregation plus a
broadcast semi/anti split of the residual. Row-level anonymization is a
single broadcast join of the final assignment back to the corpus. The
unrolled plan is static — no driver-side data inspection, no collect.

Reference scope note: the reference system (dwp/dataworks-audit-data-
ingest, audit_data_ingest.py:1-313) has no privacy operators; this module
is part of the training-data-pipeline surface the build brief adds
beyond the reference (release hygiene next to the GDPR-forget sink).
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Level = Mapping[str, "str | None"]

SUPPRESSED = "*"


def _gcol(j: int, name: str) -> str:
    return f"_g{j}_{name}"


def _level_exprs(levels: Sequence[Level]) -> list[tuple[int, str, str]]:
    """(level, qi_name, sql_expr) for every generalized cell; None exprs
    become the literal suppression marker so grouping and display agree."""
    out = []
    for j, level in enumerate(levels):
        for name, expr in level.items():
            out.append((j, name, expr if expr is not None else f"'{SUPPRESSED}'"))
    return out


def _validate(levels: Sequence[Level]) -> list[str]:
    if not levels:
        raise ValueError("anonymity ladder needs at least one level")
    qi = list(levels[0].keys())
    for j, level in enumerate(levels):
        if list(level.keys()) != qi:
            raise ValueError(
                f"level {j} keys {list(level.keys())} != level-0 keys {qi};"
                " every level must map the same QI columns"
            )
    return qi


def _reject_marker_collisions(
    base: DataFrame, levels: Sequence[Level], qi: Sequence[str]
) -> None:
    """Fail fast if a GENUINE generalized value equals the suppression
    marker (ADVICE r08): a real ``'*'`` cell would otherwise merge with
    suppressed classes in both grouping and display, silently conflating
    a real class with the suppression bucket. Checked on the class table
    (already aggregated — tiny), only over cells whose level expression
    is not itself the suppression literal."""
    real_cells = [
        _gcol(j, name)
        for j, level in enumerate(levels)
        for name in qi
        if level[name] is not None
    ]
    if not real_cells:
        return
    pred = " OR ".join(f"{c} = '{SUPPRESSED}'" for c in real_cells)
    hit = base.filter(F.expr(pred)).limit(1).count()
    if hit:
        raise ValueError(
            f"a generalized QI value equals the suppression marker"
            f" {SUPPRESSED!r}; rewrite the level expression so real"
            " values cannot collide with the suppression bucket"
        )


def ladder_assignment(
    df: DataFrame,
    levels: Sequence[Level],
    sensitive: str,
    k: int,
    l: int,  # noqa: E741 — the literature's name
) -> DataFrame:
    """Per-QI-combo release assignment: one row per distinct combination
    of ALL levels' generalized values, with ``gen_level`` = the level the
    combo publishes at (-1 = suppressed) and ``n_rows`` = its row count.
    Class-table sized; broadcastable back to the corpus.
    """
    qi = _validate(levels)
    cells = _level_exprs(levels)
    gcols = [_gcol(j, n) for j, n, _ in cells]
    base = (
        df.selectExpr(
            *[f"({e}) AS {_gcol(j, n)}" for j, n, e in cells],
            f"{sensitive} AS _sens",
        )
        .groupBy(*gcols, "_sens")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        # materialized once: the collision guard below is an eager action
        # and the residual walk reuses base per level — without this the
        # corpus aggregation would re-execute per consumer
        .localCheckpoint()
    )
    _reject_marker_collisions(base, levels, qi)

    resid = base
    assigned: list[DataFrame] = []
    for j in range(len(levels)):
        keys = [_gcol(j, n) for n in qi]
        ok = (
            resid.groupBy(*keys)
            .agg(
                F.sum("_cnt").alias("_k"),
                F.countDistinct("_sens").alias("_l"),
            )
            .filter((F.col("_k") >= k) & (F.col("_l") >= l))
            .select(*keys)
        )
        assigned.append(
            resid.join(F.broadcast(ok), keys, "left_semi").withColumn(
                "gen_level", F.lit(j)
            )
        )
        resid = resid.join(F.broadcast(ok), keys, "left_anti")
    assigned.append(resid.withColumn("gen_level", F.lit(-1)))

    u = assigned[0]
    for part in assigned[1:]:
        u = u.unionByName(part)
    return (
        u.groupBy(*gcols, "gen_level")
        .agg(F.sum("_cnt").cast("bigint").alias("n_rows"))
    )


def anonymize(
    df: DataFrame,
    levels: Sequence[Level],
    sensitive: str,
    k: int,
    l: int,  # noqa: E741
    *,
    drop_suppressed: bool = True,
) -> DataFrame:
    """Row-level release: ``df`` with ``gen_level`` attached and each QI
    column replaced by ``<name>_released`` — its generalized value at the
    class's assigned level ('*' when suppressed there or when the whole
    combo is suppressed). Original QI and non-QI columns pass through
    untouched; suppressed rows are dropped unless ``drop_suppressed`` is
    False.
    """
    qi = _validate(levels)
    cells = _level_exprs(levels)
    gcols = [_gcol(j, n) for j, n, _ in cells]
    assign = ladder_assignment(df, levels, sensitive, k, l).drop("n_rows")
    keyed = df.selectExpr(
        "*", *[f"({e}) AS {_gcol(j, n)}" for j, n, e in cells]
    )
    out = keyed.join(F.broadcast(assign), gcols)
    for name in qi:
        branches = " ".join(
            f"WHEN gen_level = {j} THEN {_gcol(j, name)}"
            for j in range(len(levels))
        )
        out = out.withColumn(
            f"{name}_released",
            F.expr(f"CASE {branches} ELSE '{SUPPRESSED}' END"),
        )
    if drop_suppressed:
        out = out.filter(F.col("gen_level") >= 0)
    return out.drop(*gcols)


def duckdb_ladder_census_sql(
    levels: Sequence[Level],
    sensitive_expr: str,
    k: int,
    l: int,  # noqa: E741
    *,
    from_sql: str,
) -> str:
    """DuckDB oracle twin of the ladder CENSUS: one row per published (or
    suppressed) class — released QI display values, gen_level, n_rows,
    n_sens — built by unrolling the same residual walk in CTEs. The level
    expressions are the same strings the Spark side groups and displays
    by, so the two engines cannot drift. ``from_sql`` supplies the input
    relation (projected to the columns the level expressions read).
    """
    qi = _validate(levels)
    cells = _level_exprs(levels)
    gdefs = ", ".join(f"({e}) AS {_gcol(j, n)}" for j, n, e in cells)
    gcols = ", ".join(_gcol(j, n) for j, n, _ in cells)
    parts = [
        f"base AS (SELECT {gdefs}, ({sensitive_expr}) AS _sens,"
        f" COUNT(*) AS _cnt FROM ({from_sql}) GROUP BY ALL)",
        "resid_0 AS (SELECT * FROM base)",
    ]
    unions = []
    for j in range(len(levels)):
        keys = ", ".join(_gcol(j, n) for n in qi)
        parts.append(
            f"ok_{j} AS (SELECT {keys} FROM resid_{j} GROUP BY {keys}"
            f" HAVING SUM(_cnt) >= {k} AND COUNT(DISTINCT _sens) >= {l})"
        )
        parts.append(
            f"hit_{j} AS (SELECT r.*, {j} AS gen_level FROM resid_{j} r"
            f" SEMI JOIN ok_{j} o USING ({keys}))"
        )
        parts.append(
            f"resid_{j + 1} AS (SELECT r.* FROM resid_{j} r"
            f" ANTI JOIN ok_{j} o USING ({keys}))"
        )
        unions.append(f"SELECT * FROM hit_{j}")
    unions.append(
        f"SELECT *, -1 AS gen_level FROM resid_{len(levels)}"
    )
    parts.append("assigned AS (" + " UNION ALL ".join(unions) + ")")
    disp = ", ".join(
        "CASE "
        + " ".join(
            f"WHEN gen_level = {j} THEN {_gcol(j, n)}"
            for j in range(len(levels))
        )
        + f" ELSE '{SUPPRESSED}' END AS {n}_released"
        for n in qi
    )
    return (
        "WITH "
        + ", ".join(parts)
        + f"""
    SELECT {disp},
           CAST(gen_level AS BIGINT) AS gen_level,
           CAST(SUM(_cnt) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT _sens) AS BIGINT) AS n_sens
    FROM assigned
    GROUP BY ALL
    ORDER BY gen_level, {", ".join(f"{n}_released" for n in qi)}
    """
    )
