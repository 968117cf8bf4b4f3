"""Order-insensitive table fingerprints — the anti-entropy primitive
behind q261, as a reusable operator: compare two replicas (or a table
across a migration, compaction, or engine swap) WITHOUT moving rows,
and localize any divergence to the audit group it happened in.

Design (Dynamo/Cassandra anti-entropy, one Merkle level): per group, the
row count plus a SUM of a 32-bit MD5 hash over a CANONICAL row
serialization. SUM, not XOR — a duplicated row XORs itself away; the sum
accumulates in DECIMAL(38,0), so it is EXACT for any group size (a
BIGINT accumulator would wrap silently past ~2^31 rows per group —
2^32·2^31 exceeds BIGINT max — and engines disagree on wrap behavior).
MD5 (not xxhash64) so the fingerprint is ENGINE-PORTABLE: the same rows
produce the same checksum in Spark, DuckDB, or anything else with MD5 —
which is the point of an audit that spans systems
(`functions/hashing.py`'s contract).

Canonical serialization is INJECTIVE: field values are escaped before
joining with ``|`` so that delimiter characters in the data cannot shift
field boundaries — ('a|b','c') and ('a','b|c') fingerprint differently.
The escape character is ``␛`` (U+241B), NOT backslash: Spark SQL
processes backslash escapes inside string literals while DuckDB does
not, so any backslash-bearing SQL text would silently mean different
strings per engine. NULL serializes as the bare sentinel ``␀``
(U+2400); a *literal* ␀ in data is escaped to ``␛␀``, so the NULL
encoding collides with nothing.

Canonicalization is strict about floats: a DOUBLE column is REJECTED
with instructions rather than silently serialized — float→string
formatting differs across engines and would make two identical replicas
look diverged. Quantize to integer units (cents, micros) first.

Scale shape: one map-side partial agg riding the scan (hash computed
in-codegen), one exchange of (group, count, sum) partials — the
cheapest possible full-content audit; every byte is read exactly once
and nothing wider than the group key is shuffled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SEP = "|"
NULL_SENTINEL = "␀"  # U+2400 SYMBOL FOR NULL
ESCAPE = "␛"  # U+241B SYMBOL FOR ESCAPE — deliberately not backslash


def hash32_col(c: Column) -> Column:
    """Column-level twin of `hashing.spark_hash32`: first 8 hex chars of
    MD5 as a BIGINT — identical value in any engine with MD5."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint")


def escape_field_sql(expr: str) -> str:
    """Dialect-free SQL escaping a STRING expression so the ``|`` joiner
    stays injective: ``␛``→``␛␛`` first, then ``|``→``␛|`` and
    ``␀``→``␛␀``. REPLACE/CONCAT text is identical in Spark SQL and
    DuckDB (no backslashes — the one literal class the two parsers
    disagree on)."""
    e = f"REPLACE({expr}, '{ESCAPE}', '{ESCAPE}{ESCAPE}')"
    e = f"REPLACE({e}, '{SEP}', '{ESCAPE}{SEP}')"
    return f"REPLACE({e}, '{NULL_SENTINEL}', '{ESCAPE}{NULL_SENTINEL}')"


def canonical_row_sql(field_exprs: list[str]) -> str:
    """Dialect-free canonical row serialization of pre-cast STRING field
    expressions: each field escaped (see :func:`escape_field_sql`), NULL
    encoded as the bare ``␀`` sentinel, fields joined with ``|``.
    Injective over tuples of (nullable) strings by construction. Shared
    by q261's Spark and DuckDB sides so the two can never drift."""
    parts = [
        f"COALESCE({escape_field_sql(e)}, '{NULL_SENTINEL}')"
        for e in field_exprs
    ]
    return f"CONCAT_WS('{SEP}', {', '.join(parts)})"


def _escape_field(c: Column) -> Column:
    c = F.replace(c, F.lit(ESCAPE), F.lit(ESCAPE + ESCAPE))
    c = F.replace(c, F.lit(SEP), F.lit(ESCAPE + SEP))
    return F.replace(c, F.lit(NULL_SENTINEL), F.lit(ESCAPE + NULL_SENTINEL))


def canonical_row(df: DataFrame, content_cols: list[str]) -> Column:
    """``|``-joined, type-canonical, ESCAPED serialization of
    ``content_cols`` — deterministic, engine-portable, and injective:
    ``␛``/``|``/``␀`` in field values are ␛-escaped before joining, and
    NULL serializes as the bare ``␀`` sentinel (CONCAT_WS would
    otherwise SKIP a null argument — separator included — so
    ('a', NULL, 'b') and ('a', 'b', NULL) would collide). No remaining
    collision class: the escaped alphabet keeps separators and the NULL
    encoding out of data's reach."""
    parts = []
    for c in content_cols:
        dt = df.schema[c].dataType
        if isinstance(dt, (T.DoubleType, T.FloatType)):
            raise TypeError(
                f"column {c!r} is {dt.simpleString()}: float→string "
                "formatting is not engine-portable; quantize to integer "
                "units first (e.g. CAST(FLOOR(x * 100 + 0.5) AS BIGINT))"
            )
        if isinstance(dt, T.BinaryType):
            part = F.hex(F.col(c))
        else:
            part = F.col(c).cast("string")
        parts.append(F.coalesce(_escape_field(part), F.lit(NULL_SENTINEL)))
    return F.concat_ws(SEP, *parts)


def table_fingerprint(
    df: DataFrame,
    group_cols: list[str],
    content_cols: list[str],
) -> DataFrame:
    """Per-group ``(n_rows, checksum)`` fingerprint of ``df``. Two
    tables agree on a group iff both values agree; group granularity is
    the localization granularity (a month, a day, a shard). The checksum
    is DECIMAL(38,0) — exact at any group size; compare the decimals
    (or their string forms), never a lossy float rendering."""
    if not group_cols:
        raise ValueError("group_cols must name at least one column")
    row = canonical_row(df, content_cols)
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(hash32_col(row).cast("decimal(38,0)")).alias("checksum"),
    )


def fingerprint_diff(a: DataFrame, b: DataFrame) -> DataFrame:
    """Groups where two fingerprint tables disagree — present on one
    side only, or differing in count/checksum. Output: the group columns
    plus ``(a_rows, a_checksum, b_rows, b_checksum)`` with NULLs for a
    group missing from one side entirely."""
    group_cols = [c for c in a.columns if c not in ("n_rows", "checksum")]
    an = a.select(
        *group_cols,
        F.col("n_rows").alias("a_rows"),
        F.col("checksum").alias("a_checksum"),
    )
    bn = b.select(
        *group_cols,
        F.col("n_rows").alias("b_rows"),
        F.col("checksum").alias("b_checksum"),
    )
    # null-safe join keys: a NULL-valued audit group (e.g. region=NULL)
    # must MATCH its twin on the other side, not read as two
    # irreparable one-sided divergences
    cond = None
    for c in group_cols:
        eq = an[c].eqNullSafe(bn[c])
        cond = eq if cond is None else cond & eq
    joined = an.join(bn, on=cond, how="full_outer").select(
        *[F.coalesce(an[c], bn[c]).alias(c) for c in group_cols],
        "a_rows",
        "a_checksum",
        "b_rows",
        "b_checksum",
    )
    return joined.filter(
        ~(
            F.col("a_rows").eqNullSafe(F.col("b_rows"))
            & F.col("a_checksum").eqNullSafe(F.col("b_checksum"))
        )
    )
