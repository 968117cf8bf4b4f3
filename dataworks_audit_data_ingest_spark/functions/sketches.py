"""HyperLogLog in exact BIGINT arithmetic — cross-engine SQL builders.

The built-in sketches (``approx_count_distinct``, ``percentile_approx``)
are the right defaults in production but their register encodings are
engine-private, so results can only be rows-only checked (q42). This
kernel builds the same idea from the published algorithm [Flajolet et al.,
AofA 2007] in pure integer SQL that Spark and DuckDB evaluate identically,
which makes register tables AND estimates hash-checkable — and, more
importantly, makes the registers a durable, engine-neutral artifact: a
daily register table written by Spark can be merged (element-wise MAX) by
any engine later.

Spec (m = 2^p registers):

    h      = 32-bit MD5-derived hash (functions/hashing.py)
    bucket = h % m
    w      = h DIV m                      ((32-p)-bit suffix)
    rho    = (33-p) - bit_length(w)       (leading zeros + 1; w=0 -> 33-p)
    M_j    = MAX(rho) per bucket          (merge of sketches = same MAX)
    S      = Σ_j 2^((33-p) - M_j)         (empty register: M_j = 0)
    E      = (alpha_ppm * m^2 * 2^(33-p)) DIV (10^6 * S)

``bit_length`` is LENGTH(BIN(w)) — verified identical in both engines
(minimal binary strings, BIN(0) = '0'). The raw Flajolet estimator only:
the small-range linear-counting branch needs ln() and is documented out of
scope; callers get the empty-register count to apply it if needed.
"""

from __future__ import annotations

from .hashing import duckdb_hash32, spark_hash32

# alpha_m in ppm for the register counts this package uses (published
# constants: alpha_16 = 0.673, alpha_32 = 0.697, alpha_64 = 0.709,
# alpha_m>=128 = 0.7213/(1 + 1.079/m)).
ALPHA_PPM = {16: 673_000, 32: 697_000, 64: 709_000, 128: 715_270, 256: 718_274}


def hll_shift(m: int) -> int:
    """Max rho for m = 2^p buckets: (32 - p) suffix bits + 1."""
    p = m.bit_length() - 1
    assert 1 << p == m, "m must be a power of two"
    return 33 - p


def hll_bucket_sql(key_expr: str, m: int, dialect: str, seed: str = "hll") -> str:
    """SQL for the register index of ``key_expr`` (a string expression)."""
    h = (spark_hash32 if dialect == "spark" else duckdb_hash32)(key_expr, seed=seed)
    return f"(({h}) % {m})"


def hll_rho_sql(key_expr: str, m: int, dialect: str, seed: str = "hll") -> str:
    """SQL for rho (leading-zero rank) of ``key_expr``'s hash suffix."""
    h = (spark_hash32 if dialect == "spark" else duckdb_hash32)(key_expr, seed=seed)
    div = "DIV" if dialect == "spark" else "//"
    w = f"(({h}) {div} {m})"
    s = hll_shift(m)
    return f"(CASE WHEN {w} = 0 THEN {s} ELSE {s} - LENGTH(BIN({w})) END)"


def hll_estimate_sql(s_expr: str, n_present_expr: str, m: int, dialect: str) -> str:
    """SQL for the integer estimate given ``S`` summed over PRESENT
    registers and the present-register count (absent registers contribute
    2^shift each)."""
    shift = hll_shift(m)
    one = "CAST(1 AS BIGINT)"
    big = (
        f"SHIFTLEFT({one}, {shift})"
        if dialect == "spark"
        else f"({one} << {shift})"
    )
    div = "DIV" if dialect == "spark" else "//"
    alpha = ALPHA_PPM[m]
    total_s = f"(({s_expr}) + ({m} - ({n_present_expr})) * {big})"
    return f"CAST(({alpha} * {m * m} * {big}) {div} (1000000 * {total_s}) AS BIGINT)"


def hll_term_sql(mj_expr: str, m: int, dialect: str) -> str:
    """SQL for one register's contribution to S: 2^(shift - M_j)."""
    shift = hll_shift(m)
    one = "CAST(1 AS BIGINT)"
    if dialect == "spark":
        return f"SHIFTLEFT({one}, {shift} - ({mj_expr}))"
    return f"({one} << ({shift} - ({mj_expr})))"


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — Bar-Yossef et al., "Counting
# distinct elements in a data stream" (RANDOM 2002); estimator form from
# Beyer et al., "On synopses for distinct-value estimation under multiset
# operations" (SIGMOD 2007): keep the k smallest distinct hash values;
# with the k-th smallest of a [0, 2^32) integer hash at U_k, the unbiased
# estimate is (k-1) * 2^32 / U_k.
#
# Unlike HLL, every quantity here is exact integer arithmetic over the
# portable MD5 hash — the sketch, the merge (a k-smallest union), AND the
# estimate are bit-identical across engines, so KMV queries can be fully
# hash-checked by the oracle (HLL's q107 pattern, without even needing
# shared float constants). Accuracy ~ 1/sqrt(k): k=256 → ~6 % rel. error.
# The sketch also supports multiset ops: union = k-smallest of the merged
# value lists; Jaccard = overlap fraction within the union's k-set.

KMV_DOMAIN = 1 << 32  # hash values are uniform in [0, 2^32)


def kmv_estimate_sql(kth_expr: str, n_expr: str, k: int, dialect: str) -> str:
    """Distinct-count estimate from the k-th smallest hash — exact integer
    arithmetic; only the integer-division token differs by dialect
    (Spark ``DIV``, DuckDB ``//``). ``n_expr`` is the number of values
    actually held (< k means the group's distinct count is exact —
    return it directly)."""
    div = "DIV" if dialect == "spark" else "//"
    return (
        f"CASE WHEN {n_expr} < {k} THEN {n_expr} "
        f"ELSE ({k} - 1) * {KMV_DOMAIN} {div} {kth_expr} END"
    )
