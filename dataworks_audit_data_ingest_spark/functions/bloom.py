"""Broadcast Bloom-filter pre-filtering for huge blocklist joins.

The decontamination/blocklist pattern (q82, q96) wants a semi/anti join of
a 100 TB corpus against a key set. When the key set is small it broadcasts
raw (q82). When it has billions of entries, neither broadcasting the keys
nor shuffling the whole corpus against them is acceptable — the standard
move (Spark's own runtime row-level filtering, Iceberg/Delta data skipping)
is a fixed-size Bloom bitmap: build it with one aggregation over the key
set, broadcast the bitmap (m bits regardless of key count), drop the
overwhelming majority of corpus rows map-side, and run the EXACT join only
over the Bloom-positive sliver. Bloom filters have no false negatives, so
exact-verify makes the composition output-identical to the plain join —
which is exactly what lets q96 keep a DuckDB oracle.

Bit positions use Kirsch-Mitzenmacher double hashing (pos_i = h1 + i*h2
mod m) over the JVM-side ``xxhash64``/``hash`` pair — one hash evaluation
feeds all k probes, and since the bitmap never influences the final result
(exact verify removes false positives), the hash does not need to be
portable across engines, so the fast native ones are fine here (contrast
``functions.hashing``, which every checked value must go through).

Everything stays in whole-stage codegen: the bitmap is a constant-folded
array-of-longs literal, membership is shift/and arithmetic — no UDF, no
Python, no per-row allocation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_M_BITS = 1 << 16  # 64 Kbit = 8 KiB bitmap
DEFAULT_K = 4  # hash probes per key


def _positions(key_sql: str, m_bits: int, k: int) -> list[str]:
    """The k probe positions for a key (Kirsch-Mitzenmacher double hash),
    as Spark SQL expression strings (same composition style as
    ``functions.hashing``)."""
    h1 = f"xxhash64({key_sql})"
    h2 = f"CAST(hash({key_sql}) AS BIGINT)"
    return [f"pmod({h1} + {i} * {h2}, {m_bits}L)" for i in range(k)]


def _word_sql(pos: str) -> str:
    return f"shiftright({pos}, 6)"  # pos // 64


def _mask_sql(pos: str) -> str:
    return f"shiftleft(1L, CAST(pmod({pos}, 64) AS INT))"


def build_bloom_bitmap(
    keys: DataFrame,
    key_col: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> list[int]:
    """Aggregate a key DataFrame into an m-bit Bloom bitmap (list of
    ``m_bits // 64`` signed longs, word ``w`` holding bits ``64w..64w+63``).

    Scale shape: one explode to k (word, mask) rows per key, then a
    ``bit_or`` aggregation keyed by word index — partial aggregation
    collapses every map task's contribution to at most ``m_bits / 64``
    rows before the exchange, so the shuffle is bounded by
    ``tasks × m/64`` words no matter how many keys stream in. The final
    ``collect`` is the bitmap itself (≤ m/64 rows — bounded by the
    filter's configured size, never by data volume; same sanctioned-
    driver-collect class as the k-means centroids)."""
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError("m_bits must be a positive multiple of 64")
    if k < 1:
        raise ValueError("k must be >= 1")
    probes = ", ".join(_positions(key_col, m_bits, k))
    rows = (
        keys.select(F.explode(F.expr(f"array({probes})")).alias("pos"))
        .select(
            F.expr(_word_sql("pos")).alias("word"),
            F.expr(_mask_sql("pos")).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    bitmap = [0] * (m_bits // 64)
    for r in rows:
        bitmap[r["word"]] = r["bits"]
    return bitmap


def bloom_might_contain(
    key_sql: str,
    bitmap: list[int],
    m_bits: int | None = None,
    k: int = DEFAULT_K,
) -> Column:
    """Membership test column: true iff all k probe bits are set.
    ``key_sql`` is a Spark SQL expression string naming the key.

    False positives happen (rate ≈ (1 - e^(-k·n/m))^k); false negatives
    never do — callers must exact-verify positives when the result feeds
    a correctness-checked output. The bitmap rides into the plan as a
    constant-folded array literal (8 KiB at the default size), evaluated
    via element_at + bit arithmetic inside codegen."""
    if m_bits is None:
        m_bits = 64 * len(bitmap)
    if 64 * len(bitmap) != m_bits:
        raise ValueError("bitmap length does not match m_bits")
    lit_bitmap = f"array({', '.join(f'{w}L' for w in bitmap)})"
    tests = []
    for pos in _positions(key_sql, m_bits, k):
        word, mask = _word_sql(pos), _mask_sql(pos)
        tests.append(
            f"(element_at({lit_bitmap}, CAST({word} AS INT) + 1) & {mask}) != 0"
        )
    return F.expr(" AND ".join(tests))


def bloom_prefiltered_semi_join(
    corpus: DataFrame,
    keys: DataFrame,
    on: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
    anti: bool = False,
) -> DataFrame:
    """Semi (or anti) join ``corpus`` against ``keys[on]`` with a Bloom
    pre-filter: only Bloom-positive corpus rows enter the exact join, so
    the shuffle carries ≈ |true matches| + FP·|corpus| rows instead of
    the whole corpus. Output is row-identical to the plain semi/anti join
    (no false negatives + exact verify).

    For the anti form, Bloom-NEGATIVE rows are definitively clean and
    bypass the join entirely; only positives go through the exact anti
    join, and the two streams union back together."""
    bitmap = build_bloom_bitmap(keys, on, m_bits=m_bits, k=k)
    positive = bloom_might_contain(on, bitmap, m_bits=m_bits, k=k)
    if not anti:
        return corpus.filter(positive).join(keys.select(on).distinct(), on, "left_semi")
    clean = corpus.filter(~positive)
    checked = corpus.filter(positive).join(
        keys.select(on).distinct(), on, "left_anti"
    )
    return clean.unionByName(checked)
