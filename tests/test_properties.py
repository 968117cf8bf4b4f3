"""Property-based tests (hypothesis) for the engine's kernels — the testing
depth the reference lacked entirely (SURVEY.md §5 "Absent: no property-based
tests").
"""

from __future__ import annotations

import io
import zlib

from hypothesis import given, settings
from hypothesis import strategies as st

from dataworks_audit_data_ingest_spark.ingest.crypto import eax_decrypt, eax_encrypt
from dataworks_audit_data_ingest_spark.ingest.largefile import _CompressEncryptStream

KEY = st.binary(min_size=16, max_size=16)
NONCE = st.binary(min_size=16, max_size=16)


@given(key=KEY, nonce=NONCE, msg=st.binary(max_size=4096))
@settings(max_examples=50, deadline=None)
def test_eax_roundtrip_property(key, nonce, msg):
    assert eax_decrypt(key, nonce, eax_encrypt(key, nonce, msg)) == msg


@given(key=KEY, nonce=NONCE, msg=st.binary(min_size=16, max_size=2048))
@settings(max_examples=30, deadline=None)
def test_eax_ciphertext_differs_from_plaintext(key, nonce, msg):
    ct = eax_encrypt(key, nonce, msg)
    assert len(ct) == len(msg)  # CTR is length-preserving
    # a short message CAN coincide with its keystream (hypothesis found the
    # 1-byte case); at >=16 bytes the probability is 2^-128 — never
    assert ct != msg


@given(
    key=KEY,
    nonce=NONCE,
    payload=st.binary(max_size=1 << 16),
    read_sizes=st.lists(st.integers(min_value=1, max_value=9973), min_size=1, max_size=40),
)
@settings(max_examples=25, deadline=None)
def test_chunked_stream_equals_whole_blob_property(key, nonce, payload, read_sizes):
    """For ANY payload and ANY read-size pattern, the streaming
    compress+encrypt emits exactly the whole-blob bytes."""
    whole = eax_encrypt(key, nonce, zlib.compress(payload))
    stream = _CompressEncryptStream(io.BytesIO(payload), key, nonce)
    out, i = b"", 0
    while True:
        piece = stream.read(read_sizes[i % len(read_sizes)])
        i += 1
        if not piece:
            break
        out += piece
    assert out == whole


@given(
    days=st.lists(
        st.dates(min_value=__import__("datetime").date(2000, 1, 1),
                 max_value=__import__("datetime").date(2030, 1, 1)),
        min_size=1,
        max_size=20,
        unique=True,
    ),
    wm_index=st.integers(min_value=-1, max_value=19),
)
@settings(max_examples=50, deadline=None)
def test_watermark_strict_greater_property(tmp_path_factory, days, wm_index):
    """For any day set and any committed watermark, resume selects exactly
    the strictly-greater days (`audit_data_ingest.py:33` semantics)."""
    from dataworks_audit_data_ingest_spark.ingest.watermark import (
        find_start_date,
        update_progress_file,
    )

    tmp = tmp_path_factory.mktemp("wm")
    progress = tmp / "p.txt"
    days = sorted(days)
    if wm_index == -1 or wm_index >= len(days):
        wm = None
    else:
        wm = days[wm_index]
        update_progress_file(progress, wm)
    got = find_start_date(progress)
    assert got == wm
    selected = [d for d in days if wm is None or d > wm]
    if wm is None:
        assert selected == days
    else:
        assert all(d > wm for d in selected)
        assert len(selected) == len(days) - wm_index - 1


@given(s=st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_hash32_range_property(s):
    """The portable hash is always a valid unsigned 32-bit value (DuckDB
    equality is covered by test_functions; here: range/determinism on
    arbitrary unicode via the reference Python implementation)."""
    import hashlib

    h = int(hashlib.md5(f"x|{s}".encode()).hexdigest()[:8], 16)
    assert 0 <= h < 2**32


# ---------------------------------------------------------------------------
# merge_upsert_partitioned vs a dict-model reference
# ---------------------------------------------------------------------------

# day derives from id (stable partition per key) — the documented
# precondition of partition-grain CDC merge
_MERGE_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),  # id
        st.integers(min_value=0, max_value=99),  # val
    ),
    min_size=1,
    max_size=12,
).map(lambda rows: [(i, f"d{i % 3}", v) for i, v in rows])


@given(base=_MERGE_ROWS, updates=_MERGE_ROWS)
@settings(max_examples=10, deadline=None)
def test_merge_upsert_matches_dict_model(base, updates, spark, tmp_path_factory):
    """Property: merge == 'updates win per key; untouched partitions keep
    their rows' against a plain dict model. Duplicate ids inside a dataset
    are first collapsed (last write wins by val order) to keep the model
    well-defined."""
    from dataworks_audit_data_ingest_spark.sinks.writers import (
        merge_upsert_partitioned,
    )

    # collapse duplicate ids (highest val wins) so inputs are relations
    def collapse(rows):
        m = {}
        for i, d, v in sorted(rows, key=lambda r: r[2]):
            m[i] = (i, d, v)
        return list(m.values())

    base_r, upd_r = collapse(base), collapse(updates)
    out = str(tmp_path_factory.mktemp("merge") / "ds")
    spark.createDataFrame(
        base_r, "id long, day string, val long"
    ).write.partitionBy("day").parquet(out)

    merge_upsert_partitioned(
        spark,
        out,
        spark.createDataFrame(upd_r, "id long, day string, val long"),
        key_cols=("id",),
        partition_by=("day",),
    )

    # model: update rows replace same-id rows IN TOUCHED PARTITIONS; rows of
    # untouched partitions survive; an id moving between touched partitions
    # lands in the update's partition only
    touched = {d for _, d, _ in upd_r}
    model = {}
    for i, d, v in base_r:
        model[i] = (d, v)
    for i, d, v in upd_r:
        model[i] = (d, v)
    # base rows whose id was NOT updated but whose partition was untouched
    # must still exist; those in touched partitions also survive (same id
    # only replaced by updates) — the dict above already captures both.
    got = {
        r.id: (str(r.day), r.val)
        for r in spark.read.parquet(out).collect()
    }
    assert got == model


# ---------------------------------------------------------------------------
# q52c pigeonhole banding: recall guarantee for Hamming distance <= k
# ---------------------------------------------------------------------------


def _sim60_bands(sig: int) -> list[int]:
    from dataworks_audit_data_ingest_spark.queries.dedup import (
        _SIM60_BAND_BITS,
        _SIM60_BANDS,
    )

    mask = (1 << _SIM60_BAND_BITS) - 1
    return [(sig >> (_SIM60_BAND_BITS * i)) & mask for i in range(_SIM60_BANDS)]


@given(
    sig=st.integers(min_value=0, max_value=(1 << 60) - 1),
    flips=st.sets(st.integers(min_value=0, max_value=59), min_size=1, max_size=5),
)
@settings(max_examples=300, deadline=None)
def test_sim60_banding_guarantees_hamming_k_recall(sig, flips):
    """ANY pair at Hamming distance <= _SIM60_K must share at least one full
    band — including adversarial spreads that touch many bands. With k < 6
    bands this is a pigeonhole certainty, not a probabilistic recall."""
    from dataworks_audit_data_ingest_spark.queries.dedup import _SIM60_K

    assert len(flips) <= _SIM60_K
    other = sig
    for b in flips:
        other ^= 1 << b
    a, o = _sim60_bands(sig), _sim60_bands(other)
    assert any(x == y for x, y in zip(a, o)), (
        f"distance-{len(flips)} pair shares no band: flips={sorted(flips)}"
    )


def test_sim60_banding_counterexample_for_four_15bit_bands():
    """The spread that breaks the old 4 x 15-bit scheme (one flip per band:
    bits 0, 15, 30, 45 touch all four bands) still shares a band at
    6 x 10 bits — the reason for the banding change."""
    flips = [0, 15, 30, 45]
    old_bands_touched = {b // 15 for b in flips}
    assert old_bands_touched == {0, 1, 2, 3}  # old scheme: zero shared bands
    sig = 0
    other = 0
    for b in flips:
        other ^= 1 << b
    assert any(x == y for x, y in zip(_sim60_bands(sig), _sim60_bands(other)))


# ---------------------------------------------------------------------------
# Int8 quantization properties (similarity/quantize.py)
# ---------------------------------------------------------------------------

_VEC = st.lists(
    st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    ),
    min_size=1,
    max_size=8,
)


@given(vecs=st.lists(_VEC, min_size=1, max_size=4))
@settings(max_examples=15, deadline=None)
def test_quantize_roundtrip_bound_property(vecs, spark):
    """For arbitrary finite vectors (negative, tiny-range, constant):
    levels stay in [0, 255] and reconstruction error stays within
    scale/2 plus double-arithmetic slack."""
    from dataworks_audit_data_ingest_spark.similarity.quantize import (
        dequantize,
        quantize_int8,
    )

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    for r in dequantize(quantize_int8(df)).collect():
        assert all(0 <= lv <= 255 for lv in r.q_levels)
        bound = r.q_scale / 2
        for orig, deq in zip(r.embedding, r.deq_embedding):
            slack = 1e-9 * max(abs(orig), 1.0)
            assert abs(orig - deq) <= bound * 1.0000001 + slack


# ---------------------------------------------------------------------------
# functions/sketches.py — HLL algebra properties (DuckDB-evaluated, no Spark)
# ---------------------------------------------------------------------------


@settings(max_examples=25, deadline=None)
@given(
    keys=st.lists(
        st.text(alphabet="abcdefgh0123456789", min_size=1, max_size=12),
        min_size=1,
        max_size=400,
        unique=True,
    ),
    split=st.integers(min_value=0, max_value=10),
)
def test_hll_merge_is_order_and_partition_independent(keys, split):
    """Registers of any two-way split merge (element-wise MAX) to exactly
    the whole-set registers — the property that makes day/batch/partition
    boundaries invisible, for ARBITRARY key sets and split points."""
    import duckdb

    from dataworks_audit_data_ingest_spark.functions import sketches as SK

    con = duckdb.connect()
    con.execute("CREATE TABLE t (k VARCHAR, part INTEGER)")
    cut = split % (len(keys) + 1)
    con.executemany(
        "INSERT INTO t VALUES (?, ?)",
        [(k, 0 if i < cut else 1) for i, k in enumerate(keys)],
    )
    q = (
        f"SELECT {SK.hll_bucket_sql('k', 32, 'duckdb')} AS b, "
        f"MAX({SK.hll_rho_sql('k', 32, 'duckdb')}) AS m FROM t {{w}} GROUP BY 1"
    )
    whole = dict(con.execute(q.format(w="")).fetchall())
    p0 = dict(con.execute(q.format(w="WHERE part = 0")).fetchall())
    p1 = dict(con.execute(q.format(w="WHERE part = 1")).fetchall())
    merged = {b: max(p0.get(b, 0), p1.get(b, 0)) for b in set(p0) | set(p1)}
    assert merged == whole
    con.close()


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(min_value=200, max_value=3000),
)
def test_hll_estimate_scales_monotonically(n):
    """More distinct keys can never shrink S's reciprocal sum: the raw
    estimate is monotone non-decreasing in set growth (supersets)."""
    import duckdb

    from dataworks_audit_data_ingest_spark.functions import sketches as SK

    con = duckdb.connect()

    def est(limit):
        row = con.execute(
            f"""
            WITH regs AS (
              SELECT {SK.hll_bucket_sql("CAST(i AS VARCHAR)", 32, 'duckdb')} AS b,
                     MAX({SK.hll_rho_sql("CAST(i AS VARCHAR)", 32, 'duckdb')}) AS m_j
              FROM RANGE(0, {limit}) t(i) GROUP BY 1
            )
            SELECT {SK.hll_estimate_sql(
                f"SUM({SK.hll_term_sql('m_j', 32, 'duckdb')})",
                "COUNT(*)", 32, 'duckdb')}
            FROM regs
            """
        ).fetchone()
        return row[0]

    assert est(n) <= est(n + n // 2)
    con.close()


# ---------------------------------------------------------------------------
# Round-4 kernels: allocation, CUSUM identity, triangles, interval union
# ---------------------------------------------------------------------------


@given(
    counts=st.lists(st.integers(min_value=1, max_value=500), min_size=2, max_size=8),
    total=st.integers(min_value=1, max_value=400),
)
@settings(max_examples=8, deadline=None)
def test_temperature_allocation_hamilton_property(counts, total, spark):
    """Property (any source histogram, any seat total, every portable
    temperature): allocations are non-negative, sum EXACTLY to the total,
    and each is within 1 of its real-valued quota (the largest-remainder
    guarantee)."""
    from dataworks_audit_data_ingest_spark.text.pipeline import (
        temperature_allocation,
    )

    rows = [(f"s{i}", j) for i, c in enumerate(counts) for j in range(c)]
    docs = spark.createDataFrame(rows, "source string, doc_id long")
    for t in (0.5, 1.0, 2.0):
        got = {r.source: r.alloc for r in temperature_allocation(docs, total, t).collect()}
        assert sum(got.values()) == total
        w = {f"s{i}": c ** t for i, c in enumerate(counts)}
        s = sum(w.values())
        for src, alloc in got.items():
            quota = total * w[src] / s
            assert alloc >= 0
            assert quota - 1 < alloc < quota + 1 + 1e-9, (src, alloc, quota)


@given(
    xs=st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=60),
    drift=st.integers(min_value=0, max_value=50),
)
@settings(max_examples=200, deadline=None)
def test_cusum_closed_form_identity(xs, drift):
    """The identity q155 rides: max(0, S_{t-1} + x_t − κ) recursion ==
    RS_t − min(0, min_{j≤t} RS_j) for EVERY integer series and slack."""
    s = 0
    rs = 0
    min_rs = 0  # min over prefixes INCLUDING the current row (and the
    # empty prefix 0) — the frame the query's ROWS UNBOUNDED PRECEDING
    # (.. AND CURRENT ROW) window uses; excluding the current row breaks
    # the identity exactly when RS_t is the new minimum (hypothesis
    # found that counterexample against an earlier draft of this test)
    for x in xs:
        s = max(0, s + x - drift)
        rs += x - drift
        min_rs = min(min_rs, rs)
        closed = rs - min(0, min_rs)
        assert s == closed, (xs, drift)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 14), st.integers(0, 14)),
        min_size=0,
        max_size=40,
    )
)
@settings(max_examples=6, deadline=None)
def test_triangle_count_matches_bruteforce_property(edges, spark):
    import itertools

    from dataworks_audit_data_ingest_spark.functions.graph import triangle_count

    simple = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    nodes = sorted({n for e in simple for n in e})
    want = sum(
        1
        for a, b, c in itertools.combinations(nodes, 3)
        if (a, b) in simple and (b, c) in simple and (a, c) in simple
    )
    df = spark.createDataFrame(list(edges) or [(0, 0)], "u long, v long")
    got = triangle_count(df).first()
    assert got.n_triangles == want
    assert got.n_edges == len(simple)


@given(
    iv=st.lists(
        st.tuples(st.integers(0, 200), st.integers(1, 50)),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=6, deadline=None)
def test_interval_union_matches_sweep(iv, spark):
    """q158's gaps-and-islands union length == a plain sweep-line model,
    for arbitrary interval sets."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = [(1, s, s + d) for s, d in iv]
    df = spark.createDataFrame(rows, "user_id long, s long, e long")
    w = Window.partitionBy("user_id").orderBy("s", "e")
    marked = df.withColumn(
        "new_island",
        F.when(
            F.col("s")
            > F.coalesce(
                F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(-(1 << 62)),
            ),
            1,
        ).otherwise(0),
    )
    islands = marked.withColumn(
        "island", F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    got = (
        islands.groupBy("user_id", "island")
        .agg((F.max("e") - F.min("s")).alias("len"))
        .agg(F.sum("len").alias("total"))
        .first()
        .total
    )
    # sweep-line model
    want = 0
    cur_s = cur_e = None
    for s0, e0 in sorted((s, s + d) for s, d in iv):
        if cur_e is None or s0 > cur_e:
            if cur_e is not None:
                want += cur_e - cur_s
            cur_s, cur_e = s0, e0
        else:
            cur_e = max(cur_e, e0)
    want += cur_e - cur_s
    assert got == want


# ---------------------------------------------------------------------------
# Weighted-sampling kernel (functions/sampling.py)
# ---------------------------------------------------------------------------

_WS_BATCH = st.lists(
    st.tuples(st.integers(min_value=0, max_value=40),  # id (collisions likely)
              st.integers(min_value=1, max_value=1000)),  # weight
    min_size=1,
    max_size=25,
)


def _model_priority(doc_id: int, weight: int) -> int:
    """Pure-python model of the integer priority — the same MD5-prefix
    uniform and integer floor-division both engine dialects compute."""
    import hashlib

    from dataworks_audit_data_ingest_spark.functions.sampling import (
        DEFAULT_SEED,
        PRIORITY_SCALE,
    )

    digest = hashlib.md5(f"{DEFAULT_SEED}|{doc_id}".encode()).hexdigest()
    u = int(digest[:8], 16)
    return (u * PRIORITY_SCALE) // weight


@given(batches=st.lists(_WS_BATCH, min_size=1, max_size=3),
       k=st.integers(min_value=1, max_value=12))
@settings(max_examples=10, deadline=None)
def test_reservoir_merge_law_property(batches, k, spark):
    """merge(bottom-k per batch) == bottom-k over the per-id
    min-priority view of ALL rows — for arbitrary batches, duplicate ids
    across batches, and re-ingested weights. Also pins the Spark
    priority against the pure-python MD5 model (the cross-engine
    contract)."""
    from dataworks_audit_data_ingest_spark.functions.sampling import (
        merge_reservoirs,
        weighted_bottom_k,
    )

    parts = [
        weighted_bottom_k(
            spark.createDataFrame(rows, "doc_id long, weight long"),
            k,
            "doc_id",
            "weight",
        )
        for rows in batches
    ]
    got = [
        (r.doc_id, r.weight, r.priority)
        for r in merge_reservoirs(parts, k, "doc_id")
        .orderBy("priority", "doc_id")
        .collect()
    ]

    # model the real contract exactly: each batch cuts to its own
    # bottom-k over RAW rows first (duplicates intact), then the merge
    # collapses ids to their min-(priority, weight) copy and re-cuts
    expected_parts = []
    for rows in batches:
        raw = sorted((_model_priority(i, w), i, w) for i, w in rows)[:k]
        expected_parts.extend(raw)
    best = {}
    for p, i, w in sorted(expected_parts):
        if i not in best or (p, w) < best[i]:
            best[i] = (p, w)
    expected = sorted(((p, i, w) for i, (p, w) in best.items()))[:k]
    assert got == [(i, w, p) for p, i, w in expected]


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["header", "body one", "body two", "footer", "x"]),
            min_size=1,
            max_size=5,
        ),
        min_size=1,
        max_size=12,
    ),
    min_docs=st.integers(min_value=2, max_value=6),
)
@settings(max_examples=8, deadline=None)
def test_strip_boilerplate_matches_dict_model(docs, min_docs, spark):
    """strip_boilerplate_lines == a 10-line python model, for ANY corpus
    of line-lists and ANY threshold: drop lines whose doc-frequency >=
    min_docs, keep order, drop docs left empty."""
    from dataworks_audit_data_ingest_spark.text.pipeline import (
        strip_boilerplate_lines,
    )

    corpus = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    df_count: dict = {}
    for _, text in corpus:
        for line in set(text.split("\n")):
            df_count[line] = df_count.get(line, 0) + 1
    bp = {l for l, c in df_count.items() if c >= min_docs}
    want = {
        i: "\n".join(l for l in text.split("\n") if l not in bp)
        for i, text in corpus
    }
    want = {i: t for i, t in want.items() if t}

    got = {
        r.doc_id: r.text
        for r in strip_boilerplate_lines(
            spark.createDataFrame(corpus, "doc_id long, text string"),
            min_docs=min_docs,
        ).collect()
    }
    assert got == want


@given(
    vecs=st.lists(
        st.lists(
            st.integers(min_value=-5, max_value=5), min_size=3, max_size=3
        ),
        min_size=2,
        max_size=10,
    ),
    k=st.integers(min_value=1, max_value=4),
)
@settings(max_examples=8, deadline=None)
def test_mutual_knn_matches_numpy_model(vecs, k, spark):
    """mutual_knn (global path) == a numpy reciprocal-top-k model, for
    ANY small integer corpus: identical pair set AND identical ranks."""
    import math

    from dataworks_audit_data_ingest_spark.similarity import mutual_knn

    # zero vectors make cosine undefined — exclude, as the operator's
    # contract assumes nonzero embeddings
    pts = [v for v in vecs if any(v)]
    if len(pts) < 2:
        return
    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        return dot / (na * nb)

    ranks = {}
    for i, a in enumerate(pts):
        order = sorted(
            (j for j in range(len(pts)) if j != i),
            key=lambda j: (-cos(a, pts[j]), j),
        )
        for r, j in enumerate(order[:k], start=1):
            ranks[(i, j)] = r
    want = {
        (a, b): (rk, ranks[(b, a)])
        for (a, b), rk in ranks.items()
        if a < b and (b, a) in ranks
    }

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(pts)],
        "vec_id long, embedding array<double>",
    )
    got = {
        (r.vec_a, r.vec_b): (r.rank_ab, r.rank_ba)
        for r in mutual_knn(df, k=k).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# CDC join view: random op sequences vs a dict model
# ---------------------------------------------------------------------------

# a batch: per side, a list of upserts (id, key, val) and deletes
# scoped (key, id) — keys/ids from tiny domains so collisions (updates,
# re-inserts, fan-out, key moves) are the COMMON case, not the corner
_CDC_IDS = st.integers(min_value=1, max_value=5)
_CDC_KEYS = st.integers(min_value=1, max_value=3)
_CDC_VALS = st.text(alphabet="ab", min_size=1, max_size=2)


def _one_batch_ops(side_ids):
    ups = st.lists(
        st.tuples(side_ids, _CDC_KEYS, _CDC_VALS), max_size=4
    ).map(lambda rows: list({r[0]: r for r in rows}.values()))
    return st.tuples(ups, st.lists(st.tuples(_CDC_KEYS, side_ids), max_size=3))


@given(
    batches=st.lists(
        st.tuples(
            _one_batch_ops(_CDC_IDS),
            _one_batch_ops(_CDC_IDS),
            # r11 verdict #6: compaction is part of the fuzzed op
            # sequence, not a fixed drill point — after any batch the
            # store may fold with the current batch excluded (the
            # streaming rung's discipline) or fold EVERYTHING (legal
            # when nothing can replay), so the staged-swap + rank
            # ordering is exercised under random interleavings
            st.sampled_from(("none", "excl_current", "fold_all")),
        ),
        min_size=1,
        max_size=3,
    )
)
@settings(max_examples=12, deadline=None)
def test_cdc_view_matches_dict_model_property(batches, spark, tmp_path_factory):
    """For ANY sequence of CDC batches (random upserts/deletes on both
    sides, id and key collisions common) interleaved with RANDOM
    semantic compactions (current-batch-excluded or fold-everything),
    the net view equals the dict model's current_A ⋈ current_B.
    Same-version upsert+delete clashes are resolved model-side by
    dropping the delete (the engine rejects the ambiguous batch; the
    model must feed it something legal)."""
    from pyspark.sql import functions as F  # noqa: F401

    from dataworks_audit_data_ingest_spark.incremental import (
        JoinViewSpec,
        compact_join_view_cdc,
        read_join_view_cdc,
        update_join_view_cdc,
    )

    spec = JoinViewSpec(key="k", left_id="lid", right_id="rid", n_buckets=2)
    root = str(tmp_path_factory.mktemp("cdc_prop") / "view")
    lmodel: dict = {}
    rmodel: dict = {}
    for i, (lops, rops, compact_choice) in enumerate(batches):
        (lu, ld), (ru, rd) = lops, rops
        # legalize the random ops to the engine's contract:
        # (a) a delete of a (key, id) version the same batch upserts is
        #     ambiguous and rejected — drop those deletes;
        # (b) an upsert that MOVES an id to a new key must tombstone the
        #     old version (the CDC idiom; a bare move strands it —
        #     exactly what test_bare_key_move_detected_by_audit pins)
        def legalize(ups, dels, model):
            pairs = {(k, i_) for i_, k, _ in ups}
            dels = [p for p in dels if (p[0], p[1]) not in pairs]
            have = {(k, i_) for k, i_ in dels}
            for i_, k, _ in ups:
                old = model.get(i_)
                if old is not None and old[1] != k and (old[1], i_) not in have:
                    dels.append((old[1], i_))
                    have.add((old[1], i_))
            return dels

        ld = legalize(lu, ld, lmodel)
        rd = legalize(ru, rd, rmodel)

        def df(rows, schema):
            return (
                spark.createDataFrame(rows, schema) if rows else None
            )

        update_join_view_cdc(
            spark,
            root,
            f"b{i}",
            spec,
            left_upserts=df(
                [(i_, k, v) for i_, k, v in lu], "lid int, k int, lval string"
            ),
            left_deletes=df(
                [(i_, k) for k, i_ in ld], "lid int, k int"
            ),
            right_upserts=df(
                [(i_, k, v) for i_, k, v in ru], "rid int, k int, rval string"
            ),
            right_deletes=df(
                [(i_, k) for k, i_ in rd], "rid int, k int"
            ),
        )
        for model, ups, dels in ((lmodel, lu, ld), (rmodel, ru, rd)):
            for k, i_ in dels:
                if i_ in model and model[i_][1] == k:
                    del model[i_]
            for i_, k, v in ups:
                model[i_] = (i_, k, v)
        if compact_choice != "none":
            exclude = (f"b{i}",) if compact_choice == "excl_current" else ()
            compact_join_view_cdc(spark, root, spec, exclude=exclude)

    got = read_join_view_cdc(spark, root)
    want = sorted(
        (k, li, lv, ri, rv)
        for (li, k, lv) in lmodel.values()
        for (ri, rk, rv) in rmodel.values()
        if k == rk
    )
    got_rows = (
        sorted((r.k, r.lid, r.lval, r.rid, r.rval) for r in got.collect())
        if got is not None
        else []
    )
    assert got_rows == want
