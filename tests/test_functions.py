"""Unit tests for the portable building blocks: cross-engine hashing, EAX
crypto primitives, watermark store, multimodal decode plumbing.
"""

from __future__ import annotations

import duckdb
import pytest

from dataworks_audit_data_ingest_spark.functions.hashing import (
    duckdb_hash32,
    spark_hash32,
)
from dataworks_audit_data_ingest_spark.ingest.crypto import eax_decrypt, eax_encrypt
from dataworks_audit_data_ingest_spark.multimodal import (
    decode_media_batches,
    fake_decode_record,
    with_media_payload,
)


def test_hash32_cross_engine(spark):
    """The MD5-derived 32-bit hash must agree between Spark SQL and DuckDB
    for arbitrary strings — the foundation of every dedup oracle."""
    samples = ["", "a", "hello world", "the fast key", "ünïcode ok", "x" * 500]
    sdf = spark.createDataFrame([(s,) for s in samples], "s string")
    spark_vals = [
        r[0]
        for r in sdf.selectExpr(f"{spark_hash32('s', 'seed1')} AS h")
        .collect()
    ]
    con = duckdb.connect()
    duck_vals = [
        con.execute(f"SELECT {duckdb_hash32('?::VARCHAR', 'seed1')}", [s]).fetchone()[0]
        for s in samples
    ]
    assert spark_vals == duck_vals
    assert all(0 <= v < 2**32 for v in spark_vals)


def test_eax_ctr_involution():
    key = bytes(range(16))
    nonce = bytes(range(16, 32))
    for msg in [b"", b"x", b"hello" * 1000]:
        ct = eax_encrypt(key, nonce, msg)
        assert eax_decrypt(key, nonce, ct) == msg
        if msg:
            assert ct != msg


def test_eax_nonce_separates_streams():
    key = bytes(16)
    c1 = eax_encrypt(key, b"\x00" * 16, b"same message")
    c2 = eax_encrypt(key, b"\x01" * 16, b"same message")
    assert c1 != c2


def test_fake_decode_record_deterministic():
    meta = fake_decode_record(b"Qx12345")
    assert meta == {"n_bytes": 7, "width": ord("Q") + 1, "height": ord("x") + 1, "n_frames": 0}
    assert fake_decode_record(b"") == {
        "n_bytes": 0,
        "width": 1,
        "height": 1,
        "n_frames": 0,
    }


def test_decode_media_batches_plumbing(spark):
    from dataworks_audit_data_ingest_spark.tables import table

    d = table(spark, "/root/testdata/sf0.001", "documents").limit(20)
    out = decode_media_batches(with_media_payload(d))
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == 20
    src = {r.doc_id: r.text for r in d.select("doc_id", "text").collect()}
    for doc_id, r in rows.items():
        assert r.n_bytes == len(src[doc_id].encode())
        assert r.width == src[doc_id].encode()[0] + 1
        assert r.media_type == "image"


def test_real_decode_gates_on_pillow(spark):
    """mode='real' decodes true image metadata when Pillow exists, and
    raises a NotImplementedError naming the dependency when it doesn't."""
    from dataworks_audit_data_ingest_spark.tables import table

    try:
        import PIL  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False

    if not have_pil:
        d = with_media_payload(table(spark, "/root/testdata/sf0.001", "documents"))
        with pytest.raises(NotImplementedError, match="Pillow"):
            decode_media_batches(d, mode="real")
        return

    # Pillow available: build real PNGs and decode their true dimensions
    import io

    from PIL import Image

    def png_bytes(w, h):
        buf = io.BytesIO()
        Image.new("RGB", (w, h), (1, 2, 3)).save(buf, format="PNG")
        return buf.getvalue()

    rows = [(1, png_bytes(8, 6)), (2, png_bytes(3, 5))]
    d = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in decode_media_batches(d, mode="real").collect()}
    assert (got[1].width, got[1].height) == (8, 6)
    assert (got[2].width, got[2].height) == (3, 5)
    assert got[1].media_type == "png" and got[1].n_frames == 1


def test_sample_frames_and_resize(spark):
    from dataworks_audit_data_ingest_spark.multimodal.ops import (
        resize_media,
        sample_frames,
    )
    from dataworks_audit_data_ingest_spark.tables import table

    d = table(spark, "/root/testdata/sf0.001", "documents").limit(30)
    media = decode_media_batches(with_media_payload(d))
    frames = sample_frames(media, every_k=2).collect()
    assert frames, "expected at least one sampled frame"
    for r in frames:
        assert r.frame_idx % 2 == 0 and 0 <= r.frame_idx < r.n_frames
    resized = resize_media(media, max_width=64, max_height=64).collect()
    for r in resized:
        assert r.target_width <= 64 and r.target_height <= 64
        assert r.target_width >= 1 and r.target_height >= 1


# ---------------------------------------------------------------------------
# functions/expectations.py
# ---------------------------------------------------------------------------


def test_expectations_count_violations(spark):
    """Engineered frame: every rule sees a known number of offenders."""
    import pytest

    from dataworks_audit_data_ingest_spark.functions import expectations as EX

    df = spark.createDataFrame(
        [
            (1, "alpha", 5),
            (1, "beta", 4),      # duplicate id
            (None, "gamma", 5),  # null id
            (3, "", -2),         # empty text, negative len
            (4, "delta!", 6),    # bad slug
        ],
        "id bigint, slug string, n bigint",
    )
    rows = EX.check_expectations(
        df,
        [
            EX.not_null("id"),
            EX.unique("id"),
            EX.in_range("n", 0, 100),
            EX.matches("slug", "^[a-z]+$", name="slug_shape"),
            EX.satisfies("n >= 0 OR slug = ''", name="escape_hatch"),
        ],
    ).collect()
    got = {r.expectation: (r.n_violations, r.passed) for r in rows}
    assert got == {
        "not_null(id)": (1, False),
        "unique(id)": (1, False),
        "in_range(n,0,100)": (1, False),
        "slug_shape": (2, False),  # "" and "delta!"
        "escape_hatch": (0, True),
    }
    with pytest.raises(ValueError):
        EX.check_expectations(df, [])


def test_expectations_single_aggregation_job(spark):
    """The suite must compile to one aggregate over the input — no
    per-rule scans: exactly one scan of the source in the physical plan."""
    from dataworks_audit_data_ingest_spark.functions import expectations as EX

    df = spark.range(100).selectExpr("id", "CAST(id % 7 AS STRING) AS s")
    plan = (
        EX.check_expectations(df, [EX.not_null("id"), EX.in_range("id", 0, 99)])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Range (0, 100") == 1, plan


def test_cdc_window_hash_overflow_guard():
    """win=9 is the largest window whose max hash 0x10FFFF*(31^win-1)/30
    fits BIGINT for the FULL codepoint range; at win=10 Spark (non-ANSI)
    wraps silently where DuckDB raises, so cross-engine chunk boundaries
    would silently diverge on non-ASCII text. The guard must reject it."""
    from dataworks_audit_data_ingest_spark.functions.hashing import (
        cdc_window_hash,
    )

    assert "ascii" in cdc_window_hash("t", "p", 9)  # allowed
    assert 0x10FFFF * (31**9 - 1) // 30 < 2**63 - 1
    assert 0x10FFFF * (31**10 - 1) // 30 > 2**63 - 1
    with pytest.raises(ValueError):
        cdc_window_hash("t", "p", 10)


def test_cents_idiom_is_cross_engine_portable(spark):
    """CAST(FLOOR(x*100 + 0.5) AS BIGINT) must agree between Spark and
    DuckDB for adversarial doubles — half-cent boundaries, negatives,
    values whose x*100 is not exactly representable — while the bare
    CAST(x*100 AS BIGINT) provably does NOT (DuckDB rounds, Spark
    truncates; the q110 sf0.1 divergence). Seeded differential check."""
    import random

    import duckdb

    rng = random.Random(20260814)
    vals = [round(rng.uniform(-10_000, 10_000), 2) for _ in range(400)]
    vals += [3468.755, -999.845, 0.005, -0.005, 123.455, 9999.995]
    vals += [v + 0.005 for v in vals[:50]]  # exact half-cent boundaries

    sdf = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i int, x double")
    sp = {
        r.i: r.c
        for r in sdf.selectExpr(
            "i", "CAST(FLOOR(x * 100 + 0.5) AS BIGINT) AS c"
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(vals)))
    du = dict(
        con.execute(
            "SELECT i, CAST(FLOOR(x * 100 + 0.5) AS BIGINT) FROM t"
        ).fetchall()
    )
    assert sp == du
    # and the bare cast really is the trap the idiom avoids
    bare_sp = {
        r.i: r.c
        for r in sdf.selectExpr("i", "CAST(x * 100 AS BIGINT) AS c").collect()
    }
    bare_du = dict(
        con.execute("SELECT i, CAST(x * 100 AS BIGINT) FROM t").fetchall()
    )
    assert bare_sp != bare_du
