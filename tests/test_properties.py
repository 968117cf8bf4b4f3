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
