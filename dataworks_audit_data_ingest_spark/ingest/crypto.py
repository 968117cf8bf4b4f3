"""Envelope encryption byte-compatible with the reference pipeline.

The reference (`audit_data_ingest.py:107-126`) per file:
  1. generates a fresh 16-byte session key → AES-128 (`:109`),
  2. wraps it with RSA-OAEP-SHA256 ("compatible with DKS", `:110-113`),
  3. AES-EAX-encrypts `zlib.compress(content)` (`:115,:119-120`) calling
     ``encrypt()`` only — the EAX auth tag is never persisted (quirk kept:
     decryption works, integrity check impossible),
  4. emits metadata ``{iv, ciphertext, datakeyencryptionkeyid}`` (`:121-125`)
     where ``iv`` is the 16-byte EAX nonce, b64.

pycryptodome is not available here, so the EAX *encryption* transform is
built from the public EAX spec (Bellare–Rogaway–Wagner 2003) on top of the
``cryptography`` primitives: EAX ciphertext = AES-CTR keyed on the session
key with initial counter block N' = OMAC^0_K(nonce), where OMAC^t_K(m) =
CMAC_K([t]₁₆ ∥ m). Since the reference discards the tag, CTR+OMAC^0 is the
entire wire format.
"""

from __future__ import annotations

import base64
import os
import zlib
from dataclasses import dataclass

from cryptography.hazmat.primitives import hashes, serialization
from cryptography.hazmat.primitives.asymmetric import padding
from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes
from cryptography.hazmat.primitives.cmac import CMAC


def _omac(key: bytes, tag: int, data: bytes) -> bytes:
    """OMAC^tag_K(data) = CMAC_K([tag]_16 || data) per the EAX spec."""
    c = CMAC(algorithms.AES(key))
    c.update(tag.to_bytes(16, "big") + data)
    return c.finalize()


def eax_encrypt(key: bytes, nonce: bytes, plaintext: bytes) -> bytes:
    """AES-EAX ciphertext stream (no tag — matching the reference's use of
    ``encrypt()`` without ``digest()``, `audit_data_ingest.py:120`)."""
    n_prime = _omac(key, 0, nonce)
    enc = Cipher(algorithms.AES(key), modes.CTR(n_prime)).encryptor()
    return enc.update(plaintext) + enc.finalize()


def eax_decrypt(key: bytes, nonce: bytes, ciphertext: bytes) -> bytes:
    """Inverse of :func:`eax_encrypt` (CTR is an involution)."""
    return eax_encrypt(key, nonce, ciphertext)


@dataclass(frozen=True)
class EncryptedRecord:
    ciphertext: bytes
    iv: str  # base64 EAX nonce              (metadata key "iv")
    encrypted_key: str  # base64 RSA-wrapped session key  (metadata key "ciphertext")
    key_id: str  # HSM key id             (metadata key "datakeyencryptionkeyid")

    def metadata(self) -> dict[str, str]:
        """Exactly the 3-field S3 object metadata of the reference
        (`audit_data_ingest.py:121-125`; 3 fields asserted by its test,
        `tests/test_audit_data_ingest.py:26`)."""
        return {
            "iv": self.iv,
            "ciphertext": self.encrypted_key,
            "datakeyencryptionkeyid": self.key_id,
        }


class EnvelopeEncryptor:
    """Per-record compress+encrypt kernel, usable inside executor tasks.

    Construct once per partition (or broadcast the pubkey bytes and construct
    lazily); each ``encrypt_record`` call draws a fresh session key and nonce,
    mirroring the per-file loop of the reference (`audit_data_ingest.py:107-126`).

    ``rng`` is injectable for deterministic tests (nonce/key seams — the
    testability the reference lacked, SURVEY.md §5).
    """

    def __init__(self, rsa_public_key_pem: bytes, key_id: str, rng=os.urandom):
        self._pub = serialization.load_pem_public_key(rsa_public_key_pem)
        self._key_id = key_id
        self._rng = rng

    def _wrap(self, session_key: bytes) -> bytes:
        # RSA-OAEP with SHA-256 hash and SHA-256 MGF1, matching
        # PKCS1_OAEP.new(key, hashAlgo=SHA256, mgfunc=MGF1-SHA256)
        # (`audit_data_ingest.py:110-113`).
        return self._pub.encrypt(
            session_key,
            padding.OAEP(
                mgf=padding.MGF1(algorithm=hashes.SHA256()),
                algorithm=hashes.SHA256(),
                label=None,
            ),
        )

    def encrypt_record(self, content: bytes) -> EncryptedRecord:
        session_key = self._rng(16)  # AES-128, `audit_data_ingest.py:109`
        nonce = self._rng(16)  # EAX default nonce size, surfaced as "iv"
        compressed = zlib.compress(content)  # zlib framing, NOT gzip (`:119`)
        return EncryptedRecord(
            ciphertext=eax_encrypt(session_key, nonce, compressed),
            iv=base64.b64encode(nonce).decode("ascii"),
            encrypted_key=base64.b64encode(self._wrap(session_key)).decode("ascii"),
            key_id=self._key_id,
        )
