"""Large-file streaming ingest: chunked-CTR equivalence with the whole-blob
path and multipart-upload round-trip on a multi-chunk file.
"""

from __future__ import annotations

import base64
import os
import zlib

import boto3
import pytest
from cryptography.hazmat.primitives import hashes
from cryptography.hazmat.primitives.asymmetric import padding

from dataworks_audit_data_ingest_spark.ingest import IngestConfig, eax_decrypt
from dataworks_audit_data_ingest_spark.ingest.crypto import eax_encrypt
from dataworks_audit_data_ingest_spark.ingest.largefile import (
    _CompressEncryptStream,
    encrypt_and_upload_large,
    list_files,
)


def test_chunked_stream_matches_whole_blob_path():
    """CTR keystream continuation: chunked encrypt == one-shot encrypt."""
    import io

    key, nonce = bytes(range(16)), bytes(range(16, 32))
    payload = os.urandom(1 << 20)  # 1 MiB
    whole = eax_encrypt(key, nonce, zlib.compress(payload))
    stream = _CompressEncryptStream(io.BytesIO(payload), key, nonce)
    chunked = b""
    while True:
        piece = stream.read(64 * 1024 + 7)  # odd size: cross chunk edges
        if not piece:
            break
        chunked += piece
    assert chunked == whole


def test_large_file_roundtrip(spark, moto_s3, rsa_keypair, tmp_path):
    priv, pub_pem = rsa_keypair
    src = tmp_path / "big"
    (src / "2023-03-03").mkdir(parents=True)
    payload = os.urandom(12 * 1024 * 1024)  # multi-chunk, multipart-sized
    (src / "2023-03-03" / "huge.bin").write_bytes(payload)
    bucket = "large-bucket"
    boto3.client("s3", region_name="eu-west-2", endpoint_url=moto_s3).create_bucket(
        Bucket=bucket,
        CreateBucketConfiguration={"LocationConstraint": "eu-west-2"},
    )
    cfg = IngestConfig(
        src_dir=str(src),
        s3_bucket=bucket,
        s3_prefix="big/",
        hsm_key_id="cloudhsm:9",
        rsa_public_key_pem=pub_pem,
        progress_file=str(tmp_path / "p.txt"),
        s3_endpoint_url=moto_s3,
        extra_boto_kwargs={
            "aws_access_key_id": "testing",
            "aws_secret_access_key": "testing",
        },
    )
    result = encrypt_and_upload_large(list_files(spark, str(src)), cfg).collect()
    assert len(result) == 1
    assert result[0].s3_key == "big/2023-03-03/huge.bin.gz.enc"

    s3 = boto3.client("s3", region_name="eu-west-2", endpoint_url=moto_s3)
    obj = s3.get_object(Bucket=bucket, Key=result[0].s3_key)
    meta = obj["Metadata"]
    assert set(meta) == {"iv", "ciphertext", "datakeyencryptionkeyid"}
    session_key = priv.decrypt(
        base64.b64decode(meta["ciphertext"]),
        padding.OAEP(
            mgf=padding.MGF1(algorithm=hashes.SHA256()),
            algorithm=hashes.SHA256(),
            label=None,
        ),
    )
    plain = zlib.decompress(
        eax_decrypt(session_key, base64.b64decode(meta["iv"]), obj["Body"].read())
    )
    assert plain == payload
