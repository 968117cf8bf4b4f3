"""Envelope key rotation drill: metadata-only rewrap — payload bytes
untouched, new key opens everything, retiring key opens nothing,
idempotent re-run."""

from __future__ import annotations

import boto3
import pytest
from cryptography.hazmat.primitives import serialization
from cryptography.hazmat.primitives.asymmetric import rsa

from dataworks_audit_data_ingest_spark.ingest import IngestConfig, run_ingest
from dataworks_audit_data_ingest_spark.ingest.decrypt import (
    read_encrypted_objects,
)
from dataworks_audit_data_ingest_spark.ingest.rotate import (
    rotate_envelope_keys,
)

PAYLOADS = {
    "a.json": b'{"id": "0001", "type": "donut", "name": "Cake"}',
    "b.json": b'{"id": "0002", "type": "ice-cream", "name": "Chocobar"}',
}


def _pem(priv):
    return priv.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.PKCS8,
        serialization.NoEncryption(),
    )


def test_rotation_rewraps_without_touching_payloads(
    spark, moto_s3, rsa_keypair, tmp_path
):
    old_priv, old_pub_pem = rsa_keypair
    src = tmp_path / "src"
    (src / "2022-02-02").mkdir(parents=True)
    for name, payload in PAYLOADS.items():
        (src / "2022-02-02" / name).write_bytes(payload)
    bucket = "rotate-bucket"
    client = boto3.client("s3", region_name="eu-west-2", endpoint_url=moto_s3)
    client.create_bucket(
        Bucket=bucket,
        CreateBucketConfiguration={"LocationConstraint": "eu-west-2"},
    )
    cfg = IngestConfig(
        src_dir=str(src),
        s3_bucket=bucket,
        s3_prefix="rot/",
        hsm_key_id="cloudhsm:old",
        rsa_public_key_pem=old_pub_pem,
        progress_file=str(tmp_path / "p.txt"),
        s3_endpoint_url=moto_s3,
        extra_boto_kwargs={
            "aws_access_key_id": "testing",
            "aws_secret_access_key": "testing",
        },
    )
    run_ingest(spark, cfg)

    # snapshot the ciphertext BODIES before rotation
    keys = [
        o["Key"]
        for o in client.list_objects_v2(Bucket=bucket, Prefix="rot/")["Contents"]
    ]
    bodies_before = {
        k: client.get_object(Bucket=bucket, Key=k)["Body"].read() for k in keys
    }

    new_priv = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    new_pub_pem = new_priv.public_key().public_bytes(
        serialization.Encoding.PEM,
        serialization.PublicFormat.SubjectPublicKeyInfo,
    )
    n = rotate_envelope_keys(
        spark, cfg, _pem(old_priv), new_pub_pem, "cloudhsm:new"
    )
    assert n == len(PAYLOADS)

    # payload ciphertext is bit-identical — rotation moved only metadata
    for k in keys:
        obj = client.get_object(Bucket=bucket, Key=k)
        assert obj["Body"].read() == bodies_before[k]
        assert obj["Metadata"]["datakeyencryptionkeyid"] == "cloudhsm:new"
        assert set(obj["Metadata"]) == {
            "iv", "ciphertext", "datakeyencryptionkeyid",
        }  # the reference's exact 3-field contract survives rotation

    # the NEW key decrypts everything, byte-identical to the originals
    rows = {
        r.basename: bytes(r.payload)
        for r in read_encrypted_objects(spark, cfg, _pem(new_priv)).collect()
    }
    assert rows == PAYLOADS

    # the RETIRING key opens nothing anymore
    with pytest.raises(Exception):
        read_encrypted_objects(spark, cfg, _pem(old_priv)).collect()

    # idempotent: a re-run (crash recovery) rewraps zero objects
    assert (
        rotate_envelope_keys(
            spark, cfg, _pem(old_priv), new_pub_pem, "cloudhsm:new"
        )
        == 0
    )


def _setup_bucket(spark, moto_s3, tmp_path, old_pub_pem, payloads, bucket):
    src = tmp_path / "src"
    (src / "2022-02-02").mkdir(parents=True)
    for name, payload in payloads.items():
        (src / "2022-02-02" / name).write_bytes(payload)
    client = boto3.client("s3", region_name="eu-west-2", endpoint_url=moto_s3)
    client.create_bucket(
        Bucket=bucket,
        CreateBucketConfiguration={"LocationConstraint": "eu-west-2"},
    )
    cfg = IngestConfig(
        src_dir=str(src),
        s3_bucket=bucket,
        s3_prefix="rot/",
        hsm_key_id="cloudhsm:old",
        rsa_public_key_pem=old_pub_pem,
        progress_file=str(tmp_path / "p.txt"),
        s3_endpoint_url=moto_s3,
        extra_boto_kwargs={
            "aws_access_key_id": "testing",
            "aws_secret_access_key": "testing",
        },
    )
    run_ingest(spark, cfg)
    return bucket, client, cfg


def test_rotation_skips_stray_objects_and_reports(
    spark, moto_s3, rsa_keypair, tmp_path
):
    """A non-envelope object under the prefix must not abort the run
    (ADVICE r08): it is skipped with status skipped_no_envelope while
    every real envelope object still rotates."""
    old_priv, old_pub_pem = rsa_keypair
    bucket, client, cfg = _setup_bucket(
        spark, moto_s3, tmp_path, old_pub_pem, PAYLOADS, "rotate-bucket-stray"
    )
    # a stray partial upload with NO envelope metadata
    client.put_object(Bucket=bucket, Key="rot/STRAY.tmp", Body=b"junk")

    new_priv = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    new_pub_pem = new_priv.public_key().public_bytes(
        serialization.Encoding.PEM,
        serialization.PublicFormat.SubjectPublicKeyInfo,
    )
    audit = str(tmp_path / "audit")
    n = rotate_envelope_keys(
        spark, cfg, _pem(old_priv), new_pub_pem, "cloudhsm:new",
        audit_path=audit,
    )
    assert n == len(PAYLOADS)  # the stray neither counted nor crashed
    stray = client.get_object(Bucket=bucket, Key="rot/STRAY.tmp")
    assert stray["Body"].read() == b"junk"
    assert stray["Metadata"] == {}
    detail = spark.read.parquet(audit).collect()[0].detail
    assert "skipped_no_envelope=1" in detail


def test_rotation_multipart_path_above_copy_threshold(
    spark, moto_s3, rsa_keypair, tmp_path
):
    """Objects at/above the CopyObject cap take the multipart
    upload_part_copy route (threshold shrunk here so the drill does not
    need a 5 GiB fixture): payload bytes stay bit-identical, metadata
    lands on the new key, and the new key decrypts."""
    import os

    old_priv, old_pub_pem = rsa_keypair
    big = {"big.bin": os.urandom(11 * 1024 * 1024)}  # incompressible
    bucket, client, cfg = _setup_bucket(
        spark, moto_s3, tmp_path, old_pub_pem, big, "rotate-bucket-mpu"
    )
    keys = [
        o["Key"]
        for o in client.list_objects_v2(Bucket=bucket, Prefix="rot/")["Contents"]
    ]
    bodies_before = {
        k: client.get_object(Bucket=bucket, Key=k)["Body"].read() for k in keys
    }
    assert any(len(b) > 10 * 1024 * 1024 for b in bodies_before.values())

    new_priv = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    new_pub_pem = new_priv.public_key().public_bytes(
        serialization.Encoding.PEM,
        serialization.PublicFormat.SubjectPublicKeyInfo,
    )
    n = rotate_envelope_keys(
        spark, cfg, _pem(old_priv), new_pub_pem, "cloudhsm:new",
        multipart_threshold=1024 * 1024,       # force the multipart branch
        multipart_part_size=5 * 1024 * 1024,   # 3 range-copied parts
    )
    assert n == 1
    for k in keys:
        obj = client.get_object(Bucket=bucket, Key=k)
        assert obj["Body"].read() == bodies_before[k]
        assert obj["Metadata"]["datakeyencryptionkeyid"] == "cloudhsm:new"
        assert set(obj["Metadata"]) == {
            "iv", "ciphertext", "datakeyencryptionkeyid",
        }
    rows = {
        r.basename: bytes(r.payload)
        for r in read_encrypted_objects(spark, cfg, _pem(new_priv)).collect()
    }
    assert rows == big
