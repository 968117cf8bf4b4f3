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
