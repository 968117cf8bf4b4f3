"""North-star rehearsal (VERDICT r09 #1): the full Kafka-shaped topology
— checkpoint-resumable message stream → zlib+AES-128-EAX envelope encrypt
→ metadata-bearing S3 sink — as ONE streaming job over the native Python
streaming source (no connector jar), with checkpoint crash/restart and a
stream==batch byte-identity drill through the decrypt round-trip."""

from __future__ import annotations

from pathlib import Path

import boto3
import pytest
from cryptography.hazmat.primitives import serialization

from dataworks_audit_data_ingest_spark.ingest import IngestConfig
from dataworks_audit_data_ingest_spark.ingest.decrypt import (
    read_encrypted_objects,
)
from dataworks_audit_data_ingest_spark.sources.synthetic import (
    SyntheticEventsDataSource,
    checkpoint_offset,
)
from dataworks_audit_data_ingest_spark.streaming import (
    start_synthetic_encrypted_ingest_stream,
    synthetic_event_records,
)

ROWS = 120
PER_BATCH = 50  # 3 drains: 50 + 50 + 20


def _cfg(tmp_path, moto_s3, pub_pem, bucket):
    boto3.client(
        "s3", region_name="eu-west-2", endpoint_url=moto_s3
    ).create_bucket(
        Bucket=bucket,
        CreateBucketConfiguration={"LocationConstraint": "eu-west-2"},
    )
    return IngestConfig(
        src_dir="",  # generated source — no directory to scan
        s3_bucket=bucket,
        s3_prefix="northstar/",
        hsm_key_id="cloudhsm:1,2",
        rsa_public_key_pem=pub_pem,
        progress_file=str(tmp_path / "unused-progress.txt"),
        s3_endpoint_url=moto_s3,
        extra_boto_kwargs={
            "aws_access_key_id": "testing",
            "aws_secret_access_key": "testing",
        },
    )


def _drain(spark, cfg, ckpt):
    q = start_synthetic_encrypted_ingest_stream(
        spark, cfg, ckpt, rows=ROWS, rows_per_batch=PER_BATCH
    )
    # fail LOUDLY on a timed-out drain — proceeding with a live query
    # would read in-flight state (or copytree a checkpoint mid-write)
    assert q.awaitTermination(120), "drain did not terminate within 120s"


def _batch_records(spark):
    """The batch twin: same generated rows, same record shaping."""
    spark.dataSource.register(SyntheticEventsDataSource)
    df = (
        spark.read.format("synthetic_events")
        .option("rows", ROWS)
        .option("n_partitions", 4)
        .load()
    )
    return synthetic_event_records(df)


def test_stream_resumes_and_byte_matches_batch(
    spark, tmp_path, moto_s3, rsa_keypair
):
    priv, pub_pem = rsa_keypair
    cfg = _cfg(tmp_path, moto_s3, pub_pem, "northstar-bucket")
    ckpt = str(tmp_path / "ns-ckpt")
    s3 = boto3.client("s3", region_name="eu-west-2", endpoint_url=moto_s3)

    # drain 1: exactly one committed chunk lands
    _drain(spark, cfg, ckpt)
    assert checkpoint_offset(ckpt) == PER_BATCH
    keys = {
        o["Key"]
        for o in s3.list_objects_v2(Bucket=cfg.s3_bucket)["Contents"]
    }
    assert len(keys) == PER_BATCH

    # restart (new query object, same checkpoint): resumes at the commit,
    # two more drains exhaust the topic
    _drain(spark, cfg, ckpt)
    _drain(spark, cfg, ckpt)
    keys = {
        o["Key"]
        for o in s3.list_objects_v2(Bucket=cfg.s3_bucket)["Contents"]
    }
    assert len(keys) == ROWS
    # 3-field metadata on every object (reference quirk preserved)
    one = sorted(keys)[0]
    meta = s3.head_object(Bucket=cfg.s3_bucket, Key=one)["Metadata"]
    assert set(meta) == {"iv", "ciphertext", "datakeyencryptionkeyid"}

    # a 4th drain past exhaustion uploads nothing (etag stable)
    etag = s3.head_object(Bucket=cfg.s3_bucket, Key=one)["ETag"]
    _drain(spark, cfg, ckpt)
    assert s3.head_object(Bucket=cfg.s3_bucket, Key=one)["ETag"] == etag
    assert (
        len(s3.list_objects_v2(Bucket=cfg.s3_bucket)["Contents"]) == ROWS
    )

    # byte-identity through the decrypt round-trip: every S3 object's
    # decrypted payload == the batch twin's record content, per key
    priv_pem = priv.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.PKCS8,
        serialization.NoEncryption(),
    )
    dec = read_encrypted_objects(spark, cfg, priv_pem)
    got = {
        (r.day, r.basename): bytes(r.payload) for r in dec.collect()
    }
    want = {
        (r.day, r.basename): bytes(r.content)
        for r in _batch_records(spark).collect()
    }
    assert got == want
    assert len(want) == ROWS


def test_replayed_batch_is_idempotent_by_key(
    spark, tmp_path, moto_s3, rsa_keypair
):
    """Crash AFTER the S3 upload but BEFORE the streaming commit: Spark
    re-runs the planned batch on restart (offsets entry without commits
    entry). The replay re-encrypts — fresh nonce, new ETag — but lands on
    the SAME keys with the SAME decrypted payloads: no duplicates, no
    divergence."""
    priv, pub_pem = rsa_keypair
    cfg = _cfg(tmp_path, moto_s3, pub_pem, "northstar-replay")
    ckpt = str(tmp_path / "nsr-ckpt")
    s3 = boto3.client("s3", region_name="eu-west-2", endpoint_url=moto_s3)

    _drain(spark, cfg, ckpt)
    _drain(spark, cfg, ckpt)
    keys_before = {
        o["Key"]
        for o in s3.list_objects_v2(Bucket=cfg.s3_bucket)["Contents"]
    }
    assert len(keys_before) == 2 * PER_BATCH

    # simulate the crash: clone the checkpoint (Spark 4 refuses external
    # edits under a path its session already drove — the clone models a
    # restore-from-snapshot restart) and drop the LAST commit record —
    # batch 1 is now planned-but-unconfirmed, exactly the replay window
    import shutil

    ckpt2 = str(tmp_path / "nsr-ckpt-restored")
    shutil.copytree(ckpt, ckpt2)
    commits = sorted(
        Path(ckpt2, "commits").glob("[0-9]*"), key=lambda p: int(p.name)
    )
    last = commits[-1]
    last.unlink()
    # the local FS keeps a sibling checksum; a stale .crc breaks the
    # commit-log rewrite with a misleading concurrent-use error
    crc = last.parent / f".{last.name}.crc"
    if crc.exists():
        crc.unlink()
    _drain(spark, cfg, ckpt2)

    keys_after = {
        o["Key"]
        for o in s3.list_objects_v2(Bucket=cfg.s3_bucket)["Contents"]
    }
    assert keys_after == keys_before  # same keys, nothing duplicated

    # and the decrypted contents still byte-match the batch twin exactly
    priv_pem = priv.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.PKCS8,
        serialization.NoEncryption(),
    )
    got = {
        (r.day, r.basename): bytes(r.payload)
        for r in read_encrypted_objects(spark, cfg, priv_pem).collect()
    }
    want = {
        (r.day, r.basename): bytes(r.content)
        for r in _batch_records(spark).collect()
        if (r.day, r.basename) in got
    }
    assert got == want and len(got) == 2 * PER_BATCH
