"""Envelope key rotation: retire an RSA master key WITHOUT touching a
byte of payload.

The reference's envelope design (`audit_data_ingest.py:107-126`: AES
session key per object, RSA-wrapped in metadata field "ciphertext",
master-key id in "datakeyencryptionkeyid") makes rotation a METADATA
operation: unwrap each object's session key with the retiring private
key, re-wrap it with the successor public key, and rewrite the three
metadata fields via S3 CopyObject with MetadataDirective=REPLACE — the
object body (the actual 100 TB) never crosses the wire into the
cluster; S3 copies it server-side, and the EAX ciphertext and iv are
bit-identical before and after. That is the entire point of envelope
encryption, executed.

Properties the drill pins:
- payloads decrypt byte-identically with the NEW private key afterwards;
- the retiring key no longer opens anything (every object re-wrapped);
- idempotent: objects already carrying the new key id are skipped, so a
  crashed run re-runs to convergence;
- the 3-field metadata contract (reference test
  `tests/test_audit_data_ingest.py:26`) is preserved verbatim.

Scale shape: listing is the driver-side metadata pass `decrypt.py`
already uses; the per-object work (one RSA unwrap + one RSA wrap + one
server-side copy) fans out over executors via mapInPandas with only
keys on the wire. Session keys exist transiently in executor memory —
same exposure class as the decrypt path, same ``key_provider``
mitigation for shipping the retiring PEM.
"""

from __future__ import annotations

import base64
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession

from ..session import tune
from .pipeline import IngestConfig
from .decrypt import _unwrap_session_key

_ROT_SCHEMA = "s3_key string, rotated boolean"


def rotate_envelope_keys(
    spark: SparkSession,
    cfg: IngestConfig,
    old_private_key_pem: bytes,
    new_public_key_pem: bytes,
    new_key_id: str,
    key_provider: Callable[[], bytes] | None = None,
    audit_path: str | None = None,
) -> int:
    """Re-wrap every object under the configured prefix from the retiring
    master key to ``new_public_key_pem`` / ``new_key_id``. Returns the
    number of objects rewrapped (objects already on the new key id are
    skipped). Payload bytes are untouched (server-side copy)."""
    import boto3

    tune(spark)
    client = boto3.client(
        "s3",
        region_name=cfg.aws_region,
        endpoint_url=cfg.s3_endpoint_url,
        **cfg.extra_boto_kwargs,
    )
    keys: list[str] = []
    paginator = client.get_paginator("list_objects_v2")
    for page in paginator.paginate(Bucket=cfg.s3_bucket, Prefix=cfg.s3_prefix):
        keys.extend(o["Key"] for o in page.get("Contents", []))
    if not keys:
        return 0
    keys_df = spark.createDataFrame([(k,) for k in keys], "s3_key string")

    bucket, region, endpoint, extra = (
        cfg.s3_bucket,
        cfg.aws_region,
        cfg.s3_endpoint_url,
        cfg.extra_boto_kwargs,
    )

    def rewrap(batches: Iterator) -> Iterator:
        import boto3
        import pandas as pd
        from cryptography.hazmat.primitives import hashes, serialization
        from cryptography.hazmat.primitives.asymmetric import padding

        s3 = boto3.client(
            "s3", region_name=region, endpoint_url=endpoint, **extra
        )
        pem = key_provider() if key_provider is not None else old_private_key_pem
        new_pub = serialization.load_pem_public_key(new_public_key_pem)
        oaep = padding.OAEP(
            mgf=padding.MGF1(algorithm=hashes.SHA256()),
            algorithm=hashes.SHA256(),
            label=None,
        )
        for pdf in batches:
            out = {"s3_key": [], "rotated": []}
            for key in pdf["s3_key"]:
                head = s3.head_object(Bucket=bucket, Key=key)
                meta = dict(head["Metadata"])
                if meta.get("datakeyencryptionkeyid") == new_key_id:
                    out["s3_key"].append(key)
                    out["rotated"].append(False)
                    continue
                session_key = _unwrap_session_key(pem, meta["ciphertext"])
                meta["ciphertext"] = base64.b64encode(
                    new_pub.encrypt(session_key, oaep)
                ).decode("ascii")
                meta["datakeyencryptionkeyid"] = new_key_id
                s3.copy_object(
                    Bucket=bucket,
                    Key=key,
                    CopySource={"Bucket": bucket, "Key": key},
                    Metadata=meta,
                    MetadataDirective="REPLACE",
                )
                out["s3_key"].append(key)
                out["rotated"].append(True)
            yield pd.DataFrame(out)

    n = max(1, min(len(keys), spark.sparkContext.defaultParallelism))
    report: DataFrame = keys_df.repartition(n).mapInPandas(
        rewrap, schema=_ROT_SCHEMA
    )
    n_rotated = report.filter("rotated").count()
    if audit_path is not None:
        from ..incremental.audit import record_audit

        record_audit(
            spark,
            audit_path,
            "rotate_envelope_keys",
            n_rotated,
            f"bucket={cfg.s3_bucket} prefix={cfg.s3_prefix}"
            f" new_key_id={new_key_id} objects={len(keys)}",
        )
    return n_rotated
