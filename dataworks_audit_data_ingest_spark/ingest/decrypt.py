"""Decrypt source — the read side of the envelope contract.

The reference only writes; its consumers (the "analytical environment",
reference README.md:10-18) must reverse the envelope: RSA-unwrap the session
key from object metadata, AES-EAX-decrypt, zlib-inflate. This module makes
that a Spark source: list the S3 prefix driver-side (keys only), then one
task per batch of objects fetches + decrypts with Arrow-batched output —
payloads never pass through the driver.

Key distribution: the RSA *private* key PEM travels to executors inside the
task closure. On a real cluster that closure moves over Spark's RPC — run
with ``spark.io.encryption.enabled`` / ``spark.authenticate`` or fetch the
key per-executor from the HSM/KMS instead (the seam is ``key_provider``).
"""

from __future__ import annotations

import base64
import zlib
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession

from ..functions.localrel import local_rows_df

from ..session import tune
from .crypto import eax_decrypt
from .pipeline import IngestConfig

_DEC_SCHEMA = "s3_key string, day string, basename string, payload binary"


def _unwrap_session_key(private_key_pem: bytes, wrapped_b64: str) -> bytes:
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import padding

    priv = serialization.load_pem_private_key(private_key_pem, password=None)
    return priv.decrypt(
        base64.b64decode(wrapped_b64),
        padding.OAEP(
            mgf=padding.MGF1(algorithm=hashes.SHA256()),
            algorithm=hashes.SHA256(),
            label=None,
        ),
    )


def read_encrypted_objects(
    spark: SparkSession,
    cfg: IngestConfig,
    private_key_pem: bytes,
    key_provider: Callable[[], bytes] | None = None,
) -> DataFrame:
    """DataFrame of decrypted payloads for every object under the configured
    prefix: (s3_key, day, basename, payload).

    Listing is a driver-side metadata pass (keys + sizes only); object
    bodies are fetched and decrypted by executor tasks. ``key_provider``
    (executor-side callable) overrides the closure-shipped private key for
    KMS-style deployments — without it the PEM travels inside the task
    closure, so RPC encryption should be on (warned below).
    """
    import boto3

    tune(spark)
    if key_provider is None and (
        spark.conf.get("spark.io.encryption.enabled", "false").lower() != "true"
    ):
        import logging

        logging.getLogger(__name__).warning(
            "read_encrypted_objects: RSA private key ships to executors in "
            "the task closure and spark.io.encryption.enabled is not true — "
            "the key crosses the wire unencrypted. Pass key_provider= (an "
            "executor-side fetch, e.g. from KMS/SSM) or enable RPC "
            "encryption in production."
        )
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
    keys_df = local_rows_df(spark, [(k,) for k in keys], "s3_key string")

    bucket, region, endpoint, extra = (
        cfg.s3_bucket,
        cfg.aws_region,
        cfg.s3_endpoint_url,
        cfg.extra_boto_kwargs,
    )

    def fetch(batches: Iterator) -> Iterator:
        import boto3
        import pandas as pd

        s3 = boto3.client(
            "s3", region_name=region, endpoint_url=endpoint, **extra
        )
        pem = key_provider() if key_provider is not None else private_key_pem
        for pdf in batches:
            out = {"s3_key": [], "day": [], "basename": [], "payload": []}
            for key in pdf["s3_key"]:
                obj = s3.get_object(Bucket=bucket, Key=key)
                meta = obj["Metadata"]
                session_key = _unwrap_session_key(pem, meta["ciphertext"])
                payload = zlib.decompress(
                    eax_decrypt(
                        session_key,
                        base64.b64decode(meta["iv"]),
                        obj["Body"].read(),
                    )
                )
                parts = key.rsplit("/", 2)
                out["s3_key"].append(key)
                out["day"].append(parts[-2] if len(parts) >= 2 else "")
                name = parts[-1]
                out["basename"].append(
                    name[: -len(".gz.enc")] if name.endswith(".gz.enc") else name
                )
                out["payload"].append(payload)
            yield pd.DataFrame(out)

    n = max(1, min(len(keys), spark.sparkContext.defaultParallelism))
    return keys_df.repartition(n).mapInPandas(fetch, schema=_DEC_SCHEMA)


def read_encrypted_json(
    spark: SparkSession,
    cfg: IngestConfig,
    private_key_pem: bytes,
    schema,
) -> DataFrame:
    """Decrypted objects parsed as JSON payloads with an explicit schema —
    the full circle back to typed rows (the audit payload shape,
    reference tests/data/audit-data-1.json)."""
    from pyspark.sql import functions as F

    raw = read_encrypted_objects(spark, cfg, private_key_pem)
    return raw.select(
        "s3_key",
        "day",
        F.from_json(F.decode("payload", "UTF-8"), schema).alias("j"),
    ).select("s3_key", "day", "j.*")
