"""The ingest pipeline: Spark-first rebuild of the reference's driver loop
(`audit_data_ingest.py:36-68` and the CLI block `:235-313`).

Shape (SURVEY.md §3.4): ``binaryFile`` scan → ``day`` partition filter
(strictly greater than the watermark) → per-record compress+encrypt
(Arrow-batched ``mapInPandas``) → ``foreachPartition`` S3 sink with
per-object envelope metadata → per-day all-or-nothing watermark commit.

What the reference hand-rolled and Spark absorbs (SURVEY.md §4):
- `hdfs dfs -ls` subprocess (`:134-139`)  → distributed file index
- `copyToLocal` staging + cleanup (`:153-166`, `:207-210`) → eliminated;
  executors read source splits directly
- ThreadPoolExecutor fan-out (`:82-90`) → task scheduling, one task per
  input partition
- all-or-nothing day verdict (`:96-104`) → Spark job success/failure
"""

from __future__ import annotations

import base64
import logging
from dataclasses import dataclass, field
from datetime import date

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import tune
from .crypto import EnvelopeEncryptor
from .watermark import find_start_date, update_progress_file

logger = logging.getLogger(__name__)

_ENC_SCHEMA = (
    "day string, basename string, ciphertext binary, "
    "iv string, encrypted_key string, key_id string"
)


@dataclass
class IngestConfig:
    """Job config tuple — (source, prefix, watermark-id) parameterization,
    mirroring how the reference deploys the same script for audit and
    equalities datasets (`ci/meta.yml:179-186`, SURVEY.md §3.3)."""

    src_dir: str
    s3_bucket: str
    # NB: concatenated to the day with NO inserted '/' — the prefix carries
    # its own trailing separator (`audit_data_ingest.py:172-173`, quirk 5).
    s3_prefix: str
    hsm_key_id: str  # "cloudhsm:privkeyid:pubkeyid" format (`:267-271`)
    rsa_public_key_pem: bytes
    progress_file: str
    aws_region: str = "eu-west-2"  # CLI default (`:275-280`)
    retries: int = 10  # botocore standard mode (`:190-197`, `:260-265`)
    s3_endpoint_url: str | None = None  # test seam (moto)
    extra_boto_kwargs: dict = field(default_factory=dict)


def fetch_hsm_key(
    param_name: str, region: str, endpoint_url: str | None = None
) -> bytes:
    """SSM-parameter fetch of the base64 RSA public key, driver-side once per
    run (`audit_data_ingest.py:200-204`; decoded at `:78`). The decoded bytes
    travel to executors via task closures (the broadcast analog of `:86-88`)."""
    import boto3

    ssm = boto3.client("ssm", region_name=region, endpoint_url=endpoint_url)
    value = ssm.get_parameter(Name=param_name, WithDecryption=True)["Parameter"][
        "Value"
    ]
    return base64.b64decode(value)


def scan_source(spark: SparkSession, src_dir: str) -> DataFrame:
    """R1: the `hdfs dfs -ls` + copy of the reference collapses into one
    distributed ``binaryFile`` scan; `day` is derived from the immediate
    parent directory name, exactly what ``filter_date`` parses
    (`audit_data_ingest.py:26-33`). Non-date directories yield NULL and are
    skipped (warn-and-exclude semantics, `:30-32`)."""
    tune(spark)
    df = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(src_dir)
    )
    return df.select(
        "path",
        F.element_at(F.split("path", "/"), -1).alias("basename"),
        F.expr(
            r"TRY_TO_DATE(REGEXP_EXTRACT(path, '([^/]+)/[^/]+$', 1), 'yyyy-MM-dd')"
        ).alias("day"),
        "length",
        "content",
    )


def filter_after_watermark(df: DataFrame, watermark: date | None) -> DataFrame:
    """R2: strictly-greater partition predicate — the committed day itself is
    never reprocessed on resume (`audit_data_ingest.py:33`). With a Hive
    `day=` layout this is pure partition pruning; here it prunes via the
    derived column.

    Deliberate deviation from the reference's first run: with no progress
    file the reference skips ``filter_date`` entirely and would process
    every listed path, non-dated directories included
    (`audit_data_ingest.py:145-146`); the warn-and-exclude of non-dated
    dirs (`:30-32`) only applies once a start date exists. Here non-dated
    directories are ALWAYS dropped (``day IS NOT NULL``) — a non-dated dir
    can never be watermark-committed, so processing it on run 1 and then
    re-processing it on every subsequent run is the less defensible
    behavior; excluding it uniformly keeps runs idempotent."""
    df = df.filter(F.col("day").isNotNull())
    if watermark is not None:
        df = df.filter(F.col("day") > F.lit(watermark))
    return df


def encrypt_files(df: DataFrame, pem: bytes, key_id: str) -> DataFrame:
    """R4+R5: zlib compress + AES-128-EAX envelope encrypt, Arrow-batched.

    ``mapInPandas`` amortizes Python-crossing over whole record batches; the
    RSA public key is constructed once per batch iterator (per task), the
    broadcast-equivalent of the reference's single driver-side key fetch
    fanned out to workers (`audit_data_ingest.py:78,86-88`)."""

    def batches(it):
        import pandas as pd

        enc = EnvelopeEncryptor(pem, key_id)
        for pdf in it:
            recs = [enc.encrypt_record(bytes(c)) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "day": pdf["day"].astype(str),
                    "basename": pdf["basename"],
                    "ciphertext": [r.ciphertext for r in recs],
                    "iv": [r.iv for r in recs],
                    "encrypted_key": [r.encrypted_key for r in recs],
                    "key_id": [r.key_id for r in recs],
                }
            )

    # guide §4: only the columns the kernel touches cross the Arrow
    # boundary — without the select, `path` and `length` ride every batch
    # (and an opaque function over extra columns defeats column pruning
    # at the scan).
    return df.select("day", "basename", "content").mapInPandas(
        batches, schema=_ENC_SCHEMA
    )


_AUDIT_SCHEMA = "day string, basename string, s3_key string, n_bytes long"


def encrypt_and_upload(df: DataFrame, cfg: IngestConfig) -> DataFrame:
    """Fused R4+R5+R6: compress+encrypt+upload in ONE Python stage.

    The composable two-stage form (``encrypt_files`` → sink) round-trips
    every ciphertext byte Python→JVM→Python through Arrow twice; measured
    locally that transfer, not crypto, was the ceiling (PERF.md). Fusing
    keeps ciphertext inside the task that produced it — only small audit
    rows (key, size) cross back. An action on the returned frame drives the
    upload; all-or-nothing day semantics are unchanged (any task failure
    fails the job before the watermark commit).
    """
    pem, key_id = cfg.rsa_public_key_pem, cfg.hsm_key_id

    def batches(it):
        import boto3
        import pandas as pd
        from botocore.config import Config

        client = boto3.client(
            "s3",
            region_name=cfg.aws_region,
            endpoint_url=cfg.s3_endpoint_url,
            config=Config(retries={"max_attempts": cfg.retries, "mode": "standard"}),
            **cfg.extra_boto_kwargs,
        )
        enc = EnvelopeEncryptor(pem, key_id)
        for pdf in it:
            out = {"day": [], "basename": [], "s3_key": [], "n_bytes": []}
            for day, basename, content in zip(
                pdf["day"].astype(str), pdf["basename"], pdf["content"]
            ):
                rec = enc.encrypt_record(bytes(content))
                key = f"{cfg.s3_prefix}{day}/{basename}.gz.enc"
                client.put_object(
                    Bucket=cfg.s3_bucket,
                    Key=key,
                    Body=rec.ciphertext,
                    Metadata=rec.metadata(),
                )
                out["day"].append(day)
                out["basename"].append(basename)
                out["s3_key"].append(key)
                out["n_bytes"].append(len(rec.ciphertext))
            yield pd.DataFrame(out)

    # guide §4: ship only the three columns the fused kernel reads
    return df.select("day", "basename", "content").mapInPandas(
        batches, schema=_AUDIT_SCHEMA
    )


def upload_partition_factory(cfg: IngestConfig):
    """R6+R11: metadata-bearing S3 sink. Per-object metadata is outside
    DataFrameWriter's model, so the sink is a ``foreachPartition`` function
    with one boto3 client per partition and botocore standard-mode retries
    (`audit_data_ingest.py:169-197`)."""

    def upload(rows) -> None:
        import boto3
        from botocore.config import Config

        client = boto3.client(
            "s3",
            region_name=cfg.aws_region,
            endpoint_url=cfg.s3_endpoint_url,
            config=Config(retries={"max_attempts": cfg.retries, "mode": "standard"}),
            **cfg.extra_boto_kwargs,
        )
        for row in rows:
            # key layout: f"{prefix}{day}/{basename}.gz.enc" — no separator
            # inserted after the prefix, suffix says .gz but framing is zlib
            # (`audit_data_ingest.py:117,:172-173`; quirks 1 & 5).
            key = f"{cfg.s3_prefix}{row['day']}/{row['basename']}.gz.enc"
            client.put_object(
                Bucket=cfg.s3_bucket,
                Key=key,
                Body=bytes(row["ciphertext"]),
                Metadata={
                    "iv": row["iv"],
                    "ciphertext": row["encrypted_key"],
                    "datakeyencryptionkeyid": row["key_id"],
                },
            )

    return upload


def run_ingest(spark: SparkSession, cfg: IngestConfig) -> list[date]:
    """R13: the per-day driver loop. Days are processed in ascending order;
    each day is one Spark action; the watermark is committed only after the
    whole day succeeded — any task failure fails the job and the day is
    retried wholesale on the next run (at-least-once over an idempotent
    overwrite sink, `audit_data_ingest.py:49-68,96-104`).

    Returns the list of committed days.
    """
    watermark = find_start_date(cfg.progress_file)
    scanned = filter_after_watermark(scan_source(spark, cfg.src_dir), watermark)
    # listing-only pass (content pruned): day inventory + bytes per day, used
    # to size file partitions so small files don't serialize onto few tasks
    day_stats = {
        r["day"]: int(r["total_bytes"])
        for r in scanned.groupBy("day")
        .agg(F.sum("length").alias("total_bytes"))
        .collect()
    }
    days = sorted(day_stats)
    if not days:
        logger.info("nothing newer than %s under %s", watermark, cfg.src_dir)
        return []

    # NB on small-file parallelism: binaryFile packing is governed by
    # maxPartitionBytes AND openCostInBytes (default 4 MB per file), so a day
    # of small files already fans out to ~max(1, bytes/(size+4MB)·cores)
    # tasks — measured 29 tasks for 200×1 MB files at defaults. Shrinking
    # maxPartitionBytes below default only added per-task overhead
    # (measured 38→26 MB/s); the defaults are kept deliberately.
    committed: list[date] = []
    for day in days:
        day_df = scanned.filter(F.col("day") == F.lit(day))
        n_uploaded = encrypt_and_upload(day_df, cfg).count()
        # reaching here means every task of the day's job succeeded
        update_progress_file(cfg.progress_file, day)
        committed.append(day)
        logger.info(
            "committed day %s (%d objects, %d bytes in)",
            day,
            n_uploaded,
            day_stats[day],
        )
    return committed
