"""CLI entry point (R14) — argparse surface mirroring the reference's flags
(`audit_data_ingest.py:235-313`), minus the staging knobs Spark eliminates
(`--tmp`, `--processes` → Spark parallelism).

Run as:  spark-submit -m dataworks_audit_data_ingest_spark.ingest.cli ...
"""

from __future__ import annotations

import argparse
import logging
import sys

from ..session import get_spark
from .pipeline import IngestConfig, fetch_hsm_key, run_ingest

logger = logging.getLogger(__name__)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Encrypt files and upload them to S3")
    p.add_argument("--src-dir", required=True, help="source directory of dated subdirs")
    p.add_argument("--s3-publish-bucket", required=True)
    p.add_argument(
        "--s3-prefix",
        required=True,
        help="object key prefix; must carry its own trailing '/' — the day is "
        "concatenated with no separator (reference parity)",
    )
    p.add_argument("--hsm-key-id", required=True, help="cloudhsm:privkeyid:pubkeyid")
    p.add_argument("--hsm-key-param-name", required=True)
    p.add_argument("--aws-default-region", default="eu-west-2")
    p.add_argument("--progress-file", required=True)
    p.add_argument("--retries", type=int, default=10)
    p.add_argument("--s3-endpoint-url", default=None)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    pem = fetch_hsm_key(
        args.hsm_key_param_name, args.aws_default_region, args.s3_endpoint_url
    )
    cfg = IngestConfig(
        src_dir=args.src_dir,
        s3_bucket=args.s3_publish_bucket,
        s3_prefix=args.s3_prefix,
        hsm_key_id=args.hsm_key_id,
        rsa_public_key_pem=pem,
        progress_file=args.progress_file,
        aws_region=args.aws_default_region,
        retries=args.retries,
        s3_endpoint_url=args.s3_endpoint_url,
    )
    spark = get_spark("audit-data-ingest")
    try:
        run_ingest(spark, cfg)
    except Exception as e:  # noqa: BLE001
        # Graceful exit on credential expiry so the next scheduled run resumes
        # from the watermark (`audit_data_ingest.py:303-305`); everything else
        # re-raises (`:306-311`).
        if "ExpiredTokenException" in type(e).__name__ or "ExpiredToken" in str(e):
            logger.warning("token expired mid-run; resume from watermark next run")
            return 0
        raise
    return 0


if __name__ == "__main__":
    sys.exit(main())
