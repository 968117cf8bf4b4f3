"""End-to-end training-data curation demo.

Composes the engine's pieces the way a data-pipeline user would:

  1. ingest: dated raw files → zlib+AES envelope → S3 (moto here)
  2. decrypt source: S3 objects → typed rows
  3. curation: PII redaction → quality filter → near-dup drop →
     per-source cap → source mixing → token-budget sample
  4. curated corpus → day-partitioned parquet

Run:  python examples/training_data_pipeline.py
"""

from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import boto3
from cryptography.hazmat.primitives import serialization
from cryptography.hazmat.primitives.asymmetric import rsa
from moto.server import ThreadedMotoServer
from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.ingest import IngestConfig, run_ingest
from dataworks_audit_data_ingest_spark.ingest.decrypt import read_encrypted_json
from dataworks_audit_data_ingest_spark.session import get_spark
from dataworks_audit_data_ingest_spark.sinks import (
    verify_shards,
    write_partitioned_parquet,
    write_training_shards,
)
from dataworks_audit_data_ingest_spark.tables import table
from dataworks_audit_data_ingest_spark.text import (
    annotate_quality,
    cap_per_source,
    drop_near_duplicates,
    mix_sources,
    redact_pii,
    token_budget_sample,
)


def main() -> None:
    spark = get_spark("training-data-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    # --- stage 0: synthesize "raw arrivals" from the documents fixture
    work = Path(tempfile.mkdtemp())
    src = work / "raw"
    docs = table(spark, "/root/testdata/sf0.001", "documents").collect()
    for i, day in enumerate(("2024-03-01", "2024-03-02")):
        (src / day).mkdir(parents=True)
        half = docs[i * len(docs) // 2 : (i + 1) * len(docs) // 2]
        for d in half:
            payload = {"doc_id": d.doc_id, "text": d.text, "lang": d.lang, "source": d.source}
            (src / day / f"doc-{d.doc_id}.json").write_text(json.dumps(payload))

    # --- stage 1: encrypted ingest to S3
    server = ThreadedMotoServer(port=0)
    server.start()
    host, port = server.get_host_and_port()
    endpoint = f"http://{host}:{port}"
    creds = {"aws_access_key_id": "testing", "aws_secret_access_key": "testing"}
    boto3.client("s3", region_name="eu-west-2", endpoint_url=endpoint, **creds).create_bucket(
        Bucket="curation-bucket",
        CreateBucketConfiguration={"LocationConstraint": "eu-west-2"},
    )
    priv = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    cfg = IngestConfig(
        src_dir=str(src),
        s3_bucket="curation-bucket",
        s3_prefix="raw/",
        hsm_key_id="cloudhsm:demo",
        rsa_public_key_pem=priv.public_key().public_bytes(
            serialization.Encoding.PEM, serialization.PublicFormat.SubjectPublicKeyInfo
        ),
        progress_file=str(work / "watermark.txt"),
        s3_endpoint_url=endpoint,
        extra_boto_kwargs=creds,
    )
    committed = run_ingest(spark, cfg)
    print(f"[1/5] ingested days: {[str(d) for d in committed]}")

    # --- stage 2: decrypt source back to typed rows
    priv_pem = priv.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.PKCS8,
        serialization.NoEncryption(),
    )
    typed = read_encrypted_json(
        spark, cfg, priv_pem, "doc_id long, text string, lang string, source string"
    )
    n_raw = typed.count()
    print(f"[2/5] decrypted {n_raw} documents")

    # --- stage 3: curation
    curated = redact_pii(typed)
    curated = annotate_quality(curated).filter(F.col("quality_verdict") == "keep")
    n_quality = curated.count()
    curated = drop_near_duplicates(curated)
    n_dedup = curated.count()
    curated = cap_per_source(curated, max_docs=500)  # no domain dominates
    curated = mix_sources(curated, {"src0": 1.0}, default_rate=0.9)
    n_mixed = curated.count()
    # Distributed two-phase prefix sum: the text column never enters an
    # exchange, and no single-task global sort — holds at 100 TB.
    curated = token_budget_sample(curated, budget_tokens=8_000)
    n_budget = curated.count()
    total_tokens = curated.select(F.sum(F.size(F.split("text", " ")))).first()[0]
    print(
        f"[3/5] curation: {n_raw} raw -> {n_quality} quality -> "
        f"{n_dedup} deduped -> {n_mixed} mixed -> {n_budget} in budget "
        f"({total_tokens} tokens)"
    )

    # --- stage 4: curated corpus, day-partitioned
    out = str(work / "curated")
    write_partitioned_parquet(curated, out, partition_by=("day",))
    back = spark.read.parquet(out)
    print(f"[4/5] curated corpus at {out}: {back.count()} docs, "
          f"partitions={sorted(r.day for r in back.select('day').distinct().collect())}")

    # --- stage 5: loader-ready shards (deterministic global shuffle)
    shards_out = str(work / "shards")
    manifest = write_training_shards(
        curated, shards_out, n_shards=4, id_col="doc_id", size_col=None
    )
    assert verify_shards(spark, shards_out)
    sizes = {k: v["n_rows"] for k, v in manifest["shards"].items()}
    print(f"[5/5] training shards at {shards_out}: {sizes} "
          f"(total {manifest['total_rows']}, manifest verified)")
    server.stop()
    assert n_budget > 0 and total_tokens <= 8_000
    assert manifest["total_rows"] == n_budget


if __name__ == "__main__":
    main()
