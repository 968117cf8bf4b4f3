"""Shared fixtures: one SparkSession per test session, a moto S3 endpoint
(the reference's harness shape — `tests/conftest.py:19-28` there spawns
``moto_server s3``; moto 5 gives us an in-process ThreadedMotoServer), and a
deterministic RSA keypair for envelope round-trips.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # keep unit tests light

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_SF_DIR_ORACLE", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    from dataworks_audit_data_ingest_spark.session import get_spark

    # Per-session warehouse + Derby home: a concurrent local Spark session
    # in the same cwd (e.g. tools/check_oracle.py sweeping while the suite
    # runs) must not share ./spark-warehouse or ./metastore_db with us.
    os.environ.setdefault(
        "SPARK_GRAFT_WAREHOUSE", str(tmp_path_factory.mktemp("warehouse"))
    )
    s = get_spark("pytest")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def moto_s3():
    """Live moto S3 endpoint; real boto3 clients point at it, as in the
    reference's integration tests (`tests/test_audit_data_ingest.py:15`)."""
    from moto.server import ThreadedMotoServer

    server = ThreadedMotoServer(port=0)
    server.start()
    host, port = server.get_host_and_port()
    os.environ.setdefault("AWS_ACCESS_KEY_ID", "testing")
    os.environ.setdefault("AWS_SECRET_ACCESS_KEY", "testing")
    yield f"http://{host}:{port}"
    server.stop()


@pytest.fixture(scope="session")
def rsa_keypair():
    from cryptography.hazmat.primitives import serialization
    from cryptography.hazmat.primitives.asymmetric import rsa

    priv = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    pub_pem = priv.public_key().public_bytes(
        serialization.Encoding.PEM, serialization.PublicFormat.SubjectPublicKeyInfo
    )
    return priv, pub_pem
