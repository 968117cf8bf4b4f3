"""Audit manifest drill: recorded_at is the true instant regardless of
the Spark session timezone (ADVICE r08 — a naive datetime would be
re-interpreted session-locally and shift by the UTC offset)."""

from __future__ import annotations

from datetime import datetime, timezone

from dataworks_audit_data_ingest_spark.incremental.audit import record_audit


def test_recorded_at_is_utc_instant_on_non_utc_session(spark, tmp_path):
    path = str(tmp_path / "audit")
    before = datetime.now(timezone.utc)
    orig = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        record_audit(spark, path, "unit_test", 7, "tz drill")
        # Read the stored instant back AS an epoch — tz-independent.
        row = (
            spark.read.parquet(path)
            .selectExpr(
                "operation",
                "n_affected",
                "CAST(unix_micros(recorded_at) AS DOUBLE) / 1e6 AS epoch",
            )
            .collect()[0]
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", orig)
    after = datetime.now(timezone.utc)
    assert row.operation == "unit_test" and row.n_affected == 7
    # Within the test's own wall-clock window — a naive-datetime bug on a
    # UTC-5/-4 session would be off by hours.
    assert before.timestamp() - 1 <= row.epoch <= after.timestamp() + 1
