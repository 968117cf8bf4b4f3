"""Compliance audit manifest: one append-only parquet trail for the
operations an auditor asks about by name — key rotation and erasure.

Both `ingest/rotate.py::rotate_envelope_keys` and
`incremental/forget.py::forget_ids_from_store` RETURN their counts; a
return value is not evidence six months later. ``record_audit`` appends
one row (operation, n_affected, detail, recorded_at) to a manifest
parquet — the same role as the shard writer's manifest and the forget
sink's audit trail, for the state-store side. Append-mode parquet is
crash-safe here: a re-run after a crash appends a second row for the
same action, which an auditor WANTS to see (the operation ran twice),
and the idempotent operations themselves report n_affected=0 on the
repeat.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import SparkSession

from ..functions.localrel import local_rows_df

_SCHEMA = (
    "operation string, n_affected long, detail string, recorded_at timestamp"
)


def record_audit(
    spark: SparkSession,
    audit_path: str,
    operation: str,
    n_affected: int,
    detail: str,
) -> None:
    """Append one audit row; creates the manifest on first use."""
    # tz-AWARE datetime on purpose (ADVICE r08): Spark converts an aware
    # value to the correct instant regardless of session timezone; a
    # naive value would be re-interpreted in session-local time and
    # shift recorded_at by the UTC offset on non-UTC sessions.
    row = [(operation, int(n_affected), detail, datetime.now(timezone.utc))]
    local_rows_df(spark, row, _SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(audit_path)
