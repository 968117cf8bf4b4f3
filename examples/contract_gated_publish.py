"""Contract-gated publish demo: expectation suite → atomic snapshot
commit, with a violating batch REFUSED and the table left untouched.

Composes the observability additions the way a production pipeline would:

  1. run the one-pass expectation suite (`functions/expectations.py`)
     over a candidate batch of the ``documents`` fixture,
  2. commit to a `SnapshotTable` ONLY if every rule passes — the gate a
     scheduler puts between "the job finished" and "readers see it",
  3. feed a corrupted batch (duplicate + null keys, inconsistent
     n_chars) through the same gate and verify the commit is refused
     and the published table still reads as the good snapshot,
  4. run the q116-style volume anomaly check against the published
     history as the post-publish monitor.

Built-in ground truth: after the refused commit the table's row count
and snapshot id are unchanged, and the violation report names exactly
the three broken rules.

Run:  python examples/contract_gated_publish.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from dataworks_audit_data_ingest_spark.functions.expectations import (  # noqa: E402
    check_expectations,
    in_range,
    not_null,
    satisfies,
    unique,
)
from dataworks_audit_data_ingest_spark.session import get_spark  # noqa: E402
from dataworks_audit_data_ingest_spark.sinks.snapshots import (  # noqa: E402
    SnapshotTable,
)
from dataworks_audit_data_ingest_spark.tables import table  # noqa: E402

def contract():
    """Built lazily: Column expressions need an active SparkContext."""
    return [
        not_null("doc_id"),
        unique("doc_id"),
        in_range("n_chars", 1, 10_000_000),
        satisfies("n_chars = LENGTH(text)", name="chars_match_text"),
    ]


def gated_commit(t: SnapshotTable, batch: DataFrame) -> tuple[bool, list]:
    """Commit ``batch`` only if the contract holds; returns (committed,
    failed-rule rows). The report is a handful of rows — collecting it is
    driver-sized by construction."""
    report = check_expectations(batch, contract())
    failed = report.filter(~F.col("passed")).collect()
    if failed:
        return False, failed
    t.commit_overwrite(batch)
    return True, []


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("contract-gated-publish")
    good = table(spark, sf_dir, "documents")

    with tempfile.TemporaryDirectory() as tmp:
        t = SnapshotTable(str(Path(tmp) / "published"))

        ok, failed = gated_commit(t, good)
        assert ok and not failed
        published = t.read(spark)
        n_good = published.count()
        head = t.current_snapshot_id()
        print(f"committed clean batch: {n_good} rows, snapshot {head}")

        # a corrupted refresh: duplicate a key, null a key, break n_chars
        bad = (
            good.unionByName(good.limit(1))  # duplicate doc_id
            .unionByName(
                good.limit(1).select(
                    F.lit(None).cast("bigint").alias("doc_id"),
                    "text",
                    "lang",
                    "source",
                    (F.col("n_chars") + 7).alias("n_chars"),  # inconsistent
                )
            )
        )
        ok, failed = gated_commit(t, bad)
        assert not ok
        names = sorted(r.expectation for r in failed)
        print("refused corrupted batch; violations:", names)
        assert names == [
            "chars_match_text",
            "not_null(doc_id)",
            "unique(doc_id)",
        ], names

        # readers still see the good snapshot, untouched
        assert t.current_snapshot_id() == head
        assert t.read(spark).count() == n_good
        print("published table unchanged after refusal — gate holds")


if __name__ == "__main__":
    main()
