"""Privacy-gated release demo: anonymization ladder → k/l expectation
contract → atomic snapshot publish, with an under-generalized release
REFUSED by the same gate.

Composes the privacy additions the way a vendor-handoff pipeline would:

  1. build the release view of ``customer`` (nation/segment quasi-
     identifiers, balance band as the sensitive attribute, region via a
     broadcast dim join),
  2. run the multi-step anonymization ladder
     (`functions/privacy.py::anonymize`) — publish each class at the
     most specific generalization level satisfying k-anonymity AND
     l-diversity over its residual rows, suppress what the whole
     ladder cannot save,
  3. verify the published classes with the SAME expectation machinery
     the data-contract gate uses (`functions/expectations.py`): every
     released class has >= k rows and >= l sensitive values — the gate
     re-derives the guarantee instead of trusting the producer,
  4. commit to a `SnapshotTable` only if the contract holds; then feed
     a RAW (non-anonymized) release through the identical gate and
     verify it is refused with the table left untouched.

Built-in ground truth: the anonymized release passes and publishes; the
raw release fails exactly the class-size rule; the snapshot id is
unchanged after the refusal.

Run:  python examples/privacy_release_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from dataworks_audit_data_ingest_spark.functions.expectations import (  # noqa: E402
    check_expectations,
    satisfies,
)
from dataworks_audit_data_ingest_spark.functions.privacy import (  # noqa: E402
    anonymize,
)
from dataworks_audit_data_ingest_spark.session import get_spark  # noqa: E402
from dataworks_audit_data_ingest_spark.sinks.snapshots import (  # noqa: E402
    SnapshotTable,
)
from dataworks_audit_data_ingest_spark.tables import table  # noqa: E402

K, L = 10, 2

LEVELS = (
    {"nation": "CAST(nation_key AS STRING)", "segment": "segment"},
    {"nation": "CAST(nation_key AS STRING)", "segment": None},
    {"nation": "CONCAT('region=', CAST(region_key AS STRING))", "segment": None},
)


def release_view(spark, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    return (
        c.join(
            F.broadcast(n.select("n_nationkey", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .selectExpr(
            "CAST(c_nationkey AS BIGINT) AS nation_key",
            "c_mktsegment AS segment",
            "CAST(n_regionkey AS BIGINT) AS region_key",
            "CASE WHEN c_acctbal < 0 THEN 'neg'"
            " WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS band",
        )
    )


def class_census(released: DataFrame) -> DataFrame:
    """Published classes with size and diversity — what the gate checks."""
    return released.groupBy(
        "nation_released", "segment_released", "gen_level"
    ).agg(
        F.count(F.lit(1)).alias("class_rows"),
        F.countDistinct("band").alias("class_bands"),
    )


def privacy_contract():
    return [
        satisfies(f"class_rows >= {K}", name="k_anonymity"),
        satisfies(f"class_bands >= {L}", name="l_diversity"),
    ]


def gated_publish(t: SnapshotTable, released: DataFrame) -> tuple[bool, list]:
    report = check_expectations(class_census(released), privacy_contract())
    failed = report.filter(~F.col("passed")).collect()
    if failed:
        return False, failed
    t.commit_overwrite(released)
    return True, []


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("privacy-release-pipeline")
    base = release_view(spark, sf_dir)

    with tempfile.TemporaryDirectory() as tmp:
        t = SnapshotTable(str(Path(tmp) / "release"))

        # the ladder output publishes: every class k/l-safe by construction,
        # and the gate RE-DERIVES that instead of trusting it
        released = anonymize(base, LEVELS, "band", K, L)
        ok, failed = gated_publish(t, released)
        assert ok and not failed, failed
        head = t.current_snapshot_id()
        n_released = t.read(spark).count()
        suppressed = base.count() - n_released
        print(
            f"published anonymized release: {n_released} rows"
            f" ({suppressed} suppressed), snapshot {head}"
        )

        # a raw hand-off (QI columns passed through as 'released') must
        # fail the same gate: the fixture has sub-k (nation, segment)
        # classes at every sf
        raw = base.selectExpr(
            "CAST(nation_key AS STRING) AS nation_released",
            "segment AS segment_released",
            "CAST(0 AS INT) AS gen_level",
            "band",
        )
        ok, failed = gated_publish(t, raw)
        assert not ok
        names = sorted({r.expectation for r in failed})
        print("refused raw release; violations:", names)
        assert "k_anonymity" in names, names

        assert t.current_snapshot_id() == head
        assert t.read(spark).count() == n_released
        print("published release unchanged after refusal — gate holds")


if __name__ == "__main__":
    main()
