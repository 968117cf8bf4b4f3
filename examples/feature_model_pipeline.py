"""End-to-end ML-on-the-engine journey: leakage-free features → hash
split → closed-form fit → held-out calibration, all from registered
operator shapes.

1. **Features** — q156's point-in-time matrix: every feature frame ends
   strictly before the label event (the feature-store leakage contract).
2. **Label** — the purchase's own value in integer cents.
3. **Split** — q104's discipline: train/test is a pure function of the
   portable id hash (backfills route identically forever).
4. **Fit** — q122's closed-form OLS (exact integer moment counters), on
   TRAIN rows only.
5. **Readout** — held-out MAE and a per-feature-band calibration table
   (q129's shape): does predicted rise with actual?

Run: python examples/feature_model_pipeline.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from dataworks_audit_data_ingest_spark.functions.hashing import (  # noqa: E402
    spark_hash32,
)
from dataworks_audit_data_ingest_spark.queries import REGISTRY  # noqa: E402
from dataworks_audit_data_ingest_spark.session import get_spark  # noqa: E402
from dataworks_audit_data_ingest_spark.tables import table  # noqa: E402

SF = "/root/testdata/sf0.001"


def run(spark, sf_dir: str) -> dict:
    """The journey as a callable: returns the fit, readout, and counts
    (the pytest imports this; main() prints it)."""
    # 1. leakage-free features + label
    feats = REGISTRY["q156_point_in_time_features"].fn(spark, sf_dir)
    labels = table(spark, sf_dir, "events").select(
        F.col("event_id").alias("label_event_id"),
        F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").alias("y_cents"),
    )
    data = feats.join(labels, "label_event_id")
    n = data.count()
    print(f"[1/4] {n} labeled rows with point-in-time features")

    # 2. deterministic split (pure function of the label id)
    split = data.withColumn(
        "bucket",
        F.expr(spark_hash32("CAST(label_event_id AS STRING)", "split")) % 100,
    )
    train = split.filter(F.col("bucket") < 80)
    test = split.filter(F.col("bucket") >= 80)
    n_tr, n_te = train.count(), test.count()
    assert n_tr + n_te == n
    print(f"[2/4] split: {n_tr} train / {n_te} test (hash-stable)")

    # 3. closed-form OLS on train: y_cents ~ n_clicks_before
    m = train.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_clicks_before").alias("sx"),
        F.sum("y_cents").alias("sy"),
        F.sum(F.col("n_clicks_before") * F.col("n_clicks_before")).alias("sxx"),
        F.sum(F.col("n_clicks_before") * F.col("y_cents")).alias("sxy"),
    ).first()
    denom = m.n * m.sxx - m.sx * m.sx
    slope_milli = (1000 * (m.n * m.sxy - m.sx * m.sy)) // denom if denom else 0
    intercept = (1000 * m.sy - slope_milli * m.sx) // (1000 * m.n)
    print(f"[3/4] fit on train only: slope_milli={slope_milli} "
          f"intercept_cents={intercept}")

    # 4. held-out readout: MAE + calibration by predicted band
    pred = test.withColumn(
        "pred_cents",
        (F.lit(slope_milli) * F.col("n_clicks_before") + F.lit(1000 * intercept))
        .cast("bigint")
        / 1000,
    )
    mae = pred.agg(
        F.avg(F.abs(F.col("pred_cents") - F.col("y_cents"))).alias("mae")
    ).first().mae
    calib = (
        pred.withColumn("band", (F.col("n_clicks_before") / 5).cast("int"))
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("pred_cents").alias("avg_pred"),
            F.avg("y_cents").alias("avg_actual"),
        )
        .orderBy("band")
        .collect()
    )
    print(f"[4/4] held-out MAE = {mae:.1f} cents; calibration bands:")
    for r in calib:
        print(f"      band {r.band}: n={r.n} pred={r.avg_pred:.0f} "
              f"actual={r.avg_actual:.0f}")
    assert mae is not None and mae >= 0
    assert sum(r.n for r in calib) == n_te

    # determinism: the whole journey re-runs identically
    feats2 = REGISTRY["q156_point_in_time_features"].fn(spark, sf_dir)
    assert sorted(map(tuple, feats.collect())) == sorted(
        map(tuple, feats2.collect())
    )
    print("OK — deterministic end to end")
    return {
        "n": n,
        "n_train": n_tr,
        "n_test": n_te,
        "slope_milli": slope_milli,
        "intercept_cents": intercept,
        "mae_cents": mae,
        "calibration": calib,
    }


def main() -> None:
    spark = get_spark("feature-model-pipeline")
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else SF
    run(spark, sf_dir)


if __name__ == "__main__":
    main()
