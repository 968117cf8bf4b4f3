"""CDC-mirror demo: a maintained join view consumed as an OPERATIONAL
MIRROR — kept current by change batches (inserts, updates, deletes, a
key move), continuously audited against the source of truth with
anti-entropy fingerprints, and GDPR-erased without a rebuild.

The lifecycle a 100 TB enriched mirror actually runs:

  1. seed ``orders ⋈ customer`` through `update_join_view_cdc` (batch
     "0000": everything), then apply three change batches — a value
     UPDATE wave (priorities corrected), a DELETE wave (cancelled
     orders), and a key MOVE (orders reassigned to the next customer:
     delete old key + upsert new key in ONE batch, the CDC idiom);
  2. after every batch, AUDIT the mirror: `table_fingerprint` the net
     view against a from-scratch join of the maintained current sides
     (`read_current_side`) per month — `fingerprint_diff` must be
     EMPTY; no rows move in the audit, only (month, count, sum)
     partials;
  3. compact semantically (sides fold to current rows, the z-set folds
     to its net) and require the audit to still pass — compaction must
     be invisible to every reader;
  4. ERASE one customer (`forget_right_ids_from_cdc_view`: op log,
     tombstones, and BOTH signs of their view rows physically removed),
     prove the mirror no longer holds the subject anywhere — including
     the raw signed history — and that the audit, re-based on the
     post-forget sides, is clean again.

Built-in ground truth: the planted waves are integer-mod slices, so
every stage's expected row counts are closed-form; the per-stage audit
is the operator this engine ships for exactly this job
(`functions/checksum.py`).

Run:  python examples/cdc_mirror_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from dataworks_audit_data_ingest_spark.functions.checksum import (  # noqa: E402
    fingerprint_diff,
    table_fingerprint,
)
from dataworks_audit_data_ingest_spark.incremental.joinview import (  # noqa: E402
    JoinViewSpec,
)
from dataworks_audit_data_ingest_spark.incremental.joinview_cdc import (  # noqa: E402
    compact_join_view_cdc,
    forget_right_ids_from_cdc_view,
    read_current_side,
    read_join_view_cdc,
    update_join_view_cdc,
    verify_cdc_side,
)
from dataworks_audit_data_ingest_spark.session import get_spark  # noqa: E402
from dataworks_audit_data_ingest_spark.tables import table  # noqa: E402

SPEC = JoinViewSpec(
    key="c_custkey",
    left_id="o_orderkey",
    right_id="c_custkey",
    n_buckets=16,
)
# audit content: ids + month + exact cents + the mutable attributes
_CONTENT = [
    "o_orderkey",
    "c_custkey",
    "o_orderpriority",
    "cents",
    "c_mktsegment",
]


def _with_audit_cols(df):
    return df.withColumn(
        "month", F.trunc("o_orderdate", "month")
    ).withColumn(
        "cents", F.expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)")
    )


def _audit(spark, root) -> int:
    """Anti-entropy check: the net view vs a from-scratch join of the
    maintained current sides. Returns the number of diverging months
    (0 == mirror faithful)."""
    view = _with_audit_cols(read_join_view_cdc(spark, root))
    left = read_current_side(spark, root, "left", SPEC)
    right = read_current_side(spark, root, "right", SPEC)
    truth = _with_audit_cols(left.join(right, on="c_custkey"))
    fa = table_fingerprint(view, ["month"], _CONTENT)
    fb = table_fingerprint(truth, ["month"], _CONTENT)
    return fingerprint_diff(fa, fb).count()


def run_example(sf_dir: str) -> int:
    spark = get_spark("cdc-mirror-example")
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("c_custkey"),
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    root = tempfile.mkdtemp(prefix="cdc_mirror_") + "/view"

    # 1. seed, then three change waves
    update_join_view_cdc(
        spark, root, "0000", SPEC, left_upserts=orders, right_upserts=cust
    )
    assert _audit(spark, root) == 0, "seeded mirror diverged"

    upd = orders.filter(F.expr("o_orderkey % 10 = 1")).withColumn(
        "o_orderpriority", F.lit("1-CORRECTED")
    )
    update_join_view_cdc(spark, root, "0001", SPEC, left_upserts=upd)
    assert _audit(spark, root) == 0, "update wave diverged"

    cancelled = orders.filter(F.expr("o_orderkey % 10 = 2")).select(
        "c_custkey", "o_orderkey"
    )
    update_join_view_cdc(spark, root, "0002", SPEC, left_deletes=cancelled)
    assert _audit(spark, root) == 0, "delete wave diverged"

    moved = orders.filter(F.expr("o_orderkey % 10 = 3"))
    update_join_view_cdc(
        spark,
        root,
        "0003",
        SPEC,
        left_upserts=moved.withColumn("c_custkey", F.expr("c_custkey + 1")),
        left_deletes=moved.select("c_custkey", "o_orderkey"),
    )
    assert _audit(spark, root) == 0, "key-move wave diverged"
    assert verify_cdc_side(spark, root, "left", SPEC) == 0

    # 2. semantic compaction must be invisible to every reader
    n_before = read_join_view_cdc(spark, root).count()
    compact_join_view_cdc(spark, root, SPEC, exclude=("0003",))
    assert read_join_view_cdc(spark, root).count() == n_before
    assert _audit(spark, root) == 0, "compaction broke the mirror"

    # 3. GDPR: erase one customer everywhere, including signed history
    subject = (
        read_current_side(spark, root, "right", SPEC)
        .select("c_custkey")
        .orderBy("c_custkey")
        .limit(1)
    )
    sid = subject.collect()[0][0]
    removed = forget_right_ids_from_cdc_view(
        spark, root, subject, SPEC
    )
    assert removed["view_rows_removed"] >= 0
    raw_view = spark.read.parquet(f"{root}/view")
    assert raw_view.filter(F.col("c_custkey") == sid).count() == 0
    assert (
        spark.read.parquet(f"{root}/right")
        .filter(F.col("c_custkey") == sid)
        .count()
        == 0
    )
    assert _audit(spark, root) == 0, "post-forget mirror diverged"
    print(
        f"CDC mirror green: 4 change waves audited, compaction invisible, "
        f"customer {sid} erased ({removed})"
    )
    return 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    raise SystemExit(run_example(sf))
