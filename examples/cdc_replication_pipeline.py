"""CDC-replication demo: a REMOTE REPLICA kept in sync by shipping the
maintained join view's SIGNED change feed, audited with anti-entropy
fingerprints, repaired with z-set corrections, and GDPR-erased on both
sites — including a crash-interrupted erasure recovered from the
durable forget intent.

`examples/cdc_mirror_pipeline.py` audits one site against its own
sides; this is the TWO-site shape a 100 TB replicated mirror actually
runs:

  1. maintain the primary ``orders ⋈ customer`` CDC view through change
     waves (update, delete, key move) and SHIP the signed deltas with
     `incremental/replicate.py::ship_view_deltas` — cursor-FREE
     catch-up transport (the replica's own partition listing is the
     cursor, so a shipper that was down for two waves resumes by
     listing, not by remembering); the replica is just the shipped
     partitions netted on read (z-sets replicate by append: no
     replica-side merge logic at all);
  2. after every wave, anti-entropy audit: `table_fingerprint` the
     primary's net view vs the replica's net, per month — one scan
     each side, (month, count, checksum) partials, no rows move;
  3. CORRUPT the replica (a lost feed partition — the classic silent
     replication failure), localize the damage to exact months, and
     repair with a SIGNED CORRECTION batch: (primary ∖ replica) at
     ``+1`` and (replica ∖ primary) at ``-1``, restricted to the
     diverged months — the repair is itself just another z-set delta,
     proportional to the divergence, not the table;
  4. GDPR-erase one customer on the primary with a CRASH injected
     between the op-log and view erasures: the naive retry would
     re-derive an EMPTY subject set from the half-erased store, but
     `recover_pending_forgets` replays the erasure from the durable
     intent persisted before the first mutation (round-12 machinery);
     then propagate the forget to the replica's shipped partitions and
     re-audit clean.

Built-in ground truth: waves are integer-mod slices; the corrupted
months are exactly the dropped partition's months; the audit is clean
(0 diverging months) after every legitimate stage.

Run:  python examples/cdc_replication_pipeline.py [sf_dir]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from dataworks_audit_data_ingest_spark.functions.checksum import (  # noqa: E402
    fingerprint_diff,
    table_fingerprint,
)
from dataworks_audit_data_ingest_spark.incremental.forget import (  # noqa: E402
    forget_matching_from_store,
)
from dataworks_audit_data_ingest_spark.incremental.joinview import (  # noqa: E402
    JoinViewSpec,
    recover_pending_forgets,
)
from dataworks_audit_data_ingest_spark.incremental.joinview_cdc import (  # noqa: E402
    forget_right_ids_from_cdc_view,
    read_current_side,
    read_join_view_cdc,
    update_join_view_cdc,
)
from dataworks_audit_data_ingest_spark.incremental.replicate import (  # noqa: E402
    read_replica,
    repair_replica,
    ship_view_deltas,
)
from dataworks_audit_data_ingest_spark.session import get_spark  # noqa: E402
from dataworks_audit_data_ingest_spark.tables import table  # noqa: E402

SPEC = JoinViewSpec(
    key="c_custkey",
    left_id="o_orderkey",
    right_id="c_custkey",
    n_buckets=16,
)
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


def _diverging_months(spark, root, replica):
    fa = table_fingerprint(
        _with_audit_cols(read_join_view_cdc(spark, root)),
        ["month"],
        _CONTENT,
    )
    fb = table_fingerprint(
        _with_audit_cols(read_replica(spark, replica)), ["month"], _CONTENT
    )
    return [r["month"] for r in fingerprint_diff(fa, fb).collect()]


def run_example(sf_dir: str) -> int:
    spark = get_spark("cdc-replication-example")
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
    tmp = tempfile.mkdtemp(prefix="cdc_repl_")
    root, replica = f"{tmp}/view", f"{tmp}/replica"

    # 1. seed + change waves; the shipper runs AFTER wave 1 and again
    # after wave 3 — catch-up transport needs no cursor, the replica's
    # partition listing is the cursor
    update_join_view_cdc(
        spark, root, "0000", SPEC, left_upserts=orders, right_upserts=cust
    )
    upd = orders.filter(F.expr("o_orderkey % 10 = 1")).withColumn(
        "o_orderpriority", F.lit("1-CORRECTED")
    )
    update_join_view_cdc(spark, root, "0001", SPEC, left_upserts=upd)
    out = ship_view_deltas(spark, root, replica)
    assert out["shipped"] == ["0000", "0001"], out
    cancelled = orders.filter(F.expr("o_orderkey % 10 = 2")).select(
        "c_custkey", "o_orderkey"
    )
    update_join_view_cdc(spark, root, "0002", SPEC, left_deletes=cancelled)
    moved = orders.filter(F.expr("o_orderkey % 10 = 3"))
    update_join_view_cdc(
        spark,
        root,
        "0003",
        SPEC,
        left_upserts=moved.withColumn("c_custkey", F.expr("c_custkey + 1")),
        left_deletes=moved.select("c_custkey", "o_orderkey"),
    )
    out = ship_view_deltas(spark, root, replica)  # the shipper was away
    assert out["shipped"] == ["0002", "0003"], out
    assert _diverging_months(spark, root, replica) == [], (
        "replica diverged after clean replication"
    )

    # 2. lose a shipped partition (silent transport failure), localize
    shutil.rmtree(f"{replica}/batch_id=0001")
    diverged = _diverging_months(spark, root, replica)
    assert diverged, "corruption went undetected"

    # 3. z-set repair scoped to the diverged months: the scope rides on
    # o_orderdate (a real view column), derived from the months the
    # fingerprints localized — the repair reads only the damaged slice
    months = [m for m in diverged]
    scope = (
        read_join_view_cdc(spark, root)
        .filter(F.trunc("o_orderdate", "month").isin(months))
        .select("o_orderdate")
        .distinct()
    )
    rep = repair_replica(
        spark, root, replica, "0004",
        scope=scope, scope_cols=("o_orderdate",),
    )
    assert rep["correction_rows"] > 0
    assert _diverging_months(spark, root, replica) == [], (
        "repair did not converge"
    )

    # 4. GDPR forget with a crash between the two primary erasures
    subject = (
        read_current_side(spark, root, "right", SPEC)
        .select("c_custkey")
        .orderBy("c_custkey")
        .limit(1)
    )
    sid = subject.collect()[0][0]

    import dataworks_audit_data_ingest_spark.incremental.forget as fg

    real = fg.forget_matching_from_store

    def crash_before_view(spark_, store_path, *a, **kw):
        if store_path.rstrip("/").endswith("/view"):
            raise RuntimeError("simulated crash between the two erasures")
        return real(spark_, store_path, *a, **kw)

    fg.forget_matching_from_store = crash_before_view
    try:
        forget_right_ids_from_cdc_view(spark, root, subject, SPEC)
        raise AssertionError("crash injection did not fire")
    except RuntimeError:
        pass
    finally:
        fg.forget_matching_from_store = real

    # the crash window is real: op log erased, view residue remains —
    # and the subject set can NO LONGER be re-derived from the store
    raw_view = spark.read.parquet(f"{root}/view")
    assert raw_view.filter(F.col("c_custkey") == sid).count() > 0
    assert (
        read_current_side(spark, root, "right", SPEC)
        .filter(F.col("c_custkey") == sid)
        .count()
        == 0
    )
    # recovery replays from the durable intent persisted pre-mutation
    recover_pending_forgets(spark, root)
    raw_view = spark.read.parquet(f"{root}/view")
    assert raw_view.filter(F.col("c_custkey") == sid).count() == 0

    # propagate to the replica: its shipped partitions are a store too
    forget_matching_from_store(
        spark,
        replica,
        spark.createDataFrame([(sid,)], "c_custkey long"),
        id_col="c_custkey",
    )
    assert (
        spark.read.parquet(replica).filter(F.col("c_custkey") == sid).count()
        == 0
    )
    assert _diverging_months(spark, root, replica) == [], (
        "post-forget replica diverged"
    )
    print(
        f"CDC replication green: 4 shipped waves, {len(months)} month(s) "
        f"corrupted+repaired via signed corrections, customer {sid} "
        "crash-forgotten on the primary and propagated to the replica"
    )
    return 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    raise SystemExit(run_example(sf))
