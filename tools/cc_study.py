"""Measured study: incremental CC maintenance vs per-batch full
recompute as crawl history grows — the evidence behind
`incremental/cc.py`'s merge-only claim.

    python tools/cc_study.py [n_batches]

Feeds the real q51 near-dup pairs (sf0.1) into the label store in
hash-sliced batches and, at every step, times (a) `update_cc_store`
(contract + batch-sized CC + broadcast relabel) against (b) the batch
kernel recomputing CC over the UNION of all pairs so far — what a
pipeline without the store pays per refresh. Equality of labels is
asserted at every step (the drill's invariant, re-checked here on the
larger fixture).
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from dataworks_audit_data_ingest_spark.functions.graph import (  # noqa: E402
    connected_components,
)
from dataworks_audit_data_ingest_spark.incremental.cc import (  # noqa: E402
    read_cc_labels,
    update_cc_store,
)
from dataworks_audit_data_ingest_spark.queries.dedup import (  # noqa: E402
    q51_dedup_minhash_lsh,
)
from dataworks_audit_data_ingest_spark.session import tune  # noqa: E402

SF = "/root/testdata/sf0.1"


def main() -> int:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .appName("cc-study")
        .getOrCreate()
    )
    tune(spark)
    pairs = (
        q51_dedup_minhash_lsh(spark, SF)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    print(f"pairs: {pairs.count()} at {SF}")
    store = tempfile.mkdtemp(prefix="cc_study_")
    union = None
    print(
        "| batch | new pairs | union pairs | incremental update"
        " (kernel input = batch) | batch recompute (kernel input = union) |"
    )
    print("|---|---|---|---|---|")
    for b in range(n_batches):
        part = pairs.filter(
            F.expr(f"pmod(hash(doc_a, doc_b), {n_batches}) = {b}")
        ).localCheckpoint(eager=True)
        union = part if union is None else union.unionByName(part)
        union = union.localCheckpoint(eager=True)

        t0 = time.time()
        update_cc_store(spark, store, part, str(b))
        inc_s = time.time() - t0

        t0 = time.time()
        batch_labels = connected_components(union).localCheckpoint(eager=True)
        full_s = time.time() - t0

        got = sorted(
            (r.node_id, r.cluster_id)
            for r in read_cc_labels(spark, store).collect()
        )
        want = sorted(
            (r.node_id, r.cluster_id) for r in batch_labels.collect()
        )
        assert got == want, f"divergence at batch {b}"
        print(
            f"| {b} | {part.count()} | {union.count()} |"
            f" {inc_s:.2f}s | {full_s:.2f}s |"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
