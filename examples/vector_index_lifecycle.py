"""The standing vector-index lifecycle in one runnable file:

  1. **Train generation 1** — IVF cells over the initial corpus
     (`similarity/kmeans.py::train_cells`), and record the training-time
     quality baseline (`streaming/index_job.py::quality_milli` — mean
     squared quantization error of the training assignment).
  2. **Stream-index with monitoring** — micro-batches route to their
     nearest cell and land cell-partitioned (immediately IVF-queryable);
     each batch ALSO lands a one-row quality record. In-distribution
     traffic keeps `should_retrain` quiet.
  3. **Drift fires the loop** — a shifted batch arrives (a new domain /
     embedding-model version); its vectors sit systematically farther
     from every trained centroid, the quality record shows it, and
     `should_retrain` flips — decided entirely from the persisted
     records, no corpus rescan.
  4. **Retrain generation 2** — new cells over recent traffic, a new
     baseline, a NEW index root (generation bump: readers switch
     atomically by path; the old generation stays queryable until
     dropped). Re-indexed drifted traffic is quiet under gen-2.
  5. **Query both generations** — IVF top-k against the cell-partitioned
     stores proves the index is live at every point of the lifecycle.

Every step is the at-scale shape: training touches a bounded sample,
per-batch cost is one broadcast + one map + one batch-sized write, the
retrain decision is a few persisted rows, and generation switching is a
path flip rather than an in-place rewrite.

Run:  python examples/vector_index_lifecycle.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from dataworks_audit_data_ingest_spark.similarity.kmeans import (  # noqa: E402
    assign_cells,
    train_cells,
)
from dataworks_audit_data_ingest_spark.similarity.knn import knn_join  # noqa: E402
from dataworks_audit_data_ingest_spark.streaming.index_job import (  # noqa: E402
    index_microbatch,
    quality_milli,
    should_retrain,
)
from dataworks_audit_data_ingest_spark.tables import table  # noqa: E402

K_CELLS = 4
TOP_K = 3
DRIFT_OFFSET = 5.0  # simulated embedding-model/domain shift


def _doubled(df):
    return df.select(
        "vec_id",
        F.expr("TRANSFORM(embedding, x -> CAST(x AS DOUBLE))").alias(
            "embedding"
        ),
    )


def _pts(df):
    return df.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )


def _shifted(df, offset: float, id_offset: int):
    return df.select(
        (F.col("vec_id") + id_offset).alias("vec_id"),
        F.expr(f"TRANSFORM(embedding, x -> x + {offset})").alias("embedding"),
    )


def run(spark, root: str, sf_dir: str = "/root/testdata/sf0.001") -> dict:
    out: dict = {}
    emb = _doubled(table(spark, sf_dir, "embeddings"))
    base = emb.filter(F.col("vec_id") % 2 == 0)
    fresh = emb.filter(F.col("vec_id") % 2 == 1)

    # -- 1. generation 1: train + baseline ---------------------------------
    _, cents1 = train_cells(base, k=K_CELLS, n_iter=2)
    baseline1 = quality_milli(assign_cells(_pts(base), cents1))
    out["baseline1_milli"] = baseline1

    g1 = f"{root}/gen1"
    # -- 2. in-distribution streaming stays quiet --------------------------
    index_microbatch(
        fresh, 0, cents1, f"{g1}/index", quality_dir=f"{g1}/quality"
    )
    out["quiet_in_distribution"] = not should_retrain(
        spark, f"{g1}/quality", baseline1
    )

    # -- 3. drifted traffic fires the monitor ------------------------------
    drift = _shifted(emb, DRIFT_OFFSET, 1_000_000)
    index_microbatch(
        drift, 1, cents1, f"{g1}/index", quality_dir=f"{g1}/quality"
    )
    out["fired_on_drift"] = should_retrain(
        spark, f"{g1}/quality", baseline1, window=1
    )
    out["gen1_rows"] = spark.read.parquet(f"{g1}/index").count()

    # the gen-1 index stayed queryable throughout
    queries = emb.filter(F.col("vec_id") < TOP_K)
    store1 = spark.read.parquet(f"{g1}/index")
    nn1 = knn_join(
        queries,
        store1,
        TOP_K,
        method="ivf",
        cell_col="cell",
        vec_col="embedding",
    )
    out["gen1_hits"] = nn1.count()

    # -- 4. generation 2: retrain on recent traffic, new root --------------
    recent = fresh.unionByName(drift)
    _, cents2 = train_cells(recent, k=K_CELLS, n_iter=2)
    baseline2 = quality_milli(assign_cells(_pts(recent), cents2))
    out["baseline2_milli"] = baseline2

    g2 = f"{root}/gen2"
    index_microbatch(
        drift, 0, cents2, f"{g2}/index", quality_dir=f"{g2}/quality"
    )
    out["quiet_after_retrain"] = not should_retrain(
        spark, f"{g2}/quality", baseline2, window=1
    )

    # -- 5. gen-2 answers queries over the re-indexed traffic --------------
    store2 = spark.read.parquet(f"{g2}/index")
    nn2 = knn_join(
        drift.filter(F.col("vec_id") < 1_000_000 + TOP_K),
        store2,
        TOP_K,
        method="ivf",
        cell_col="cell",
        vec_col="embedding",
    )
    out["gen2_hits"] = nn2.count()
    return out


def main() -> None:
    import tempfile

    from dataworks_audit_data_ingest_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("vector-index-lifecycle")
    spark.sparkContext.setLogLevel("ERROR")
    with tempfile.TemporaryDirectory() as root:
        out = run(spark, root, sf_dir)
    for k, v in out.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
