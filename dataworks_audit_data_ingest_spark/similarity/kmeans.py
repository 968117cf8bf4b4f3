"""DataFrame-native Lloyd's k-means — trains the IVF cell structure when no
natural partitioning (label column) exists.

Everything is declarative Spark: assignment is a broadcast join of the
(k-row) centroid table against one corpus scan + a per-point argmin window
over k candidate rows; the update step is one groupBy mean over exploded
vector positions. Each round cuts lineage with ``localCheckpoint`` — the
same O(iterations)-shuffle discipline as the connected-components operator
(queries/dedup.py::q58). No Python in the math path.

At 100 TB: per round, one broadcast (k·dim doubles — tiny), one corpus
scan, one shuffle keyed by (cell, pos) whose width is k·dim, not |corpus|.
Deterministic end to end: init picks the k lowest portable-MD5 ids, and all
means are decimal-exact — same clusters on every run and partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import spark_hash32

_DEC = "DECIMAL(28,18)"


def _sq_dist(a: str, b: str) -> str:
    """Exact-sum squared L2 distance between two array<double> columns."""
    return (
        f"CAST(AGGREGATE(ZIP_WITH({a}, {b}, (p, v) -> "
        f"CAST((p - v) * (p - v) AS {_DEC})), CAST(0 AS {_DEC}), "
        f"(acc, x) -> CAST(acc + x AS {_DEC})) AS DOUBLE)"
    )


def assign_cells(
    points: DataFrame, centroids: DataFrame, backend: str = "jvm"
) -> DataFrame:
    """(id, cell, sq_dist) — nearest centroid per point; ties break on the
    lower cell id so assignment is deterministic.

    ``backend="jvm"`` joins the broadcast k-row centroid table against the
    points and takes a per-point argmin window — pure JVM, ideal for small
    k, but materializes k rows per point (O(k·n) through the window).
    ``backend="numpy"`` runs the distance argmin as an Arrow-batched
    mapInPandas numpy matmul — one batch-sized GEMM per Arrow batch, no
    k·n row blow-up; this is the 100 TB path once k reaches IVF scale
    (hundreds to thousands of cells). Both backends are exact and agree
    bit-for-bit on the argmin (equivalence pytest)."""
    if backend == "numpy":
        cent_rows = sorted(
            ((r.cell, list(r.cvec)) for r in centroids.collect()),
            key=lambda t: t[0],
        )
        cell_ids = [c for c, _ in cent_rows]
        cent_list = [v for _, v in cent_rows]

        def assign(batches):
            import numpy as np
            import pandas as pd

            C = np.asarray(cent_list, dtype=np.float64)  # (k, d)
            ids = np.asarray(cell_ids)
            c_sq = (C * C).sum(axis=1)
            for pdf in batches:
                X = np.asarray(list(pdf["vec"]), dtype=np.float64)  # (b, d)
                # squared L2 via the expansion; exact argmin is preserved
                # because ties in d2 resolve to the lowest cell id (argmin
                # returns the first index and cells are sorted ascending)
                d2 = (X * X).sum(axis=1)[:, None] - 2.0 * (X @ C.T) + c_sq[None, :]
                best = d2.argmin(axis=1)
                picked = C[best]
                exact = ((X - picked) ** 2).sum(axis=1)
                yield pd.DataFrame(
                    {
                        "id": pdf["id"],
                        "cell": ids[best],
                        "sq_dist": exact,
                    }
                )

        return points.select("id", "vec").mapInPandas(
            assign, schema="id long, cell int, sq_dist double"
        )

    pairs = points.select("id", "vec").join(
        F.broadcast(centroids.select("cell", F.col("cvec")))
    )
    scored = pairs.withColumn("sq_dist", F.expr(_sq_dist("vec", "cvec")))
    w = Window.partitionBy("id").orderBy("sq_dist", "cell")
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("id", "cell", "sq_dist")
    )


def train_cells(
    corpus: DataFrame,
    k: int = 16,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "kmeans",
    init: str = "maxmin",
    backend: str = "jvm",
) -> tuple[DataFrame, DataFrame]:
    """Lloyd's iterations; returns (assignments(id, cell, sq_dist),
    centroids(cell, cvec)).

    ``init="maxmin"`` (default) is deterministic farthest-point: the
    first seed is the point with the lowest portable MD5 hash of its id;
    each next seed is the point farthest from its nearest chosen seed
    (ties on id) — k driver-side argmax probes of one vector each. Never
    double-seeds one dense cluster, but costs k sequential jobs: right for
    k up to a few dozen. ``init="spread"`` takes the k lowest-hash points
    in ONE job — the scale path for IVF-sized k (hundreds+), where Lloyd
    rounds plus empty-cell retention absorb the rougher start.
    ``backend`` selects the assignment kernel (see assign_cells). Cells
    that lose every member during a round keep their previous centroid
    (no silent k shrinkage)."""
    pts = corpus.select(
        F.col(id_col).alias("id"),
        F.expr(f"TRANSFORM({vec_col}, x -> CAST(x AS DOUBLE))").alias("vec"),
    ).localCheckpoint()

    hashed = pts.withColumn(
        "_h", F.expr(spark_hash32("CAST(id AS STRING)", seed))
    )
    if init == "spread":
        seed_vecs = [r.vec for r in hashed.orderBy("_h", "id").limit(k).collect()]
    else:
        first = hashed.orderBy("_h", "id").limit(1).select("vec").first()
        seed_vecs = [first.vec]
        for _ in range(k - 1):
            cents = _centroid_df(pts.sparkSession, seed_vecs)
            far = (
                assign_cells(pts, cents, backend=backend)
                .join(pts, "id")
                .orderBy(F.desc("sq_dist"), "id")
                .limit(1)
                .select("vec")
                .first()
            )
            seed_vecs.append(far.vec)
    centroids = _centroid_df(pts.sparkSession, seed_vecs).localCheckpoint()

    assigned = None
    for _ in range(n_iter):
        assigned = assign_cells(pts, centroids, backend=backend)
        # update: mean per (cell, position), decimal-exact then one rounding
        elems = (
            pts.join(assigned.select("id", "cell"), "id")
            .select("cell", F.posexplode("vec").alias("pos", "v"))
        )
        # Portable mean: exact decimal SUM, one cast to double, THEN the
        # IEEE division — the same value DuckDB's
        # CAST(SUM(decimal) AS DOUBLE)/COUNT(*) produces, so trained
        # centroids hash-match the oracle (q230). Decimal division first
        # would round at Spark's decimal-division scale instead.
        means = elems.groupBy("cell", "pos").agg(
            (
                F.sum(F.col("v").cast(_DEC)).cast("double")
                / F.count(F.lit(1))
            ).alias("m")
        )
        new_cents = (
            means.groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cell", F.expr("TRANSFORM(pm, x -> x.m)").alias("new_cvec"))
        )
        # a cell with no members this round keeps its previous centroid
        centroids = (
            centroids.join(new_cents, "cell", "left")
            .select(
                "cell", F.coalesce("new_cvec", "cvec").alias("cvec")
            )
        ).localCheckpoint()

    return assign_cells(pts, centroids, backend=backend), centroids


def _centroid_df(spark, vecs: list) -> DataFrame:
    """Build the (cell, cvec) table from driver-side seed vectors (k rows)."""
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "cell int, cvec array<double>",
    )


def inertia(assignments: DataFrame) -> float:
    """Total within-cluster squared distance — the Lloyd's objective."""
    return float(assignments.agg(F.sum("sq_dist")).first()[0])
