"""Distributed PCA for embedding columns — the standard ANN preprocessing
step (decorrelate + truncate before IVF/LSH indexing).

The classic Spark decomposition of the problem:

  1. one distributed pass computes the d-vector mean and the d×d scatter
     matrix (sum of outer products) via ``posexplode`` + a (i, j)-keyed
     aggregation — shuffle width is d², never |corpus|;
  2. the d×d eigendecomposition runs driver-side with numpy (d is 64-4096
     for real embedding models: trivially driver-sized, and no distributed
     eigensolver is warranted);
  3. the projection back onto the top-k components is a broadcast matrix
     of k·d doubles applied as a JVM ZIP_WITH/AGGREGATE expression — no
     Python in the per-row path.

numpy appears ONLY on the driver for step 2 (d×d), mirroring how the IVF
centroid table stays broadcast-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_pca(
    corpus: DataFrame,
    n_components: int,
    vec_col: str = "embedding",
) -> tuple[list[float], list[list[float]], list[float]]:
    """One distributed pass + driver-side eigh.

    Returns ``(mean, components, explained_variance)`` where ``components``
    is a list of ``n_components`` d-vectors (rows), ordered by decreasing
    eigenvalue.
    """
    import numpy as np

    elems = corpus.select(
        F.posexplode(
            F.expr(f"TRANSFORM({vec_col}, x -> CAST(x AS DOUBLE))")
        ).alias("i", "xi")
    )
    n = corpus.count()
    d = len(corpus.select(vec_col).first()[0])

    mean_rows = elems.groupBy("i").agg((F.sum("xi") / n).alias("m")).collect()
    mean = np.zeros(d)
    for r in mean_rows:
        mean[r.i] = r.m

    # scatter: sum over rows of x_i * x_j for i <= j (symmetric half),
    # keyed by (i, j) — d*(d+1)/2 keys regardless of corpus size
    pairs = (
        corpus.select(
            F.expr(f"TRANSFORM({vec_col}, x -> CAST(x AS DOUBLE))").alias("v")
        )
        .select(F.posexplode("v").alias("i", "xi"), F.col("v"))
        .select(
            "i",
            "xi",
            F.posexplode("v").alias("j", "xj"),
        )
        .filter(F.col("j") >= F.col("i"))
        .groupBy("i", "j")
        .agg(F.sum(F.col("xi") * F.col("xj")).alias("s"))
        .collect()
    )
    scatter = np.zeros((d, d))
    for r in pairs:
        scatter[r.i, r.j] = r.s
        scatter[r.j, r.i] = r.s
    cov = scatter / n - np.outer(mean, mean)

    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:n_components]
    components = [vecs[:, k].tolist() for k in order]
    explained = [float(vals[k]) for k in order]
    return mean.tolist(), components, explained


def transform_pca(
    corpus: DataFrame,
    mean: list[float],
    components: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project each vector onto the components — pure JVM expressions over a
    literal (broadcast-sized) component matrix; no Python per row."""
    mean_arr = "ARRAY(" + ", ".join(f"CAST({m} AS DOUBLE)" for m in mean) + ")"
    centered = f"ZIP_WITH(TRANSFORM({vec_col}, x -> CAST(x AS DOUBLE)), {mean_arr}, (x, m) -> x - m)"
    projections = []
    for comp in components:
        c_arr = "ARRAY(" + ", ".join(f"CAST({c} AS DOUBLE)" for c in comp) + ")"
        projections.append(
            f"AGGREGATE(ZIP_WITH({centered}, {c_arr}, (x, c) -> x * c), "
            f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        )
    return corpus.withColumn(out_col, F.expr("ARRAY(" + ", ".join(projections) + ")"))
