"""Distributed PCA: correctness vs numpy on collected data, JVM-only
projection, variance ordering."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataworks_audit_data_ingest_spark.similarity.pca import fit_pca, transform_pca
from dataworks_audit_data_ingest_spark.tables import table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return table(spark, SF, "embeddings").limit(200).cache()


def test_fit_matches_numpy_reference(spark, emb):
    mean, comps, var = fit_pca(emb, n_components=4)
    X = np.array([r.embedding for r in emb.collect()], dtype=np.float64)
    np.testing.assert_allclose(mean, X.mean(axis=0), atol=1e-9)
    cov = np.cov(X, rowvar=False, bias=True)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:4]
    np.testing.assert_allclose(var, vals[order], rtol=1e-8)
    for got, k in zip(comps, order):
        ref = vecs[:, k]
        # eigenvectors are sign-ambiguous
        assert min(
            np.abs(np.array(got) - ref).max(), np.abs(np.array(got) + ref).max()
        ) < 1e-8


def test_transform_is_jvm_only_and_correct(spark, emb):
    mean, comps, _ = fit_pca(emb, n_components=3)
    out = transform_pca(emb, mean, comps)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert node not in plan
    rows = out.select("vec_id", "pca", "embedding").limit(5).collect()
    M = np.array(mean)
    C = np.array(comps)
    for r in rows:
        ref = C @ (np.array(r.embedding, dtype=np.float64) - M)
        np.testing.assert_allclose(r.pca, ref, atol=1e-9)


def test_variance_is_decreasing_and_dominant(spark, emb):
    _, _, var = fit_pca(emb, n_components=8)
    assert var == sorted(var, reverse=True)
    assert var[0] > 0
