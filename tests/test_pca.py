"""Distributed PCA: the tree-aggregated covariance fit is pinned
against numpy full-batch PCA (same sign convention) and the JVM-only
projection against the numpy projection of the same fit."""

import numpy as np
import pytest

from clawrag_spark.operators.dataset import fit_pca, pca_project


def _numpy_pca(X, k):
    mu = X.mean(axis=0)
    cov = np.cov(X, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = []
    for idx in order:
        v = evecs[:, idx]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        comps.append(v)
    evr = [float(evals[i]) / float(evals.sum()) for i in order]
    return mu, np.array(comps), evr


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(7)
    # anisotropic cloud: three dominant directions in d=12
    basis = rng.randn(12, 12)
    scales = np.array([10, 6, 3] + [0.5] * 9)
    return rng.randn(400, 12) * scales @ basis


@pytest.fixture(scope="module")
def emb(spark, data):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(data)]
    return spark.createDataFrame(
        rows, "vec_id int, embedding array<double>"
    ).repartition(8)


def test_fit_matches_numpy_full_batch(spark, emb, data):
    mean, comps, evr = fit_pca(emb, "embedding", k=3)
    mu_ref, comps_ref, evr_ref = _numpy_pca(data, 3)
    assert np.allclose(mean, mu_ref, atol=1e-9)
    # same covariance up to float-sum ordering -> same eigenvectors
    assert np.allclose(np.array(comps), comps_ref, atol=1e-6)
    assert np.allclose(evr, evr_ref, atol=1e-9)
    # descending variance, orthonormal components
    assert all(evr[i] >= evr[i + 1] for i in range(len(evr) - 1))
    C = np.array(comps)
    assert np.allclose(C @ C.T, np.eye(3), atol=1e-9)


def test_fit_is_partitioning_invariant(spark, emb, data):
    m1, c1, _ = fit_pca(emb, "embedding", k=2)
    m2, c2, _ = fit_pca(emb.repartition(1), "embedding", k=2)
    assert np.allclose(m1, m2, atol=1e-9)
    assert np.allclose(np.array(c1), np.array(c2), atol=1e-7)


def test_projection_matches_numpy(spark, emb, data):
    mean, comps, _ = fit_pca(emb, "embedding", k=3)
    got = {
        r["vec_id"]: (r["pc1"], r["pc2"], r["pc3"])
        for r in pca_project(
            emb, "vec_id", "embedding", mean, comps, decimals=6
        ).collect()
    }
    want = (data - np.array(mean)) @ np.array(comps).T
    for i in range(len(data)):
        assert np.allclose(got[i], np.round(want[i], 6), atol=2e-6), i
    # pc1 carries the most spread
    arr = np.array([got[i] for i in range(len(data))])
    assert arr[:, 0].std() > arr[:, 1].std() > arr[:, 2].std()


def test_fit_validations(spark):
    empty = spark.createDataFrame([], "vec_id int, embedding array<double>")
    with pytest.raises(ValueError):
        fit_pca(empty, "embedding", k=2)
    two = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [2.0, 1.0])], "vec_id int, embedding array<double>"
    )
    with pytest.raises(ValueError):
        fit_pca(two, "embedding", k=5)
