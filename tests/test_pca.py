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


# ------------------------------------------------ Lloyd's k-means


def _numpy_lloyd(X, seeds, n_iters):
    cents = seeds.copy()
    for _ in range(n_iters):
        d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        cells = d2.argmin(axis=1)  # first-min tie-break, same as Spark
        nxt = cents.copy()
        for c in range(len(cents)):
            m = X[cells == c]
            if len(m):
                nxt[c] = m.mean(axis=0)
        if np.allclose(nxt, cents, atol=0):
            break
        cents = nxt
    return cents, cells


def test_kmeans_matches_numpy_lloyd_and_separates_blobs(spark):
    from pyspark.sql import functions as F

    from clawrag_spark.operators.dataset import kmeans_assign, kmeans_fit

    rng = np.random.RandomState(3)
    blobs = np.concatenate(
        [rng.randn(80, 6) * 0.1 + center for center in
         (np.zeros(6), np.full(6, 5.0), np.array([5, -5, 5, -5, 5, -5.0]))]
    )
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(blobs)]
    emb = spark.createDataFrame(
        rows, "vec_id int, embedding array<double>"
    ).repartition(6)

    got = kmeans_fit(emb, "vec_id", "embedding", k=3, n_iters=10)

    # replicate the deterministic init: k smallest (xxhash64(id), id)
    seed_ids = [
        r["vec_id"]
        for r in emb.select("vec_id")
        .orderBy(F.xxhash64(F.col("vec_id")), "vec_id")
        .limit(3)
        .collect()
    ]
    seeds = blobs[seed_ids].astype(float)
    want, want_cells = _numpy_lloyd(blobs, seeds, 10)
    assert np.allclose(np.array(got), want, atol=1e-7)

    assigned = {
        r["vec_id"]: r["cell"]
        for r in kmeans_assign(emb, "vec_id", "embedding", got).collect()
    }
    # perfect blob separation: each true blob maps to exactly one cell
    for b in range(3):
        cells = {assigned[i] for i in range(b * 80, (b + 1) * 80)}
        assert len(cells) == 1, b
    assert len({next(iter({assigned[b * 80]})) for b in range(3)}) == 3
    # and matches the numpy assignment labels
    assert all(assigned[i] == want_cells[i] for i in range(len(blobs)))


def test_kmeans_validates_k(spark):
    from clawrag_spark.operators.dataset import kmeans_fit

    emb = spark.createDataFrame(
        [(0, [1.0, 2.0])], "vec_id int, embedding array<double>"
    )
    with pytest.raises(ValueError):
        kmeans_fit(emb, "vec_id", "embedding", k=5)
