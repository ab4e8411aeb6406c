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


class TestSifEmbeddings:
    """SIF doc embeddings pinned against a full-batch numpy reference
    implementing the identical math: Python \\w+ tokens, a/(a+p(w))
    weights with count-1 OOV, crc32 hashed bag-of-words averaged per
    token count, uncentered top-eigenvector removal (sign pinned)."""

    TEXTS = [
        "the quick brown fox jumps over the lazy dog",
        "the the the quick quick brown",
        "pack my box with five dozen liquor jugs",
        "sphinx of black quartz judge my vow",
        "",
        "how vexingly quick daft zebras jump",
        "the five boxing wizards jump quickly",
        "...",  # punctuation-only: zero tokens, must stay a zero vector
        "jackdaws love my big sphinx of quartz the the",
        "quick zephyrs blow vexing daft jim",
    ]

    @staticmethod
    def _numpy_sif(texts, dim, a, vocab_size):
        import re
        import zlib
        from collections import Counter

        tok_re = re.compile(r"\w+")
        corpus = Counter()
        for t in texts:
            corpus.update(tok_re.findall(t.lower()))
        total = sum(corpus.values())
        top = sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))[
            :vocab_size
        ]
        weights = {tok: a / (a + c / total) for tok, c in top}
        w_oov = a / (a + 1.0 / total)
        mat = np.zeros((len(texts), dim))
        for i, t in enumerate(texts):
            toks = Counter(tok_re.findall(t.lower()))
            n = sum(toks.values())
            if not n:
                continue
            for tok, c in toks.items():
                h = zlib.crc32(tok.encode())
                sign = 1.0 if (h >> 31) & 1 == 0 else -1.0
                mat[i, h % dim] += weights.get(tok, w_oov) * sign * c
            mat[i] /= n
        evals, evecs = np.linalg.eigh(mat.T @ mat / len(texts))
        u = evecs[:, int(np.argmax(evals))]
        if u[int(np.argmax(np.abs(u)))] < 0:
            u = -u
        return mat - np.outer(mat @ u, u)

    def test_matches_numpy_full_batch(self, spark):
        from clawrag_spark.operators.dataset import sif_embeddings

        dim, a = 16, 1e-3
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(self.TEXTS)],
            "doc_id int, text string",
        ).repartition(4)
        got = {
            r["doc_id"]: np.array(r["sif"])
            for r in sif_embeddings(
                docs, "doc_id", "text", dim=dim, a=a, decimals=6
            ).collect()
        }
        want = self._numpy_sif(self.TEXTS, dim, a, 50_000)
        assert set(got) == set(range(len(self.TEXTS)))
        for i in range(len(self.TEXTS)):
            np.testing.assert_allclose(got[i], want[i], atol=2e-6)
        # the tokenless doc stays exactly zero even after PC removal
        assert np.all(got[7] == 0.0)

    def test_vocab_bound_reroutes_tail_to_oov(self, spark):
        """vocab_size smaller than the vocabulary: tail tokens must be
        weighted as OOV (count-1 probability), not dropped."""
        from clawrag_spark.operators.dataset import sif_embeddings

        dim, a, vs = 8, 1e-2, 3
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(self.TEXTS)],
            "doc_id int, text string",
        )
        got = {
            r["doc_id"]: np.array(r["sif"])
            for r in sif_embeddings(
                docs, "doc_id", "text", dim=dim, a=a,
                vocab_size=vs, remove_pc=False, decimals=6,
            ).collect()
        }
        import re
        import zlib
        from collections import Counter

        tok_re = re.compile(r"\w+")
        corpus = Counter()
        for t in self.TEXTS:
            corpus.update(tok_re.findall(t.lower()))
        total = sum(corpus.values())
        top = sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))[:vs]
        weights = {tok: a / (a + c / total) for tok, c in top}
        w_oov = a / (a + 1.0 / total)
        for i, t in enumerate(self.TEXTS):
            toks = Counter(tok_re.findall(t.lower()))
            n = sum(toks.values())
            row = np.zeros(dim)
            if n:
                for tok, c in toks.items():
                    h = zlib.crc32(tok.encode())
                    sign = 1.0 if (h >> 31) & 1 == 0 else -1.0
                    row[h % dim] += weights.get(tok, w_oov) * sign * c
                row /= n
            np.testing.assert_allclose(got[i], row, atol=2e-6)
