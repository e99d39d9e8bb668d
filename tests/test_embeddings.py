"""embedding covariance + PCA (operators/embeddings.py) vs numpy."""

from __future__ import annotations

import numpy as np
import pytest

from linkgraph.operators.embeddings import embedding_covariance, embedding_pca

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").persist()


@pytest.fixture(scope="module")
def X(emb):
    rows = emb.orderBy("vec_id").collect()
    return (
        np.asarray([r["embedding"] for r in rows], dtype=np.float64),
        [r["vec_id"] for r in rows],
    )


def test_covariance_matches_numpy(spark, emb, X):
    x, _ = X
    got_rows = embedding_covariance(emb).collect()
    d = x.shape[1]
    got = np.zeros((d, d))
    for r in got_rows:
        got[r["i"], r["j"]] = r["cov"]
    want = np.cov(x, rowvar=False, bias=True)  # population covariance
    assert len(got_rows) == d * d
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-10)
    # symmetric by construction
    np.testing.assert_allclose(got, got.T, atol=1e-12)


def test_covariance_repartition_invariant_to_fp_noise(spark, emb):
    a = {(r["i"], r["j"]): r["cov"] for r in embedding_covariance(emb).collect()}
    b = {
        (r["i"], r["j"]): r["cov"]
        for r in embedding_covariance(emb.repartition(9)).collect()
    }
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-12)


def test_pca_matches_numpy(spark, emb, X):
    x, ids = X
    k = 4
    res = embedding_pca(emb, k=k)
    # eigenvalues: numpy eigh on the same population covariance
    C = np.cov(x, rowvar=False, bias=True)
    vals = np.sort(np.linalg.eigvalsh(C))[::-1][:k]
    np.testing.assert_allclose(res.explained_variance, vals, atol=1e-10)
    assert vals[0] >= vals[-1] >= 0  # PSD covariance
    # components: orthonormal, sign-canonical
    V = np.asarray(res.components).T  # d x k
    np.testing.assert_allclose(V.T @ V, np.eye(k), atol=1e-10)
    for c in range(k):
        nz = np.nonzero(np.abs(V[:, c]) > 1e-12)[0]
        assert V[nz[0], c] > 0
    # projection equals centered matmul
    got = {r["id"]: r["proj"] for r in res.projected.collect()}
    want = (x - x.mean(axis=0)) @ V
    for row_i, vid in enumerate(ids):
        np.testing.assert_allclose(got[vid], want[row_i], atol=1e-9)
    # variance of the first score equals the first eigenvalue
    p0 = np.asarray([got[v][0] for v in ids])
    assert p0.var() == pytest.approx(vals[0], rel=1e-9)


def test_pca_k_validation(spark, emb):
    with pytest.raises(ValueError):
        embedding_pca(emb, k=0)
    with pytest.raises(ValueError):
        embedding_pca(emb, k=10_000)


# ---- deterministic Lloyd k-means ----

def _kmeans_replica(X, ids, k, n_iter):
    import numpy as np

    order = np.argsort(ids)
    cents = [X[order[i]].tolist() for i in range(k)]

    def assign(cents):
        C = np.asarray(cents)
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        cells = d2.argmin(axis=1)  # numpy argmin = first minimum = min cell
        return cells, d2[np.arange(len(X)), cells]

    for _ in range(n_iter):
        cells, _ = assign(cents)
        for c in range(k):
            mask = cells == c
            if mask.any():
                cents[c] = X[mask].mean(axis=0).tolist()
    cells, d2 = assign(cents)
    return cells, d2, cents


def test_kmeans_matches_replica_and_monotone(spark, emb, X):
    from linkgraph.operators.embeddings import kmeans_lloyd

    x, ids = X
    k = 6
    res = kmeans_lloyd(emb, k=k, n_iter=4)
    cells, d2, cents = _kmeans_replica(x, ids, k, 4)
    got = {r["id"]: (r["cell"], r["dist2"]) for r in res.assignments.collect()}
    for row_i, vid in enumerate(ids):
        assert got[vid][0] == cells[row_i], vid
        assert got[vid][1] == pytest.approx(d2[row_i], rel=1e-9)
    assert res.inertia == pytest.approx(float(d2.sum()), rel=1e-9)
    # Lloyd monotonicity: more iterations never increase inertia
    res1 = kmeans_lloyd(emb, k=k, n_iter=1)
    assert res.inertia <= res1.inertia + 1e-9


def test_kmeans_k1_is_global_mean(spark, emb, X):
    from linkgraph.operators.embeddings import kmeans_lloyd

    x, _ = X
    res = kmeans_lloyd(emb, k=1, n_iter=2)
    np.testing.assert_allclose(res.centroids[0], x.mean(axis=0), atol=1e-10)
    # inertia = total variance * n
    want = (((x - x.mean(axis=0)) ** 2).sum(axis=1)).sum()
    assert res.inertia == pytest.approx(want, rel=1e-9)


def test_kmeans_validation(spark, emb):
    from linkgraph.operators.embeddings import kmeans_lloyd

    with pytest.raises(ValueError):
        kmeans_lloyd(emb, k=0)
    with pytest.raises(ValueError):
        kmeans_lloyd(emb, k=10_000)
