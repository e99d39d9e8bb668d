"""eigenvector_centrality (operators/eigen.py) — numpy/networkx pins."""

from __future__ import annotations

import numpy as np
import pytest

from linkgraph.operators.eigen import eigenvector_centrality

from .conftest import edges_df, karate_club, toy_cycle


def _numpy_power(src, dst, n, iters):
    A = np.zeros((n, n))
    for a, b in zip(src, dst):
        A[int(a), int(b)] += 1.0
    x = np.full(n, 1.0 / np.sqrt(n))
    for _ in range(iters):
        x = A.T @ x
        x = x / np.linalg.norm(x)
    return x


def test_eigen_matches_numpy_fixed_iters(spark):
    src, dst, n = karate_club()
    e = edges_df(spark, src, dst)
    res = eigenvector_centrality(e, max_iter=10, check_convergence=False)
    got = {r["node"]: r["score"] for r in res.scores.collect()}
    want = _numpy_power(src, dst, n, 10)
    assert res.iterations == 10
    for v in range(n):
        assert got[v] == pytest.approx(want[v], rel=1e-10)


def test_eigen_converges_to_principal_eigenvector(spark):
    src, dst, n = karate_club()
    res = eigenvector_centrality(edges_df(spark, src, dst), eps=1e-12)
    assert res.converged
    got = np.array(
        [r["score"] for r in sorted(res.scores.collect(), key=lambda r: r["node"])]
    )
    A = np.zeros((n, n))
    for a, b in zip(src, dst):
        A[int(a), int(b)] += 1.0
    w, V = np.linalg.eigh(A)  # symmetric: eigh is exact
    lead = V[:, np.argmax(w)]
    lead = lead * np.sign(lead.sum())
    assert np.allclose(got, lead, atol=1e-6)
    assert np.linalg.norm(got) == pytest.approx(1.0)


def test_eigen_networkx_parity(spark):
    pytest.importorskip("scipy")  # nx's eigenvector_centrality_numpy needs it
    nx = pytest.importorskip("networkx")
    src, dst, n = karate_club()
    res = eigenvector_centrality(edges_df(spark, src, dst), eps=1e-12)
    got = {r["node"]: r["score"] for r in res.scores.collect()}
    G = nx.Graph()
    G.add_edges_from(zip(map(int, src), map(int, dst)))
    want = nx.eigenvector_centrality_numpy(G)
    scale = got[0] / want[0]
    for v in range(n):
        assert got[v] == pytest.approx(want[v] * scale, rel=1e-5)


def test_eigen_cycle_uniform(spark):
    src, dst, n = toy_cycle()
    res = eigenvector_centrality(
        edges_df(spark, src, dst), max_iter=7, check_convergence=False
    )
    got = [r["score"] for r in res.scores.collect()]
    # a directed cycle permutes the uniform vector onto itself
    assert all(v == pytest.approx(1.0 / np.sqrt(n)) for v in got)


def test_eigen_zero_iterate_raises(spark):
    # 0 -> 1 -> 2 DAG: A^T applied twice annihilates everything upstream;
    # the third iterate is the zero vector
    e = edges_df(spark, np.array([0, 1]), np.array([1, 2]))
    with pytest.raises(ValueError, match="collapsed to 0"):
        eigenvector_centrality(e, max_iter=5, check_convergence=False)
