"""Sanity-check the numpy oracles themselves against analytic truths and an
ALWAYS-ON vendored dense-matrix golden (mirrors the reference's
compare_pagerank.py golden test, /root/reference/py_src/compare_pagerank.py:
20-40, tightened to 1e-6). Nothing in this module skips: the independent
golden is the 20-line dense Google-matrix power iteration below, not an
optional library. A networkx cross-check runs additionally when
networkx+scipy happen to be installed."""

import numpy as np
import pytest

from linkgraph.oracle import connected_components, pagerank_family_a, triangle_count
from tests import conftest as fx


def test_cycle_uniform():
    src, dst, n = fx.toy_cycle()
    r, _ = pagerank_family_a(src, dst, n, eps=1e-12, max_iter=500)
    assert np.allclose(r, 1.0 / 3, atol=1e-9)
    assert abs(r.sum() - 1.0) < 1e-12


def test_mass_conserved_with_dangling():
    src, dst, n = fx.toy_chain_dangling()
    r, _ = pagerank_family_a(src, dst, n, eps=1e-12, max_iter=1000)
    assert abs(r.sum() - 1.0) < 1e-9  # Family-A conserves mass every iteration
    assert r[3] > r[0]  # chain accumulates toward the dangling end


def dense_google_matrix_pagerank(src, dst, n, d=0.85, iters=2000):
    """Independent formulation: explicit dense Google matrix G with dangling
    rows replaced by uniform, power-iterate x <- G^T x. Standard textbook
    PageRank (Page et al. 1999) — a second, structurally different oracle.
    (networkx's pagerank needs scipy, absent in this sandbox.)"""
    M = np.zeros((n, n))
    for u, v in zip(src, dst):
        M[u, v] += 1.0
    rowsum = M.sum(axis=1)
    dangling_rows = rowsum == 0
    M[~dangling_rows] /= rowsum[~dangling_rows, None]
    M[dangling_rows] = 1.0 / n
    G = d * M + (1 - d) / n
    x = np.full(n, 1.0 / n)
    for _ in range(iters):
        x = G.T @ x
    return x


def test_karate_vs_independent_dense_oracle():
    src, dst, n = fx.karate_club()
    r, _ = pagerank_family_a(src, dst, n, eps=1e-12, max_iter=2000)
    truth = dense_google_matrix_pagerank(src, dst, n)
    assert np.allclose(r, truth, atol=1e-9, rtol=0)


def test_chain_dangling_vs_independent_dense_oracle():
    src, dst, n = fx.toy_chain_dangling()
    r, _ = pagerank_family_a(src, dst, n, eps=1e-13, max_iter=5000)
    truth = dense_google_matrix_pagerank(src, dst, n, iters=5000)
    assert np.allclose(r, truth, atol=1e-10, rtol=0)


def test_karate_vs_networkx_golden():
    """Optional extra golden (the reference's compare_pagerank.py test):
    runs only where networkx+scipy exist; the dense-matrix golden above is
    the always-on independent oracle."""
    nx = pytest.importorskip("networkx")
    pytest.importorskip("scipy")
    src, dst, n = fx.karate_club()  # multi-edge-free: nx.DiGraph dedupes
    g = nx.DiGraph()
    g.add_nodes_from(range(n))
    g.add_edges_from(zip(src.tolist(), dst.tolist()))
    truth = nx.pagerank(g, alpha=0.85, tol=1e-12, max_iter=500)
    r, _ = pagerank_family_a(src, dst, n, eps=1e-12, max_iter=2000)
    assert np.allclose(r, np.array([truth[i] for i in range(n)]), atol=1e-6, rtol=0)


def test_components_oracle():
    src, dst, n = fx.two_components()
    labels = connected_components(src, dst, n)
    assert set(labels[:5]) == {0} and set(labels[5:]) == {5}


def test_triangles_karate():
    src, dst, n = fx.karate_club()
    # networkx ground truth: karate club has 45 triangles
    assert triangle_count(src, dst, n) == 45
