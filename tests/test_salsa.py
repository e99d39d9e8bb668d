"""salsa (operators/salsa.py) — numpy replica + the in-degree theorem."""

from __future__ import annotations

import numpy as np
import pytest

from linkgraph.operators.salsa import salsa

from .conftest import edges_df, karate_club


def _numpy_salsa(src, dst, n, iters):
    A = np.zeros((n, n))
    for a, b in zip(src, dst):
        A[int(a), int(b)] += 1.0
    od = A.sum(axis=1)
    idg = A.sum(axis=0)
    Wb = np.divide(A, od[:, None], out=np.zeros_like(A), where=od[:, None] > 0)
    Wf = np.divide(A, idg[None, :], out=np.zeros_like(A), where=idg[None, :] > 0)
    h = np.full(n, 1.0 / n)
    a = np.full(n, 1.0 / n)
    for _ in range(iters):
        a = Wb.T @ h
        h = Wf @ a
    return h, a


def test_salsa_matches_numpy_fixed_iters(spark):
    src, dst, n = karate_club()
    e = edges_df(spark, src, dst)
    res = salsa(e, max_iter=5, check_convergence=False)
    rows = {r["node"]: (r["hub"], r["authority"]) for r in res.scores.collect()}
    h, a = _numpy_salsa(src, dst, n, 5)
    for v in range(n):
        assert rows[v][0] == pytest.approx(h[v], rel=1e-12)
        assert rows[v][1] == pytest.approx(a[v], rel=1e-12)


def test_salsa_stationary_is_indegree_proportional(spark):
    """Lempel-Moran: on a connected support the stationary authority
    weight is proportional to in-degree (SALSA's whole point — no TKC
    drift). Karate with both directions is strongly connected."""
    src, dst, n = karate_club()
    res = salsa(edges_df(spark, src, dst), eps=1e-13, max_iter=500)
    assert res.converged
    got = {r["node"]: r["authority"] for r in res.scores.collect()}
    deg = {}
    for b in dst:
        deg[int(b)] = deg.get(int(b), 0) + 1
    m = sum(deg.values())
    for v in range(n):
        assert got[v] == pytest.approx(deg[v] / m, abs=1e-9)


def test_salsa_conserves_mass(spark):
    src, dst, _ = karate_club()
    res = salsa(edges_df(spark, src, dst), max_iter=3, check_convergence=False)
    agg = res.scores.agg({"hub": "sum", "authority": "sum"}).first()
    assert agg["sum(hub)"] == pytest.approx(1.0, abs=1e-12)
    assert agg["sum(authority)"] == pytest.approx(1.0, abs=1e-12)


def test_salsa_empty_raises(spark):
    with pytest.raises(ValueError):
        salsa(spark.createDataFrame([], "src long, dst long"))
