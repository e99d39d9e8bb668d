"""katz_centrality (operators/katz.py) — numpy replica + invariants."""

from __future__ import annotations

import numpy as np
import pytest

from linkgraph.operators.katz import katz_centrality

from .conftest import edges_df, karate_club, toy_chain_dangling


def _numpy_katz(src, dst, n, alpha, beta, iters):
    A = np.zeros((n, n))
    for a, b in zip(src, dst):
        A[int(a), int(b)] += 1.0
    x = np.full(n, beta)
    for _ in range(iters):
        x = beta + alpha * (A.T @ x)
    return x


def test_katz_matches_numpy_karate(spark):
    src, dst, n = karate_club()  # fixture already carries both directions
    e = edges_df(spark, src, dst)
    res = katz_centrality(e, alpha=0.05, max_iter=12, check_convergence=False)
    got = {r["node"]: r["katz"] for r in res.scores.collect()}
    want = _numpy_katz(src, dst, n, 0.05, 1.0, 12)
    assert res.iterations == 12
    for v in range(n):
        assert got[v] == pytest.approx(want[v], rel=1e-12)


def test_katz_converges_and_fixpoint(spark):
    src, dst, _ = karate_club()
    e = edges_df(spark, src, dst)
    # karate lambda_max ~ 6.73 -> alpha=0.1 converges
    res = katz_centrality(e, alpha=0.1, eps=1e-12)
    assert res.converged
    got = {r["node"]: r["katz"] for r in res.scores.collect()}
    # fixed point satisfies x = beta + alpha * A^T x
    incoming = {v: [] for v in got}
    for a, b in zip(src, dst):
        incoming[int(b)].append(int(a))
    for v, xs in incoming.items():
        assert got[v] == pytest.approx(1.0 + 0.1 * sum(got[u] for u in xs), abs=1e-6)


def test_katz_dangling_and_sources(spark):
    src, dst, _ = toy_chain_dangling()  # 0->1->2->3 directed
    res = katz_centrality(
        edges_df(spark, src, dst), alpha=0.5, max_iter=10, check_convergence=False
    )
    got = {r["node"]: r["katz"] for r in res.scores.collect()}
    # walk sums: x(0)=1 (no in-edges); x(1)=1+.5; x(2)=1+.5+.25; ...
    assert got[0] == pytest.approx(1.0)
    assert got[1] == pytest.approx(1.5)
    assert got[2] == pytest.approx(1.75)
    assert got[3] == pytest.approx(1.875)


def test_katz_weighted_and_normalize(spark):
    e = spark.createDataFrame(
        [(0, 1, 2.0), (0, 1, 1.0), (2, 1, 1.0)], "src long, dst long, wt double"
    )
    res = katz_centrality(
        e, alpha=0.25, weight_col="wt", max_iter=3, check_convergence=False
    )
    got = {r["node"]: r["katz"] for r in res.scores.collect()}
    # parallel edges summed: w(0->1)=3
    assert got[1] == pytest.approx(1.0 + 0.25 * (3.0 * 1.0 + 1.0))
    resn = katz_centrality(
        e, alpha=0.25, max_iter=3, check_convergence=False, normalize=True
    )
    vals = np.array([r["katz"] for r in resn.scores.collect()])
    assert np.linalg.norm(vals) == pytest.approx(1.0)


def test_katz_empty_raises(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    with pytest.raises(ValueError):
        katz_centrality(empty)
