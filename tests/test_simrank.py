"""Truncated SimRank vs a dense numpy oracle (FIXTURES-style graphs)."""

from __future__ import annotations

import numpy as np
import pytest

from linkgraph.operators.simrank import simrank
from tests.conftest import edges_df


def numpy_simrank(src, dst, n, c=0.8, rounds=2):
    """Dense truncated SimRank: S_0 = I; off-diagonal update
    S_{t+1}[a,b] = c/(|I(a)||I(b)|) * sum_{i in I(a), j in I(b)} S_t[i,j];
    diagonal pinned at 1. Simple graph (dedup, no self-loops)."""
    A = np.zeros((n, n), dtype=bool)  # A[i, a] = edge i -> a
    for s, t in zip(src, dst):
        if s != t:
            A[s, t] = True
    ind = A.sum(axis=0)
    S = np.eye(n)
    for _ in range(rounds):
        raw = A.T.astype(float) @ S @ A.astype(float)  # sum over in-neighbors
        denom = np.outer(ind, ind).astype(float)
        new = np.zeros_like(S)
        nz = denom > 0
        new[nz] = c * raw[nz] / denom[nz]
        np.fill_diagonal(new, 1.0)
        S = new
    np.fill_diagonal(S, 0.0)  # operator reports off-diagonal pairs only
    return S


def _collect(df):
    return {(r["a"], r["b"]): r["sim"] for r in df.collect()}


@pytest.mark.parametrize("rounds", [1, 2, 3])
def test_simrank_matches_dense_oracle(spark, rounds):
    # co-citation diamond + chain + a multi-edge and a self-loop to exercise
    # the simple-graph dedup: 0->2, 1->2, 0->3, 1->3, 3->4, dup(0->2), 4->4
    src = [0, 1, 0, 1, 3, 0, 4]
    dst = [2, 2, 3, 3, 4, 2, 4]
    n = 5
    got = _collect(simrank(edges_df(spark, src, dst), c=0.8, rounds=rounds))
    want = numpy_simrank(src, dst, n, c=0.8, rounds=rounds)
    for a in range(n):
        for b in range(a + 1, n):
            assert got.get((a, b), 0.0) == pytest.approx(want[a, b], abs=1e-12)
    assert all(v > 0 for v in got.values())


def test_simrank_random_digraph_matches_oracle(spark):
    rng = np.random.default_rng(7)
    n, m = 12, 40
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    got = _collect(simrank(edges_df(spark, src, dst), c=0.6, rounds=2))
    want = numpy_simrank(src, dst, n, c=0.6, rounds=2)
    for a in range(n):
        for b in range(a + 1, n):
            assert got.get((a, b), 0.0) == pytest.approx(want[a, b], abs=1e-12)


def test_simrank_capped_equals_exact_when_degrees_bounded(spark):
    src = [0, 1, 0, 1, 3]
    dst = [2, 2, 3, 3, 4]
    e = edges_df(spark, src, dst)
    exact = _collect(simrank(e, rounds=2))
    capped = _collect(simrank(e, rounds=2, max_degree=2))  # max out-deg is 2
    assert capped == exact


def test_simrank_cap_is_simrank_on_capped_subgraph(spark):
    # hub 0 points at 1..4 (out-deg 4); cap 3 deletes ALL of 0's out-edges
    src = [0, 0, 0, 0, 5, 6]
    dst = [1, 2, 3, 4, 1, 2]
    e = edges_df(spark, src, dst)
    capped = _collect(simrank(e, rounds=2, max_degree=3))
    sub = [(s, d) for s, d in zip(src, dst) if s != 0]
    want = numpy_simrank([s for s, _ in sub], [d for _, d in sub], 7, rounds=2)
    for a in range(7):
        for b in range(a + 1, 7):
            assert capped.get((a, b), 0.0) == pytest.approx(want[a, b], abs=1e-12)


def test_simrank_validation(spark):
    e = edges_df(spark, [0], [1])
    with pytest.raises(ValueError):
        simrank(e, c=1.0)
    with pytest.raises(ValueError):
        simrank(e, rounds=0)
    with pytest.raises(ValueError):
        simrank(e, max_degree=0)
