"""Synchronous PPR forward push vs a pure-python replica."""

from __future__ import annotations

import numpy as np
import pytest

from linkgraph.operators.push import ppr_push
from tests.conftest import edges_df


def py_push(src, dst, n, seed, alpha, eps, rounds):
    """Exact replica of the synchronous threshold push (multi-edges count,
    dangling residual parks in place)."""
    outdeg = np.bincount(np.asarray(src), minlength=n)
    p = np.zeros(n)
    r = np.zeros(n)
    r[seed] = 1.0
    done = 0
    for done in range(1, rounds + 1):
        act = (r > eps) & (outdeg > 0)
        inc = np.zeros(n)
        for s, t in zip(src, dst):
            if act[s]:
                inc[t] += (1.0 - alpha) * r[s] / outdeg[s]
        p = p + np.where(act, alpha * r, 0.0)
        r = np.where(act, 0.0, r) + inc
    return p, r


def _collect(res):
    return {row["node"]: (row["p"], row["r"]) for row in res.scores.collect()}


@pytest.mark.parametrize("rounds", [1, 3, 6])
def test_push_matches_python_replica(spark, rounds):
    rng = np.random.default_rng(5)
    n, m = 30, 120
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    res = ppr_push(
        edges_df(spark, src, dst), source=0, alpha=0.2, eps=1e-3,
        fixed_rounds=rounds,
    )
    got = _collect(res)
    p, r = py_push(src, dst, n, 0, 0.2, 1e-3, rounds)
    for v in range(n):
        gp, gr = got.get(v, (0.0, 0.0))
        assert gp == pytest.approx(p[v], abs=1e-12)
        assert gr == pytest.approx(r[v], abs=1e-12)


def test_push_drains_and_conserves_mass(spark):
    # undirected star: convergence is fast; alpha*Σp_pushed + residual = 1
    src = [0, 1, 0, 2, 0, 3, 1, 0, 2, 0, 3, 0]
    dst = [1, 0, 2, 0, 3, 0, 0, 1, 0, 2, 0, 3]
    res = ppr_push(edges_df(spark, src, dst), source=0, alpha=0.15, eps=1e-6)
    rows = res.scores.collect()
    total = sum(row["p"] for row in rows) + sum(row["r"] for row in rows)
    assert total == pytest.approx(1.0, abs=1e-9)
    assert all(row["r"] <= 1e-6 + 1e-12 for row in rows)  # frontier drained
    assert res.rounds >= 2


def test_push_dangling_residual_parks(spark):
    # 0 -> 1, 1 has no out-edges: its residual must stay put, not loop
    res = ppr_push(edges_df(spark, [0], [1]), source=0, alpha=0.5, eps=1e-8)
    got = _collect(res)
    assert got[0][0] == pytest.approx(0.5)       # p_0 = alpha * 1
    assert got[1][1] == pytest.approx(0.5)       # r_1 parks (dangling)
    assert res.rounds == 1  # one push empties the frontier (parked
    # dangling residual is not pushable), so the loop stops immediately


def test_push_validation(spark):
    e = edges_df(spark, [0], [1])
    with pytest.raises(ValueError):
        ppr_push(e, 0, alpha=1.0)
    with pytest.raises(ValueError):
        ppr_push(e, 0, eps=0.0)
