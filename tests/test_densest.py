"""densest_subgraph (Bahmani et al. parallel peel) — exactness pins.

The peel is deterministic, so the WHOLE trajectory (per-round n, m,
density), the best round, and the member set are pinned — against a
hand-computed fixture and against an independent numpy re-implementation
of the same threshold rule on the karate graph.
"""

from __future__ import annotations

import numpy as np
import pytest

from linkgraph.operators.densest import densest_round_stats, densest_subgraph
from tests import conftest as fx


def _numpy_peel(src, dst, eps):
    """Independent driver-side mirror of the threshold peel on the
    symmetric simple graph; returns (trajectory rows, best_round,
    best member set)."""
    pairs = {
        (min(a, b), max(a, b)) for a, b in zip(src.tolist(), dst.tolist()) if a != b
    }
    nodes = sorted({x for p in pairs for x in p})
    traj, rounds_members = [], []
    rnd = 0
    while nodes:
        deg = {v: 0 for v in nodes}
        live = [p for p in pairs if p[0] in deg and p[1] in deg]
        for a, b in live:
            deg[a] += 1
            deg[b] += 1
        n_s, m_s = len(nodes), len(live)
        rho = m_s / n_s
        traj.append((rnd, n_s, m_s, rho))
        rounds_members.append(list(nodes))
        thresh = 2.0 * (1.0 + eps) * rho
        nodes = [v for v in nodes if deg[v] > thresh]
        rnd += 1
    best = max(range(len(traj)), key=lambda i: (traj[i][3], -i))
    return traj, best, set(rounds_members[best])


def test_clique_plus_path_hand_computed(spark):
    # K5 on {0..4} + pendant path 4-5-6-7: round 0 peels the path
    # (thresh 3.575 vs clique degrees >= 4), round 1 is the clique at
    # density 2.0 — the densest intermediate.
    src = np.array([0, 0, 0, 0, 1, 1, 1, 2, 2, 3, 4, 5, 6])
    dst = np.array([1, 2, 3, 4, 2, 3, 4, 3, 4, 4, 5, 6, 7])
    res = densest_subgraph(fx.edges_df(spark, src, dst), eps=0.1)
    assert res.best_round == 1
    assert res.best_density == pytest.approx(2.0)
    assert {r["node"] for r in res.members.collect()} == {0, 1, 2, 3, 4}
    rows = sorted(
        (r["round"], r["n_nodes"], r["m_edges"], r["density"])
        for r in res.rounds.collect()
    )
    assert rows[0] == (0, 8, 13, pytest.approx(13 / 8))
    assert rows[1] == (1, 5, 10, pytest.approx(2.0))
    assert res.approx_factor == pytest.approx(2.2)


def test_direction_multiedge_selfloop_invariance(spark):
    # duplicated rows, reversed rows, and self-loops must not change the
    # simple-graph peel
    src = np.array([0, 0, 0, 0, 1, 1, 1, 2, 2, 3, 4, 5, 6])
    dst = np.array([1, 2, 3, 4, 2, 3, 4, 3, 4, 4, 5, 6, 7])
    noisy_src = np.concatenate([src, dst, src[:4], np.array([2, 7])])
    noisy_dst = np.concatenate([dst, src, dst[:4], np.array([2, 7])])
    res = densest_subgraph(fx.edges_df(spark, noisy_src, noisy_dst), eps=0.1)
    assert res.best_density == pytest.approx(2.0)
    assert {r["node"] for r in res.members.collect()} == {0, 1, 2, 3, 4}


def test_karate_matches_numpy_mirror_trajectory(spark):
    src, dst, _ = fx.karate_club()
    for eps in (0.05, 0.3):
        res = densest_subgraph(fx.edges_df(spark, src, dst), eps=eps)
        want_traj, want_best, want_members = _numpy_peel(src, dst, eps)
        got_traj = sorted(
            (r["round"], r["n_nodes"], r["m_edges"], r["density"])
            for r in res.rounds.collect()
        )
        assert len(got_traj) == len(want_traj)
        for g, w in zip(got_traj, want_traj):
            assert g[:3] == w[:3]
            assert g[3] == pytest.approx(w[3])
        assert res.best_round == want_best
        assert {r["node"] for r in res.members.collect()} == want_members


def test_karate_approximation_guarantee_vs_exhaustive_core(spark):
    # rho* >= best k-core density; the guarantee says best >= rho*/2.2 and
    # on karate the peel's best density must at least reach the max-core
    # density over 2.2 (a weaker but independent bound)
    src, dst, _ = fx.karate_club()
    res = densest_subgraph(fx.edges_df(spark, src, dst), eps=0.1)
    # karate's 4-core is the densest core: compute its density directly
    from linkgraph.operators.kcore import k_core

    core = k_core(fx.edges_df(spark, src, dst), 4)
    members = {r["node"] for r in core.collect()}
    pairs = {
        (min(a, b), max(a, b))
        for a, b in zip(src.tolist(), dst.tolist())
        if a != b and a in members and b in members
    }
    core_density = len(pairs) / len(members)
    assert res.best_density >= core_density / 2.2


def test_round_stats_matches_operator_trajectory(spark):
    src, dst, _ = fx.karate_club()
    df = fx.edges_df(spark, src, dst)
    res = densest_subgraph(df, eps=0.1)
    full = {
        r["round"]: (r["n_nodes"], r["m_edges"], r["density"])
        for r in res.rounds.collect()
    }
    lazy = {
        r["round"]: (r["n_nodes"], r["m_edges"], r["density"])
        for r in densest_round_stats(df, eps=0.1, n_rounds=2).collect()
    }
    assert set(lazy) == {0, 1}
    for k, v in lazy.items():
        assert full[k][:2] == v[:2]
        assert full[k][2] == pytest.approx(v[2])


def test_empty_graph_raises(spark):
    df = fx.edges_df(spark, np.array([7]), np.array([7]))  # self-loop only
    with pytest.raises(ValueError, match="no non-self-loop"):
        densest_subgraph(df)
