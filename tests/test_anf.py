"""HyperANF (operators/anf.py) — exact propagation pin + accuracy bound.

The propagation pin feeds a numpy twin the ENGINE'S OWN (bucket, rho)
observations and replays the max-merge rounds bit-exactly — so the Spark
round body (join + per-register max aggregate) is value-checked without
needing xxhash64 outside Spark. Accuracy is bounded against the exact
BFS-computed neighborhood function on karate.
"""

from __future__ import annotations

import numpy as np
import pytest

from linkgraph.operators.anf import (
    effective_diameter_from_curve,
    hll_init,
    neighborhood_function,
    _merge_round,
)

from .conftest import edges_df, karate_club, two_components


def _adj(src, dst):
    und = {(int(a), int(b)) for a, b in zip(src, dst) if a != b}
    und |= {(b, a) for a, b in und}
    nodes = set(map(int, src)) | set(map(int, dst))
    adj = {v: set() for v in nodes}
    for a, b in und:
        adj[a].add(b)
    return nodes, adj


def _exact_nf(nodes, adj, max_t):
    balls = {v: {v} for v in nodes}
    out = [sum(len(b) for b in balls.values())]
    for _ in range(max_t):
        balls = {
            v: balls[v] | set().union(*(balls[u] for u in adj[v]))
            if adj[v]
            else balls[v]
            for v in nodes
        }
        out.append(sum(len(b) for b in balls.values()))
    return out


def test_merge_round_matches_numpy_twin(spark):
    src, dst, _ = karate_club()
    e = edges_df(spark, src, dst)
    from linkgraph.operators.degrees import symmetrize, vertices

    b, m = 5, 32
    sk0 = hll_init(vertices(e), b=b)
    regs = {r["node"]: np.array(r["sk"]) for r in sk0.collect()}
    nodes, adj = _adj(src, dst)
    sym = symmetrize(e)
    cur_df, cur_np = sk0, regs
    for _ in range(3):
        cur_df = _merge_round(sym, cur_df, m)
        cur_np = {
            v: np.max(
                [cur_np[v]] + [cur_np[u] for u in adj[v]], axis=0
            )
            for v in nodes
        }
        got = {r["node"]: list(r["sk"]) for r in cur_df.collect()}
        assert got == {v: list(map(int, a)) for v, a in cur_np.items()}


def test_nf_curve_tracks_exact_within_hll_error(spark):
    src, dst, _ = karate_club()
    e = edges_df(spark, src, dst)
    curve = {
        r["t"]: r["nf_est"]
        for r in neighborhood_function(e, max_t=6, b=7).collect()
    }
    nodes, adj = _adj(src, dst)
    exact = _exact_nf(nodes, adj, max_t=6)
    for t, want in enumerate(exact):
        if t not in curve:  # growth-stall early exit past the diameter
            break
        assert abs(curve[t] / want - 1) < 0.2, (t, curve[t], want)
    # monotone non-decreasing (balls only grow; merge is a register max)
    ts = sorted(curve)
    assert all(curve[a] <= curve[b] * (1 + 1e-9) for a, b in zip(ts, ts[1:]))


def test_nf_deterministic_and_directed_smaller(spark):
    src, dst, _ = karate_club()
    e = edges_df(spark, src, dst)
    c1 = neighborhood_function(e, max_t=3, b=5).collect()
    c2 = neighborhood_function(e, max_t=3, b=5).collect()
    assert [(r["t"], r["nf_est"]) for r in c1] == [
        (r["t"], r["nf_est"]) for r in c2
    ]
    # directed balls follow out-edges only -> never larger than undirected
    cd = {
        r["t"]: r["nf_est"]
        for r in neighborhood_function(e, max_t=3, b=5, directed=True).collect()
    }
    cu = {r["t"]: r["nf_est"] for r in c1}
    for t in set(cd) & set(cu):
        assert cd[t] <= cu[t] * (1 + 1e-9)


def test_effective_diameter_two_cliques_bridge(spark):
    # path 0-1-2-3-4: exact eff-diam(0.9) interpolates between hop counts
    src = np.array([0, 1, 2, 3])
    dst = np.array([1, 2, 3, 4])
    e = edges_df(spark, src, dst)
    curve = [
        (r["t"], r["nf_est"])
        for r in neighborhood_function(e, max_t=8, b=7).collect()
    ]
    d = effective_diameter_from_curve(curve)
    nodes, adj = _adj(src, dst)
    exact = _exact_nf(nodes, adj, 8)
    # exact NF: 5,13,19,23,25 -> 0.9*25=22.5 lands between t=2 and t=3
    assert exact[:5] == [5, 13, 19, 23, 25]
    assert 1.5 < d < 4.5


def test_nf_disconnected_saturates_at_component_sizes(spark):
    src, dst, _ = two_components()
    e = edges_df(spark, src, dst)
    rows = neighborhood_function(e, max_t=10, b=7).collect()
    nodes, adj = _adj(src, dst)
    want = _exact_nf(nodes, adj, 10)[-1]  # sum over v of |component(v)|
    assert abs(rows[-1]["nf_est"] / want - 1) < 0.2


def test_register_rounds_match_bruteforce_ball(spark):
    """anf_register_rounds (md5 family) == per-vertex bucket-wise max over
    the exact t-hop OUT-ball, replayed in python from the engine's own
    t=0 observations — the same identity the anf_round DuckDB oracle uses."""
    from linkgraph.operators.anf import anf_register_rounds
    from linkgraph.operators.degrees import vertices

    src = np.array([0, 1, 2, 3, 0, 4])
    dst = np.array([1, 2, 3, 0, 2, 4])  # cycle + chord + self-loop
    e = edges_df(spark, src, dst)
    b, m, t = 4, 16, 2

    obs = {
        r["node"]: np.array(r["sk"])
        for r in hll_init(vertices(e), b=b, hash="md5").collect()
    }
    out = {v: set() for v in obs}
    for a, bb in zip(map(int, src), map(int, dst)):
        out[a].add(bb)
    balls = {v: {v} for v in obs}
    for _ in range(t):
        balls = {v: balls[v] | set().union(*(balls[u] for u in out[v]), set())
                 if out[v] else balls[v] for v in obs}
    want = {
        v: np.max(np.stack([obs[u] for u in ball]), axis=0)
        for v, ball in balls.items()
    }
    got = {
        r["node"]: (r["rho_sum"], r["zero_regs"])
        for r in anf_register_rounds(e, t=t, b=b, hash="md5").collect()
    }
    assert got == {
        v: (int(w.sum()), int((w == 0).sum())) for v, w in want.items()
    }


def test_hll_init_md5_and_xxhash_same_shape(spark):
    """Both hash families yield exactly one nonzero register per vertex
    with rho in [1, width-b+1]."""
    src, dst, _ = karate_club()
    e = edges_df(spark, src, dst)
    from linkgraph.operators.degrees import vertices

    for fam, width in (("xxhash64", 64), ("md5", 48)):
        for r in hll_init(vertices(e), b=4, hash=fam).collect():
            sk = np.array(r["sk"])
            assert (sk > 0).sum() == 1
            assert 1 <= sk.max() <= width - 4 + 1
