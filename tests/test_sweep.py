"""PPR sweep-cut curve vs a brute-force python sweep (and numpy PPR)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from linkgraph.operators.sweep import ppr_sweep
from linkgraph.oracle import pagerank_personalized
from tests.conftest import edges_df


def brute_sweep(edge_list, ranks, top=None):
    """Exact per-prefix cut/vol/phi over the simple undirected view given
    per-vertex PPR scores (dict)."""
    und = set()
    for s, t in edge_list:
        if s != t:
            und.add((min(s, t), max(s, t)))
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    vol_all = sum(deg.values())
    ranked = sorted(
        [v for v, p in ranks.items() if p > 0 and v in deg],
        key=lambda v: (-ranks[v] / deg[v], v),
    )
    rows = []
    prefix = set()
    vol = 0
    for pos, v in enumerate(ranked, 1):
        prefix.add(v)
        vol += deg[v]
        cut = sum(1 for a, b in und if (a in prefix) != (b in prefix))
        denom = min(vol, vol_all - vol)
        if denom > 0 and (top is None or pos <= top):
            rows.append((pos, v, deg[v], vol, cut, cut / denom))
    return rows


def _curve(df):
    return [
        (r["pos"], r["node"], r["deg"], r["vol"], r["cut"], r["phi"])
        for r in df.orderBy("pos").collect()
    ]


def test_sweep_two_cliques_bridge(spark):
    # two 4-cliques joined by one bridge; seed inside clique A — the sweep
    # minimum must be the clique boundary (cut=1 at the 4-vertex prefix)
    cl_a = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    cl_b = [(a + 4, b + 4) for a in range(4) for b in range(a + 1, 4)]
    half = cl_a + cl_b + [(0, 4)]
    edge_list = half + [(b, a) for a, b in half]  # both directions: PPR
    # walks the undirected graph, so mass reaches the whole component
    src = [a for a, _ in edge_list]
    dst = [b for _, b in edge_list]
    e = edges_df(spark, src, dst)
    seeds = spark.createDataFrame([(1,)], "node long")
    got = _curve(ppr_sweep(e, seeds, k=6, top=None))

    ranks, _ = pagerank_personalized(
        np.array(src), np.array(dst), 8, np.array([1]), eps=0.0, max_iter=6
    )
    want = brute_sweep(edge_list, {v: ranks[v] for v in range(8)})
    assert [(p, n, dg, vol, cut) for p, n, dg, vol, cut, _ in want] == [
        (p, n, dg, vol, cut) for p, n, dg, vol, cut, _ in got
    ]
    for w, g in zip(want, got):
        assert g[5] == pytest.approx(w[5], abs=1e-12)
    # the conductance minimum sits at the clique-A prefix
    best = min(got, key=lambda r: (r[5], r[0]))
    assert best[0] == 4 and best[4] == 1


def test_sweep_random_graph_matches_brute(spark):
    rng = np.random.default_rng(11)
    n, m = 14, 45
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    edge_list = list(zip(src.tolist(), dst.tolist()))
    e = edges_df(spark, src, dst)
    seeds = spark.createDataFrame([(0,), (3,)], "node long")
    got = _curve(ppr_sweep(e, seeds, k=3, top=5))
    ranks, _ = pagerank_personalized(
        src, dst, n, np.array([0, 3]), eps=0.0, max_iter=3
    )
    want = brute_sweep(edge_list, {v: ranks[v] for v in range(n)}, top=5)
    assert [(p, n2, dg, vol, cut) for p, n2, dg, vol, cut, _ in want] == [
        (p, n2, dg, vol, cut) for p, n2, dg, vol, cut, _ in got
    ]
    for w, g in zip(want, got):
        assert g[5] == pytest.approx(w[5], abs=1e-12)


def test_sweep_top_truncates_but_keeps_global_cut(spark):
    # path 0-1-2-3-4: top=2 returns 2 rows whose cut counts edges to the
    # UNRANKED/UNPICKED remainder (global cut, not intra-prefix)
    src = [0, 1, 2, 3]
    dst = [1, 2, 3, 4]
    e = edges_df(spark, src, dst)
    seeds = spark.createDataFrame([(0,)], "node long")
    full = _curve(ppr_sweep(e, seeds, k=4, top=None))
    trunc = _curve(ppr_sweep(e, seeds, k=4, top=2))
    assert trunc == full[:2]
    assert len(trunc) == 2


def test_sweep_validation(spark):
    e = edges_df(spark, [0], [1])
    seeds = spark.createDataFrame([(0,)], "node long")
    with pytest.raises(ValueError):
        ppr_sweep(e, seeds, k=0)
    with pytest.raises(ValueError):
        ppr_sweep(e, seeds, k=2, top=8, cap=4)


def test_sweep_capped_equals_uncapped_prefix(spark):
    # the scale bound: truncating the support to the top-cap scores BEFORE
    # ranking must not change any returned prefix with top <= cap — an
    # edge whose far endpoint ranks beyond the cap contributes the same
    # never-uncut +1 delta as an unranked endpoint
    rng = np.random.default_rng(23)
    n, m = 30, 140
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    e = edges_df(spark, src, dst)
    seeds = spark.createDataFrame([(0,), (7,)], "node long")
    uncapped = _curve(ppr_sweep(e, seeds, k=3, top=6, cap=None))
    capped = _curve(ppr_sweep(e, seeds, k=3, top=6, cap=8))
    assert capped == uncapped
    assert len(capped) > 0


def test_nibble_matches_sweep_cut_on_push_scores(spark):
    # ppr_nibble == sweep_cut over ppr_push's estimates, and the curve
    # matches the brute-force sweep of those same scores
    from linkgraph.operators.push import ppr_push
    from linkgraph.operators.sweep import ppr_nibble, sweep_cut

    cl_a = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    cl_b = [(a + 4, b + 4) for a in range(4) for b in range(a + 1, 4)]
    half = cl_a + cl_b + [(0, 4)]
    edge_list = half + [(b, a) for a, b in half]
    src = [a for a, _ in edge_list]
    dst = [b for _, b in edge_list]
    e = edges_df(spark, src, dst)

    got = _curve(ppr_nibble(e, 1, alpha=0.15, eps=1e-4, fixed_rounds=5,
                            top=None))
    scores = ppr_push(e, 1, alpha=0.15, eps=1e-4, fixed_rounds=5).scores
    via_cut = _curve(
        sweep_cut(e, scores.select("node", "p"), top=None)
    )
    assert got == via_cut

    p = {r["node"]: r["p"] for r in scores.collect() if r["p"] > 0}
    want = brute_sweep(edge_list, p)
    assert [(pp, nn, dg, vol, cut) for pp, nn, dg, vol, cut, _ in want] == [
        (pp, nn, dg, vol, cut) for pp, nn, dg, vol, cut, _ in got
    ]
    # seed inside clique A: the minimum is still the clique boundary
    best = min(got, key=lambda r: (r[5], r[0]))
    assert best[4] == 1
