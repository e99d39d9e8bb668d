"""Coreness (h-index fixpoint, operators/coreness.py) — exactness pins.

The decisive check: the fixpoint must agree with the independent k_core
peel operator for every k ({v : core(v) >= k} == k_core(k)), on graphs
with nontrivial core structure (karate: max core 4). Plus the Lu et al.
invariants: monotone non-increasing rounds, degree at round 0, and a
hand-computed golden on a small mixed graph.
"""

from __future__ import annotations

import numpy as np
import pytest

from linkgraph.operators.coreness import coreness
from linkgraph.operators.kcore import k_core

from .conftest import edges_df, karate_club, toy_chain_dangling


def _core_map(df):
    return {r["node"]: r["h"] for r in df.collect()}


def _numpy_coreness(src, dst):
    """Sequential peel oracle (independent of the Spark h-index path)."""
    pairs = {(int(a), int(b)) for a, b in zip(src, dst) if a != b}
    und = pairs | {(b, a) for a, b in pairs}
    nodes = {a for a, _ in und} | set(map(int, src)) | set(map(int, dst))
    adj = {v: set() for v in nodes}
    for a, b in und:
        adj[a].add(b)
    core = {v: len(adj[v]) for v in nodes}
    # classic Batagelj-Zaversnik peel
    order = sorted(nodes, key=lambda v: core[v])
    deg = {v: len(adj[v]) for v in nodes}
    seen = set()
    import heapq

    heap = [(deg[v], v) for v in nodes]
    heapq.heapify(heap)
    k = 0
    out = {}
    while heap:
        d, v = heapq.heappop(heap)
        if v in seen or d != deg[v]:
            continue
        seen.add(v)
        k = max(k, d)
        out[v] = k
        for u in adj[v]:
            if u not in seen:
                deg[u] -= 1
                heapq.heappush(heap, (deg[u], u))
    return out


def test_coreness_matches_sequential_peel_karate(spark):
    src, dst, _ = karate_club()
    got = _core_map(coreness(edges_df(spark, src, dst)))
    want = _numpy_coreness(src, dst)
    assert got == want
    assert max(got.values()) == 4  # karate's known degeneracy


def test_coreness_agrees_with_kcore_operator(spark):
    src, dst, _ = karate_club()
    e = edges_df(spark, src, dst)
    core = _core_map(coreness(e))
    for k in (1, 2, 3, 4, 5):
        members = {r["node"] for r in k_core(e, k).collect()}
        assert {v for v, c in core.items() if c >= k} == members, k


def test_coreness_round0_is_degree_and_monotone(spark):
    src, dst, _ = karate_club()
    e = edges_df(spark, src, dst)
    prev = None
    for r in range(4):
        h = _core_map(coreness(e, fixed_rounds=r))
        if prev is not None:
            assert all(h[v] <= prev[v] for v in h)  # monotone non-increasing
        prev = h
    deg = _core_map(coreness(e, fixed_rounds=0))
    und = {(a, b) for a, b in zip(src, dst) if a != b}
    und |= {(b, a) for a, b in und}
    from collections import Counter

    cnt = Counter(a for a, _ in und)
    assert deg == dict(cnt)


def test_coreness_isolated_and_dangling(spark):
    src, dst, _ = toy_chain_dangling()
    # add a self-loop-only vertex 9: simple-graph semantics -> coreness 0
    e = edges_df(spark, np.append(src, 9), np.append(dst, 9))
    got = _core_map(coreness(e))
    assert got == {0: 1, 1: 1, 2: 1, 3: 1, 9: 0}
