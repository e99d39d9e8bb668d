"""Exactness pins for operators/betweenness.py: an independent pure-python
Brandes (BFS + dependency accumulation, straight from the 2001 paper)
restricted to the sampled sources, on karate + hand-computed toys."""

from collections import deque

import pytest

from linkgraph.operators.betweenness import betweenness_sample
from tests import conftest as fx


def brandes_python(edge_list, sources, directed=False):
    adj = {}
    nodes = set()
    for u, v in edge_list:
        if u == v:
            continue
        nodes.update((u, v))
        adj.setdefault(u, set()).add(v)
        if not directed:
            adj.setdefault(v, set()).add(u)
    bc = {}
    for s in sources:
        if s not in nodes:
            continue
        dist = {s: 0}
        sig = {s: 1.0}
        order = []
        q = deque([s])
        while q:
            u = q.popleft()
            order.append(u)
            for w in adj.get(u, ()):
                if w not in dist:
                    dist[w] = dist[u] + 1
                    sig[w] = 0.0
                    q.append(w)
                if dist[w] == dist[u] + 1:
                    sig[w] += sig[u]
        delta = {v: 0.0 for v in order}
        for w in reversed(order):
            for x in adj.get(w, ()):
                if dist.get(x) == dist[w] + 1:
                    delta[w] += sig[w] / sig[x] * (1.0 + delta[x])
            if w != s and delta[w] > 0:
                bc[w] = bc.get(w, 0.0) + delta[w]
    return bc


def _got(df):
    return {r["node"]: r["bc"] for r in df.collect()}


def test_betweenness_path_hand_computed(spark):
    # path 0-1-2-3, sources {0}: δ(2)=1 (covers 3), δ(1)=1+δ(2)=2
    df = fx.edges_df(spark, [0, 1, 2], [1, 2, 3])
    sdf = spark.createDataFrame([(0,)], "node long")
    got = _got(betweenness_sample(df, sdf, directed=False))
    assert got == {1: 2.0, 2: 1.0}


def test_betweenness_diamond_split_paths(spark):
    # 0-1-3, 0-2-3 (diamond): two shortest paths 0->3; δ(1)=δ(2)=0.5
    df = fx.edges_df(spark, [0, 0, 1, 2], [1, 2, 3, 3])
    sdf = spark.createDataFrame([(0,)], "node long")
    got = _got(betweenness_sample(df, sdf, directed=False))
    assert set(got) == {1, 2}
    assert abs(got[1] - 0.5) < 1e-12 and abs(got[2] - 0.5) < 1e-12


@pytest.mark.parametrize("sources", [[0], [0, 33], [0, 5, 16, 33]])
def test_betweenness_karate_vs_python_brandes(spark, sources):
    src, dst, n = fx.karate_club()
    df = fx.edges_df(spark, src, dst)
    sdf = spark.createDataFrame([(s,) for s in sources], "node long")
    got = _got(betweenness_sample(df, sdf, directed=False))
    exp = brandes_python(list(zip(src, dst)), sources, directed=False)
    assert set(got) == set(exp)
    for v, b in exp.items():
        assert abs(got[v] - b) < 1e-9


def test_betweenness_directed_differs_from_undirected(spark):
    # directed chain 0->1->2 from source 0: only 1 is intermediate
    df = fx.edges_df(spark, [0, 1], [1, 2])
    sdf = spark.createDataFrame([(0,)], "node long")
    got = _got(betweenness_sample(df, sdf, directed=True))
    assert got == {1: 1.0}
    exp = brandes_python([(0, 1), (1, 2)], [0], directed=True)
    assert exp == {1: 1.0}
