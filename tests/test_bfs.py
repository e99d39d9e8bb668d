"""BFS hop distances vs a pure-Python BFS oracle — exact, directed and
undirected, including unreachable (NULL-distance) vertices."""

from collections import deque

import numpy as np
import pytest

from linkgraph.operators.bfs import hop_distances
from tests import conftest as fx


def bfs_oracle(edges, source, directed=True):
    adj = {}
    nodes = set()
    for s, d in edges:
        nodes.update((s, d))
        adj.setdefault(s, []).append(d)
        if not directed and s != d:
            adj.setdefault(d, []).append(s)
    dist = {v: None for v in nodes}
    if source in dist:
        dist[source] = 0
        q = deque([source])
        while q:
            u = q.popleft()
            for w in adj.get(u, []):
                if dist[w] is None:
                    dist[w] = dist[u] + 1
                    q.append(w)
    return dist


@pytest.mark.parametrize("directed", [True, False])
def test_matches_bfs_oracle(spark, directed):
    edges = [
        (0, 1), (1, 2), (2, 0),   # cycle
        (2, 3), (3, 4),           # tail
        (7, 8),                   # separate component (unreachable from 0)
        (5, 0),                   # reaches 0 only against edge direction
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    res = hop_distances(df, 0, directed=directed)
    got = {r["node"]: r["dist"] for r in res.distances.collect()}
    assert got == bfs_oracle(edges, 0, directed=directed)
    if directed:
        assert got[5] is None and got[7] is None
    else:
        assert got[5] == 1


def test_karate_eccentricity(spark):
    src, dst, n = fx.karate_club()
    edges = [(int(s), int(d)) for s, d in zip(src, dst)]
    df = fx.edges_df(spark, src, dst)
    res = hop_distances(df, 0, directed=False)
    got = {r["node"]: r["dist"] for r in res.distances.collect()}
    want = bfs_oracle(edges, 0, directed=False)
    assert got == want
    # rounds = source eccentricity + 1 (the final no-change round)
    ecc = max(v for v in want.values() if v is not None)
    assert res.iterations == ecc + 1


# ---------------- multi-source hops / harmonic centrality ----------------


def test_multi_source_matches_per_source_bfs(spark):
    from linkgraph.operators.bfs import multi_source_hops

    src, dst, n = fx.karate_club()
    df = fx.edges_df(spark, src, dst)
    sources = [0, 5, 33]
    sdf = spark.createDataFrame([(s,) for s in sources], "node long")
    got = {
        (r["source"], r["node"]): r["dist"]
        for r in multi_source_hops(df, sdf, directed=False).distances.collect()
    }
    for s in sources:
        exp = bfs_oracle(list(zip(src, dst)), s, directed=False)
        for v, d in exp.items():
            if d is None:
                assert (s, v) not in got
            else:
                assert got[(s, v)] == d


def test_multi_source_unreached_pairs_absent(spark):
    from linkgraph.operators.bfs import multi_source_hops

    # two disjoint directed paths: 0->1 and 10->11; sources 0 and 10
    df = fx.edges_df(spark, [0, 10], [1, 11])
    sdf = spark.createDataFrame([(0,), (10,)], "node long")
    got = {
        (r["source"], r["node"]): r["dist"]
        for r in multi_source_hops(df, sdf, directed=True).distances.collect()
    }
    assert got == {(0, 0): 0, (0, 1): 1, (10, 10): 0, (10, 11): 1}


def test_harmonic_centrality_karate_vs_python(spark):
    from linkgraph.operators.bfs import harmonic_centrality

    src, dst, n = fx.karate_club()
    df = fx.edges_df(spark, src, dst)
    sources = [0, 1, 2, 3]
    sdf = spark.createDataFrame([(s,) for s in sources], "node long")
    expected = {}
    for s in sources:
        for v, d in bfs_oracle(list(zip(src, dst)), s, directed=False).items():
            if d:
                ns, h = expected.get(v, (0, 0.0))
                expected[v] = (ns + 1, h + 1.0 / d)
    got = {
        r["node"]: (r["n_sources"], r["harmonic"])
        for r in harmonic_centrality(df, sdf, directed=False).collect()
    }
    assert set(got) == set(expected)
    for v, (ns, h) in expected.items():
        assert got[v][0] == ns
        assert abs(got[v][1] - h) < 1e-12


def test_effective_diameter_path_hand_computed(spark):
    from linkgraph.operators.bfs import effective_diameter

    # path 0-1-2-3-4 (undirected), sources {0}: dists 1,2,3,4 ->
    # q=0.9 needs cum >= 3.6 -> d=4; q=0.5 -> cum >= 2 -> d=2
    df = fx.edges_df(spark, [0, 1, 2, 3], [1, 2, 3, 4])
    sdf = spark.createDataFrame([(0,)], "node long")
    r = effective_diameter(df, sdf, q=0.9, directed=False).first()
    assert (r["n_pairs"], r["max_dist"], r["eff_diameter"]) == (4, 4, 4)
    r2 = effective_diameter(df, sdf, q=0.5, directed=False).first()
    assert r2["eff_diameter"] == 2


def test_effective_diameter_karate_vs_python(spark):
    from linkgraph.operators.bfs import effective_diameter

    src, dst, n = fx.karate_club()
    sources = [0, 16, 33]
    dists = []
    for s in sources:
        dists += [
            d
            for d in bfs_oracle(list(zip(src, dst)), s, directed=False).values()
            if d
        ]
    dists.sort()
    import math
    exp_eff = dists[math.ceil(0.9 * len(dists)) - 1]
    df = fx.edges_df(spark, src, dst)
    sdf = spark.createDataFrame([(s,) for s in sources], "node long")
    r = effective_diameter(df, sdf, q=0.9, directed=False).first()
    assert r["n_pairs"] == len(dists)
    assert r["max_dist"] == max(dists)
    assert r["eff_diameter"] == exp_eff


def test_closeness_matches_networkx(spark):
    from linkgraph.operators.bfs import closeness_centrality

    src, dst, n = fx.karate_club()
    e = fx.edges_df(spark, src, dst)
    srcs = spark.createDataFrame([(v,) for v in range(n)], "node long")
    got = {
        r["source"]: (r["closeness"], r["closeness_wf"])
        for r in closeness_centrality(e, srcs).collect()
    }
    nx = pytest.importorskip("networkx")
    G = nx.Graph()
    G.add_edges_from(zip(map(int, src), map(int, dst)))
    want = nx.closeness_centrality(G)  # wf_improved=True default
    for v in range(n):
        assert got[v][1] == pytest.approx(want[v], abs=1e-12)
        # connected graph: wf == raw
        assert got[v][0] == pytest.approx(want[v], abs=1e-12)


def test_closeness_disconnected_and_isolated(spark):
    from linkgraph.operators.bfs import closeness_centrality

    # component {0,1,2} path + component {10,11}; n = 5
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "src long, dst long"
    )
    srcs = spark.createDataFrame([(0,), (1,), (10,)], "node long")
    got = {
        r["source"]: r for r in closeness_centrality(e, srcs).collect()
    }
    assert got[1]["n_reached"] == 3
    assert got[1]["closeness"] == pytest.approx(2 / 2)  # dists 1+1
    assert got[1]["closeness_wf"] == pytest.approx((2 / 4) * (2 / 2))
    assert got[10]["closeness"] == pytest.approx(1.0)
    assert got[10]["closeness_wf"] == pytest.approx((1 / 4) * 1.0)
    assert got[0]["closeness"] == pytest.approx(2 / 3)  # dists 1+2
