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
