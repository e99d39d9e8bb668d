"""Exactness pins for operators/sssp.py: python Dijkstra parity on karate
with deterministic weights, hand-computed toys, unreachable NULLs, and the
fixed-round contract shape."""

import heapq

from linkgraph.operators.sssp import shortest_paths, symmetrized_cost_edges
from tests import conftest as fx


def dijkstra(edge_list, source, directed=True):
    adj = {}
    nodes = set()
    for u, v, w in edge_list:
        nodes.update((u, v))
        adj.setdefault(u, []).append((v, w))
        if not directed:
            adj.setdefault(v, []).append((u, w))
    dist = {v: None for v in nodes}
    if source not in nodes:
        return dist
    dist[source] = 0.0
    pq = [(0.0, source)]
    while pq:
        d, u = heapq.heappop(pq)
        if dist[u] is not None and d > dist[u]:
            continue
        for v, w in adj.get(u, ()):
            nd = d + w
            if dist[v] is None or nd < dist[v]:
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def _weighted_karate():
    src, dst, n = fx.karate_club()
    # deterministic positive weights, asymmetric across edges (int() strips
    # the fixture's numpy scalar types, which createDataFrame rejects)
    return [
        (int(u), int(v), 1.0 + ((int(u) * 7 + int(v) * 13) % 5))
        for u, v in zip(src, dst)
    ], n


def test_sssp_karate_matches_dijkstra(spark):
    edges, n = _weighted_karate()
    df = spark.createDataFrame(edges, "src long, dst long, cost double")
    res = shortest_paths(df, 0, weight_col="cost", directed=True)
    got = {r["node"]: r["cost"] for r in res.distances.collect()}
    exp = dijkstra(edges, 0, directed=True)
    assert set(got) == set(exp)
    for v, d in exp.items():
        if d is None:
            assert got[v] is None
        else:
            assert abs(got[v] - d) < 1e-9


def test_sssp_weighted_beats_hop_count(spark):
    # 0->1->2 costs 1+1=2 vs direct 0->2 cost 5: weighted picks the 2-hop
    df = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 5.0)], "src long, dst long, cost double"
    )
    res = shortest_paths(df, 0, weight_col="cost")
    got = {r["node"]: r["cost"] for r in res.distances.collect()}
    assert got == {0: 0.0, 1: 1.0, 2: 2.0}


def test_sssp_unreachable_is_null_and_converges(spark):
    df = spark.createDataFrame(
        [(0, 1, 1.0), (5, 6, 1.0)], "src long, dst long, cost double"
    )
    res = shortest_paths(df, 0, weight_col="cost")
    got = {r["node"]: r["cost"] for r in res.distances.collect()}
    assert got[5] is None and got[6] is None and got[1] == 1.0
    assert res.iter_metrics[-1]["relaxed"] == 0


def test_fixed_rounds_prefix_of_fixpoint(spark):
    # after k rounds every node within k relaxation steps carries its
    # final cost; here the graph is a path so round i settles node i
    df = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(6)], "src long, dst long, cost double"
    )
    r2 = shortest_paths(df, 0, weight_col="cost", max_iter=2, check_convergence=False)
    got = {r["node"]: r["cost"] for r in r2.distances.collect()}
    assert got[1] == 1.0 and got[2] == 2.0
    assert got[3] is None  # not yet reached after 2 rounds


def test_symmetrized_cost_edges_hand_computed(spark):
    # 0->1 x3, 1->0 x1 -> cnt 4 -> cost .25; self-loop dropped
    df = fx.edges_df(spark, [0, 0, 0, 1, 2], [1, 1, 1, 0, 2])
    rows = {(r["src"], r["dst"]): r["cost"] for r in symmetrized_cost_edges(df).collect()}
    assert rows == {(0, 1): 0.25}
