"""minimum spanning forest (operators/msf.py) — Borůvka vs Kruskal."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from linkgraph.operators.msf import min_spanning_forest

from .conftest import karate_club


def _wedges_df(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, w double")


def _kruskal(rows):
    """Forest under the same (w, a, b) total order; canonical a<b,
    parallel edges keep min w."""
    best = {}
    nodes = set()
    for s, d, w in rows:
        nodes.update((s, d))
        if s == d:
            continue
        a, b = min(s, d), max(s, d)
        best[(a, b)] = min(best.get((a, b), float("inf")), w)
    parent = {v: v for v in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    forest = set()
    for (a, b), w in sorted(best.items(), key=lambda kv: (kv[1], kv[0])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            forest.add((a, b, w))
    return forest, nodes


def _rand_graph(seed, n=40, m=120, tie_heavy=False):
    rng = random.Random(seed)
    rows = []
    for _ in range(m):
        s, d = rng.randrange(n), rng.randrange(n)
        w = float(rng.randrange(1, 6 if tie_heavy else 1000))
        rows.append((s, d, w))
    return rows


@pytest.mark.parametrize("seed,tie_heavy", [(1, False), (2, True)])
def test_msf_matches_kruskal(spark, seed, tie_heavy):
    rows = _rand_graph(seed, tie_heavy=tie_heavy)
    res = min_spanning_forest(_wedges_df(spark, rows))
    got = {(r["a"], r["b"], r["w"]) for r in res.forest.collect()}
    want, nodes = _kruskal(rows)
    assert got == want
    # forest invariant: |E| = n - #components
    n_comp = res.labels.select("component").distinct().count()
    assert len(got) == len(nodes) - n_comp
    # labels consistent: endpoints of every forest edge share a component
    lab = {r["node"]: r["component"] for r in res.labels.collect()}
    for a, b, _ in got:
        assert lab[a] == lab[b]


def test_msf_matches_networkx_weight(spark):
    nx = pytest.importorskip("networkx")
    rows = _rand_graph(7, n=30, m=90, tie_heavy=True)
    res = min_spanning_forest(_wedges_df(spark, rows))
    got_w = sum(r["w"] for r in res.forest.collect())
    G = nx.Graph()
    for s, d, w in rows:
        if s == d:
            continue
        a, b = min(s, d), max(s, d)
        if not G.has_edge(a, b) or G[a][b]["weight"] > w:
            G.add_edge(a, b, weight=w)
    want_w = sum(
        d["weight"] for _, _, d in nx.minimum_spanning_edges(G, data=True)
    )
    assert got_w == pytest.approx(want_w, abs=1e-9)


def test_msf_disconnected_and_determinism(spark):
    # two components + an isolated self-loop vertex
    rows = [(0, 1, 3.0), (1, 2, 1.0), (0, 2, 2.0), (5, 6, 1.0), (7, 7, 9.0)]
    e = _wedges_df(spark, rows)
    res = min_spanning_forest(e)
    got = {(r["a"], r["b"], r["w"]) for r in res.forest.collect()}
    assert got == {(1, 2, 1.0), (0, 2, 2.0), (5, 6, 1.0)}
    lab = {r["node"]: r["component"] for r in res.labels.collect()}
    assert lab[7] not in {lab[0], lab[5]}  # self-loop vertex stays alone
    again = {
        (r["a"], r["b"], r["w"])
        for r in min_spanning_forest(e.repartition(7)).forest.collect()
    }
    assert again == got


def test_msf_on_unweighted_karate(spark):
    # unit weights: the MSF is a spanning tree picked purely by the
    # (a, b) tie-break — n-1 edges, one component
    src, dst, n = karate_club()
    e = spark.createDataFrame(
        [(int(s), int(d), 1.0) for s, d in zip(src, dst)],
        "src long, dst long, w double",
    )
    res = min_spanning_forest(e)
    assert res.forest.count() == n - 1
    assert res.labels.select("component").distinct().count() == 1
    want, _ = _kruskal([(int(s), int(d), 1.0) for s, d in zip(src, dst)])
    got = {(r["a"], r["b"], r["w"]) for r in res.forest.collect()}
    assert got == want
