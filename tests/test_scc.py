"""Strongly connected components (Trim+Coloring) vs a pure-Python Tarjan
oracle — exact label equality (component = min member id) on hand-built
graphs, random digraphs, and the contract-shape per-user transition graph.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from linkgraph.operators.scc import strongly_connected_components
from tests import conftest as fx


def tarjan_scc(n_nodes, edges):
    """Iterative Tarjan; returns {node: min member id of its SCC}."""
    adj = {}
    nodes = set()
    for s, d in edges:
        nodes.add(s)
        nodes.add(d)
        if s != d:
            adj.setdefault(s, []).append(d)
    index = {}
    low = {}
    on_stack = set()
    stack = []
    out = {}
    counter = [0]

    def strongconnect(v0):
        work = [(v0, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            succs = adj.get(v, [])
            for i in range(pi, len(succs)):
                w = succs[i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                elif w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if pi < len(succs):
                # resume bookkeeping happened above; fall through when done
                pass
            work.pop()
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                rep = min(comp)
                for w in comp:
                    out[w] = rep

    for v in sorted(nodes):
        if v not in index:
            strongconnect(v)
    return out


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    res = strongly_connected_components(df)
    return {r["node"]: r["component"] for r in res.components.collect()}, res


def test_hand_built(spark):
    # two 3-cycles bridged by a DAG edge + a tail + a self-loop singleton
    edges = [
        (1, 2), (2, 3), (3, 1),          # SCC {1,2,3}
        (3, 10), (10, 11), (11, 12), (12, 10),  # SCC {10,11,12}
        (12, 99),                         # tail singleton 99
        (50, 50),                         # self-loop singleton
    ]
    got, res = _run(spark, edges)
    want = tarjan_scc(0, edges)
    assert got == want
    assert got[1] == got[2] == got[3] == 1
    assert got[10] == got[11] == got[12] == 10
    assert got[99] == 99 and got[50] == 50


def test_nested_and_chained_sccs(spark):
    # condensation is a chain of three SCCs — exercises multi-round peel
    edges = [
        (5, 6), (6, 5),
        (6, 3), (3, 4), (4, 3),
        (4, 1), (1, 2), (2, 1),
    ]
    got, res = _run(spark, edges)
    assert got == tarjan_scc(0, edges)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_digraph_matches_tarjan(spark, seed):
    rng = np.random.default_rng(seed)
    n, m = 60, 150
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    edges = [(int(s), int(d)) for s, d in zip(src, dst)]
    got, res = _run(spark, edges)
    assert got == tarjan_scc(n, edges)


def test_karate_directed(spark):
    src, dst, n = fx.karate_club()
    edges = [(int(s), int(d)) for s, d in zip(src, dst)]
    got, _ = _run(spark, edges)
    assert got == tarjan_scc(n, edges)


def test_string_nodes(spark):
    edges = [("u1:a", "u1:b"), ("u1:b", "u1:a"), ("u1:b", "u1:c")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r["node"]: r["component"]
        for r in strongly_connected_components(df).components.collect()
    }
    assert got == {"u1:a": "u1:a", "u1:b": "u1:a", "u1:c": "u1:c"}
