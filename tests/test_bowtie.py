"""bowtie (operators/bowtie.py) — Broder web-structure decomposition."""

from __future__ import annotations

import pytest

from linkgraph.operators.bowtie import bowtie_decomposition

from .conftest import edges_df


def _replica(src, dst):
    """Pure-python bow-tie: Tarjan-free mutual reachability via closures."""
    nodes = sorted(set(src) | set(dst))
    adj = {v: set() for v in nodes}
    radj = {v: set() for v in nodes}
    for a, b in zip(src, dst):
        if a != b:
            adj[a].add(b)
            radj[b].add(a)

    def closure(seeds, graph):
        seen = set(seeds)
        stack = list(seeds)
        while stack:
            v = stack.pop()
            for w in graph[v]:
                if w not in seen:
                    seen.add(w)
                    stack.append(w)
        return seen

    fwd_of = {v: closure([v], adj) for v in nodes}
    comp = {}
    for v in nodes:
        members = {w for w in fwd_of[v] if v in fwd_of[w]} | {v}
        comp[v] = min(members)
    sizes = {}
    for v, c in comp.items():
        sizes[c] = sizes.get(c, 0) + 1
    core_label = min(c for c in sizes if sizes[c] == max(sizes.values()))
    core = {v for v in nodes if comp[v] == core_label}
    fwd = closure(core, adj)
    bwd = closure(core, radj)
    both = {v: adj[v] | radj[v] for v in nodes}
    weak = closure(core, both)
    out = {}
    for v in nodes:
        if v in core:
            out[v] = "CORE"
        elif v in bwd:
            out[v] = "IN"
        elif v in fwd:
            out[v] = "OUT"
        elif v in weak:
            out[v] = "TENDRIL"
        else:
            out[v] = "DISCONNECTED"
    return out, core_label


# the canonical toy: core 3-cycle {1,2,3}; 0 -> core (IN); core -> 4 (OUT);
# 0 -> 5 dead end (IN-tendril); 6 -> 4 feeder (OUT-tendril); 0 -> 7 -> 4
# tube; 8 <-> 9 a separate SCC (DISCONNECTED)
BOWTIE_SRC = [1, 2, 3, 0, 3, 0, 6, 0, 7, 8, 9]
BOWTIE_DST = [2, 3, 1, 1, 4, 5, 4, 7, 4, 9, 8]


def test_bowtie_toy_classes(spark):
    res = bowtie_decomposition(edges_df(spark, BOWTIE_SRC, BOWTIE_DST))
    got = {r["node"]: r["bowtie"] for r in res.classes.collect()}
    assert got == {
        0: "IN",
        1: "CORE",
        2: "CORE",
        3: "CORE",
        4: "OUT",
        5: "TENDRIL",
        6: "TENDRIL",
        7: "TENDRIL",
        8: "DISCONNECTED",
        9: "DISCONNECTED",
    }
    assert res.core_component == 1
    want, core_label = _replica(BOWTIE_SRC, BOWTIE_DST)
    assert got == want and res.core_component == core_label


def test_bowtie_matches_networkx(spark):
    nx = pytest.importorskip("networkx")
    import random

    rng = random.Random(5)
    n = 60
    src = [rng.randrange(n) for _ in range(150)]
    dst = [rng.randrange(n) for _ in range(150)]
    res = bowtie_decomposition(edges_df(spark, src, dst))
    got = {r["node"]: r["bowtie"] for r in res.classes.collect()}

    G = nx.DiGraph((a, b) for a, b in zip(src, dst) if a != b)
    G.add_nodes_from(set(src) | set(dst))
    sccs = sorted(
        nx.strongly_connected_components(G), key=lambda s: (-len(s), min(s))
    )
    core = sccs[0]
    fwd = set().union(*(nx.descendants(G, v) for v in core)) | core
    bwd = set().union(*(nx.ancestors(G, v) for v in core)) | core
    U = G.to_undirected()
    weak = nx.node_connected_component(U, min(core))
    for v in G.nodes:
        want = (
            "CORE" if v in core
            else "IN" if v in bwd
            else "OUT" if v in fwd
            else "TENDRIL" if v in weak
            else "DISCONNECTED"
        )
        assert got[v] == want, (v, got[v], want)
    assert res.core_component == min(core)


def test_bowtie_replica_random_and_determinism(spark):
    import random

    rng = random.Random(17)
    n = 40
    src = [rng.randrange(n) for _ in range(90)]
    dst = [rng.randrange(n) for _ in range(90)]
    e = edges_df(spark, src, dst)
    got = {
        r["node"]: r["bowtie"]
        for r in bowtie_decomposition(e).classes.collect()
    }
    want, _ = _replica(src, dst)
    assert got == want
    again = {
        r["node"]: r["bowtie"]
        for r in bowtie_decomposition(e.repartition(7)).classes.collect()
    }
    assert again == got


def test_bowtie_raises_on_reachability_cap(spark):
    # a 6-chain into a 2-cycle core: closure needs >2 rounds
    src = [0, 1, 2, 3, 4, 5, 6]
    dst = [1, 2, 3, 4, 5, 6, 5]
    with pytest.raises(RuntimeError, match="max_iter"):
        bowtie_decomposition(edges_df(spark, src, dst), max_iter=2)
