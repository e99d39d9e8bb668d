"""greedy_coloring (operators/coloring.py) — properness + totality pins."""

from __future__ import annotations

import numpy as np

from linkgraph.operators.coloring import greedy_coloring

from .conftest import edges_df, karate_club, toy_chain_dangling


def test_coloring_proper_and_total_karate(spark):
    src, dst, _ = karate_club()
    e = edges_df(spark, src, dst)
    col = {r["node"]: r["color"] for r in greedy_coloring(e).collect()}
    nodes = set(map(int, src)) | set(map(int, dst))
    assert set(col) == nodes  # total: every vertex colored exactly once
    for a, b in zip(src, dst):
        if a != b:
            assert col[int(a)] != col[int(b)]  # proper
    # sanity: uses a bounded palette (karate Delta=17; greedy <= Delta+1
    # colors can't be guaranteed round-indexed, but the round count must
    # stay modest)
    assert max(col.values()) < 40


def test_coloring_deterministic_and_prefix_stable(spark):
    src, dst, _ = karate_club()
    e = edges_df(spark, src, dst)
    full = {r["node"]: r["color"] for r in greedy_coloring(e).collect()}
    two = {r["node"]: r["color"] for r in greedy_coloring(e, fixed_rounds=2).collect()}
    again = {r["node"]: r["color"] for r in greedy_coloring(e, fixed_rounds=2).collect()}
    assert two == again  # hash-derandomized: bit-identical re-runs
    # fixed_rounds is a prefix of the fixpoint run
    assert all(full[v] == c for v, c in two.items())
    assert all(c <= 1 for c in two.values())


def test_coloring_isolated_wins_round0(spark):
    src, dst, _ = toy_chain_dangling()
    e = edges_df(spark, np.append(src, 9), np.append(dst, 9))  # 9: self-loop only
    col = {r["node"]: r["color"] for r in greedy_coloring(e).collect()}
    assert col[9] == 0
    assert set(col) == {0, 1, 2, 3, 9}
