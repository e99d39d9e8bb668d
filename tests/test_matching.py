"""maximal_matching (operators/matching.py) — validity + maximality."""

from __future__ import annotations

import numpy as np

from linkgraph.operators.matching import maximal_matching

from .conftest import edges_df, karate_club, toy_chain_dangling


def test_matching_valid_and_maximal_karate(spark):
    src, dst, _ = karate_club()
    e = edges_df(spark, src, dst)
    m = [(r["a"], r["b"]) for r in maximal_matching(e).collect()]
    used = [v for ab in m for v in ab]
    assert len(used) == len(set(used))  # valid: no vertex matched twice
    matched = set(used)
    und = {(min(a, b), max(a, b)) for a, b in zip(src, dst) if a != b}
    assert set(m) <= und
    # maximal: every edge has at least one matched endpoint
    for a, b in und:
        assert a in matched or b in matched, (a, b)


def test_matching_deterministic_prefix(spark):
    src, dst, _ = karate_club()
    e = edges_df(spark, src, dst)
    full = {(r["a"], r["b"]): r["round"] for r in maximal_matching(e).collect()}
    one = {(r["a"], r["b"]): r["round"] for r in maximal_matching(e, fixed_rounds=1).collect()}
    again = {(r["a"], r["b"]): r["round"] for r in maximal_matching(e, fixed_rounds=1).collect()}
    assert one == again
    assert all(full[k] == v for k, v in one.items())
    assert all(v == 0 for v in one.values())


def test_matching_path_and_selfloop(spark):
    src, dst, _ = toy_chain_dangling()  # path 0-1-2-3
    e = edges_df(spark, np.append(src, 9), np.append(dst, 9))  # + self-loop 9
    m = [(r["a"], r["b"]) for r in maximal_matching(e).collect()]
    used = [v for ab in m for v in ab]
    assert 9 not in used  # self-loops never match
    assert len(used) == len(set(used))
    # a maximal matching of a 4-path has 1 or 2 edges
    assert 1 <= len(m) <= 2
