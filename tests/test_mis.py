"""Pins for operators/mis.py: MIS invariants (independence + maximality),
a pure-python md5-Luby replica, determinism under repartitioning, and the
fixed-round partial shape."""

import hashlib

from linkgraph.operators.mis import maximal_independent_set
from tests import conftest as fx


def _simple_und(src, dst):
    und = set()
    nodes = set()
    for u, v in zip(src, dst):
        nodes.update((u, v))
        if u != v:
            und.add((u, v))
            und.add((v, u))
    return nodes, und


def _luby_python(src, dst, seed="mis", max_rounds=200):
    nodes, und = _simple_und(src, dst)
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
    active = set(nodes)
    mis = {}
    for r in range(max_rounds):
        if not active:
            break
        pri = {
            v: hashlib.md5(f"mis|{r}|{v}".encode()).hexdigest() for v in active
        }
        win = {
            v
            for v in active
            if all(pri[v] < pri[u] for u in adj.get(v, ()) if u in active)
        }
        for v in win:
            mis[v] = r
        removed = set(win)
        for v in win:
            removed |= adj.get(v, set()) & active
        active -= removed
    return mis


def _got(df):
    return {r["node"]: r["round"] for r in df.collect()}


def test_mis_karate_matches_python_luby(spark):
    src, dst, n = fx.karate_club()
    df = fx.edges_df(spark, src, dst).selectExpr(
        "cast(src as string) src", "cast(dst as string) dst"
    )
    got = _got(maximal_independent_set(df))
    exp = _luby_python([str(u) for u in src], [str(v) for v in dst])
    assert got == exp


def test_mis_invariants_on_karate(spark):
    src, dst, n = fx.karate_club()
    df = fx.edges_df(spark, src, dst).selectExpr(
        "cast(src as string) src", "cast(dst as string) dst"
    )
    mis = set(_got(maximal_independent_set(df)))
    nodes, und = _simple_und([str(u) for u in src], [str(v) for v in dst])
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
    # independence: no two MIS members adjacent
    assert all((a, b) not in und for a in mis for b in mis if a != b)
    # maximality: every non-member has a MIS neighbor
    for v in nodes - mis:
        assert adj.get(v, set()) & mis, v


def test_mis_deterministic_under_repartition(spark):
    src, dst, n = fx.karate_club()
    df = fx.edges_df(spark, src, dst).selectExpr(
        "cast(src as string) src", "cast(dst as string) dst"
    )
    a = _got(maximal_independent_set(df))
    b = _got(maximal_independent_set(df.repartition(13)))
    assert a == b


def test_mis_fixed_rounds_is_prefix(spark):
    src, dst, n = fx.karate_club()
    df = fx.edges_df(spark, src, dst).selectExpr(
        "cast(src as string) src", "cast(dst as string) dst"
    )
    full = _got(maximal_independent_set(df))
    partial = _got(maximal_independent_set(df, fixed_rounds=1))
    assert partial == {v: r for v, r in full.items() if r < 1}


def test_mis_isolated_and_self_loop_nodes_win_round_0(spark):
    # 9 isolated via self-loop, 0-1 edge: winner of {0,1} + 9 in round 0
    df = fx.edges_df(spark, [0, 9], [1, 9]).selectExpr(
        "cast(src as string) src", "cast(dst as string) dst"
    )
    got = _got(maximal_independent_set(df))
    assert got["9"] == 0
    assert ("0" in got) != ("1" in got)
