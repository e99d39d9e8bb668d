"""Exactness + property pins for operators/walks.py: a pure-python md5
tournament replica on toy graphs, determinism under repartitioning, seed
sensitivity, dead-end termination, and per-step marginal uniformity."""

import hashlib
from collections import Counter

from linkgraph.operators.walks import random_walks
from tests import conftest as fx


def _walks_python(src, dst, walk_len, seed="w0"):
    nbrs = {}
    nodes = set()
    for u, v in zip(src, dst):
        nbrs.setdefault(u, set()).add(v)
        nodes.update((u, v))
    out = {}
    for s in nodes:
        cur = s
        out[(s, 0)] = s
        for i in range(1, walk_len + 1):
            cands = nbrs.get(cur)
            if not cands:
                break
            cur = min(
                cands,
                key=lambda d: hashlib.md5(
                    f"{s}|{seed}|{i}|{d}".encode()
                ).hexdigest(),
            )
            out[(s, i)] = cur
    return out


def _collect(df):
    return {(r["start"], r["step"]): r["node"] for r in df.collect()}


def test_walks_karate_match_python_md5_replica(spark):
    src, dst, n = fx.karate_club()
    df = fx.edges_df(spark, src, dst).selectExpr(
        "cast(src as string) src", "cast(dst as string) dst"
    )
    got = _collect(random_walks(df, walk_len=4))
    exp = _walks_python(
        [str(u) for u in src], [str(v) for v in dst], 4
    )
    assert got == exp


def test_walks_deterministic_under_repartition(spark):
    src, dst, n = fx.karate_club()
    df = fx.edges_df(spark, src, dst).selectExpr(
        "cast(src as string) src", "cast(dst as string) dst"
    )
    a = _collect(random_walks(df, walk_len=3))
    b = _collect(random_walks(df.repartition(13), walk_len=3))
    assert a == b


def test_walks_seed_changes_paths(spark):
    src, dst, n = fx.karate_club()
    df = fx.edges_df(spark, src, dst).selectExpr(
        "cast(src as string) src", "cast(dst as string) dst"
    )
    a = _collect(random_walks(df, walk_len=3, seed="w0"))
    b = _collect(random_walks(df, walk_len=3, seed="w1"))
    assert a != b
    assert {k for k in a if k[1] == 0} == {k for k in b if k[1] == 0}


def test_walks_dead_end_stops_early(spark):
    # path 0 -> 1 -> 2 (directed): the walk from 0 must stop at step 2,
    # the walk from 2 at step 0
    df = fx.edges_df(spark, [0, 1], [1, 2]).selectExpr(
        "cast(src as string) src", "cast(dst as string) dst"
    )
    got = _collect(random_walks(df, walk_len=5))
    assert got == {
        ("0", 0): "0", ("0", 1): "1", ("0", 2): "2",
        ("1", 0): "1", ("1", 1): "2",
        ("2", 0): "2",
    }


def test_walks_step_marginal_is_roughly_uniform(spark):
    # hub 'h' with 4 spokes; many independent walk families (seeds) from
    # the single start: each spoke should win the step-1 tournament about
    # 1/4 of the time (hash symmetry)
    spokes = [f"s{i}" for i in range(4)]
    df = spark.createDataFrame(
        [("h", s) for s in spokes], "src string, dst string"
    )
    starts = spark.createDataFrame([("h",)], "node string")
    hits = Counter()
    for k in range(20):
        got = _collect(random_walks(df, 1, seed=f"u{k}", starts=starts))
        hits[got[("h", 1)]] += 1
    assert set(hits) <= set(spokes)
    assert max(hits.values()) <= 12  # no spoke dominates (E=5 per spoke)
    assert len(hits) >= 3


# ---------------- weighted walks ----------------


def _wwalks_python(wedges, walk_len, seed="ww0"):
    from collections import defaultdict

    w = defaultdict(int)
    for s, d, ww in wedges:
        w[(s, d)] += ww
    adj = {}
    nodes = set()
    for (s, d), ww in w.items():
        adj.setdefault(s, []).append((d, ww))
        nodes.update((s, d))
    out = {}
    for st in nodes:
        cur = st
        out[(st, 0)] = st
        for i in range(1, walk_len + 1):
            nbrs = sorted(adj.get(cur, []))
            if not nbrs:
                break
            tot = sum(ww for _, ww in nbrs)
            u = int(hashlib.md5(f"{st}|{seed}|{i}".encode()).hexdigest()[:12], 16)
            r = u % tot
            cum = 0
            for d, ww in nbrs:
                cum += ww
                if r < cum:
                    cur = d
                    break
            out[(st, i)] = cur
    return out


def test_weighted_walks_match_python_replica(spark):
    from linkgraph.operators.walks import weighted_random_walks

    src, dst, n = fx.karate_club()
    wedges = [
        (str(u), str(v), 1 + ((int(u) * 3 + int(v)) % 4))
        for u, v in zip(src, dst)
    ]
    df = spark.createDataFrame(wedges, "src string, dst string, w long")
    got = _collect(weighted_random_walks(df, walk_len=4))
    assert got == _wwalks_python(wedges, 4)


def test_weighted_walks_marginal_matches_weights(spark):
    from linkgraph.operators.walks import weighted_random_walks

    # hub -> a (w=1), hub -> b (w=3): across many walk families the draw
    # frequencies must approximate 1:3 (deterministic given the seeds)
    df = spark.createDataFrame(
        [("h", "a", 1), ("h", "b", 3)], "src string, dst string, w long"
    )
    starts = spark.createDataFrame([("h",)], "node string")
    hits = Counter()
    for k in range(24):
        got = _collect(weighted_random_walks(df, 1, seed=f"s{k}", starts=starts))
        hits[got[("h", 1)]] += 1
    assert hits["b"] > hits["a"]  # 3x weight must dominate
    assert hits["a"] >= 1  # but the light edge still gets drawn


def test_weighted_walks_deterministic_and_dup_edges_combined(spark):
    from linkgraph.operators.walks import weighted_random_walks

    # duplicate (src,dst) rows must combine: ("h","a",1)x2 == ("h","a",2)
    d1 = spark.createDataFrame(
        [("h", "a", 1), ("h", "a", 1), ("h", "b", 2)],
        "src string, dst string, w long",
    )
    d2 = spark.createDataFrame(
        [("h", "a", 2), ("h", "b", 2)], "src string, dst string, w long"
    )
    a = _collect(weighted_random_walks(d1, 2))
    b = _collect(weighted_random_walks(d2.repartition(7), 2))
    assert a == b


# ---- node2vec second-order biased walks ----

def _n2v_python(src, dst, walk_len, w_return=1, w_common=4, w_far=2,
                seed="n2v0"):
    nbrs = {}
    und = set()
    nodes = set()
    for u, v in zip(src, dst):
        if u == v:
            continue
        nbrs.setdefault(u, set()).add(v)
        und.add((u, v))
        und.add((v, u))
        nodes.update((u, v))
    out = {}
    for s in sorted(nodes):
        out[(s, 0)] = s
        cands = nbrs.get(s)
        if not cands:
            continue
        cur = min(
            cands,
            key=lambda d: hashlib.md5(
                f"{s}|{seed}|1|{d}".encode()
            ).hexdigest(),
        )
        prev = s
        out[(s, 1)] = cur
        for i in range(2, walk_len + 1):
            cands = sorted(nbrs.get(cur, ()))
            if not cands:
                break
            ws = [
                w_return if x == prev
                else w_common if (prev, x) in und
                else w_far
                for x in cands
            ]
            u48 = int(
                hashlib.md5(f"{s}|{seed}|{i}".encode()).hexdigest()[:12], 16
            )
            slot = u48 % sum(ws)
            cum = 0
            for x, w in zip(cands, ws):
                cum += w
                if slot < cum:
                    prev, cur = cur, x
                    break
            out[(s, i)] = cur
    return out


def test_node2vec_matches_python_replica(spark):
    from linkgraph.operators.walks import node2vec_walks

    src, dst, _ = fx.karate_club()
    got = _collect(node2vec_walks(fx.edges_df(spark, src, dst), walk_len=4))
    want = _n2v_python(src, dst, 4)
    assert got == want


def test_node2vec_bias_extremes(spark):
    from linkgraph.operators.walks import node2vec_walks

    # path 0-1-2 plus a triangle edge 0-2: from state (0 -> 1) the
    # candidates are {0 (return), 2 (common: 0-2 edge exists)}
    src = [0, 1, 0, 1, 2, 2]
    dst = [1, 2, 2, 0, 1, 0]
    e = fx.edges_df(spark, src, dst)
    # huge return weight -> the walk must bounce back to prev
    got = _collect(node2vec_walks(e, walk_len=2, w_return=1_000_000,
                                  w_common=1, w_far=1))
    for s in (0, 1, 2):
        assert got[(s, 2)] == s  # step-2 returns to the start
    # replica agreement on asymmetric weights too
    got2 = _collect(node2vec_walks(e, walk_len=3, w_return=2, w_common=5,
                                   w_far=3))
    want2 = _n2v_python(src, dst, 3, 2, 5, 3)
    assert got2 == want2


def test_node2vec_deterministic_and_seeded(spark):
    from linkgraph.operators.walks import node2vec_walks

    src, dst, _ = fx.two_components()
    e = fx.edges_df(spark, src, dst)
    a = _collect(node2vec_walks(e, walk_len=3))
    b = _collect(node2vec_walks(e.repartition(7), walk_len=3))
    assert a == b
    # seed sensitivity needs out-degree > 1 (two_components is a union
    # of directed cycles, where every step has a single candidate) —
    # probe it on karate
    ks, kd, _ = fx.karate_club()
    ke = fx.edges_df(spark, ks, kd)
    c = _collect(node2vec_walks(ke, walk_len=3))
    d = _collect(node2vec_walks(ke, walk_len=3, seed="other"))
    assert c != d


def test_node2vec_rejects_non_integer_weights(spark):
    from linkgraph.operators.walks import node2vec_walks

    src, dst, _ = fx.two_components()
    e = fx.edges_df(spark, src, dst)
    import pytest

    with pytest.raises(ValueError):
        node2vec_walks(e, walk_len=2, w_common=2.5)
    with pytest.raises(ValueError):
        node2vec_walks(e, walk_len=2, w_return=0)
    with pytest.raises(ValueError):
        node2vec_walks(e, walk_len=2, w_far=True)
