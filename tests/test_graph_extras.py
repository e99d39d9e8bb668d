"""Round-2 operator additions: personalized PageRank, HITS, k-core,
as-of join. Each pinned against an independent in-test reference
(numpy power iteration / python peel / pandas merge_asof)."""

import numpy as np
import pandas as pd
import pytest

from linkgraph.operators.asof import asof_join
from linkgraph.operators.hits import hits
from linkgraph.operators.kcore import k_core
from linkgraph.operators.pagerank import pagerank_dataframe, personalized_pagerank
from linkgraph.oracle import pagerank_personalized
from tests import conftest as fx


def _rank_vec(res, n):
    d = {r["node"]: r["rank"] for r in res.ranks.collect()}
    return np.array([d.get(i, 0.0) for i in range(n)])


@pytest.mark.parametrize(
    "fixture", [fx.toy_chain_dangling, fx.karate_club, fx.multi_edge]
)
def test_ppr_matches_numpy_oracle(spark, fixture):
    src, dst, n = fixture()
    df = fx.edges_df(spark, src, dst)
    present = sorted(set(src.tolist()) | set(dst.tolist()))
    sources = np.array(present[: max(1, len(present) // 3)])
    sdf = spark.createDataFrame([(int(s),) for s in sources], "node long")
    res = personalized_pagerank(df, sdf, eps=1e-10, max_iter=300)
    oracle, oiters = pagerank_personalized(src, dst, n, sources, eps=1e-10, max_iter=300)
    got = _rank_vec(res, n)
    assert np.allclose(got[present], oracle[present], atol=1e-6, rtol=0)
    assert res.iterations == oiters


def test_ppr_uniform_sources_reduces_to_family_a(spark):
    src, dst, n = fx.toy_cycle()
    df = fx.edges_df(spark, src, dst)
    allv = spark.createDataFrame([(int(i),) for i in range(n)], "node long")
    a = personalized_pagerank(df, allv, eps=1e-10)
    b = pagerank_dataframe(df, eps=1e-10)
    va, vb = _rank_vec(a, n), _rank_vec(b, n)
    assert np.allclose(va, vb, atol=1e-8, rtol=0)


def _hits_numpy(src, dst, n, iters):
    h = np.full(n, 1.0 / n)
    a = np.full(n, 1.0 / n)
    for _ in range(iters):
        a_raw = np.zeros(n)
        np.add.at(a_raw, dst, h[src])
        if a_raw.sum() == 0:
            break
        a = a_raw / a_raw.sum()
        h_raw = np.zeros(n)
        np.add.at(h_raw, src, a[dst])
        h = h_raw / h_raw.sum()
    return h, a


@pytest.mark.parametrize("iters", [1, 25])
def test_hits_matches_numpy(spark, iters):
    src, dst, n = fx.karate_club()
    df = fx.edges_df(spark, src, dst)
    res = hits(df, max_iter=iters, check_convergence=False)
    oh, oa = _hits_numpy(src, dst, n, iters)
    got = {r["node"]: (r["hub"], r["authority"]) for r in res.scores.collect()}
    for i in sorted(got):
        assert got[i][0] == pytest.approx(oh[i], abs=1e-9)
        assert got[i][1] == pytest.approx(oa[i], abs=1e-9)
    assert res.iterations == iters


def test_hits_converges(spark):
    src, dst, n = fx.karate_club()
    df = fx.edges_df(spark, src, dst)
    res = hits(df, eps=1e-9, max_iter=200)
    assert res.converged
    # principal eigenvector is nonnegative and L1-normalized
    s = res.scores.toPandas()
    assert s["authority"].min() >= 0 and abs(s["authority"].sum() - 1.0) < 1e-9


def _kcore_python(src, dst, k):
    adj = {}
    for u, v in zip(src.tolist(), dst.tolist()):
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    changed = True
    while changed:
        changed = False
        for u in list(adj):
            if len(adj[u]) < k:
                for v in adj[u]:
                    adj[v].discard(u)
                del adj[u]
                changed = True
    return sorted(adj)


@pytest.mark.parametrize("k", [2, 3, 4, 5])
def test_kcore_matches_python_peel(spark, k):
    src, dst, n = fx.karate_club()
    df = fx.edges_df(spark, src, dst)
    got = sorted(r["node"] for r in k_core(df, k).collect())
    assert got == _kcore_python(src, dst, k)


def test_kcore_karate_4core_golden(spark):
    # the karate club's 4-core is the densest subgroup around both leaders
    src, dst, n = fx.karate_club()
    df = fx.edges_df(spark, src, dst)
    assert len(k_core(df, 4).collect()) == 10
    assert k_core(df, 6).count() == 0


def test_asof_join_matches_pandas_merge_asof(spark):
    rng = np.random.default_rng(7)
    left = pd.DataFrame({
        "uid": rng.integers(0, 5, 200),
        "t": rng.integers(0, 1000, 200),
        "lv": rng.random(200),
    })
    right = (
        pd.DataFrame({
            "uid": rng.integers(0, 5, 300),
            "t": rng.integers(0, 1000, 300),
            "rv": rng.random(300),
        })
        .groupby(["uid", "t"], as_index=False)
        .agg(rv=("rv", "max"))  # unique (by, on) pairs: unambiguous as-of
    )
    ldf = spark.createDataFrame(left)
    rdf = spark.createDataFrame(right)
    for strict, allow_exact in [(False, True), (True, False)]:
        got = (
            asof_join(ldf, rdf, on="t", by="uid", value_cols=["rv"], strict=strict)
            .toPandas()
            .sort_values(["uid", "t", "lv"])
            .reset_index(drop=True)
        )
        exp = (
            pd.merge_asof(
                left.sort_values("t"),
                right.sort_values("t"),
                on="t",
                by="uid",
                direction="backward",
                allow_exact_matches=allow_exact,
            )
            .sort_values(["uid", "t", "lv"])
            .reset_index(drop=True)
        )
        assert np.allclose(
            got["rv"].fillna(-1).to_numpy(), exp["rv"].fillna(-1).to_numpy()
        ), f"strict={strict}"


def test_asof_join_empty_right(spark):
    ldf = spark.createDataFrame([(1, 10, 0.5)], "uid long, t long, lv double")
    rdf = spark.createDataFrame([], "uid long, t long, rv double")
    out = asof_join(ldf, rdf, on="t", by="uid", value_cols=["rv"]).collect()
    assert len(out) == 1 and out[0]["rv"] is None
