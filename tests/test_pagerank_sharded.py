"""Sharded (Arrow-kernel) PageRank must be allclose-1e-6 identical to both
the numpy oracle and the DataFrame path on every fixture — the Spark analogue
of the reference racing serial vs OMP vs OCL implementations and comparing
at 1e-6 (/root/reference/main.c:109-112)."""

import numpy as np
import pytest

from linkgraph.operators.pagerank import pagerank_dataframe, pagerank_sharded
from linkgraph.oracle import pagerank_family_a
from linkgraph.plans.shards import ShardedGraph
from tests import conftest as fx


@pytest.mark.parametrize(
    "fixture",
    [fx.toy_chain_dangling, fx.toy_cycle, fx.two_components, fx.multi_edge, fx.karate_club],
)
def test_matches_oracle(spark, fixture):
    src, dst, n = fixture()
    df = fx.edges_df(spark, src, dst)
    res = pagerank_sharded(df, eps=1e-9, max_iter=300, num_shards=3)
    got = {r["node"]: r["rank"] for r in res.ranks.collect()}
    oracle, oiters = pagerank_family_a(src, dst, n, eps=1e-9, max_iter=300)
    present = sorted(set(src.tolist()) | set(dst.tolist()))
    assert np.allclose(
        np.array([got[i] for i in present]), oracle[present], atol=1e-6, rtol=0
    )
    assert res.iterations == oiters


def test_star_hub_salting_matches_unsalted(spark):
    """FIXTURES §F3 star_hub: with a tiny hub threshold the hub's in-edges
    are salted across shards; result must equal the unsalted run (1e-6)."""
    src, dst, n = fx.star_hub(2000)
    df = fx.edges_df(spark, src, dst)
    g_salted = ShardedGraph.build(df, num_shards=4, hub_salt_factor=0.05)
    assert g_salted.hub_count >= 1  # the hub actually got split
    salted = pagerank_sharded(df, eps=1e-9, sharded_graph=g_salted)
    unsalted = pagerank_sharded(df, eps=1e-9, num_shards=1)
    a = {r["node"]: r["rank"] for r in salted.ranks.collect()}
    b = {r["node"]: r["rank"] for r in unsalted.ranks.collect()}
    va = np.array([a[k] for k in sorted(a)])
    vb = np.array([b[k] for k in sorted(b)])
    assert np.allclose(va, vb, atol=1e-6, rtol=0)
    g_salted.unpersist()


def test_sharded_equals_dataframe_path(spark):
    src, dst, n = fx.karate_club()
    df = fx.edges_df(spark, src, dst)
    a = pagerank_sharded(df, eps=1e-8, num_shards=4)
    b = pagerank_dataframe(df, eps=1e-8)
    da = {r["node"]: r["rank"] for r in a.ranks.collect()}
    db = {r["node"]: r["rank"] for r in b.ranks.collect()}
    va = np.array([da[k] for k in sorted(da)])
    vb = np.array([db[k] for k in sorted(db)])
    assert np.allclose(va, vb, atol=1e-6, rtol=0)
    assert a.iterations == b.iterations


def test_shard_count_invariance(spark):
    src, dst, n = fx.karate_club()
    df = fx.edges_df(spark, src, dst)
    r1 = pagerank_sharded(df, eps=1e-9, num_shards=1)
    r8 = pagerank_sharded(df, eps=1e-9, num_shards=8)
    d1 = {r["node"]: r["rank"] for r in r1.ranks.collect()}
    d8 = {r["node"]: r["rank"] for r in r8.ranks.collect()}
    v1 = np.array([d1[k] for k in sorted(d1)])
    v8 = np.array([d8[k] for k in sorted(d8)])
    assert np.allclose(v1, v8, atol=1e-6, rtol=0)


def test_per_partition_metrics_lineage(spark, tmp_path):
    from linkgraph.checkpoint import ParquetManifestStore

    src, dst, n = fx.karate_club()
    df = fx.edges_df(spark, src, dst)
    store = ParquetManifestStore(str(tmp_path / "ckpt"))
    res = pagerank_sharded(df, eps=1e-6, max_iter=5, num_shards=3, store=store, run_id="m")
    pm = store.read_metrics(spark, "m")
    assert pm is not None
    rows = pm.collect()
    # every iteration logged per-partition nnz summing to the edge count
    iters = {r["iteration"] for r in rows}
    assert iters == set(range(1, res.iterations + 1))
    by_iter = {}
    for r in rows:
        by_iter.setdefault(r["iteration"], 0)
        by_iter[r["iteration"]] += r["nnz"]
    assert all(v == len(src) for v in by_iter.values())


def test_resume_sharded(spark, tmp_path):
    from linkgraph.checkpoint import ParquetManifestStore

    src, dst, n = fx.karate_club()
    df = fx.edges_df(spark, src, dst)
    store = ParquetManifestStore(str(tmp_path / "ckpt"))
    full = pagerank_sharded(df, eps=1e-9)
    pagerank_sharded(df, eps=1e-9, max_iter=6, store=store, run_id="r", num_shards=2)
    resumed = pagerank_sharded(df, eps=1e-9, max_iter=300, store=store, run_id="r", num_shards=2)
    da = {r["node"]: r["rank"] for r in full.ranks.collect()}
    db = {r["node"]: r["rank"] for r in resumed.ranks.collect()}
    va = np.array([da[k] for k in sorted(da)])
    vb = np.array([db[k] for k in sorted(db)])
    assert np.allclose(va, vb, atol=1e-12, rtol=0)
    assert resumed.iterations == full.iterations
