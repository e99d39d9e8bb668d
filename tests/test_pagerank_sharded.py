"""Shard-kernel PageRank (both physical strategies over ShardedGraph) must
be allclose-1e-6 identical to the numpy oracle and the DataFrame path on
every fixture — the Spark analogue of the reference racing serial vs OMP vs
OCL vs MPI implementations and comparing at 1e-6
(/root/reference/main.c:109-112, main_mpi.c:142-150).

The exhaustive fixture sweep runs on ``pagerank_barrier`` (whole loop in one
barrier stage — cheap per fixture); the driver-loop ``pagerank_sharded``
(per-iteration mapInArrow) is pinned by the equivalence, salting, metrics
and resume tests below.
"""

import numpy as np
import pytest

from linkgraph.operators.pagerank import pagerank_dataframe, pagerank_sharded
from linkgraph.oracle import pagerank_family_a
from linkgraph.plans.barrier import pagerank_barrier
from linkgraph.plans.shards import ShardedGraph
from tests import conftest as fx


def _vec(res):
    d = {r["node"]: r["rank"] for r in res.ranks.collect()}
    return np.array([d[k] for k in sorted(d)])


@pytest.mark.parametrize(
    "fixture",
    [fx.toy_chain_dangling, fx.toy_cycle, fx.two_components, fx.multi_edge, fx.karate_club],
)
def test_barrier_matches_oracle(spark, fixture):
    src, dst, n = fixture()
    df = fx.edges_df(spark, src, dst)
    res = pagerank_barrier(df, eps=1e-9, max_iter=300, num_tasks=4)
    got = {r["node"]: r["rank"] for r in res.ranks.collect()}
    oracle, oiters = pagerank_family_a(src, dst, n, eps=1e-9, max_iter=300)
    present = sorted(set(src.tolist()) | set(dst.tolist()))
    assert np.allclose(
        np.array([got[i] for i in present]), oracle[present], atol=1e-6, rtol=0
    )
    assert res.iterations == oiters


def test_sharded_matches_oracle(spark):
    src, dst, n = fx.karate_club()
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
    salted = pagerank_sharded(df, eps=1e-8, sharded_graph=g_salted)
    unsalted = pagerank_barrier(df, eps=1e-8, num_shards=1, num_tasks=1)
    assert np.allclose(_vec(salted), _vec(unsalted), atol=1e-6, rtol=0)
    g_salted.unpersist()


def test_sharded_and_barrier_equal_dataframe_path(spark):
    src, dst, n = fx.karate_club()
    df = fx.edges_df(spark, src, dst)
    g = ShardedGraph.build(df, num_shards=4)
    a = pagerank_sharded(df, eps=1e-8, sharded_graph=g)
    c = pagerank_barrier(df, eps=1e-8, sharded_graph=g, num_tasks=3)
    b = pagerank_dataframe(df, eps=1e-8)
    assert np.allclose(_vec(a), _vec(b), atol=1e-6, rtol=0)
    assert np.allclose(_vec(c), _vec(b), atol=1e-6, rtol=0)
    assert a.iterations == b.iterations == c.iterations
    g.unpersist()


def test_shard_and_task_count_invariance(spark):
    """Determinism across physical parallelism (the reference gets this free
    from serial execution; we must assert it — SURVEY §5)."""
    src, dst, n = fx.karate_club()
    df = fx.edges_df(spark, src, dst)
    r1 = pagerank_barrier(df, eps=1e-9, num_shards=1, num_tasks=1)
    r8 = pagerank_barrier(df, eps=1e-9, num_shards=8, num_tasks=4)
    assert np.allclose(_vec(r1), _vec(r8), atol=1e-6, rtol=0)


def test_shard_layout_reload(spark, tmp_path):
    """A built shard layout is a reusable artifact: load() must reproduce
    the build's state and yield identical PageRank (bench runs share one
    build across parallelism levels this way)."""
    src, dst, n = fx.karate_club()
    df = fx.edges_df(spark, src, dst)
    sd = str(tmp_path / "shards")
    g = ShardedGraph.build(df, num_shards=3, shard_dir=sd)
    a = pagerank_barrier(df, eps=1e-8, sharded_graph=g, num_tasks=3)
    g.unpersist()  # keeps the dir: caller-provided shard_dir is not owned
    g2 = ShardedGraph.load(spark, sd)
    assert (g2.n, g2.m, g2.num_shards) == (g.n, g.m, g.num_shards)
    assert np.array_equal(g2.node_ids, g.node_ids)
    assert np.array_equal(g2.dangling_mask, g.dangling_mask)
    b = pagerank_barrier(df, eps=1e-8, sharded_graph=g2, num_tasks=2)
    assert np.allclose(_vec(a), _vec(b), atol=1e-9, rtol=0)
    g2.unpersist()


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
    full = pagerank_barrier(df, eps=1e-9)
    pagerank_sharded(
        df, eps=1e-9, max_iter=6, store=store, run_id="r", num_shards=2, fused=False
    )
    resumed = pagerank_sharded(
        df, eps=1e-9, max_iter=300, store=store, run_id="r", num_shards=2, fused=False
    )
    assert np.allclose(_vec(full), _vec(resumed), atol=1e-9, rtol=0)
    assert resumed.iterations == full.iterations


def test_resume_barrier(spark, tmp_path):
    """Barrier engine checkpoints executor-side (task 0, pyarrow) in the
    ParquetManifestStore layout; a later run resumes mid-convergence."""
    from linkgraph.checkpoint import ParquetManifestStore

    src, dst, n = fx.karate_club()
    df = fx.edges_df(spark, src, dst)
    store = ParquetManifestStore(str(tmp_path / "ckpt"))
    full = pagerank_barrier(df, eps=1e-9)
    half = pagerank_barrier(df, eps=1e-9, max_iter=6, store=store, run_id="b", num_tasks=3)
    assert store.latest_iteration("b") == half.iterations
    resumed = pagerank_barrier(
        df, eps=1e-9, max_iter=300, store=store, run_id="b", num_tasks=3
    )
    assert np.allclose(_vec(full), _vec(resumed), atol=1e-9, rtol=0)
    assert resumed.iterations == full.iterations
    # per-partition lineage rows exist for the resumed iterations too
    pm = store.read_metrics(spark, "b")
    assert pm is not None and pm.count() > 0


def test_two_level_prefix_sum_exact_and_distributed(spark):
    """The in-degree-CDF prefix sum must (a) equal a driver-side cumsum
    exactly and (b) contain NO single-partition Exchange / constant-key
    window in its physical plan — the n-row vertex table is never funneled
    through one task (VERDICT r1 'What's wrong' #3)."""
    import numpy as np

    from linkgraph.plans.shards import _two_level_prefix_sum

    rng = np.random.default_rng(7)
    vals = rng.integers(0, 50, size=10_000)
    df = spark.createDataFrame(
        [(int(i), int(v)) for i, v in enumerate(vals)], "idx long, in_deg long"
    ).repartition(16)
    out = _two_level_prefix_sum(df, "idx", "in_deg", "_cdf")
    got = {r["idx"]: r["_cdf"] for r in out.collect()}
    want = np.concatenate([[0], np.cumsum(vals)[:-1]])
    assert all(got[i] == int(want[i]) for i in range(len(vals)))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    assert "windowspecdefinition(0," not in plan.lower().replace(" ", "")


def test_batch_and_periter_regimes_identical(spark):
    """The fused k-iteration batch job must be BIT-compatible with the
    distributed per-iteration path: same combine order (part-ascending
    concat + bincount) => same floats, same iteration count (both equal the
    numpy oracle's count via the identical in-loop L2 stop)."""
    import numpy as np

    src, dst, n = fx.karate_club()
    df = fx.edges_df(spark, src, dst)
    from linkgraph.plans.shards import ShardedGraph

    g = ShardedGraph.build(df, num_shards=3)
    rb = pagerank_sharded(df, eps=1e-9, max_iter=300, sharded_graph=g, batch=True)
    rp = pagerank_sharded(
        df, eps=1e-9, max_iter=300, sharded_graph=g, batch=False, fused=False
    )
    vb = {r["node"]: r["rank"] for r in rb.ranks.collect()}
    vp = {r["node"]: r["rank"] for r in rp.ranks.collect()}
    assert rb.iterations == rp.iterations
    assert vb.keys() == vp.keys()
    assert all(vb[k] == vp[k] for k in vb), "regimes must produce identical floats"
    assert any(m.get("batched") for m in rb.iter_metrics)
    assert not any(m.get("batched") for m in rp.iter_metrics)
    g.unpersist()


def test_fused_regime_matches_batch_and_checkpoints(spark, tmp_path):
    """VERDICT r2 #3 — distributed k-step fusion: outside the single-task
    batch regime (large m, or any checkpointed run), ``pagerank_sharded``
    runs the WHOLE loop as one barrier gang job (k = all steps between
    driver norm reads, exchange executor-to-executor, checkpoints written
    in-job) instead of one Spark job per iteration. Same part-ascending
    combine order => identical floats and iteration counts; resume from the
    in-job checkpoints reaches the same fixed point."""
    from linkgraph.checkpoint import ParquetManifestStore

    src, dst, n = fx.karate_club()
    df = fx.edges_df(spark, src, dst)
    g = ShardedGraph.build(df, num_shards=3)
    rb = pagerank_sharded(df, eps=1e-9, max_iter=300, sharded_graph=g, batch=True)
    rf = pagerank_sharded(df, eps=1e-9, max_iter=300, sharded_graph=g, batch=False)
    assert rf.strategy == "sharded"
    assert rf.iterations == rb.iterations
    vb = {r["node"]: r["rank"] for r in rb.ranks.collect()}
    vf = {r["node"]: r["rank"] for r in rf.ranks.collect()}
    assert vb.keys() == vf.keys()
    assert all(vb[k] == vf[k] for k in vb), "fused gang must reproduce batch floats"
    # route_ms in the lineage proves the barrier exchange ran (fusion, not
    # the legacy driver loop)
    assert any("route_ms" in m for m in rf.iter_metrics)

    # a store forces the non-batch regime; the fused job checkpoints every
    # iteration and a later call resumes from the manifest
    store = ParquetManifestStore(str(tmp_path / "ckpt"))
    half = pagerank_sharded(
        df, eps=1e-9, max_iter=6, store=store, run_id="f", sharded_graph=g
    )
    assert half.iterations == 6
    assert store.latest_iteration("f") == 6
    resumed = pagerank_sharded(
        df, eps=1e-9, max_iter=300, store=store, run_id="f", sharded_graph=g
    )
    assert resumed.iterations == rb.iterations
    vr = {r["node"]: r["rank"] for r in resumed.ranks.collect()}
    assert np.allclose(
        np.array([vb[k] for k in sorted(vb)]),
        np.array([vr[k] for k in sorted(vr)]),
        atol=1e-9, rtol=0,
    )
    g.unpersist()


def test_auto_dispatch_regimes(spark, tmp_path):
    """`pagerank(strategy="auto")` must (a) pick the sharded batch engine at
    contract scale, (b) fall back to the UNBOUNDED dataframe plan when n
    exceeds the dense-vector budget (round-2 VERDICT #1 — the O(n)-driver
    engines must never bind by default at 10^8-10^9 vertices), (c) route
    checkpointed large-m runs to the barrier engine, and stay oracle-equal
    in every regime."""
    from linkgraph.checkpoint import ParquetManifestStore
    from linkgraph.operators.pagerank import pagerank

    src, dst, n = fx.karate_club()
    df = fx.edges_df(spark, src, dst)

    auto = pagerank(df, eps=1e-8)
    assert auto.strategy == "sharded"

    # graph "above the threshold": shrink the budget instead of building
    # 10^9 vertices — the dispatch arithmetic is what's under test
    big = pagerank(df, eps=1e-8, dense_budget_bytes=10)
    assert big.strategy == "dataframe"
    assert np.allclose(_vec(auto), _vec(big), atol=1e-6, rtol=0)

    store = ParquetManifestStore(str(tmp_path / "ck"))
    ck = pagerank(df, eps=1e-8, store=store, run_id="auto1")
    assert ck.strategy == "barrier"
    assert np.allclose(_vec(ck), _vec(auto), atol=1e-6, rtol=0)

    forced = pagerank(df, eps=1e-8, strategy="barrier")
    assert forced.strategy == "barrier"


def test_ranks_df_distributed_and_isolated(spark):
    """ShardedGraph.ranks_df materializes [node, rank] from executors (no
    driver createDataFrame), and each result is published to a UNIQUE
    vector file: a later solve on the same graph must not retarget an
    earlier result's lazy plan."""
    src, dst, n = fx.karate_club()
    df = fx.edges_df(spark, src, dst)
    g = ShardedGraph.build(df, num_shards=3)

    vec = np.arange(g.n, dtype=np.float64) / g.n
    got = {r["node"]: r["rank"] for r in g.ranks_df(vec).collect()}
    assert got == {int(nid): float(v) for nid, v in zip(g.node_ids, vec)}

    a = pagerank_sharded(df, eps=1e-8, sharded_graph=g)
    a_before = _vec(a)
    # second solve on the SAME graph (different engine, different scratch)
    pagerank_barrier(df, eps=1e-4, max_iter=3, sharded_graph=g, num_tasks=2)
    assert np.array_equal(_vec(a), a_before), "earlier result plan retargeted"
    g.unpersist()


# ---- weighted + Family-B fast-path regimes (round-4) ----

def _weighted_df(spark, src, dst):
    """Deterministic positive integer weights on a fixture edge list."""
    import pyspark.sql.functions as F

    return fx.edges_df(spark, src, dst).withColumn(
        "wt", (F.pmod(F.col("src") * 7 + F.col("dst") * 13, F.lit(5)) + 1).cast("double")
    )


def test_weighted_all_strategies_equal_dataframe(spark):
    """Weighted PageRank through the CSR shard kernel (batch regime), the
    barrier gang, and the legacy per-iteration loop must match the
    dataframe path at 1e-6 with identical iteration counts — the weighted
    extension of the cross-strategy equality pin (VERDICT r3 #4)."""
    src, dst, n = fx.karate_club()
    df = _weighted_df(spark, src, dst)
    b = pagerank_dataframe(df, eps=1e-8, weight_col="wt")
    g = ShardedGraph.build(df, num_shards=4, weight_col="wt")
    assert g.weighted
    a = pagerank_sharded(df, eps=1e-8, sharded_graph=g, weight_col="wt")
    c = pagerank_barrier(df, eps=1e-8, sharded_graph=g, num_tasks=3)
    legacy = pagerank_sharded(
        df, eps=1e-8, sharded_graph=g, weight_col="wt", batch=False, fused=False
    )
    assert np.allclose(_vec(a), _vec(b), atol=1e-6, rtol=0)
    assert np.allclose(_vec(c), _vec(b), atol=1e-6, rtol=0)
    assert np.allclose(_vec(legacy), _vec(b), atol=1e-6, rtol=0)
    assert a.iterations == b.iterations == c.iterations == legacy.iterations
    g.unpersist()


def test_weighted_uniform_equals_unweighted_sharded(spark):
    import pyspark.sql.functions as F

    src, dst, n = fx.karate_club()
    df = fx.edges_df(spark, src, dst).withColumn("wt", F.lit(3.0))
    w = pagerank_sharded(df, eps=1e-8, weight_col="wt")
    u = pagerank_sharded(fx.edges_df(spark, src, dst), eps=1e-8)
    assert np.allclose(_vec(w), _vec(u), atol=1e-9, rtol=0)
    assert w.iterations == u.iterations


def test_family_b_all_strategies_equal_dataframe(spark):
    """Family B (leaking base + one final normalization) through shard
    batch kernel / barrier / legacy loop == dataframe path, on the
    dangling-heavy fixture where A and B genuinely differ."""
    src, dst, n = fx.toy_chain_dangling()
    df = fx.edges_df(spark, src, dst)
    b = pagerank_dataframe(df, eps=1e-10, family="b")
    a = pagerank_sharded(df, eps=1e-10, family="b")
    c = pagerank_barrier(df, eps=1e-10, family="b", num_tasks=3)
    legacy = pagerank_sharded(df, eps=1e-10, family="b", batch=False, fused=False)
    assert np.allclose(_vec(a), _vec(b), atol=1e-6, rtol=0)
    assert np.allclose(_vec(c), _vec(b), atol=1e-6, rtol=0)
    assert np.allclose(_vec(legacy), _vec(b), atol=1e-6, rtol=0)
    assert a.iterations == b.iterations == c.iterations
    # the flag genuinely changes the loop: A conserves unit mass every
    # iteration, B's mass leaks through the dangling tail (the converged
    # fixed points still coincide after B's one normalization — documented
    # in pagerank_dataframe)
    a_fam_a = pagerank_sharded(df, eps=1e-10)
    assert all(abs(mm["mass"] - 1.0) < 1e-9 for mm in a_fam_a.iter_metrics)
    assert a.iter_metrics[1]["mass"] < 1.0 - 1e-6
    # B's published vector is normalized exactly once
    assert abs(_vec(a).sum() - 1.0) < 1e-9
    assert abs(_vec(c).sum() - 1.0) < 1e-9


def test_weighted_family_b_combined(spark):
    src, dst, n = fx.toy_chain_dangling()
    df = _weighted_df(spark, src, dst)
    b = pagerank_dataframe(df, eps=1e-10, family="b", weight_col="wt")
    a = pagerank_sharded(df, eps=1e-10, family="b", weight_col="wt")
    assert np.allclose(_vec(a), _vec(b), atol=1e-6, rtol=0)
    assert a.iterations == b.iterations


def test_weighted_auto_dispatch_and_guards(spark):
    from linkgraph.operators.pagerank import choose_strategy, pagerank

    # weighted / family b no longer force the dataframe plan
    assert choose_strategy(100, 100, weighted=True) == "sharded"
    assert choose_strategy(100, 100, family="b") == "sharded"
    src, dst, n = fx.karate_club()
    df = _weighted_df(spark, src, dst)
    res = pagerank(df, eps=1e-8, weight_col="wt")
    assert res.strategy == "sharded"
    assert np.allclose(
        _vec(res), _vec(pagerank_dataframe(df, eps=1e-8, weight_col="wt")),
        atol=1e-6, rtol=0,
    )
    # string ids fall back to the dataframe plan instead of crashing
    import pyspark.sql.functions as F

    sdf = fx.edges_df(spark, src, dst).select(
        F.concat(F.lit("v"), F.col("src")).alias("src"),
        F.concat(F.lit("v"), F.col("dst")).alias("dst"),
    )
    res_s = pagerank(sdf, eps=1e-8)
    assert res_s.strategy == "dataframe"
    # prebuilt unweighted layout + weight_col is a loud error
    g = ShardedGraph.build(fx.edges_df(spark, src, dst), num_shards=2)
    with pytest.raises(ValueError, match="unweighted"):
        pagerank_sharded(df, sharded_graph=g, weight_col="wt")
    g.unpersist()
