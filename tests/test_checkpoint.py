"""Resume-mid-convergence: a run killed after iteration k, resumed from the
checkpoint store, must produce the same final vector as an uninterrupted run
(SURVEY §5; north rule 'runs resume mid-convergence')."""

import numpy as np

from linkgraph.checkpoint import ParquetManifestStore
from linkgraph.operators.pagerank import pagerank_dataframe
from tests import conftest as fx


def ranks_dict(res):
    return {r["node"]: r["rank"] for r in res.ranks.collect()}


def test_resume_equals_uninterrupted(spark, tmp_path):
    src, dst, n = fx.karate_club()
    df = fx.edges_df(spark, src, dst)
    store = ParquetManifestStore(str(tmp_path / "ckpt"))

    full = pagerank_dataframe(df, eps=1e-9, max_iter=300)

    # interrupted run: stop after 7 iterations (max_iter=7 simulates the kill)
    pagerank_dataframe(df, eps=1e-9, max_iter=7, store=store, run_id="r1")
    assert store.latest_iteration("r1") == 7

    resumed = pagerank_dataframe(df, eps=1e-9, max_iter=300, store=store, run_id="r1")
    a = ranks_dict(full)
    b = ranks_dict(resumed)
    assert set(a) == set(b)
    va = np.array([a[k] for k in sorted(a)])
    vb = np.array([b[k] for k in sorted(b)])
    assert np.allclose(va, vb, atol=1e-12, rtol=0)  # identical trajectory
    assert resumed.iterations == full.iterations  # same total iteration count


def test_manifest_is_commit_point(spark, tmp_path):
    store = ParquetManifestStore(str(tmp_path / "ckpt"))
    assert store.latest_iteration("nope") is None
    src, dst, n = fx.toy_chain_dangling()
    df = fx.edges_df(spark, src, dst)
    pagerank_dataframe(df, eps=1e-15, max_iter=3, store=store, run_id="r2")
    log = store.iteration_log("r2")
    assert [e["iteration"] for e in log] == [1, 2, 3]
    assert all("norm" in e and "wall_ms" in e for e in log)
    back = store.read_ranks(spark, "r2", 3)
    assert back.count() == n
