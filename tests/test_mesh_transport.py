"""Mesh transport parity: the shm (same-host tmpfs) and TCP transports must
produce identical PageRank vectors and iteration counts on BOTH combine
paths (replicate allgather and segment-routed exchange) — the Spark
analogue of the reference racing its serial/OMP/OCL/MPI implementations
against each other (/root/reference/main.c:109-112)."""

import numpy as np
import pytest

from linkgraph.plans.barrier import pagerank_barrier
from tests import conftest as fx


def _vec(res):
    d = {r["node"]: r["rank"] for r in res.ranks.collect()}
    return np.array([d[k] for k in sorted(d)])


@pytest.mark.parametrize("replicate", [True, False])
def test_shm_and_tcp_transports_identical(spark, replicate):
    src, dst, n = fx.karate_club()
    df = fx.edges_df(spark, src, dst)
    a = pagerank_barrier(
        df, eps=1e-9, num_tasks=4, num_shards=4,
        mesh_transport="shm", replicate=replicate,
    )
    b = pagerank_barrier(
        df, eps=1e-9, num_tasks=4, num_shards=4,
        mesh_transport="tcp", replicate=replicate,
    )
    assert a.iterations == b.iterations
    va, vb = _vec(a), _vec(b)
    # same collectives, same canonical combine order => same floats
    assert np.array_equal(va, vb)


def test_replicate_and_routed_paths_allclose(spark):
    """The two combine strategies differ in FP summation order, so they are
    compared at the engine's contract tolerance, not bit-exactly."""
    src, dst, n = fx.toy_chain_dangling()
    df = fx.edges_df(spark, src, dst)
    a = pagerank_barrier(df, eps=1e-9, num_tasks=3, replicate=True)
    b = pagerank_barrier(df, eps=1e-9, num_tasks=3, replicate=False)
    assert np.allclose(_vec(a), _vec(b), atol=1e-9, rtol=0)


def test_shared_buffer_resume_equals_uninterrupted(spark, tmp_path):
    """Segment-routed + shm => host-shared ping/pong rank buffers. A run
    interrupted at iteration k and resumed must land on the same vector as
    an uninterrupted run (same floats: the shared path reads/writes the
    same values the private path holds, in the same order)."""
    from linkgraph.checkpoint import ParquetManifestStore

    src, dst, n = fx.toy_chain_dangling()
    df = fx.edges_df(spark, src, dst)
    store = ParquetManifestStore(str(tmp_path / "ckpt"))
    pagerank_barrier(
        df, eps=1e-9, max_iter=5, num_tasks=3, store=store, run_id="sb",
        mesh_transport="shm", replicate=False,
    )
    assert store.latest_iteration("sb") == 5
    resumed = pagerank_barrier(
        df, eps=1e-9, max_iter=300, num_tasks=3, store=store, run_id="sb",
        mesh_transport="shm", replicate=False,
    )
    full = pagerank_barrier(
        df, eps=1e-9, max_iter=300, num_tasks=3,
        mesh_transport="shm", replicate=False,
    )
    assert resumed.iterations == full.iterations
    assert np.array_equal(_vec(resumed), _vec(full))


def test_shm_mesh_cleans_up(spark):
    import glob

    pre = set(glob.glob("/dev/shm/lg_mesh_*"))  # killed runs may leak dirs
    src, dst, n = fx.toy_cycle()
    df = fx.edges_df(spark, src, dst)
    pagerank_barrier(df, eps=1e-8, num_tasks=4, mesh_transport="shm")
    assert set(glob.glob("/dev/shm/lg_mesh_*")) - pre == set()
