"""Gang-scheduled PageRank: the whole convergence loop in ONE barrier stage.

This is the closest Spark re-expression of the reference's MPI pipeline
(/root/reference/main_mpi.c:67-154, pagerank_custom_mpi.h:40-79):

reference MPI                               | here (Spark barrier mode)
--------------------------------------------|----------------------------------
mpirun gang-starts W ranks                  | one barrier() stage of P tasks
                                            | (Spark guarantees co-scheduling;
                                            | the TorchDistributor/Horovod
                                            | pattern: barrier for rendezvous,
                                            | framework-owned data plane)
CSR block scattered once, resident per rank | shard parquet files read once per
(main_mpi.c:122-126)                        | task, resident numpy arrays
rank 0 computes dangling base, broadcasts   | task 0 combines partials, applies
(pagerank_custom_mpi.h:41-50)               | base+damping+norm, sends new rank
MPI_Allgatherv dense vector each iteration  | task0->all rank vector over TCP
(pagerank_custom_mpi.h:62-63)               | (star allreduce on raw sockets)
MPI_Reduce of the norm; rank 0 decides stop | task 0 computes L2 norm, sends
and broadcasts `done` (:65-76)              | continue/stop flag with the rank

Why not per-iteration Spark jobs here: a driver-synchronized loop pays task
dispatch + result collection (~0.2-0.5 s) every iteration, which caps
scaling efficiency once the numpy kernel drops below ~1 s/iteration; and
BarrierTaskContext.allGather has a ~1 s sync floor, so it is used ONCE for
endpoint rendezvous, never in the loop. The socket star moves
O(n + Σ partials) bytes per iteration at loopback/NIC speed with ~ms
latency, so per-iteration overhead is negligible and throughput scales with
cores — the property the north rule's >=0.8 efficiency at N->4N demands.

Trade-off vs the driver-loop paths (kept, see operators/pagerank.py):
barrier mode needs all P slots simultaneously (gang scheduling) and retries
the whole stage on task loss, resuming from the last checkpoint; the
driver-loop paths reschedule per iteration and tolerate executor churn.

Checkpointing: task 0 writes rank snapshots + per-partition lineage/metrics
in the exact ParquetManifestStore layout (checkpoint.py) via pyarrow —
manifest-committed per iteration, resumable mid-convergence (north rule).
"""

from __future__ import annotations

import math
import os
import pickle
import socket
import struct
import time

import numpy as np

from linkgraph.plans.shards import ShardedGraph

_MSG_LIMIT = 1 << 34


def _send_msg(sock: socket.socket, obj) -> None:
    data = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
    sock.sendall(struct.pack("<Q", len(data)) + data)


def _recv_exact(sock: socket.socket, size: int) -> bytes:
    buf = bytearray(size)
    view = memoryview(buf)
    got = 0
    while got < size:
        n = sock.recv_into(view[got:], size - got)
        if n == 0:
            raise ConnectionError("peer closed")
        got += n
    return bytes(buf)


def _recv_msg(sock: socket.socket):
    (size,) = struct.unpack("<Q", _recv_exact(sock, 8))
    if size > _MSG_LIMIT:
        raise ValueError(f"message too large: {size}")
    return pickle.loads(_recv_exact(sock, size))


def _assign_shards(part_dirs: list[tuple[int, str]], num_tasks: int) -> list[list[tuple[int, str]]]:
    """Greedy LPT bin-packing of shard dirs onto tasks by on-disk bytes —
    the edge-count-balanced block assignment of main_mpi.c:88-108."""

    def dir_bytes(path: str) -> int:
        return sum(
            os.path.getsize(os.path.join(path, f))
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )

    sized = sorted(((dir_bytes(p), part, p) for part, p in part_dirs), reverse=True)
    bins: list[list[tuple[int, str]]] = [[] for _ in range(num_tasks)]
    loads = [0] * num_tasks
    for sz, part, p in sized:
        i = loads.index(min(loads))
        bins[i].append((part, p))
        loads[i] += sz
    return bins


def _load_task_shards(assigned: list[tuple[int, str]]):
    import pyarrow.parquet as pq

    shards = []
    for part, path in assigned:
        t = pq.read_table(path, columns=["src_idx", "dst_idx", "weight"])
        src = t.column("src_idx").to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        dst = t.column("dst_idx").to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        w = t.column("weight").to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
        lo = int(dst.min()) if len(dst) else 0
        shards.append((part, src, dst - lo, w, lo))
    return shards


def _task_partials(shards, rank: np.ndarray, d: float):
    """Per-task SpMV partials: one bincount per shard over its dst range
    (the scatter side of kernels/pr_custom_matrix_in.cl:141-151)."""
    idxs, vals, metrics = [], [], []
    for part, src, dst_rel, w, lo in shards:
        t0 = time.monotonic()
        rng = int(dst_rel.max()) + 1 if len(dst_rel) else 0
        contrib = rank[src] * w
        if rng <= max(4 * len(dst_rel), 1024):
            sums = np.bincount(dst_rel, weights=contrib)
            nz = np.nonzero(sums)[0]
            idxs.append(nz + lo)
            vals.append(sums[nz])
            k = len(nz)
        else:
            u, inv = np.unique(dst_rel, return_inverse=True)
            s = np.bincount(inv, weights=contrib)
            idxs.append(u + lo)
            vals.append(s)
            k = len(u)
        metrics.append(
            {"part_id": part, "nnz": len(src), "rows": k,
             "wall_ms": (time.monotonic() - t0) * 1e3}
        )
    if idxs:
        return np.concatenate(idxs), np.concatenate(vals), metrics
    return np.empty(0, np.int64), np.empty(0, np.float64), metrics


def pagerank_barrier(
    edges=None,
    d: float = 0.85,
    eps: float = 1e-6,
    max_iter: int = 200,
    check_convergence: bool = True,
    num_tasks: int | None = None,
    num_shards: int | None = None,
    store=None,
    run_id: str | None = None,
    sharded_graph: ShardedGraph | None = None,
):
    """Family-A PageRank (semantics of operators/pagerank.py, SURVEY §2.8)
    with the entire iteration loop inside one barrier stage. Returns a
    PageRankResult whose ranks DataFrame is rebuilt from the collected
    vector."""
    import pandas as pd

    from linkgraph.operators.pagerank import PageRankResult

    g = sharded_graph or ShardedGraph.build(edges, num_shards=num_shards)
    spark = g.spark
    sc = spark.sparkContext
    n, node_ids, dangling = g.n, g.node_ids, g.dangling_mask
    P = num_tasks or sc.defaultParallelism

    part_dirs = [(r["part"], r["path"]) for r in g.shard_df.collect()]
    P = max(1, min(P, max(1, len(part_dirs))))
    bins = _assign_shards(part_dirs, P)

    start_iter = 0
    rank0 = np.full(n, 1.0 / n, dtype=np.float64)
    if store is not None and run_id is not None and store.latest_iteration(run_id) is not None:
        start_iter = store.latest_iteration(run_id)
        snap = store.read_ranks(spark, run_id, start_iter).toPandas()
        idx = np.searchsorted(node_ids, snap["node"].to_numpy())
        rank0 = np.zeros(n, dtype=np.float64)
        rank0[idx] = snap["rank"].to_numpy()

    ckpt_root = store.root if store is not None and run_id is not None else None
    bc = sc.broadcast((rank0, dangling, node_ids if ckpt_root else None))
    tasks = list(enumerate(bins))  # (task_id, assigned shard dirs)

    def run(it_rows):
        from pyspark import BarrierTaskContext

        ctx = BarrierTaskContext.get()
        pid = ctx.partitionId()
        rows = list(it_rows)
        assigned = rows[0][1] if rows else []
        shards = _load_task_shards(assigned)
        rank_init, dangling_mask, ids = bc.value
        rank = rank_init.copy()

        # --- rendezvous: ONE allGather to exchange task-0's endpoint ---
        host = socket.gethostbyname(socket.gethostname())
        server = conns = peer = None
        if pid == 0 and P > 1:
            server = socket.create_server(("", 0))
            server.settimeout(600)
            port = server.getsockname()[1]
            addrs = ctx.allGather(f"{host}:{port}")
        elif P > 1:
            addrs = ctx.allGather("")
        try:
            if P > 1:
                if pid == 0:
                    conns = {}
                    while len(conns) < P - 1:
                        c, _ = server.accept()
                        c.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
                        hello = _recv_msg(c)
                        conns[hello["pid"]] = c
                else:
                    h, p = addrs[0].rsplit(":", 1)
                    peer = socket.create_connection((h, int(p)), timeout=600)
                    peer.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
                    _send_msg(peer, {"pid": pid})

            # --- the loop: reference MPI iteration, sockets for Allgather ---
            my_metrics: list[dict] = []
            iter_log: list[dict] = []
            it = start_iter
            norm = float("inf")
            converged = False
            for it in range(start_iter + 1, max_iter + 1):
                t0 = time.monotonic()
                idx, val, pmet = _task_partials(shards, rank, d)
                if pid == 0:
                    # gather (sorted by pid => deterministic combine order)
                    parts = {0: (idx, val, pmet)}
                    if conns:
                        for q in sorted(conns):
                            m = _recv_msg(conns[q])
                            parts[q] = (m["idx"], m["val"], m["met"])
                    leaked = float(rank[dangling_mask].sum())
                    base = (leaked + (1.0 - leaked) * (1.0 - d)) / n
                    # deterministic combine order (sorted pid), one dense
                    # bincount (np.add.at is ~20× slower per element)
                    all_idx = np.concatenate([parts[q][0] for q in sorted(parts)])
                    all_val = np.concatenate([parts[q][1] for q in sorted(parts)])
                    new = np.full(n, base, dtype=np.float64)
                    new += d * np.bincount(all_idx, weights=all_val, minlength=n)
                    norm = float(np.sqrt(((new - rank) ** 2).sum()))
                    converged = bool(check_convergence and norm <= eps)
                    done = converged or it >= max_iter
                    rank = new
                    all_met = [mm for q in sorted(parts) for mm in parts[q][2]]
                    iter_log.append(
                        {"iteration": it, "norm": norm, "mass": float(rank.sum()),
                         "wall_ms": (time.monotonic() - t0) * 1e3,
                         "partitions": len(all_met),
                         "nnz": int(sum(mm["nnz"] for mm in all_met))}
                    )
                    if ckpt_root is not None:
                        from linkgraph.checkpoint import write_iteration_arrays

                        write_iteration_arrays(
                            ckpt_root, run_id, it, ids, rank, iter_log[-1],
                            [{"iteration": it, **mm} for mm in all_met],
                        )
                    if conns:
                        # serialize once, fan out to all peers
                        data = pickle.dumps(
                            {"rank": rank, "done": done, "norm": norm},
                            protocol=pickle.HIGHEST_PROTOCOL,
                        )
                        framed = struct.pack("<Q", len(data)) + data
                        for q in conns:
                            conns[q].sendall(framed)
                else:
                    _send_msg(peer, {"idx": idx, "val": val, "met": pmet})
                    m = _recv_msg(peer)
                    rank = m["rank"]
                    norm = m["norm"]
                    done = m["done"]
                    converged = bool(check_convergence and norm <= eps)
                my_metrics.extend(pmet)
                if done:
                    break

            if pid == 0:
                yield {"kind": "result", "rank": rank, "iterations": it,
                       "norm": norm, "converged": converged, "iter_log": iter_log}
            yield {"kind": "task", "pid": pid, "metrics": my_metrics}
        finally:
            for s in (peer, server):
                if s is not None:
                    s.close()
            if conns:
                for c in conns.values():
                    c.close()

    out = sc.parallelize(tasks, P).barrier().mapPartitions(run).collect()
    bc.destroy()
    res = next(o for o in out if o["kind"] == "result")

    ranks_df = spark.createDataFrame(
        pd.DataFrame({"node": node_ids, "rank": res["rank"]})
    )
    if sharded_graph is None:
        g.unpersist()
    return PageRankResult(
        ranks=ranks_df,
        iterations=res["iterations"],
        norm=res["norm"],
        converged=res["converged"],
        iter_metrics=res["iter_log"],
    )
