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
(main_mpi.c:122-126)                        | task, resident numpy CSR arrays
contiguous node blocks per rank             | each task OWNS a contiguous
(main_mpi.c:88-108)                         | vertex segment [n·p/P, n·(p+1)/P)
                                            | of the rank vector
per-rank partial SpMV + OpenMP              | per-task numpy CSR kernel
(pagerank_custom_mpi.h:53-60)               | (plans/shards.py csr_partials)
MPI_Allgatherv re-materializes the dense    | two full-mesh rounds per
vector on every rank every iteration        | iteration (shm files intra-host,
(pagerank_custom_mpi.h:62-63)               | TCP sockets across hosts — the
                                            | same-node/cross-node transport
                                            | split every MPI stack makes):
                                            | (1) partial sums
                                            | routed to their segment OWNER,
                                            | (2) updated segments allgathered
                                            | — O(n/P) per link, all links in
                                            | parallel (the star variant's
                                            | O(n·P) fan-out from task 0 was
                                            | measured serial-bottlenecked)
MPI_Reduce of the norm; rank 0 decides      | per-segment δ² piggybacks on the
stop and broadcasts done (:65-76)           | segment messages; every task sums
                                            | them and decides IDENTICALLY
                                            | (same floats, same order)

Why not per-iteration Spark jobs here: a driver-synchronized loop pays task
dispatch + result collection (~0.2-0.5 s) every iteration, which caps
scaling efficiency once the numpy kernel drops below ~1 s/iteration; and
BarrierTaskContext.allGather has a ~1 s sync floor, so it is used ONCE for
endpoint rendezvous, never in the loop.

Trade-off vs the driver-loop paths (kept, see operators/pagerank.py):
barrier mode needs all P slots simultaneously (gang scheduling) and retries
the whole stage on task loss, resuming from the last checkpoint; the
driver-loop paths reschedule per iteration and tolerate executor churn.

Checkpointing: task 0 (which holds the full assembled vector after round 2)
writes rank snapshots + per-partition lineage/metrics in the exact
ParquetManifestStore layout (checkpoint.py) via pyarrow — manifest-committed
per checkpoint interval, resumable mid-convergence (north rule).
"""

from __future__ import annotations

import os
import pickle
import shutil
import socket
import struct
import uuid
import threading
import time

import numpy as np

from linkgraph.plans.shards import ShardedGraph, csr_partials

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


def _dir_bytes(path: str) -> int:
    return sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )


class _ShmMesh:
    """Intra-host transport: pickled messages through files on a tmpfs
    (/dev/shm), write-to-tmp-then-rename for atomicity, spin-then-sleep
    polling for arrival. The MPI precedent is the shared-memory BTL every
    MPI stack selects for same-node ranks — the TCP mesh below stays the
    multi-host data plane, but when every barrier task lands on one host
    (always true on local[N]; common for small gangs on big executors) the
    single-round file exchange replaces log2(P) sequential TCP rounds and
    cuts the per-iteration sync floor by ~an order of magnitude at P=32.

    Collectives are SPMD-ordered (every task calls the same sequence of
    exchange/allgather), so a per-instance sequence number names each
    round's files. A task deletes its OWN files two rounds back — by then
    every reader has provably consumed them (reaching round k requires
    having completed round k-1, which requires having read all round k-2
    inputs)."""

    def __init__(self, pid: int, P: int, root: str):
        self.pid = pid
        self.P = P
        self.root = root
        self.seq = 0
        self._mine: list[list[str]] = []  # my files per round, for cleanup
        self._rx: dict[int, int] = {}  # peer -> incoming fifo fd
        self._tx: dict[int, int] = {}  # peer -> outgoing fifo fd (lazy)
        os.makedirs(root, exist_ok=True)
        # One FIFO per ordered peer pair for arrival signaling: a reader
        # BLOCKS in the kernel on its incoming fifo (zero CPU) instead of
        # exists()-polling. Polling was measured self-defeating at P=32:
        # ~20 waiting tasks in 0.2-2 ms sleep/wake loops steal enough CPU
        # from the still-computing tasks to stretch the very tail the gang
        # is waiting on (a feedback loop; engine sat at 4-17x the sync-free
        # control). Protocol: writer renames the payload file THEN writes
        # one byte to the reader's fifo; one byte <=> one message, in SPMD
        # round order, so a blocking 1-byte read == "next payload is on
        # disk". Pipe buffers (64 KiB) never fill at 1 B/round.
        for q in range(P):
            if q != pid:
                try:
                    os.mkfifo(os.path.join(root, f"f_{q}_{pid}"))
                except FileExistsError:
                    pass
        for q in range(P):
            if q != pid:
                # O_NONBLOCK so open succeeds before the writer arrives;
                # reads themselves block via select() below
                self._rx[q] = os.open(
                    os.path.join(root, f"f_{q}_{pid}"),
                    os.O_RDONLY | os.O_NONBLOCK,
                )

    def _signal(self, q: int) -> None:
        fd = self._tx.get(q)
        if fd is None:
            # writer-side open blocks with ENXIO until the reader has
            # opened; the reader opens all incoming fifos in __init__, so
            # this resolves within the rendezvous window
            path = os.path.join(self.root, f"f_{self.pid}_{q}")
            deadline = time.monotonic() + 600
            while True:
                try:
                    fd = os.open(path, os.O_WRONLY | os.O_NONBLOCK)
                    break
                except OSError:
                    if time.monotonic() > deadline:
                        raise TimeoutError(f"shm mesh: no reader on {path}")
                    time.sleep(0.001)
            self._tx[q] = fd
        os.write(fd, b"\x01")

    def _await_byte(self, q: int, deadline: float) -> None:
        import select

        fd = self._rx[q]
        while True:
            try:
                if os.read(fd, 1):
                    return
            except BlockingIOError:
                pass
            timeout = deadline - time.monotonic()
            if timeout <= 0:
                raise TimeoutError(f"shm mesh: no signal from peer {q}")
            select.select([fd], [], [], min(timeout, 60.0))

    def _write(self, name: str, obj) -> str:
        path = os.path.join(self.root, name)
        tmp = path + f".tmp{self.pid}"
        with open(tmp, "wb") as f:
            f.write(pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL))
        os.rename(tmp, path)
        return path

    def _read(self, name: str, peer: int, deadline: float):
        self._await_byte(peer, deadline)
        with open(os.path.join(self.root, name), "rb") as f:
            return pickle.load(f)

    def _round_files(self, written: list[str]):
        self._mine.append(written)
        self.seq += 1
        if len(self._mine) > 2:
            for path in self._mine.pop(0):
                try:
                    os.unlink(path)
                except OSError:
                    pass

    def exchange(self, outgoing: dict[int, object]):
        if self.P == 1:
            return {}
        k = self.seq
        written = []
        for q, msg in outgoing.items():
            written.append(self._write(f"s{k}_p{self.pid}_to_{q}", msg))
            self._signal(q)
        deadline = time.monotonic() + 600
        got = {
            q: self._read(f"s{k}_p{q}_to_{self.pid}", q, deadline)
            for q in range(self.P)
            if q != self.pid
        }
        self._round_files(written)
        return got

    def allgather(self, payload) -> dict[int, object]:
        if self.P == 1:
            return {self.pid: payload}
        k = self.seq
        written = [self._write(f"s{k}_p{self.pid}", payload)]
        for q in range(self.P):
            if q != self.pid:
                self._signal(q)
        deadline = time.monotonic() + 600
        got = {
            q: self._read(f"s{k}_p{q}", q, deadline)
            for q in range(self.P)
            if q != self.pid
        }
        got[self.pid] = payload
        self._round_files(written)
        return got

    def stream_put(self, key, obj) -> None:
        """Streamed collective, write half: publish one keyed item of the
        CURRENT round to every peer immediately (called mid-compute, so the
        transfer overlaps the remaining kernel work). Pairs with
        stream_collect, which closes the round. One signal byte per peer
        per item keeps the byte<=>message accounting of the fifo protocol:
        the reader issues one blocking read per EXPECTED item."""
        self._stream_written = getattr(self, "_stream_written", [])
        self._stream_written.append(
            self._write(f"s{self.seq}_p{self.pid}_{key}", obj)
        )
        for q in range(self.P):
            if q != self.pid:
                self._signal(q)

    def stream_collect(self, expected: dict[int, list]) -> dict[tuple, object]:
        """Streamed collective, read half: collect every peer's items for
        this round. ``expected[q]`` lists peer q's keys in q's write order
        (deterministic static assignment — every task derives the same
        lists), so per-peer sequential blocking reads consume signals in
        order. Returns {(q, key): obj}. Closes the round."""
        deadline = time.monotonic() + 600
        got = {}
        for q in range(self.P):
            if q == self.pid:
                continue
            for key in expected.get(q, ()):
                got[(q, key)] = self._read(f"s{self.seq}_p{q}_{key}", q, deadline)
        self._round_files(getattr(self, "_stream_written", []))
        self._stream_written = []
        return got

    def close(self):
        # A task must NOT delete its recent files here — a slower peer may
        # still be reading the final round (deleting would starve its
        # read). Each departing task signals pid 0 one final byte; pid 0
        # waits for every depart signal (bounded) and sweeps the dir.
        try:
            if self.pid != 0 and self.P > 1:
                self._signal(0)
            elif self.pid == 0:
                deadline = time.monotonic() + 600
                try:
                    for q in range(1, self.P):
                        self._await_byte(q, deadline)
                except (TimeoutError, OSError):
                    pass  # a dead peer fails the stage anyway; still sweep
        except (TimeoutError, OSError):
            pass
        for fd in list(self._rx.values()) + list(self._tx.values()):
            try:
                os.close(fd)
            except OSError:
                pass
        if self.pid == 0:
            shutil.rmtree(self.root, ignore_errors=True)


class _Mesh:
    """Full-mesh peer connections among the P barrier tasks, established via
    one allGather of listening endpoints (the only use of Spark's barrier
    sync — it has a ~1 s floor, so the loop never touches it)."""

    def __init__(self, ctx, pid: int, P: int, server=None, addrs=None):
        self.pid = pid
        self.P = P
        self.conns: dict[int, socket.socket] = {}
        self._server = server
        if P == 1:
            return
        if self._server is None:
            host = socket.gethostbyname(socket.gethostname())
            self._server = socket.create_server(("", 0))
            self._server.settimeout(600)
            port = self._server.getsockname()[1]
            addrs = ctx.allGather(f"{host}:{port}")
        # connect to lower pids; accept from higher pids
        for q in range(pid):
            h, p = addrs[q].split(":")[:2]
            s = socket.create_connection((h, int(p)), timeout=600)
            s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            _send_msg(s, {"pid": pid})
            self.conns[q] = s
        while len(self.conns) < P - 1:
            c, _ = self._server.accept()
            c.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            hello = _recv_msg(c)
            self.conns[hello["pid"]] = c

    def exchange(self, outgoing: dict[int, object]):
        """Send outgoing[q] to each peer q; receive one message from every
        peer. Sender runs in a thread so all links drain in parallel
        (blocking both directions on one thread can deadlock once TCP
        buffers fill). Returns {q: message}."""
        if self.P == 1:
            return {}
        payloads = {
            q: pickle.dumps(outgoing[q], protocol=pickle.HIGHEST_PROTOCOL)
            for q in self.conns
        }

        def _send_all():
            for q, data in payloads.items():
                self.conns[q].sendall(struct.pack("<Q", len(data)) + data)

        t = threading.Thread(target=_send_all)
        t.start()
        got = {q: _recv_msg(self.conns[q]) for q in self.conns}
        t.join()
        return got

    def allgather(self, payload) -> dict[int, object]:
        """Everyone ends with every task's payload. Recursive doubling when
        P is a power of two (MPI's allgather: log2(P) pairwise exchanges —
        per-message latency dominates at these sizes, so 2·log2(P) messages
        beat the mesh's 2·(P-1)); mesh broadcast otherwise."""
        if self.P == 1:
            return {self.pid: payload}
        if self.P & (self.P - 1) == 0:
            blocks = {self.pid: payload}
            r = 1
            while r < self.P:
                partner = self.pid ^ r
                data = pickle.dumps(blocks, protocol=pickle.HIGHEST_PROTOCOL)
                conn = self.conns[partner]
                t = threading.Thread(
                    target=conn.sendall, args=(struct.pack("<Q", len(data)) + data,)
                )
                t.start()
                blocks.update(_recv_msg(conn))
                t.join()
                r <<= 1
            return blocks
        got = self.exchange({q: payload for q in self.conns})
        got[self.pid] = payload
        return got

    def close(self):
        for c in self.conns.values():
            c.close()
        if self._server is not None:
            self._server.close()


def _make_mesh(ctx, pid: int, P: int, mode: str = "auto"):
    """Transport selection, decided identically on every task from ONE
    barrier allGather advertising (host, tcp port, shm-writable, uuid):
    same host everywhere + writable /dev/shm => _ShmMesh (single-round
    tmpfs file exchange, MPI's same-node shared-memory BTL analogue);
    otherwise the TCP full mesh. mode ("auto"|"tcp"|"shm", default from
    LINKGRAPH_MESH at the driver) forces a choice — tests use it for
    transport-parity assertions."""
    if P == 1 or mode == "tcp":
        return _Mesh(ctx, pid, P)
    host = socket.gethostbyname(socket.gethostname())
    server = socket.create_server(("", 0))
    server.settimeout(600)
    port = server.getsockname()[1]
    shm_ok = os.access("/dev/shm", os.W_OK)
    token = uuid.uuid4().hex if pid == 0 else "-"
    ads = ctx.allGather(f"{host}:{port}:{int(shm_ok)}:{token}")
    same_host = len({a.split(":")[0] for a in ads}) == 1
    all_shm = all(a.split(":")[2] == "1" for a in ads)
    if mode == "shm" or (same_host and all_shm):
        server.close()
        if pid == 0:
            # insurance against leaked dirs from hard-killed runs (a stage
            # retry re-rendezvouses under a fresh uuid): sweep stale roots
            now = time.time()
            for name in os.listdir("/dev/shm"):
                if name.startswith("lg_mesh_"):
                    p = os.path.join("/dev/shm", name)
                    try:
                        if now - os.path.getmtime(p) > 7200:
                            shutil.rmtree(p, ignore_errors=True)
                    except OSError:
                        pass
        root = os.path.join("/dev/shm", "lg_mesh_" + ads[0].split(":")[3])
        return _ShmMesh(pid, P, root)
    return _Mesh(ctx, pid, P, server=server, addrs=ads)


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
    checkpoint_interval: int = 1,
    mesh_transport: str | None = None,
    replicate: bool | None = None,
    work_steal: bool | None = None,
    family: str = "a",
    weight_col: str | None = None,
):
    """PageRank (semantics of operators/pagerank.py, SURVEY §2.8; family
    "a" = per-iteration dangling redistribution, "b" = mtx/OCL leaking
    base with ONE final sum-normalization at publish time) with the
    entire iteration loop inside one barrier stage. Weighted layouts
    (ShardedGraph.build weight_col) work unchanged: the per-edge weight
    stream lives inside csr_partials and inv_od is the 0/1 dangling
    mask. Returns a PageRankResult whose ranks DataFrame is rebuilt from
    the collected vector."""
    if family not in ("a", "b"):
        raise ValueError(f"family must be 'a' or 'b', got {family!r}")
    fam_b = family == "b"
    from linkgraph.operators.pagerank import PageRankResult

    if sharded_graph is not None and weight_col is not None and not sharded_graph.weighted:
        raise ValueError(
            "pagerank_barrier: weight_col given but the prebuilt "
            "sharded_graph was built unweighted"
        )
    g = sharded_graph or ShardedGraph.build(
        edges, num_shards=num_shards, weight_col=weight_col
    )
    spark = g.spark
    sc = spark.sparkContext
    n, node_ids = g.n, g.node_ids
    P = num_tasks or sc.defaultParallelism
    part_dirs = [(r["part"], r["path"]) for r in g.shard_df.collect()]
    P = max(1, min(P, max(1, len(part_dirs))))
    # contiguous vertex segments, one owner task each (main_mpi.c:88-108)
    seg_bounds = np.linspace(0, n, P + 1).astype(np.int64)

    start_iter = 0
    rank0 = np.full(n, 1.0 / n, dtype=np.float64)
    if store is not None and run_id is not None and store.latest_iteration(run_id) is not None:
        start_iter = store.latest_iteration(run_id)
        snap = store.read_ranks(spark, run_id, start_iter).toPandas()
        idx = np.searchsorted(node_ids, snap["node"].to_numpy())
        rank0 = np.zeros(n, dtype=np.float64)
        rank0[idx] = snap["rank"].to_numpy()

    ckpt_root = store.root if store is not None and run_id is not None else None
    dangling_idx = np.flatnonzero(g.dangling_mask)
    bc = sc.broadcast((rank0, dangling_idx, g.inv_od, node_ids if ckpt_root else None))
    path_of = dict(part_dirs)
    build_token = g.build_token  # keys the worker shard cache per build

    # per-run claim directory for intra-iteration work stealing (replicate
    # path): lives next to the shards (same shared-storage assumption);
    # O_CREAT|O_EXCL claim files are atomic on POSIX and NFSv4
    claims_root = os.path.join(g.shard_dir, "claims", uuid.uuid4().hex)
    # task 0 publishes the final vector here — a UNIQUE file, not the
    # mutable rank.npy iteration scratch, so earlier results' lazy plans
    # are never silently retargeted by a later solve on the same graph
    rank_out = os.path.join(g.shard_dir, f"rank_out_{uuid.uuid4().hex}.npy")
    transport = mesh_transport or os.environ.get("LINKGRAPH_MESH", "auto")
    do_steal = (
        work_steal
        if work_steal is not None
        else os.environ.get("LINKGRAPH_STEAL", "0") == "1"
    )
    parts_sized = sorted((part, _dir_bytes(path)) for part, path in part_dirs)
    tasks = list(range(P))

    def run(it_rows):
        from pyspark import BarrierTaskContext

        from linkgraph.plans.shards import _load_shard, _load_uniq

        ctx = BarrierTaskContext.get()
        pid = ctx.partitionId()
        list(it_rows)  # drain; partition index IS the task id
        rank_init, dang_idx, inv_od, ids = bc.value
        rank = rank_init.copy()
        lo, hi = int(seg_bounds[pid]), int(seg_bounds[pid + 1])

        # Combine strategy by vertex-count regime:
        # * small n: allgather ALL partials (recursive doubling) and combine
        #   the full vector on every task — O(n) replicated work is cheap,
        #   and 2·log2(P) messages beat 4·(P-1) (latency dominates).
        # * large n: route partials to segment owners, allgather segments —
        #   replicated combine would cost O(n) numpy + O(n·P) traffic.
        rep = replicate if replicate is not None else n <= (1 << 19)

        # Static deterministic LPT assignment, identical on every task:
        # shards sorted by bytes desc, each assigned to the least-loaded
        # task (the edge-count-balanced block assignment of
        # main_mpi.c:88-108). A measured-rate adaptive variant was tried
        # and REVERTED: on this jittery host, rates estimated from the
        # previous iteration are stale by the next one, and the resulting
        # misallocation waits exceeded the imbalance they removed.
        size_of = dict(parts_sized)
        order_desc = [pp for pp, _sz in sorted(parts_sized, key=lambda x: (-x[1], x[0]))]
        load = [0.0] * P
        # full assignment (not just own): every task derives the same
        # per-peer part lists, which is what lets the streamed partial
        # exchange below know exactly which keyed items to await from whom
        assign: list[list[int]] = [[] for _ in range(P)]
        for part in order_desc:
            q = min(range(P), key=lambda i: (load[i] + size_of[part], i))
            load[q] += size_of[part]
            assign[q].append(part)
        mine_parts = assign[pid]

        # Work stealing (replicate path only, OPT-IN via work_steal= /
        # LINKGRAPH_STEAL=1 — default static): measured on this host, the
        # claims race BACKFIRES at P=32: a task whose peers are briefly
        # descheduled at iteration start claims nearly every shard and then
        # runs the whole SpMV alone while 31 tasks idle in the allgather
        # (observed 3-7 s iterations vs ~0.1 s static). With the gather
        # allocator stall fixed (shards.py csr_partials scratch) genuine
        # multi-second stragglers are rare, so static LPT wins; stealing
        # remains available for environments with real vCPU freezes.
        # When enabled: the static LPT assignment is
        # each task's PREFERENCE, not its obligation. Per iteration each
        # shard is claimed exactly once via an O_EXCL file create; a task
        # whose vCPU stalls (this hypervisor freezes vCPUs for 100s of ms)
        # loses its unclaimed shards to peers instead of serializing the
        # whole gang behind its kernel work — only its (tiny) allgather
        # message is still waited on. Results stay BIT-identical for every
        # claim outcome because the combine below concatenates partials in
        # canonical part-ascending order, not arrival/owner order. The
        # non-replicate (large-n) path keeps the static assignment: its
        # partials are routed by segment owner and stealing would only
        # re-route the same bytes.
        steal = rep and P > 1 and do_steal
        mine_set = set(mine_parts)
        pref_order = mine_parts + [p for p in order_desc if p not in mine_set]
        mesh = _make_mesh(ctx, pid, P, transport)
        # Streamed partial exchange (replicate + static assignment + shm
        # mesh): each shard's sums are published the moment the kernel
        # finishes them, so the transfer overlaps the remaining compute and
        # the gang's critical path waits only on the slowest task's LAST
        # shard — not on a bulk post-kernel write+read of its whole share.
        # Needs the static assignment (receivers must know which keys to
        # await); stealing randomizes ownership, so it keeps the bulk path.
        # Only pays when there is compute to overlap: per item it costs
        # ~P fifo writes + a file create, so a task whose whole kernel
        # share is a few ms (tiny graphs at high P) is better off with the
        # single bulk round — gate on per-task shard bytes.
        stream_min = int(os.environ.get("LINKGRAPH_STREAM_MIN_BYTES", 32 << 20))
        streamed = (
            rep and P > 1 and not steal and isinstance(mesh, _ShmMesh)
            and sum(size_of.values()) // P >= stream_min
        )
        # Claim directory placement matters: ~P x num_shards O_EXCL
        # attempts per iteration all target ONE directory, and on a
        # disk-backed filesystem the directory-inode lock serializes the
        # gang (measured: seconds per iteration at P=32 on ext4 /tmp).
        # Same-host (shm mesh) runs claim inside the tmpfs mesh root —
        # memory-speed creates, swept with the mesh; multi-host runs keep
        # the shard_dir (shared storage, atomic on NFSv4).
        claims_dir = (
            os.path.join(mesh.root, "claims")
            if isinstance(mesh, _ShmMesh)
            else claims_root
        )
        if steal:
            os.makedirs(claims_dir, exist_ok=True)

        def _claimed(it_no: int, part: int) -> bool:
            p = os.path.join(claims_dir, f"it{it_no}_p{part}")
            if os.path.exists(p):  # lock-free fast path: already claimed
                return False
            try:
                os.close(os.open(p, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
                return True
            except FileExistsError:
                return False

        try:
            start = start_iter
            if ckpt_root is not None:
                # intra-job stage-retry resume: start_iter/rank0 were
                # resolved ONCE on the driver and captured in the broadcast;
                # a barrier stage retry restarts every task, so task 0
                # re-reads the latest committed manifest iteration here and
                # the mesh agrees on it via one startup allgather (never in
                # the loop). Without this, a retry would redo work from the
                # original vector (correct but not "resume").
                payload = None
                if pid == 0:
                    import pyarrow.parquet as paq

                    from linkgraph.checkpoint import ParquetManifestStore

                    st = ParquetManifestStore(ckpt_root)
                    li = st.latest_iteration(run_id)
                    if li is not None and li > start:
                        entry = next(
                            e
                            for e in st._read_manifest(run_id)["iterations"]
                            if e["iteration"] == li
                        )
                        t = paq.read_table(entry["rank_path"])
                        r = np.zeros(n, dtype=np.float64)
                        r[np.searchsorted(ids, t.column("node").to_numpy())] = t.column(
                            "rank"
                        ).to_numpy()
                        payload = (li, r)
                resumed = mesh.allgather(payload).get(0)
                if resumed is not None:
                    start, rank = resumed[0], resumed[1].copy()

            # Shared rank buffers (segment-routed path, same-host mesh):
            # ONE ping/pong pair of n-vector mmaps on the mesh tmpfs holds
            # rank and w=rank·inv_od; each task writes only its own
            # [lo,hi) segment (no races) and every task's gather reads the
            # SAME physical pages. This is Spark-broadcast semantics for
            # processes (one copy per node, readers share), and on this
            # host it is the difference between P private n-vectors
            # thrashing the shared L3 and one L3-resident copy (measured
            # at n=4M: 32-proc aggregate gather 2.05G/s shared vs 1.62G/s
            # private, self-relative efficiency 0.87 vs 0.37 — see
            # BENCH/BASELINE.md). The per-iteration exchange shrinks to
            # one scalar plus lineage per task: writing your segment IS
            # the allgather. tmpfs pages cannot be hugepage-backed here
            # (shmem_enabled=never), which costs ~2x single-proc gather
            # TLB overhead vs THP-backed private arrays — the right trade
            # exactly when n·P exceeds LLC, which is the regime this path
            # is selected for.
            shared = (not rep) and isinstance(mesh, _ShmMesh)
            if shared:
                bufs = [os.path.join(mesh.root, f"vec{p}.buf") for p in (0, 1)]
                if pid == 0:
                    for b in bufs:
                        with open(b, "wb") as f:
                            f.truncate(2 * n * 8)  # [rank | w] halves
                mesh.allgather(None)  # buffers exist
                vecs = [np.memmap(b, dtype=np.float64, mode="r+", shape=(2, n))
                        for b in bufs]
                inv_seg = inv_od[lo:hi]
                cur = start & 1
                vecs[cur][0, lo:hi] = rank[lo:hi]
                vecs[cur][1, lo:hi] = rank[lo:hi] * inv_seg
                mesh.allgather(None)  # all segments written
            my_metrics: list[dict] = []
            iter_log: list[dict] = []
            it = start
            norm = float("inf")
            converged = False
            for it in range(start + 1, max_iter + 1):
                t0 = time.monotonic()
                # (1) SpMV partials over this iteration's shards: claimed
                # (steal path) or statically assigned (shared CSR kernel;
                # worker-cached decoded arrays). Shared mode gathers from
                # the host-shared w half of the current parity buffer —
                # no per-task O(n) multiply, no private copy.
                if shared:
                    cur, nxt = (it - 1) & 1, it & 1
                    w_rank = vecs[cur][1]
                else:
                    w_rank = rank * inv_od
                pmet = []
                per_shard = []  # (part, u, s)
                for part in (pref_order if steal else mine_parts):
                    if steal and not _claimed(it, part):
                        continue
                    tk = time.monotonic()
                    u, s, nnz = csr_partials(_load_shard(path_of[part], build_token), w_rank)
                    per_shard.append((part, u, s))
                    if streamed:
                        mesh.stream_put(part, s)
                    pmet.append(
                        {"part_id": part, "nnz": nnz, "rows": len(u),
                         "wall_ms": (time.monotonic() - tk) * 1e3,
                         "stolen": part not in mine_set}
                    )
                t_kernel = time.monotonic()

                if streamed:
                    # close the round: metrics ride the last streamed item;
                    # every task then combines the full vector in canonical
                    # part-ascending order (same floats, same order as the
                    # bulk path => identical stop decisions and vectors)
                    mesh.stream_put("met", pmet)
                    got = mesh.stream_collect(
                        {q: assign[q] + ["met"] for q in range(P) if q != pid}
                    )
                    t_route = time.monotonic()
                    sums_by_part = {p: s for p, _u, s in per_shard}
                    for (_q, key), obj in got.items():
                        if key != "met":
                            sums_by_part[key] = obj
                    parts_sorted = sorted(sums_by_part)
                    all_u = (
                        np.concatenate(
                            [_load_uniq(path_of[p], build_token) for p in parts_sorted]
                        )
                        if parts_sorted else np.empty(0, np.int64)
                    )
                    all_s = (
                        np.concatenate([sums_by_part[p] for p in parts_sorted])
                        if parts_sorted else np.empty(0, np.float64)
                    )
                    all_met = [
                        mm
                        for q in range(P)
                        for mm in (pmet if q == pid else got[(q, "met")])
                    ]
                    if fam_b:
                        base = (1.0 - d) / n
                    else:
                        leaked = float(rank[dang_idx].sum())
                        base = (leaked + (1.0 - leaked) * (1.0 - d)) / n
                    new = np.full(n, base, dtype=np.float64)
                    if len(all_u):
                        new += d * np.bincount(all_u, weights=all_s, minlength=n)
                    nsq = float(((new - rank) ** 2).sum())
                    rank = new
                    norm = float(np.sqrt(nsq))
                    converged = bool(check_convergence and norm <= eps)
                    done = converged or it >= max_iter
                    my_metrics.extend(pmet)
                    if pid == 0:
                        iter_log.append(
                            {"iteration": it, "norm": norm, "mass": float(rank.sum()),
                             "wall_ms": (time.monotonic() - t0) * 1e3,
                             "kernel_ms": (t_kernel - t0) * 1e3,
                             "route_ms": (t_route - t_kernel) * 1e3,
                             "comb_ms": (time.monotonic() - t_route) * 1e3,
                             "partitions": len(all_met),
                             "nnz": int(sum(mm["nnz"] for mm in all_met))}
                        )
                        if ckpt_root is not None and (
                            done or it % checkpoint_interval == 0
                        ):
                            from linkgraph.checkpoint import write_iteration_arrays

                            write_iteration_arrays(
                                ckpt_root, run_id, it, ids, rank, iter_log[-1],
                                [{"iteration": it, **mm} for mm in all_met],
                            )
                    if done:
                        break
                    continue

                if rep:
                    # one allgather of partials; every task combines the
                    # full vector in canonical part-ascending order (same
                    # floats, same order regardless of who computed what =>
                    # identical stop decisions, checkpoint-equal vectors,
                    # and results invariant to claim outcomes AND to P).
                    # Only the per-iteration sums go on the wire — the
                    # loop-invariant uniq-dst arrays are resolved locally
                    # from the shard sidecars (_load_uniq, page-cache-
                    # shared), halving the mesh volume of the route step.
                    blocks = mesh.allgather(
                        ([(p, s) for p, _u, s in per_shard], pmet)
                    )
                    t_route = time.monotonic()
                    order = sorted(blocks)
                    flat = sorted(
                        (t for q in order for t in blocks[q][0]), key=lambda x: x[0]
                    )
                    all_u = (
                        np.concatenate(
                            [_load_uniq(path_of[p], build_token) for p, _s in flat]
                        )
                        if flat else np.empty(0, np.int64)
                    )
                    all_s = (
                        np.concatenate([s for _p, s in flat])
                        if flat else np.empty(0, np.float64)
                    )
                    all_met = [mm for q in order for mm in blocks[q][1]]
                    if fam_b:
                        base = (1.0 - d) / n
                    else:
                        leaked = float(rank[dang_idx].sum())
                        base = (leaked + (1.0 - leaked) * (1.0 - d)) / n
                    new = np.full(n, base, dtype=np.float64)
                    if len(all_u):
                        new += d * np.bincount(all_u, weights=all_s, minlength=n)
                    nsq = float(((new - rank) ** 2).sum())
                    rank = new
                    norm = float(np.sqrt(nsq))
                    converged = bool(check_convergence and norm <= eps)
                    done = converged or it >= max_iter
                    my_metrics.extend(pmet)
                    if pid == 0:
                        iter_log.append(
                            {"iteration": it, "norm": norm, "mass": float(rank.sum()),
                             "wall_ms": (time.monotonic() - t0) * 1e3,
                             "kernel_ms": (t_kernel - t0) * 1e3,
                             "route_ms": (t_route - t_kernel) * 1e3,
                             "comb_ms": (time.monotonic() - t_route) * 1e3,
                             "partitions": len(all_met),
                             "nnz": int(sum(mm["nnz"] for mm in all_met))}
                        )
                        if ckpt_root is not None and (
                            done or it % checkpoint_interval == 0
                        ):
                            from linkgraph.checkpoint import write_iteration_arrays

                            write_iteration_arrays(
                                ckpt_root, run_id, it, ids, rank, iter_log[-1],
                                [{"iteration": it, **mm} for mm in all_met],
                            )
                    if done:
                        break
                    continue

                # (2) route partial slices to their segment owners (mesh
                # round 1 — the scatter half of Allgatherv); each shard's
                # uniq-dst array is sorted, so the slice owned by task q is
                # one searchsorted range
                shard_routes = [np.searchsorted(u, seg_bounds) for (_p, u, _s) in per_shard]
                outgoing = {}
                for q in range(P):
                    if q == pid:
                        continue
                    pieces = [
                        (u[c[q]:c[q + 1]], s[c[q]:c[q + 1]])
                        for (_p, u, s), c in zip(per_shard, shard_routes)
                        if c[q + 1] > c[q]
                    ]
                    outgoing[q] = pieces
                mine = [
                    (u[c[pid]:c[pid + 1]], s[c[pid]:c[pid + 1]])
                    for (_p, u, s), c in zip(per_shard, shard_routes)
                    if c[pid + 1] > c[pid]
                ]
                received = mesh.exchange(outgoing)
                for q in sorted(received):  # deterministic combine order
                    mine.extend(received[q])
                t_route = time.monotonic()

                # (3) owner update of [lo, hi): base + d·contrib, δ² local.
                # leaked is computed from the full OLD rank — gathered from
                # the shared buffer (shared path) or the private copy: the
                # SAME dang_idx order over the same floats either way, so
                # shm-shared and tcp-private vectors stay bit-identical and
                # every task reaches the same stop decision.
                old_full = vecs[cur][0] if shared else rank
                if fam_b:
                    base = (1.0 - d) / n
                else:
                    leaked = float(old_full[dang_idx].sum())
                    base = (leaked + (1.0 - leaked) * (1.0 - d)) / n
                seg = np.full(hi - lo, base, dtype=np.float64)
                if mine:
                    all_u = np.concatenate([u for u, _ in mine])
                    all_s = np.concatenate([s for _, s in mine])
                    seg += d * np.bincount(all_u - lo, weights=all_s, minlength=hi - lo)
                dsq = float(((seg - old_full[lo:hi]) ** 2).sum())

                if shared:
                    # (4, shared) write own segment into the next-parity
                    # host-shared buffer — that IS the allgather; only
                    # scalars + lineage go through the mesh. The scalar
                    # exchange doubles as the barrier that keeps parity
                    # reuse safe: a task reaches iteration k+2 (overwriting
                    # parity k) only after every peer sent its k+1 scalars,
                    # i.e. after every read of parity k has completed.
                    vecs[nxt][0, lo:hi] = seg
                    vecs[nxt][1, lo:hi] = seg * inv_seg
                    got = mesh.exchange(
                        {q: (dsq, pmet) for q in range(P) if q != pid}
                    )
                    dsq_by_pid = {pid: dsq}
                    all_met_by_pid = {pid: pmet}
                    for q, (qdsq, qmet) in got.items():
                        dsq_by_pid[q] = qdsq
                        all_met_by_pid[q] = qmet
                else:
                    # (4) allgather segments (mesh round 2) — every task
                    # re-materializes the full vector, as the reference's
                    # Allgatherv does (pagerank_custom_mpi.h:62-63); per-shard
                    # lineage metrics piggyback so task 0 logs ALL partitions
                    segs = mesh.exchange(
                        {q: (seg, dsq, pmet) for q in range(P) if q != pid}
                    )
                    new = np.empty(n, dtype=np.float64)
                    new[lo:hi] = seg
                    all_met_by_pid = {pid: pmet}
                    dsq_by_pid = {pid: dsq}
                    for q, (qseg, qdsq, qmet) in segs.items():
                        new[int(seg_bounds[q]):int(seg_bounds[q + 1])] = qseg
                        dsq_by_pid[q] = qdsq
                        all_met_by_pid[q] = qmet
                # accumulate δ² in FIXED global pid order (own dsq included
                # at its sorted position, not first): every task sums the
                # same floats in the same order, so a last-ulp difference
                # cannot make tasks disagree on `converged` — a divergent
                # stop decision would deadlock the mesh. Same invariant as
                # the replicate path.
                nsq = 0.0
                all_met = []
                for q in sorted(dsq_by_pid):
                    nsq += dsq_by_pid[q]
                    all_met.extend(all_met_by_pid[q])
                if not shared:
                    rank = new
                norm = float(np.sqrt(nsq))
                converged = bool(check_convergence and norm <= eps)
                done = converged or it >= max_iter
                my_metrics.extend(pmet)
                if pid == 0:
                    full = vecs[nxt][0] if shared else rank
                    iter_log.append(
                        {"iteration": it, "norm": norm, "mass": float(full.sum()),
                         "wall_ms": (time.monotonic() - t0) * 1e3,
                         "kernel_ms": (t_kernel - t0) * 1e3,
                         "route_ms": (t_route - t_kernel) * 1e3,
                         "partitions": len(all_met),
                         "nnz": int(sum(mm["nnz"] for mm in all_met))}
                    )
                    if ckpt_root is not None and (
                        done or it % checkpoint_interval == 0
                    ):
                        from linkgraph.checkpoint import write_iteration_arrays

                        write_iteration_arrays(
                            ckpt_root, run_id, it, ids, np.asarray(full),
                            iter_log[-1],
                            [{"iteration": it, **mm} for mm in all_met],
                        )
                if done:
                    if shared and pid == 0:
                        # materialize before mesh.close() sweeps the tmpfs
                        rank = np.array(vecs[nxt][0])
                    break

            if pid == 0:
                if fam_b:
                    # Family B's ONE final sum-normalization
                    # (pagerank_OCL.h:156-161) — applied exactly once, at
                    # publish; iteration checkpoints stay raw so a resume
                    # continues the genuine leaking trajectory
                    rank = rank / rank.sum()
                # publish the final vector to shard storage (atomic rename)
                # instead of yielding the n-array through collect(): the
                # driver materializes the result table DISTRIBUTED via
                # ShardedGraph.ranks_df — no O(n) driver serialization.
                tmp = rank_out + f".tmp{os.getpid()}.npy"
                np.save(tmp, rank)
                os.replace(tmp, rank_out)
                yield {"kind": "result", "iterations": it,
                       "norm": norm, "converged": converged, "iter_log": iter_log}
            yield {"kind": "task", "pid": pid, "metrics": my_metrics}
        finally:
            mesh.close()
            if steal and pid == 0:
                # safe: every task has finished its final claims before
                # pid 0's last allgather could complete
                shutil.rmtree(claims_root, ignore_errors=True)

    out = sc.parallelize(tasks, P).barrier().mapPartitions(run).collect()
    bc.destroy()
    res = next(o for o in out if o["kind"] == "result")
    ranks_df = g.ranks_df(vector_path=rank_out)  # published by task 0
    if sharded_graph is None:
        # pin the distributed result before the owned temp dir is removed
        ranks_df = ranks_df.localCheckpoint(eager=True)
        g.unpersist()
    return PageRankResult(
        ranks=ranks_df,
        iterations=res["iterations"],
        norm=res["norm"],
        converged=res["converged"],
        iter_metrics=res["iter_log"],
        strategy="barrier",
    )
