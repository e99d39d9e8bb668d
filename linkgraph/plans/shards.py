"""Partitioned adjacency shards — the engine's physical layout for iteration.

This is the Spark-first re-expression of the reference's distributed design
(/root/reference/main_mpi.c:67-154 + the OpenCL kernels):

reference                                   | here
--------------------------------------------|----------------------------------
contiguous node blocks sized by edge count  | dst-range buckets with
(main_mpi.c:88-108)                         | edge-balanced boundaries from
                                            | approxQuantile over the EDGE
                                            | table (quantiles of dst weighted
                                            | by edge multiplicity = the degree
                                            | CDF, SURVEY §4 X4)
JDS degree-bucketing of skewed rows         | explicit hub split: vertices with
(readers/mtx_hybrid.h:39-221)               | in_degree > threshold get their
                                            | in-edge lists SALTED across
                                            | dedicated shards; partial sums
                                            | combined in a second level
                                            | (SURVEY §4 X3)
MPI_Allgatherv of the dense rank vector     | per-iteration broadcast of the
every iteration (pagerank_custom_mpi.h:62)  | rank ndarray to executors
OpenCL gather-scatter kernels               | numpy gather + np.unique/bincount
(kernels/pr_custom_matrix_in.cl:112-268)    | scatter inside mapInArrow
per-iteration scalar readback               | one toPandas() of per-shard
(pagerank_custom.h:261-268)                 | partial sums + metrics

Scale notes (100 TB / 1000-executor design):

* The build is 3 shuffles total, all one-time: vertex index (sort),
  edge→index join (hash/broadcast, AQE-skew-safe), repartition to shards.
  Iterations reuse the persisted shards — ZERO shuffle per iteration.
* Per-iteration driver traffic is O(n_distinct_dst + hubs·salts) partial
  sums, not O(edges): dst-locality from range bucketing keeps each dst in
  ~1 shard (hubs in `salts` shards).
* The dense broadcast vector caps this fast path at rank vectors that fit
  executor memory (~10^9 vertices at 8 B/vertex) — the same envelope as
  the reference's MPI Allgatherv. Beyond that, `pagerank_dataframe` is the
  unbounded join-gather fallback (SURVEY §3.3).
* Shard count is tuned from the edge count (`tune_shuffle_partitions`) —
  the north rule's per-iteration shuffle tuning applies to the build and
  to the fallback path's per-iteration joins.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
from pyspark import TaskContext
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkgraph.operators.degrees import out_degrees, vertices

# target edges per shard/partition task — small enough to fit comfortably in
# executor memory with headroom (per-edge state here is 3×8 B), large enough
# to amortize task overhead. ~8M edges ≈ 200 MB working set.
TARGET_EDGES_PER_SHARD = 8_000_000


def tune_shuffle_partitions(spark: SparkSession, m_edges: int, floor: int | None = None) -> int:
    """Pick shuffle/shard parallelism from observed edge mass (north rule:
    'shuffle partitioning tuned per iteration'). Called before every shuffle
    stage whose input size we know."""
    cores = spark.sparkContext.defaultParallelism
    floor = floor or cores
    p = max(floor, math.ceil(m_edges / TARGET_EDGES_PER_SHARD))
    spark.conf.set("spark.sql.shuffle.partitions", str(p))
    return p


_STEP_SCHEMA = (
    "kind int, idx long, contrib double, part_id int, nnz long, rows long, wall_ms double"
)


def _make_step(bc_rank):
    """Arrow kernel: per shard, gather rank[src]·w and partially reduce by
    dst (np.unique + bincount — the scatter side of the reference's SpMV
    kernels). Emits (kind=0) partial sums + one (kind=1) lineage/metrics row."""

    def step(batches):
        rank = bc_rank.value
        t0 = time.monotonic()
        us: list[np.ndarray] = []
        ss: list[np.ndarray] = []
        nnz = 0
        for b in batches:
            src = b.column("src_idx").to_numpy(zero_copy_only=False)
            dst = b.column("dst_idx").to_numpy(zero_copy_only=False)
            w = b.column("weight").to_numpy(zero_copy_only=False)
            contrib = rank[src] * w
            u, inv = np.unique(dst, return_inverse=True)
            us.append(u)
            ss.append(np.bincount(inv, weights=contrib))
            nnz += len(src)
        if us:
            u_all = np.concatenate(us)
            s_all = np.concatenate(ss)
            u, inv = np.unique(u_all, return_inverse=True)
            s = np.bincount(inv, weights=s_all)
        else:
            u = np.empty(0, dtype=np.int64)
            s = np.empty(0, dtype=np.float64)
        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        wall_ms = (time.monotonic() - t0) * 1e3
        k = len(u)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(np.concatenate([np.zeros(k, np.int32), np.array([1], np.int32)])),
                pa.array(np.concatenate([u.astype(np.int64), np.array([-1], np.int64)])),
                pa.array(np.concatenate([s, np.array([0.0])])),
                pa.array(np.full(k + 1, pid, np.int32)),
                pa.array(np.concatenate([np.zeros(k, np.int64), np.array([nnz], np.int64)])),
                pa.array(np.concatenate([np.zeros(k, np.int64), np.array([k], np.int64)])),
                pa.array(np.concatenate([np.zeros(k), np.array([wall_ms])])),
            ],
            names=["kind", "idx", "contrib", "part_id", "nnz", "rows", "wall_ms"],
        )

    return step


@dataclass
class ShardedGraph:
    """Persisted, indexed, edge-balanced + hub-salted shards ready to iterate."""

    spark: SparkSession
    shards: DataFrame  # [src_idx, dst_idx, weight] repartitioned & cached
    node_ids: np.ndarray  # sorted long[n]; idx = position (driver copy)
    dangling_mask: np.ndarray  # bool[n]
    n: int
    m: int
    num_shards: int
    hub_count: int
    hub_threshold: int

    @staticmethod
    def build(
        edges: DataFrame,
        num_shards: int | None = None,
        hub_salt_factor: float = 1.0,
        buckets_per_shard: int = 2,
    ) -> "ShardedGraph":
        """One-time build (3 shuffles): index vertices, weight+index edges,
        bucket by edge-balanced dst ranges with hub salting, cache."""
        spark = edges.sparkSession

        # 1) dense vertex index: sorted node ids -> idx = row position.
        #    zipWithIndex is the distributed densification (the reference does
        #    this with a driver dict, py_src/prepare_graph.py:15-23).
        verts = vertices(edges)
        mapping_rdd = verts.orderBy("node").rdd.map(lambda r: r[0]).zipWithIndex()
        mapping = spark.createDataFrame(mapping_rdd, "node: long, idx: long").persist()
        n = mapping.count()
        if n == 0:
            raise ValueError("ShardedGraph.build: empty graph")

        # 2) weighted + indexed edges (loop-invariant gather hoisting, X1)
        od = out_degrees(edges)
        m = edges.count()
        num_shards = num_shards or tune_shuffle_partitions(spark, m)
        wedges = (
            edges.join(od, edges.src == od.node, "inner")
            .select("src", "dst", (F.lit(1.0) / F.col("out_deg").cast("double")).alias("weight"))
            .join(mapping.select(F.col("node").alias("src"), F.col("idx").alias("src_idx")), "src")
            .join(mapping.select(F.col("node").alias("dst"), F.col("idx").alias("dst_idx")), "dst")
            .select("src_idx", "dst_idx", "weight")
        )

        # 3) edge-balanced dst buckets: quantiles of dst_idx over EDGES weight
        #    each vertex by its in-degree — the degree-CDF partitioning of
        #    main_mpi.c:88-108 without collecting the CDF.
        n_buckets = num_shards * buckets_per_shard
        probs = [i / n_buckets for i in range(1, n_buckets)]
        bounds = wedges.stat.approxQuantile("dst_idx", probs, 0.01) if n_buckets > 1 else []
        bounds_arr = F.array(*[F.lit(int(b)) for b in bounds])
        bucket = F.size(F.filter(bounds_arr, lambda b: b <= F.col("dst_idx")))

        # 4) hub split (X3): in-degree above threshold -> salt in-edges across
        #    `salts` dedicated bucket ids so no single task owns a hub row.
        hub_threshold = max(1, int(hub_salt_factor * m / num_shards))
        in_deg = wedges.groupBy("dst_idx").agg(F.count("*").alias("in_deg"))
        hubs = in_deg.filter(F.col("in_deg") > hub_threshold).collect()
        hub_count = len(hubs)
        if hub_count:
            hub_salts = {
                int(h["dst_idx"]): int(math.ceil(h["in_deg"] / hub_threshold)) for h in hubs
            }
            salt_map = F.create_map(
                *[F.lit(x) for kv in hub_salts.items() for x in kv]
            )
            offsets = {}
            off = n_buckets
            for h, s in sorted(hub_salts.items()):
                offsets[h] = off
                off += s
            offset_map = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
            salted = offset_map[F.col("dst_idx")] + F.pmod(
                F.xxhash64("src_idx"), salt_map[F.col("dst_idx")]
            )
            part = F.when(salt_map[F.col("dst_idx")].isNotNull(), salted).otherwise(bucket)
        else:
            part = bucket

        shards = (
            wedges.withColumn("part", part.cast("int"))
            .repartition(num_shards, "part")
            .select("src_idx", "dst_idx", "weight")
            .persist()
        )
        shards.count()  # materialize

        # driver-side vertex state (same envelope as the MPI design's
        # per-rank dense vector): sorted node ids + dangling mask
        mp = mapping.orderBy("idx").toPandas()
        node_ids = mp["node"].to_numpy()
        src_nodes = {r["node"] for r in od.select("node").collect()} if n < 5_000_000 else None
        if src_nodes is not None:
            dangling_mask = np.array([nid not in src_nodes for nid in node_ids])
        else:
            dang = (
                mapping.join(od.select("node"), "node", "left_anti").select("idx").toPandas()
            )
            dangling_mask = np.zeros(n, dtype=bool)
            dangling_mask[dang["idx"].to_numpy()] = True
        mapping.unpersist()

        return ShardedGraph(
            spark=spark,
            shards=shards,
            node_ids=node_ids,
            dangling_mask=dangling_mask,
            n=n,
            m=m,
            num_shards=num_shards,
            hub_count=hub_count,
            hub_threshold=hub_threshold,
        )

    def spmv_partials(self, rank: np.ndarray):
        """One distributed SpMV pass: returns (idx, partial_contrib,
        per-partition metrics pandas DF). The only Spark action per iteration."""
        bc = self.spark.sparkContext.broadcast(rank)
        try:
            pdf = self.shards.mapInArrow(_make_step(bc), _STEP_SCHEMA).toPandas()
        finally:
            bc.destroy()
        contribs = pdf[pdf["kind"] == 0]
        metrics = pdf[pdf["kind"] == 1][["part_id", "nnz", "rows", "wall_ms"]]
        return (
            contribs["idx"].to_numpy(),
            contribs["contrib"].to_numpy(),
            metrics,
        )

    def unpersist(self):
        self.shards.unpersist()
