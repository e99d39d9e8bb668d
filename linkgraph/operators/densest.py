"""Densest-subgraph extraction via (2+2ε)-approximate parallel peeling.

Density here is the standard average-degree objective rho(S) = |E(S)|/|S|
over the undirected simple graph (direction ignored, self-loops dropped,
parallel edges collapsed — the same graph semantics as kcore.py). The
exact optimum needs flow; the scalable classic is Bahmani, Kumar &
Vassilvitskii ("Densest subgraph in streaming and MapReduce", PVLDB 2012):
repeatedly delete EVERY vertex whose induced degree is at most
2(1+eps)·rho(S) in one shot, remember the densest intermediate S, and the
best S seen is within 2(1+eps) of optimal after only O(log_{1+eps} n)
rounds — each round a degree aggregate + a semi-join, exactly the shape
that survives a 1000-executor cluster (contrast the sequential
one-vertex-at-a-time Charikar peel, which needs n rounds).

Implementation notes:
* One pass assigns each vertex its PEEL ROUND (like a coarse degeneracy
  ordering); the per-round (n, m, density) trajectory is a tiny
  O(log n)-row table, so "remember the best S" is a driver-side argmax
  over that table plus one filter ``peel_round >= best_round`` — no
  per-round vertex-set snapshots.
* Each round filters the symmetric edge table monotonically (survivors
  only shrink) through a localCheckpoint, so round r scans only the
  surviving edges — the same peel discipline as k_core.
* Fully deterministic for a given eps: the threshold rule has no ties to
  break (ALL under-threshold vertices go at once).

Reference parity note: the reference engine (C/OpenCL PageRank,
/root/reference) has no densest-subgraph operator; this is an engine
addition in the k-core/truss family (SURVEY.md §2.9 extensions), with the
contract oracle `densest_r2` unrolling two peel rounds in ANSI SQL.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.operators.kcore import _sym_simple


@dataclass
class DensestResult:
    members: DataFrame  # [node] — vertices of the densest intermediate S
    rounds: DataFrame   # [round, n_nodes, m_edges, density] trajectory
    best_round: int
    best_density: float
    approx_factor: float  # 2(1+eps): best_density >= optimum / this


def densest_subgraph(
    edges: DataFrame, eps: float = 0.1, max_rounds: int = 200
) -> DensestResult:
    """Greedy parallel peel. Returns the densest intermediate subgraph's
    vertex set, the per-round trajectory, and the proven approximation
    factor. ``eps`` trades rounds for tightness (rounds ~ log_{1+eps} n)."""
    if eps <= 0:
        raise ValueError("eps must be > 0 (eps=0 degenerates to n rounds)")
    spark = edges.sparkSession
    sym = _sym_simple(edges).localCheckpoint(eager=True)

    peeled: list[DataFrame] = []  # [node, peel_round] pieces
    traj: list[tuple[int, int, int, float]] = []
    cur = sym
    rnd = 0
    while rnd < max_rounds:
        stats = cur.agg(
            F.count(F.lit(1)).alias("m2"),  # directed copies = 2|E(S)|
            F.countDistinct("src").alias("n"),
        ).first()
        n_s, m2 = int(stats["n"]), int(stats["m2"])
        if n_s == 0:
            break
        density = (m2 / 2.0) / n_s
        traj.append((rnd, n_s, m2 // 2, density))
        thresh = 2.0 * (1.0 + eps) * density
        deg = cur.groupBy("src").count()
        gone = deg.where(F.col("count") <= thresh).select(
            F.col("src").alias("node")
        )
        peeled.append(
            gone.select("node", F.lit(rnd).alias("peel_round"))
            .localCheckpoint(eager=True)
        )
        survivors = deg.where(F.col("count") > thresh).select(
            F.col("src").alias("node")
        )
        cur = (
            cur.join(survivors.withColumnRenamed("node", "src"), "src", "left_semi")
            .join(survivors.select(F.col("node").alias("dst")), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )
        rnd += 1
        # termination: min degree <= average degree = 2·rho <= thresh, so
        # every round removes at least one vertex

    if not traj:
        raise ValueError("densest_subgraph: graph has no non-self-loop edges")
    best_round, _, _, best_density = max(traj, key=lambda t: (t[3], -t[0]))
    order = peeled[0]
    for p in peeled[1:]:
        order = order.unionByName(p)
    members = order.where(F.col("peel_round") >= best_round).select("node")
    rounds_df = spark.createDataFrame(
        traj, "round int, n_nodes long, m_edges long, density double"
    )
    return DensestResult(
        members=members,
        rounds=rounds_df,
        best_round=best_round,
        best_density=best_density,
        approx_factor=2.0 * (1.0 + eps),
    )


def densest_round_stats(
    edges: DataFrame, eps: float = 0.1, n_rounds: int = 2
) -> DataFrame:
    """The first ``n_rounds`` rows of the peel trajectory as a DataFrame
    [round, n_nodes, m_edges, density] computed LAZILY (no driver loop
    actions) — the SQL-unrollable form backing the `densest_r2` contract
    oracle. Matches densest_subgraph's trajectory rows exactly."""
    sym = _sym_simple(edges)
    out = None
    cur = sym
    for rnd in range(n_rounds):
        deg = cur.groupBy("src").count()
        stats = deg.agg(
            F.sum("count").alias("m2"),
            F.count(F.lit(1)).alias("n"),
        ).select(
            F.lit(rnd).alias("round"),
            F.col("n").alias("n_nodes"),
            (F.col("m2") / 2).cast("long").alias("m_edges"),
            (F.col("m2") / 2.0 / F.col("n")).alias("density"),
        )
        out = stats if out is None else out.unionByName(stats)
        if rnd + 1 < n_rounds:
            dens = (
                deg.agg((F.sum("count") / 2.0 / F.count(F.lit(1))).alias("rho"))
            )
            survivors = (
                deg.crossJoin(dens)
                .where(F.col("count") > 2.0 * (1.0 + eps) * F.col("rho"))
                .select(F.col("src").alias("node"))
            )
            cur = cur.join(
                survivors.withColumnRenamed("node", "src"), "src", "left_semi"
            ).join(survivors.select(F.col("node").alias("dst")), "dst", "left_semi")
    return out.where(F.col("n_nodes") > 0)
