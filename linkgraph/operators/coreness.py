"""Per-vertex core number (coreness) via the distributed h-index fixpoint.

``k_core(edges, k)`` (operators/kcore.py) answers one membership question
per k; coreness answers all of them at once: core(v) = the largest k such
that v belongs to the k-core. The sequential algorithm is a global peel —
inherently serial — but Lu, Chen, Ren, Zhang, Zhou & Stanley ("The
H-index of a network node and its relation to degree and coreness",
Nature Communications 7:10168, 2016) show the h-index operator converges
to exactly the core number from the degree initialization:

    h_0(v)     = deg(v)
    h_{t+1}(v) = H({ h_t(u) : u in N(v) })

where H(multiset) is the h-index — the largest k with at least k values
>= k. Each h_t is a pointwise upper bound on coreness, the sequence is
monotone non-increasing, and the fixpoint IS coreness. Rounds needed are
bounded by the longest "degeneracy chain"; small in practice (power-law
graphs converge in a few dozen rounds).

Spark plan per round: one equi-join (neighbor h lookup, shuffle keyed by
vertex id) + one window ``row_number`` partitioned by vertex (partition
size = degree; sort is per-neighborhood, never global) + one hash
aggregate. H({x_i sorted desc}) = max_i min(i, x_i), so the window rank
turns the h-index into a plain max aggregate — pure Catalyst, no UDF.
Convergence = one count action per round over changed vertices; lineage
cut per round via localCheckpoint like every driver loop here.

Graph semantics match k_core: direction ignored, self-loops dropped,
parallel edges collapsed (degree = distinct-neighbor count). Isolated
vertices (e.g. self-loop-only) have coreness 0.

Scale: state is one int64 per vertex, exchanged along edges once per
round — the same O(m) shuffle as a PageRank step. Hub windows are
single-neighborhood sorts (the 1-task-per-hot-key concern shared with any
per-neighborhood operator; at 100x the degree-ordered cap applies only to
wedge-style ops — a sort of one hub's 10^7 neighbor values is linear work
and spills gracefully). Exactness vs k_core is pinned in tests:
{v : coreness(v) >= k} == k_core(k) for several k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph.operators.degrees import vertices


def _sym_simple(edges: DataFrame) -> DataFrame:
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    return (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )


def _h_index_round(sym: DataFrame, h: DataFrame) -> DataFrame:
    """One h-index refinement: h'(v) = H({h(u) : u ~ v}) as
    max(min(rank_desc, neighbor_h)) — [node, h]. Vertices absent from
    ``sym`` (isolated) are not emitted; the caller re-attaches them."""
    nbr = sym.join(
        h.select(F.col("node").alias("dst"), F.col("h").alias("nh")), "dst"
    ).select(F.col("src").alias("node"), "nh")
    w = Window.partitionBy("node").orderBy(F.desc("nh"))
    return (
        nbr.withColumn("rk", F.row_number().over(w))
        .groupBy("node")
        .agg(F.max(F.least(F.col("rk").cast("long"), F.col("nh"))).alias("h"))
    )


def coreness(
    edges: DataFrame,
    max_iter: int = 200,
    fixed_rounds: int | None = None,
) -> DataFrame:
    """[node, h] — per-vertex core number at the h-index fixpoint (or the
    monotone upper bound after exactly ``fixed_rounds`` refinement rounds,
    the contract-query shape; round 0 is the degree initialization)."""
    sym = _sym_simple(edges).persist()
    verts = vertices(edges).localCheckpoint(eager=True)
    deg = sym.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("long").alias("h")
    )
    h = (
        verts.join(deg, "node", "left")
        .select("node", F.coalesce("h", F.lit(0).cast("long")).alias("h"))
        .localCheckpoint(eager=True)
    )
    rounds = fixed_rounds if fixed_rounds is not None else max_iter
    for _ in range(rounds):
        upd = _h_index_round(sym, h)
        nxt = (
            h.select("node", F.col("h").alias("h_prev"))
            .join(upd, "node", "left")
            .select(
                "node",
                F.coalesce("h", "h_prev").alias("h"),
                F.col("h_prev"),
            )
            .localCheckpoint(eager=True)
        )
        if fixed_rounds is None:
            changed = nxt.where(F.col("h") != F.col("h_prev")).count()
            h = nxt.select("node", "h")
            if changed == 0:
                break
        else:
            h = nxt.select("node", "h")
    sym.unpersist()
    return h
