"""Single-source weighted shortest paths — synchronous Bellman-Ford rounds.

The weighted companion of BFS hop distances (operators/bfs.py): cost(v) =
minimum over paths of Σ edge weights. Delta-stepping (Meyer & Sanders 2003)
is the classic distributed refinement; the synchronous relax-all-edges round
(Bellman-Ford) is its Δ=∞ special case and the natural Spark shape — one
hash join + min-aggregate + outer-join-least per round, exactly the
min-label components / BFS loop, so the 100×-scale posture is identical
(shuffles keyed on the vertex id, rounds ≤ the weighted-path hop bound,
lineage cut per round, no driver state).

Weights must be non-negative (negative cycles diverge; the round cap
bounds the damage but results are then meaningless — the standard BF
caveat). Float determinism: each round computes min(previous, prev_cost +
w) with a fixed evaluation shape, so the k-round table is bit-reproducible
and the contract query (sssp_r4) value-hashes against a k-unrolled CTE
oracle computing the identical recurrence.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.operators.degrees import symmetrize, vertices


@dataclass
class SsspResult:
    distances: DataFrame  # [node, cost] — cost NULL = unreachable
    iterations: int
    iter_metrics: list[dict] = field(default_factory=list)


def shortest_paths(
    edges: DataFrame,
    source,
    weight_col: str = "cost",
    directed: bool = True,
    max_iter: int = 200,
    check_convergence: bool = True,
) -> SsspResult:
    """[node, cost] minimum weighted path cost from ``source`` (NULL when
    unreachable). With ``check_convergence=False`` runs exactly
    ``max_iter`` relaxation rounds (the fixed-round contract shape)."""
    if directed:
        e = edges.select("src", "dst", F.col(weight_col).alias("w"))
    else:
        # undirected: relax both directions with the same weight
        fwd = edges.select("src", "dst", F.col(weight_col).alias("w"))
        rev = edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"),
            F.col(weight_col).alias("w"),
        )
        e = fwd.unionByName(rev)
    e = e.persist()
    dist = (
        vertices(edges)
        .select(
            "node",
            F.when(F.col("node") == F.lit(source), F.lit(0.0)).alias("cost"),
        )
        .persist()
    )
    e.count()

    metrics: list[dict] = []
    it = 0
    for it in range(1, max_iter + 1):
        cand = (
            e.join(dist.filter(F.col("cost").isNotNull()), e["src"] == F.col("node"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min(F.col("cost") + F.col("w")).alias("cand"))
        )
        new = (
            dist.join(cand, "node", "left")
            .select(
                "node",
                F.least(F.col("cost"), F.col("cand")).alias("_c"),
                (
                    F.coalesce(F.least(F.col("cost"), F.col("cand")), F.lit(-1.0))
                    != F.coalesce(F.col("cost"), F.lit(-1.0))
                ).alias("chg"),
            )
            .withColumnRenamed("_c", "cost")
            .localCheckpoint(eager=False)
        )
        if check_convergence:
            changed = new.agg(F.sum(F.col("chg").cast("long"))).first()[0] or 0
            metrics.append({"iteration": it, "relaxed": int(changed)})
        else:
            changed = -1
        old = dist
        dist = new.select("node", "cost").persist()
        old.unpersist()
        if changed == 0:
            break

    e.unpersist()
    return SsspResult(distances=dist, iterations=it, iter_metrics=metrics)


def symmetrized_cost_edges(edges: DataFrame) -> DataFrame:
    """Helper for conversation graphs: simple undirected edge list with
    cost = 1 / transition count (heavier reply traffic = shorter
    distance), counts summed over both directions first so the cost is
    direction-symmetric. Returns [src, dst, cost] with src < dst once per
    undirected edge."""
    cnt = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return cnt.select("src", "dst", (F.lit(1.0) / F.col("cnt")).alias("cost"))
