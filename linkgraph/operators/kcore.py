"""k-core extraction: the maximal subgraph in which every vertex has
undirected degree >= k. Standard iterative peel — drop under-degree
vertices, recompute degrees on the induced subgraph, repeat to fixpoint
(O(peel-rounds) Spark jobs; rounds are bounded by the graph's degeneracy
ordering depth, small for power-law graphs).

Graph semantics: direction ignored, self-loops dropped, parallel edges
collapsed (degree = number of distinct neighbors) — the standard simple-
graph definition. Per round: one symmetric-edge semi-join against the
surviving vertex set + one degree aggregate; lineage broken per round via
localCheckpoint like every driver-loop here. The edge table is filtered
monotonically (survivors only shrink), so each round's scan is smaller
than the last.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sym_simple(edges: DataFrame) -> DataFrame:
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    return (
        e.select("src", "dst")
        .union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )


def k_core(edges: DataFrame, k: int, max_rounds: int = 100) -> DataFrame:
    """Returns DataFrame[node] — vertices of the k-core (possibly empty)."""
    if k < 0:
        raise ValueError("k must be >= 0")
    sym = _sym_simple(edges).persist()
    if k <= 1:
        # every non-isolated vertex is in the 1-core; 0-core = all vertices
        from linkgraph.operators.degrees import vertices

        out = vertices(edges) if k == 0 else sym.select(F.col("src").alias("node")).distinct()
        sym.unpersist()
        return out

    cur = sym
    cur_m = None  # carried edge count: one count action per round, not two
    for _ in range(max_rounds):
        deg = cur.groupBy("src").count()
        survivors = deg.where(F.col("count") >= k).select(F.col("src").alias("node"))
        nxt = (
            cur.join(survivors.withColumnRenamed("node", "src"), "src", "left_semi")
            .join(
                survivors.select(F.col("node").alias("dst")), "dst", "left_semi"
            )
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        # fixpoint when no edge was peeled this round; the previous round's
        # count is carried (first round pays one extra count on sym)
        if cur_m is None:
            cur_m = cur.count()
        nxt_m = nxt.count()
        if nxt_m == cur_m:
            cur = nxt
            break
        cur, cur_m = nxt, nxt_m
    sym.unpersist()
    return cur.select(F.col("src").alias("node")).distinct()
