"""k-truss extraction: the maximal subgraph in which every edge is
supported by at least k-2 triangles (Cohen, "Trusses: cohesive subgraphs
for social network analysis", NSA tech report 2008).

Standard iterative peel on the SIMPLE undirected graph (self-loops dropped,
multi-edges collapsed): compute per-edge support = |N(a) ∩ N(b)|, drop
edges with support < k-2, recompute on the induced subgraph, repeat to
fixpoint. Rounds are bounded by the truss peeling depth (small in
practice); each round's edge table only shrinks, so scans get cheaper as
the loop proceeds.

Plan per round: the support count is a wedge join keyed by the common
neighbor — canonical edge (a, b) joined to und(a→z) and und(b→z) on z,
then one groupBy (a, b). Two shuffle hash joins + one aggregate + one count
action per round (previous round's edge count is carried, mirroring
operators/kcore.py). Lineage is cut per round via eager localCheckpoint.

No reference implementation exists (the reference is PageRank-only); the
operator extends the §2.9 triangle family. The fixed-round peel used by
the `ktruss_r2` contract query is exposed as `truss_peel_round` so the
loop BODY is value-checked against an unrolled-CTE DuckDB oracle the same
way kcore_r3 / pagerank_k5 are.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical(edges: DataFrame) -> DataFrame:
    """Simple undirected edge set, one row per edge, a < b."""
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    return (
        e.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )


def edge_support(canon: DataFrame) -> DataFrame:
    """[a, b, support] for every canonical edge: support = number of common
    neighbors of a and b within the canonical edge set (edges in no
    triangle get support 0 via the left join)."""
    und = canon.select(F.col("a").alias("u"), F.col("b").alias("z")).unionByName(
        canon.select(F.col("b").alias("u"), F.col("a").alias("z"))
    )
    w1 = und.select(F.col("u").alias("a"), "z")
    w2 = und.select(F.col("u").alias("b"), "z")
    sup = (
        canon.join(w1, "a").join(w2, ["b", "z"]).groupBy("a", "b").agg(
            F.count("*").alias("support")
        )
    )
    return canon.join(sup, ["a", "b"], "left").select(
        "a", "b", F.coalesce(F.col("support"), F.lit(0)).alias("support")
    )


def truss_peel_round(canon: DataFrame, k: int) -> DataFrame:
    """One peel round: canonical edges whose support within `canon` is
    >= k-2. The loop body of k_truss, shared with the ktruss_r2 oracle."""
    return edge_support(canon).where(F.col("support") >= k - 2).select("a", "b")


def k_truss(edges: DataFrame, k: int, max_rounds: int = 100) -> DataFrame:
    """Returns DataFrame[a, b, support] — the canonical (a < b) edges of the
    k-truss with their final within-truss support (possibly empty)."""
    if k < 2:
        raise ValueError("k must be >= 2")
    canon = _canonical(edges)
    if k == 2:
        # every edge is trivially in the 2-truss (support >= 0)
        return edge_support(canon)

    cur = canon.localCheckpoint(eager=True)
    cur_m = None
    for _ in range(max_rounds):
        sup = edge_support(cur)
        nxt = (
            sup.where(F.col("support") >= k - 2)
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        if cur_m is None:
            cur_m = cur.count()
        nxt_m = nxt.count()
        if nxt_m == cur_m:
            # converged: `sup` was computed on cur == final edge set
            return sup.where(F.col("support") >= k - 2)
        cur, cur_m = nxt, nxt_m
    return edge_support(cur)
