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

from pyspark.sql import DataFrame, Window
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


def triangle_incidence(canon: DataFrame) -> DataFrame:
    """[a, b, c1, d1, c2, d2] — one row per (canonical edge, containing
    triangle): the edge (a,b) plus the triangle's other two canonical
    edges (c1,d1), (c2,d2). Exactly 3 rows per triangle. Materialized
    ONCE by truss_decomposition: the h-index rounds then touch only this
    static table + the evolving per-edge level, never re-running the
    wedge join the way the k_truss peel (which shrinks its graph) must."""
    und = canon.select(F.col("a").alias("u"), F.col("b").alias("z")).unionByName(
        canon.select(F.col("b").alias("u"), F.col("a").alias("z"))
    )
    w1 = und.select(F.col("u").alias("a"), "z")
    w2 = und.select(F.col("u").alias("b"), "z")
    tri = canon.join(w1, "a").join(w2, ["b", "z"])  # (a,b) + common nbr z
    return tri.select(
        "a",
        "b",
        F.least("a", "z").alias("c1"),
        F.greatest("a", "z").alias("d1"),
        F.least("b", "z").alias("c2"),
        F.greatest("b", "z").alias("d2"),
    )


def truss_decomposition(
    edges: DataFrame,
    max_iter: int = 200,
    fixed_rounds: int | None = None,
) -> DataFrame:
    """[a, b, trussness] for every canonical edge — trussness(e) = the
    largest k with e in the k-truss (>= 2 always). Peel-free local
    algorithm: with s(e) = trussness(e) - 2, initialize s_0 = support and
    iterate

        s_{t+1}(e) = H({ min(s_t(e1), s_t(e2)) : triangles (e,e1,e2) })

    — the edge analogue of the coreness h-index fixpoint (Sariyuce,
    Seshadhri & Pinar, "Local algorithms for hierarchical dense subgraph
    discovery", PVLDB 12(1), 2018: the h-index iteration converges to
    the nucleus decomposition; (2,3)-nucleus = truss). Monotone
    non-increasing, exact at the fixpoint — equality with the
    independent k_truss peel is pinned in tests for every k.

    Plan: triangle incidence materialized once (3 rows/triangle), then
    per round two composite-key equi-joins (other-edge level lookup) +
    one per-edge window rank + one max aggregate + one change count —
    state is O(#triangles), the inherent footprint of any truss
    algorithm, with the per-round cost independent of how many rounds
    the decomposition needs. ``fixed_rounds`` runs exactly that many
    h-index rounds (the `trussness_r2` contract shape)."""
    canon = _canonical(edges).persist()
    inc = triangle_incidence(canon).persist()
    sup = inc.groupBy("a", "b").agg(F.count(F.lit(1)).alias("s"))
    s = (
        canon.join(sup, ["a", "b"], "left")
        .select("a", "b", F.coalesce(F.col("s"), F.lit(0)).cast("long").alias("s"))
        .localCheckpoint(eager=True)
    )
    rounds = fixed_rounds if fixed_rounds is not None else max_iter
    w = Window.partitionBy("a", "b").orderBy(F.desc("v"))
    for _ in range(rounds):
        lv = s.select(F.col("a").alias("c1"), F.col("b").alias("d1"), F.col("s").alias("s1"))
        rv = s.select(F.col("a").alias("c2"), F.col("b").alias("d2"), F.col("s").alias("s2"))
        vals = (
            inc.join(lv, ["c1", "d1"])
            .join(rv, ["c2", "d2"])
            .select("a", "b", F.least("s1", "s2").alias("v"))
        )
        upd = (
            vals.withColumn("rk", F.row_number().over(w))
            .groupBy("a", "b")
            .agg(F.max(F.least(F.col("rk").cast("long"), F.col("v"))).alias("h"))
        )
        nxt = (
            s.select("a", "b", F.col("s").alias("s_prev"))
            .join(upd, ["a", "b"], "left")
            .select("a", "b", F.coalesce("h", F.lit(0)).cast("long").alias("s"), "s_prev")
            .localCheckpoint(eager=True)
        )
        if fixed_rounds is None:
            changed = nxt.where(F.col("s") != F.col("s_prev")).count()
            s = nxt.select("a", "b", "s")
            if changed == 0:
                break
        else:
            s = nxt.select("a", "b", "s")
    canon.unpersist()
    inc.unpersist()
    return s.select("a", "b", (F.col("s") + 2).alias("trussness"))
