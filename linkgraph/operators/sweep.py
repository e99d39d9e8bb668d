"""PPR sweep cut — local community detection around a seed set
(Andersen, Chung & Lang, FOCS'06: the PageRank-Nibble recipe).

1. Run k fixed personalized-PageRank iterations from the seed set
   (operators/pagerank.py personalized_pagerank — same loop, same
   dangling-mass-to-teleport semantics).
2. Order the support by the degree-normalized score p(v)/deg(v)
   (descending, vertex id tie-break) over the simple undirected view.
3. For every prefix S_t of that order report vol(S_t), cut(S_t) and the
   conductance φ(S_t) = cut / min(vol, vol(G) − vol) — the sweep curve
   whose argmin is the ACL-certified local cluster.

The cut curve needs NO per-prefix edge scan: an undirected edge {u, v}
with sweep positions r_u < r_v is cut exactly for prefixes
r_u ≤ t < r_v (an edge with one unranked endpoint stays cut for every
t ≥ r_u), so cut(t) is the running sum of +1 deltas at min-positions and
−1 deltas at both-ranked max-positions — two position-keyed counts and
one window cumsum. vol(t) is a window cumsum of degrees. Everything
after the PPR loop is one sort of the SUPPORT (not the graph) plus
Catalyst window functions; cut/vol are exact integers.

Scale posture: the PPR loop is the vertex-keyed join+agg plan audited in
pagerank.py; the sweep itself touches only the support, which for local
clustering is the point — with an eps-pruned push (streaming/rank.py's
residual machinery) the support is O(1/(α·eps)) independent of graph
size, and ``top`` bounds the returned curve. The single-partition window
over the support is the driver-visible cost; at 100 TB you cap the
support (top · a safety factor) before the sort, which the `top`
parameter does here.

Engine addition in the §2.9 north-rule family (no analogue in the
reference); the driver contract pins the whole pipeline — k PPR steps,
degree normalization, sweep order, integer cut/vol, φ — against an
unrolled-CTE DuckDB oracle (`ppr_sweep`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ppr_sweep(
    edges: DataFrame,
    sources: DataFrame,
    k: int = 4,
    d: float = 0.85,
    top: int | None = 64,
) -> DataFrame:
    """Sweep-cut curve [pos, node, score, deg, vol, cut, phi] over the
    degree-normalized k-step PPR order; ``top`` truncates the returned
    curve (cut/vol stay exact w.r.t. the FULL graph). Prefixes whose
    complement volume is 0 (the final all-support prefix on a fully
    ranked graph) are omitted — φ is undefined there."""
    from linkgraph.operators.pagerank import personalized_pagerank

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    res = personalized_pagerank(
        edges, sources, d=d, eps=0.0, max_iter=k, check_convergence=False
    )

    sym = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    und = sym.unionByName(
        sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().persist()
    deg = und.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )

    ranked = (
        res.ranks.filter(F.col("rank") > 0)
        .join(deg, "node")
        .select(
            "node",
            "deg",
            (F.col("rank") / F.col("deg")).alias("score"),
        )
        .withColumn(
            "pos",
            F.row_number().over(
                Window.orderBy(F.col("score").desc(), F.col("node").asc())
            ),
        )
        .persist()
    )

    pairs = und.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    ra = ranked.select(F.col("node").alias("a"), F.col("pos").alias("pa"))
    rb = ranked.select(F.col("node").alias("b"), F.col("pos").alias("pb"))
    epos = (
        pairs.join(ra, "a", "left")
        .join(rb, "b", "left")
        .filter(F.col("pa").isNotNull() | F.col("pb").isNotNull())
        .select(
            F.when(F.col("pa").isNull(), F.col("pb"))
            .when(F.col("pb").isNull(), F.col("pa"))
            .otherwise(F.least("pa", "pb"))
            .alias("minp"),
            F.when(
                F.col("pa").isNotNull() & F.col("pb").isNotNull(),
                F.greatest("pa", "pb"),
            ).alias("maxp"),
        )
    )
    deltas = (
        epos.groupBy(F.col("minp").alias("pos"))
        .agg(F.count(F.lit(1)).alias("delta"))
        .unionByName(
            epos.filter(F.col("maxp").isNotNull())
            .groupBy(F.col("maxp").alias("pos"))
            .agg((-F.count(F.lit(1))).alias("delta"))
        )
        .groupBy("pos")
        .agg(F.sum("delta").alias("delta"))
    )

    wpos = Window.orderBy("pos")
    vol_all = deg.agg(F.sum("deg")).first()[0] or 0
    curve = (
        ranked.join(deltas, "pos", "left")
        .select(
            "pos",
            "node",
            "score",
            "deg",
            F.sum("deg").over(wpos).alias("vol"),
            F.sum(F.coalesce("delta", F.lit(0))).over(wpos).alias("cut"),
        )
        .withColumn(
            "phi",
            F.when(
                F.least(F.col("vol"), F.lit(int(vol_all)) - F.col("vol")) > 0,
                F.col("cut")
                / F.least(F.col("vol"), F.lit(int(vol_all)) - F.col("vol")),
            ),
        )
        .filter(F.col("phi").isNotNull())
    )
    if top is not None:
        curve = curve.filter(F.col("pos") <= top)
    und.unpersist()
    return curve
