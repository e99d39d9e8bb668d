"""PPR sweep cut — local community detection around a seed set
(Andersen, Chung & Lang, FOCS'06: the PageRank-Nibble recipe).

1. Produce seed-local scores: either k fixed personalized-PageRank power
   iterations (``ppr_sweep`` — the contract-pinned shape) or the
   eps-pruned ACL forward push (``ppr_nibble`` — the O(1/(α·eps))-support
   scale path, operators/push.py).
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
one window cumsum. vol(t) is a window cumsum of degrees. cut/vol are
exact integers.

Scale posture: the support is HARD-BOUNDED before any global window.
``sweep_cut`` truncates the ranked support to the top-``cap`` scores via
a distributed top-k (TakeOrderedAndProject: per-partition heaps + driver
merge — no shuffle of the full support), and only then assigns sweep
positions; every single-partition window in the operator therefore runs
over ≤ cap rows. The truncation is EXACT for the returned curve: for any
prefix t ≤ cap, an edge whose far endpoint ranks beyond the cap
contributes the same +1-and-never−1 delta as an unranked endpoint, so
cut(t)/vol(t)/φ(t) for t ≤ top ≤ cap equal the untruncated sweep's
values (pinned in tests/test_sweep.py). With ``ppr_nibble`` the support
entering the sweep is additionally O(1/(α·eps)) by the push invariant —
independent of graph size — which is the designed 100-TB path.

Sweep ordering is cross-engine stable: positions are assigned on the
floor-scaled key floor(score·1e10 + 0.5) (descending, node-id
tie-break), so structurally-identical vertices whose raw double scores
differ only by partition-order summation ulps order by the id tie-break
identically in Spark and the DuckDB contract twin (plain IEEE ops — no
round() implementation skew; see __spark_entry__._fs).

Engine addition in the §2.9 north-rule family (no analogue in the
reference); the driver contract pins the whole pipeline — k PPR steps,
degree normalization, sweep order, integer cut/vol, φ — against
unrolled-CTE DuckDB oracles (`ppr_sweep`, `ppr_nibble`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ordering-key scale: scores agreeing to 10 dp order identically; beyond
# that the node-id tie-break decides (same expression in the SQL twins,
# via the shared linkgraph/fp.py helper)
_KEY_DIGITS = 10


def sweep_cut(
    edges: DataFrame,
    scores: DataFrame,
    top: int | None = 64,
    cap: int | None = None,
) -> DataFrame:
    """Exact sweep-cut curve [pos, node, score, deg, vol, cut, phi] over
    the degree-normalized score order of ``scores`` ([node, p], p > 0
    rows form the support).

    ``top`` truncates the returned curve; ``cap`` bounds the support that
    enters position assignment (default ``8·top`` — a safety factor so
    the returned prefixes are provably unaffected; ``None`` with
    ``top=None`` means unbounded, contract-scale only). cut/vol stay
    exact w.r.t. the FULL graph for every returned prefix. Prefixes whose
    complement volume is 0 (the final all-support prefix on a fully
    ranked graph) are omitted — φ is undefined there."""
    if cap is None and top is not None:
        cap = 8 * top
    if top is not None and cap is not None and cap < top:
        raise ValueError(f"cap ({cap}) must be >= top ({top})")

    sym = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    und = sym.unionByName(
        sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    deg = und.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )

    from linkgraph.fp import floor_scale_key

    skey = floor_scale_key(F.col("score"), _KEY_DIGITS)
    support = (
        scores.filter(F.col("p") > 0)
        .join(deg, "node")
        .select(
            "node",
            "deg",
            (F.col("p") / F.col("deg")).alias("score"),
        )
        .withColumn("skey", skey)
    )
    if cap is not None:
        # distributed top-k (TakeOrderedAndProject) — the support is
        # bounded BEFORE any single-partition window exists in the plan
        support = support.orderBy(
            F.col("skey").desc(), F.col("node").asc()
        ).limit(cap)
    ranked = support.withColumn(
        "pos",
        F.row_number().over(
            Window.orderBy(F.col("skey").desc(), F.col("node").asc())
        ),
    ).drop("skey")
    # materialize once, lineage cut — used three times below (positions,
    # a-side, b-side); ≤ cap rows, so eager checkpoint is O(cap)
    ranked = ranked.localCheckpoint(eager=True)

    pairs = und.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    ra = ranked.select(F.col("node").alias("a"), F.col("pos").alias("pa"))
    rb = ranked.select(F.col("node").alias("b"), F.col("pos").alias("pb"))
    if cap is not None:
        # position tables are ≤ cap rows: broadcast both sides of the
        # edge join so the full edge table never shuffles
        ra, rb = F.broadcast(ra), F.broadcast(rb)
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
    return curve


def ppr_sweep(
    edges: DataFrame,
    sources: DataFrame,
    k: int = 4,
    d: float = 0.85,
    top: int | None = 64,
    cap: int | None = None,
) -> DataFrame:
    """Sweep-cut curve over the degree-normalized k-step power-PPR order
    (the contract-pinned shape — the scores come from
    pagerank.personalized_pagerank, whose support is the seeds' k-hop
    ball). For graph-size-independent support use ``ppr_nibble``."""
    from linkgraph.operators.pagerank import personalized_pagerank

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    res = personalized_pagerank(
        edges, sources, d=d, eps=0.0, max_iter=k, check_convergence=False
    )
    return sweep_cut(
        edges, res.ranks.select("node", F.col("rank").alias("p")),
        top=top, cap=cap,
    )


def ppr_nibble(
    edges: DataFrame,
    source,
    alpha: float = 0.15,
    eps: float = 1e-4,
    top: int | None = 64,
    cap: int | None = None,
    fixed_rounds: int | None = None,
    max_rounds: int = 200,
) -> DataFrame:
    """PageRank-Nibble (ACL FOCS'06, alg. 2): eps-pruned synchronous
    forward push from ``source`` (operators/push.py — support is
    O(1/(α·eps)) INDEPENDENT of graph size), then the exact sweep-cut
    curve over the push-estimate order. This composition is the designed
    100-TB local-clustering path: no stage ever touches more than the
    push support + its incident edges, and the sweep windows run over
    ≤ cap rows. ``fixed_rounds`` gives the deterministic contract shape;
    the default runs the push to frontier exhaustion."""
    from linkgraph.operators.push import ppr_push

    res = ppr_push(
        edges, source, alpha=alpha, eps=eps,
        max_rounds=max_rounds, fixed_rounds=fixed_rounds,
    )
    return sweep_cut(
        edges, res.scores.select("node", "p"), top=top, cap=cap
    )
