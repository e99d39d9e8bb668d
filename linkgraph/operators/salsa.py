"""SALSA — stochastic hubs & authorities (Lempel & Moran, "SALSA: the
stochastic approach for link-structure analysis", ACM TOIS 19(2), 2001).

HITS's mutual-reinforcement loop with the adjacency replaced by its
ROW-STOCHASTIC normalizations, i.e. a random walk alternating a
backward and a forward step on the directed graph:

    a'[v] = Σ_{(u,v)∈E} h[u] / out_deg(u)
    h'[u] = Σ_{(u,v)∈E} a'[v] / in_deg(v)

Degree normalization makes the update mass-CONSERVING on the subgraph
of vertices with the relevant degree (the walk never leaves), which is
what removes HITS's topic-drift / TKC effect: the stationary authority
weight of a connected support component is proportional to in-degree
within it. Multi-edges contribute multiplicity, consistent with the
PageRank/HITS semantics here (SURVEY §1.4).

Plan per iteration: two equi-join + dst/src-keyed hash-aggregate rounds
against LOOP-INVARIANT degree-normalized edge weights (built once,
persisted — the expand_out_degrees discipline of SURVEY §2.3 J2), and
exactly ONE action computing the L2 authority delta; no normalization
scalar is needed at all because the update conserves mass. Vertices
outside the walk's support (no in-edges / no out-edges respectively)
keep score 0 via the left join.

Scale: O(m) shuffle per iteration, O(1) driver scalars — the PageRank
step's footprint twice per round.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.operators.degrees import vertices


@dataclass
class SalsaResult:
    scores: DataFrame  # [node, hub, authority]
    iterations: int
    norm: float
    converged: bool
    iter_metrics: list = field(default_factory=list)


def salsa(
    edges: DataFrame,
    eps: float = 1e-9,
    max_iter: int = 100,
    check_convergence: bool = True,
) -> SalsaResult:
    """Authority/hub vectors initialized uniform (1/n each); per
    iteration one backward then one forward stochastic step, stopping on
    the L2 delta of the authority vector. Fixed-iteration runs
    (``check_convergence=False``) are the `salsa_k3` contract shape."""
    e = edges.select("src", "dst").persist()
    verts = vertices(edges).persist()
    n = verts.count()
    if n == 0:
        raise ValueError("salsa: empty graph (no vertices in edge table)")
    # loop-invariant normalized weights: 1/out_deg(src) and 1/in_deg(dst)
    od = e.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    idg = e.groupBy("dst").agg(F.count(F.lit(1)).alias("id"))
    we = (
        e.join(od, "src")
        .join(idg, "dst")
        .select(
            "src", "dst",
            (1.0 / F.col("od")).alias("w_bwd"),  # h/out_deg step
            (1.0 / F.col("id")).alias("w_fwd"),  # a/in_deg step
        )
        .persist()
    )
    we.count()
    state = verts.select(
        "node", F.lit(1.0 / n).alias("hub"), F.lit(1.0 / n).alias("authority")
    ).persist()

    norm = float("inf")
    converged = False
    metrics: list[dict] = []
    it = 0
    for it in range(1, max_iter + 1):
        t0 = time.monotonic()
        a_new = (
            we.join(
                state.select(F.col("node").alias("src"), "hub"), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("hub") * F.col("w_bwd")).alias("a_raw"))
        )
        h_new = (
            we.join(a_new.select(F.col("node").alias("dst"), "a_raw"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum(F.col("a_raw") * F.col("w_fwd")).alias("h_raw"))
        )
        nxt = (
            state.select("node", F.col("authority").alias("a_old"))
            .join(a_new, "node", "left")
            .join(h_new, "node", "left")
            .select(
                "node",
                F.coalesce("h_raw", F.lit(0.0)).alias("hub"),
                F.coalesce("a_raw", F.lit(0.0)).alias("authority"),
                "a_old",
            )
            .localCheckpoint(eager=False)
        )
        agg = nxt.agg(
            F.sum(F.pow(F.col("authority") - F.col("a_old"), 2)).alias("sq")
        ).first()
        norm = float(agg["sq"]) ** 0.5
        old = state
        state = nxt.select("node", "hub", "authority").persist()
        old.unpersist()
        metrics.append(
            {"iteration": it, "norm": norm,
             "wall_ms": (time.monotonic() - t0) * 1e3}
        )
        if check_convergence and norm <= eps:
            converged = True
            break
    e.unpersist()
    we.unpersist()
    verts.unpersist()
    return SalsaResult(
        scores=state, iterations=it, norm=norm, converged=converged,
        iter_metrics=metrics,
    )
