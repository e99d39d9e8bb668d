"""HITS (Kleinberg hubs & authorities) — the second classic power-iteration
link metric; shares the engine's gather/reduce shape with PageRank
(SURVEY §2.3 J1 / §2.4 A2: SpMV as equi-join + hash aggregate) but
alternates direction: authorities pull over in-edges, hubs over out-edges.

Update (L1-normalized each half-step, converging on the L2 delta of the
authority vector):

    a'[v] = Σ_{(u,v)∈E} h[u]     then  a' /= Σ a'
    h'[u] = Σ_{(u,v)∈E} a'[v]    then  h' /= Σ h'

Multi-edges contribute multiplicity (same keep-multi-edge semantics as the
PageRank path, SURVEY §1.4). Plan shape per iteration: two equi-join +
partial/final hash-aggregate rounds and exactly TWO actions — a_tot (forced
by the a->h data dependency), then one combined aggregate for (h_tot, L2
delta); hub normalization is a lazy literal division on the checkpointed
plan. Lineage broken per iteration via localCheckpoint exactly like
pagerank_dataframe (operators/pagerank.py X5).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.operators.degrees import vertices


@dataclass
class HitsResult:
    scores: DataFrame  # [node, hub, authority]
    iterations: int
    norm: float
    converged: bool
    iter_metrics: list = field(default_factory=list)


def hits(
    edges: DataFrame,
    eps: float = 1e-8,
    max_iter: int = 100,
    check_convergence: bool = True,
) -> HitsResult:
    e = edges.select("src", "dst").persist()
    verts = vertices(edges).persist()
    n = verts.count()
    if n == 0:
        raise ValueError("hits: empty graph (no vertices in edge table)")
    e.count()

    state = verts.select(
        "node", F.lit(1.0 / n).alias("hub"), F.lit(1.0 / n).alias("authority")
    ).persist()

    norm = float("inf")
    converged = False
    metrics: list[dict] = []
    it = 0
    for it in range(1, max_iter + 1):
        t0 = time.monotonic()
        a_raw = (
            e.join(state.select(F.col("node"), "hub"), e.src == F.col("node"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("a_raw"))
        )
        a_tot = float(a_raw.agg(F.sum("a_raw")).first()[0] or 0.0)
        if a_tot == 0.0:
            break  # no edges: uniform fixpoint already held
        a = a_raw.select("node", (F.col("a_raw") / F.lit(a_tot)).alias("a_new"))
        h_raw = (
            e.join(a.select(F.col("node"), "a_new"), e.dst == F.col("node"))
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("a_new").alias("h_raw"))
        )
        # TWO actions per iteration, not three: a_tot above is forced by the
        # a->h data dependency, but the L2 delta is on the (already
        # a_tot-normalized) authority column, so h_tot piggybacks into the
        # same aggregate (the pagerank_dataframe one-action pattern,
        # operators/pagerank.py:135-141) and the hub normalization is applied
        # lazily as a literal on the checkpointed plan.
        new_state = (
            state.join(a, "node", "left")
            .join(h_raw, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("h_raw"), F.lit(0.0)).alias("h_raw"),
                F.coalesce(F.col("a_new"), F.lit(0.0)).alias("authority"),
                F.col("authority").alias("a_old"),
            )
            .localCheckpoint(eager=False)
        )
        agg = new_state.agg(
            F.sum(F.pow(F.col("authority") - F.col("a_old"), 2)).alias("sq"),
            F.sum("h_raw").alias("h_tot"),
        ).first()
        norm = float(agg["sq"]) ** 0.5
        h_tot = float(agg["h_tot"] or 0.0)
        old = state
        state = new_state.select(
            "node", (F.col("h_raw") / F.lit(h_tot)).alias("hub"), "authority"
        ).persist()
        old.unpersist()
        metrics.append(
            {"iteration": it, "norm": norm,
             "wall_ms": (time.monotonic() - t0) * 1e3}
        )
        if check_convergence and norm <= eps:
            converged = True
            break

    e.unpersist()
    verts.unpersist()
    return HitsResult(
        scores=state, iterations=it, norm=norm, converged=converged,
        iter_metrics=metrics,
    )
