"""Synchronous PPR forward push — the ACL approximate-PageRank primitive
(Andersen, Chung & Lang, FOCS'06) in its deterministic batched form.

State per vertex: estimate p and residual r (init: r = 1 at the seed,
everything else 0). Per round, EVERY vertex with r > eps pushes at once:

    p_v += alpha · r_v
    each out-neighbor u of v receives (1-alpha) · r_v / outdeg(v)
    r_v  := 0 (plus anything v itself receives this round)

The classic sequential push processes one vertex at a time, which makes
the result order-dependent; pushing the whole over-threshold frontier
synchronously is order-free and DETERMINISTIC — the same fixpoint
guarantees hold (p approximates the α-teleport PPR with per-vertex
residual error ≤ eps·outdeg after termination) and every round is
value-reproducible across engines, so the driver contract can hash a
fixed round count against an unrolled-CTE DuckDB twin and tests can pin
a pure-python replica to 1e-12.

Why this exists next to pagerank.personalized_pagerank: the power loop
pays O(k·m) — every iteration touches every edge. The push touches only
the ACTIVE frontier's out-edges; for local clustering around a seed the
total work is O(1/(alpha·eps)) INDEPENDENT of graph size — the designed
100-TB path for seed-local scores (the same residual argument as the
streaming delta-push maintenance in streaming/rank.py, here as a batch
operator). Every round is one frontier-filtered edge join + one
vertex-keyed aggregate + an outer merge, all join/agg-rooted (safe
checkpoint shape per linkgraph/lineage.py).

Dangling vertices (outdeg 0) cannot push; their residual simply stays —
the standard ACL treatment on directed graphs (their mass is the
approximation slack). Use a symmetrized edge table for the undirected
setting, where dangling vertices don't exist.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.operators.degrees import out_degrees, vertices


@dataclass
class PushResult:
    scores: DataFrame  # [node, p, r] — p estimate, r remaining residual
    rounds: int
    iter_metrics: list[dict] = field(default_factory=list)


def ppr_push(
    edges: DataFrame,
    source,
    alpha: float = 0.15,
    eps: float = 1e-4,
    max_rounds: int = 200,
    fixed_rounds: int | None = None,
) -> PushResult:
    """Seed-local approximate PPR via synchronous threshold push.

    ``alpha`` is the teleport probability (ACL convention: p accumulates
    alpha·r per push). ``eps`` is the residual push threshold — smaller
    eps = larger support and tighter approximation. ``fixed_rounds``
    runs exactly that many rounds with no convergence check (the
    deterministic contract-query shape); otherwise the loop stops when
    no vertex holds r > eps (or raises after ``max_rounds``)."""
    if not (0.0 < alpha < 1.0):
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    if eps <= 0.0:
        raise ValueError(f"eps must be > 0, got {eps}")
    if fixed_rounds is not None and fixed_rounds < 1:
        raise ValueError(f"fixed_rounds must be >= 1, got {fixed_rounds}")

    e = edges.select("src", "dst").persist()
    od = out_degrees(e)
    state = (
        vertices(e)
        .join(od, "node", "left")
        .select(
            "node",
            F.coalesce("out_deg", F.lit(0)).alias("od"),
            F.lit(0.0).alias("p"),
            F.when(F.col("node") == F.lit(source), 1.0).otherwise(0.0).alias("r"),
        )
        .localCheckpoint(eager=True)
    )
    e.count()

    metrics: list[dict] = []
    rounds = 0
    n_rounds = fixed_rounds if fixed_rounds is not None else max_rounds
    for rounds in range(1, n_rounds + 1):
        # active = pushable frontier: over-threshold residual AND outdeg>0
        # (dangling residual has nowhere to go and would loop forever)
        active = F.col("r") > F.lit(eps)
        pushable = active & (F.col("od") > 0)
        spread = (
            state.filter(pushable)
            .join(e, state.node == e.src)
            .groupBy(F.col("dst").alias("node"))
            .agg(
                F.sum(F.lit(1.0 - alpha) * F.col("r") / F.col("od")).alias("inc")
            )
        )
        new = (
            state.join(spread, "node", "left")
            .select(
                "node",
                "od",
                (
                    F.col("p")
                    + F.when(pushable, F.lit(alpha) * F.col("r")).otherwise(0.0)
                ).alias("p"),
                (
                    F.when(pushable, F.lit(0.0)).otherwise(F.col("r"))
                    + F.coalesce("inc", F.lit(0.0))
                ).alias("r"),
            )
            .localCheckpoint(eager=False)
        )
        agg = new.agg(
            F.sum((( F.col("r") > F.lit(eps)) & (F.col("od") > 0)).cast("long")).alias("act"),
            F.sum("r").alias("resid"),
        ).first()
        old = state
        state = new.persist()
        old.unpersist()
        metrics.append(
            {"round": rounds, "active_next": int(agg["act"] or 0),
             "residual_mass": float(agg["resid"] or 0.0)}
        )
        if fixed_rounds is None and (agg["act"] or 0) == 0:
            break
    else:
        if fixed_rounds is None:
            e.unpersist()
            state.unpersist()
            raise RuntimeError(
                f"ppr_push did not drain the frontier within max_rounds="
                f"{max_rounds}; raise max_rounds or eps"
            )
    e.unpersist()
    return PushResult(
        scores=state.select("node", "p", "r"), rounds=rounds, iter_metrics=metrics
    )
