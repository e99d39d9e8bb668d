"""Katz centrality — damped path counting by synchronous power iteration.

Complements the random-surfer centralities (pagerank.py, hits.py) with
the third classic of the family (Katz, "A new status index derived from
sociometric analysis", Psychometrika 1953): x = beta*1 + alpha*A^T x,
whose fixed point sums all incoming walks weighted alpha^length —
convergent iff alpha < 1/lambda_max(A). Unlike PageRank there is no
row-normalization and no dangling handling: mass is NOT conserved, so
the operator is a pure linear recurrence — which makes the loop body
exactly expressible as an unrolled SQL CTE (the `katz_k4` oracle) with
no float-division noise beyond the multiply-add itself.

Plan per iteration, identical shape to pagerank_dataframe's: one
equi-join gather of x[src] along edges + one hash aggregate keyed by
dst + one left join back onto the vertex set (in-degree-0 vertices keep
the beta base), lineage cut per iteration, and ONE action piggybacking
the L2 delta — no extra convergence job.

Scale: O(m) shuffle per iteration, O(1) driver state (the delta
scalar). Skewed in-hubs land on the hash aggregate's partial/final
combine — map-side partial aggregation absorbs the skew exactly as in
the PageRank step.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.operators.degrees import vertices


@dataclass
class KatzResult:
    scores: DataFrame  # [node, katz]
    iterations: int
    norm: float
    converged: bool
    iter_metrics: list = field(default_factory=list)


def katz_centrality(
    edges: DataFrame,
    alpha: float = 0.1,
    beta: float = 1.0,
    eps: float = 1e-9,
    max_iter: int = 200,
    check_convergence: bool = True,
    weight_col: str | None = None,
    normalize: bool = False,
) -> KatzResult:
    """x_{t+1}(v) = beta + alpha * sum over in-edges (u,v) of w(u,v) *
    x_t(u), from x_0 = beta*1 (so k fixed iterations count walks up to
    length k exactly — the contract-query shape). ``normalize`` divides
    the final vector by its L2 norm (the networkx convention); default
    off keeps the raw walk-sum semantics the SQL oracle reproduces.

    alpha must satisfy alpha * lambda_max < 1 for the fixpoint to exist;
    with ``check_convergence`` a diverging run simply stops at max_iter
    with ``converged=False`` — the caller sees the truth either way."""
    if alpha <= 0:
        raise ValueError("alpha must be > 0")
    spark = edges.sparkSession
    if weight_col is None:
        we = edges.select("src", "dst", F.lit(1.0).alias("w"))
    else:
        we = edges.select("src", "dst", F.col(weight_col).cast("double").alias("w"))
    we = we.groupBy("src", "dst").agg(F.sum("w").alias("w")).persist()
    verts = vertices(edges).persist()
    n = verts.count()
    if n == 0:
        raise ValueError("katz: empty graph (no vertices in edge table)")

    x = verts.withColumn("katz", F.lit(float(beta))).persist()
    norm = float("inf")
    converged = False
    metrics: list[dict] = []
    it = 0
    for it in range(1, max_iter + 1):
        t0 = time.monotonic()
        contribs = (
            we.join(x.select(F.col("node").alias("src"), "katz"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("katz") * F.col("w")).alias("c"))
        )
        nxt = (
            x.select("node", F.col("katz").alias("katz_old"))
            .join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(float(beta))
                    + F.lit(float(alpha)) * F.coalesce(F.col("c"), F.lit(0.0))
                ).alias("katz"),
                "katz_old",
            )
            .localCheckpoint(eager=False)
        )
        agg = nxt.agg(
            F.sum(F.pow(F.col("katz") - F.col("katz_old"), 2)).alias("sq")
        ).first()
        norm = float(agg["sq"]) ** 0.5
        old = x
        x = nxt.select("node", "katz").persist()
        old.unpersist()
        metrics.append(
            {"iteration": it, "norm": norm,
             "wall_ms": (time.monotonic() - t0) * 1e3}
        )
        if check_convergence and norm <= eps:
            converged = True
            break
    we.unpersist()
    verts.unpersist()
    if normalize:
        l2 = float(
            x.agg(F.sqrt(F.sum(F.pow("katz", 2))).alias("l2")).first()["l2"]
        )
        x = x.withColumn("katz", F.col("katz") / F.lit(l2))
    return KatzResult(
        scores=x, iterations=it, norm=norm, converged=converged,
        iter_metrics=metrics,
    )
