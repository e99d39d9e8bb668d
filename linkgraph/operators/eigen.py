"""Eigenvector centrality — L2-normalized power iteration.

Completes the spectral-centrality family (pagerank.py: stochastic-matrix
fixpoint; hits.py: A^T A / A A^T pair; katz.py: damped resolvent):
x_{t+1} = A^T x_t / ||A^T x_t||_2, converging to the principal
eigenvector of A^T when the graph is strongly connected / aperiodic
(Bonacich, "Power and centrality: a family of measures", AJS 1987). No
damping, no teleport: vertices with no incoming walks from the dominant
component genuinely get 0 — callers on arbitrary graphs who need
irreducibility should use PageRank; this operator is the textbook
semantics the others are compared against.

Plan per iteration, the familiar one-action shape: equi-join gather of
x[src] along edges + dst-keyed partial+final sum, then ONE aggregate
action returning (sum raw^2, sum raw*old, sum old^2) together — the
normalization scalar l2 = sqrt(sum raw^2) AND the convergence delta
||raw/l2 - old||^2 = 1 - 2*cross/l2 + oldsq come out of the same job
(the delta is expanded algebraically so it never needs the normalized
vector materialized first), exactly pagerank_dataframe's piggyback
discipline. The division by l2 is a lazy column on the kept DataFrame.

Scale: O(m) shuffle per iteration, O(1) driver scalars.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.operators.degrees import vertices


@dataclass
class EigenResult:
    scores: DataFrame  # [node, score]
    iterations: int
    norm: float  # L2 delta between successive normalized vectors
    converged: bool
    iter_metrics: list = field(default_factory=list)


def eigenvector_centrality(
    edges: DataFrame,
    eps: float = 1e-8,
    max_iter: int = 200,
    check_convergence: bool = True,
    weight_col: str | None = None,
) -> EigenResult:
    """x_0 = 1/sqrt(n); x_{t+1} = normalize(A^T x_t). Parallel edges sum
    to multiplicity weights (``weight_col`` overrides). With
    ``check_convergence`` the loop stops when the L2 delta between
    successive normalized vectors is <= eps; a zero iterate (e.g. a DAG
    whose sources feed nothing back) raises rather than dividing by 0."""
    spark = edges.sparkSession
    if weight_col is None:
        we = edges.select("src", "dst", F.lit(1.0).alias("w"))
    else:
        we = edges.select("src", "dst", F.col(weight_col).cast("double").alias("w"))
    we = we.groupBy("src", "dst").agg(F.sum("w").alias("w")).persist()
    verts = vertices(edges).persist()
    n = verts.count()
    if n == 0:
        raise ValueError("eigenvector_centrality: empty graph")

    x = verts.withColumn("score", F.lit(1.0 / n**0.5)).persist()
    norm = float("inf")
    converged = False
    metrics: list[dict] = []
    it = 0
    for it in range(1, max_iter + 1):
        t0 = time.monotonic()
        raw = (
            we.join(x.select(F.col("node").alias("src"), "score"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("score") * F.col("w")).alias("raw"))
        )
        nxt = (
            x.select("node", F.col("score").alias("score_old"))
            .join(raw, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("raw"), F.lit(0.0)).alias("raw"),
                "score_old",
            )
            .localCheckpoint(eager=False)
        )
        # ONE action: l2 norm + delta vs old, via the algebraic expansion
        # ||raw/l2 - old||^2 = sum(raw^2)/l2^2 - 2*sum(raw*old)/l2 + sum(old^2)
        agg = nxt.agg(
            F.sum(F.pow("raw", 2)).alias("sq"),
            F.sum(F.col("raw") * F.col("score_old")).alias("cross"),
            F.sum(F.pow("score_old", 2)).alias("oldsq"),
        ).first()
        l2 = float(agg["sq"]) ** 0.5
        if l2 == 0.0:
            we.unpersist()
            verts.unpersist()
            raise ValueError(
                "eigenvector_centrality: iterate collapsed to 0 — the graph "
                "has no recurrent mass (use pagerank for irreducibility)"
            )
        dsq = 1.0 - 2.0 * float(agg["cross"]) / l2 + float(agg["oldsq"])
        norm = max(0.0, dsq) ** 0.5
        old = x
        x = nxt.select(
            "node", (F.col("raw") / F.lit(l2)).alias("score")
        ).persist()
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
    return EigenResult(
        scores=x, iterations=it, norm=norm, converged=converged,
        iter_metrics=metrics,
    )
