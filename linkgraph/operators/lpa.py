"""Label propagation — synchronous, deterministic (SURVEY §2.9).

Semantics (fixed so results are exactly reproducible, north rule: label
assignments match EXACTLY):

* undirected neighbor view (multi-edges collapse: neighbor multiplicity from
  the deduped symmetrized edge set);
* every round, each vertex with >=1 neighbor takes the most frequent label
  among its neighbors; ties broken by the SMALLER label; isolated vertices
  keep their label;
* all vertices update simultaneously (synchronous); fixed ``max_iter``
  rounds with early stop when no label changes.

One join + one two-level aggregate per round; the mode-with-tiebreak is a
row_number window over (count desc, label asc) — all Catalyst built-ins.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph.operators.degrees import symmetrize, vertices


@dataclass
class LPAResult:
    labels: DataFrame  # [node: long, label: long]
    iterations: int
    iter_metrics: list[dict] = field(default_factory=list)


def label_propagation(edges: DataFrame, max_iter: int = 10) -> LPAResult:
    sym = symmetrize(edges).persist()
    labels = vertices(edges).select("node", F.col("node").alias("label")).persist()
    sym.count()

    metrics: list[dict] = []
    it = 0
    for it in range(1, max_iter + 1):
        neigh = sym.join(labels, sym.src == labels.node, "inner").select(
            F.col("dst").alias("node"), "label"
        )
        counts = neigh.groupBy("node", "label").agg(F.count("*").alias("cnt"))
        w = Window.partitionBy("node").orderBy(F.desc("cnt"), F.asc("label"))
        best = (
            counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", F.col("label").alias("cand"))
        )
        new = (
            labels.join(best, "node", "left")
            .select(
                "node",
                F.coalesce(F.col("cand"), F.col("label")).alias("label"),
                (F.coalesce(F.col("cand"), F.col("label")) != F.col("label")).alias("changed"),
            )
            .localCheckpoint(eager=False)
        )
        changed = new.agg(F.sum(F.col("changed").cast("long")).alias("c")).first()["c"] or 0
        old = labels
        labels = new.select("node", "label").persist()
        old.unpersist()
        metrics.append({"iteration": it, "changed": int(changed)})
        if changed == 0:
            break

    sym.unpersist()
    return LPAResult(labels=labels, iterations=it, iter_metrics=metrics)
