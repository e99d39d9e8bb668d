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


def seeded_label_propagation(
    edges: DataFrame, seeds: DataFrame, max_iter: int = 10
) -> LPAResult:
    """Semi-supervised LPA with CLAMPED seeds (the Zhu & Ghahramani
    label-spreading shape on the hard-label/mode update): ``seeds`` is
    [node, label]; seed vertices broadcast their label but never update;
    every other vertex starts UNLABELED (NULL) and per round takes the
    most frequent label among its LABELED neighbors (ties -> smaller
    label, the repo-standard determinism rule); vertices no seed can
    reach stay NULL. The standard "propagate known communities /
    categories over the graph" primitive.

    Plan per round: identical to ``label_propagation`` — one labeled-
    neighbor join + a two-level count aggregate + the row_number mode —
    plus a seed clamp in the update projection. Early stop when no
    label changes (null-safe comparison)."""
    sym = symmetrize(edges).persist()
    seed_df = seeds.select("node", F.col("label").alias("slabel"))
    labels = (
        vertices(edges)
        .join(seed_df, "node", "left")
        .select(
            "node",
            F.col("slabel").alias("label"),
            F.col("slabel").isNotNull().alias("is_seed"),
        )
        .localCheckpoint(eager=True)
    )
    sym.count()

    metrics: list[dict] = []
    it = 0
    for it in range(1, max_iter + 1):
        neigh = sym.join(
            labels.filter(F.col("label").isNotNull()).select(
                F.col("node").alias("src"), "label"
            ),
            "src",
        ).select(F.col("dst").alias("node"), "label")
        counts = neigh.groupBy("node", "label").agg(F.count("*").alias("cnt"))
        w = Window.partitionBy("node").orderBy(F.desc("cnt"), F.asc("label"))
        best = (
            counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", F.col("label").alias("cand"))
        )
        upd = F.when(F.col("is_seed"), F.col("label")).otherwise(
            F.coalesce(F.col("cand"), F.col("label"))
        )
        new = (
            labels.join(best, "node", "left")
            .select(
                "node",
                upd.alias("label"),
                "is_seed",
                (~upd.eqNullSafe(F.col("label"))).alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new.agg(F.sum(F.col("changed").cast("long")).alias("c")).first()["c"]
            or 0
        )
        labels = new.select("node", "label", "is_seed")
        metrics.append({"iteration": it, "changed": int(changed)})
        if changed == 0:
            break

    sym.unpersist()
    return LPAResult(
        labels=labels.select("node", "label"),
        iterations=it,
        iter_metrics=metrics,
    )
