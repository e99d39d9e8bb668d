"""Connected components — iterative min-label hash-join propagation.

The exact algorithm the north rule names: every vertex starts with label =
own id; each round, every vertex takes the min of its label and its
neighbors' labels (undirected view); fixpoint when no label changes.
Convergence in O(diameter) rounds; each round is one hash join + one hash
aggregate, with lineage cut per round (localCheckpoint — the iterative-loop
analogue of the reference's rank-buffer swap, /root/reference/helpers/helper.h:24-28).

The reference itself has no components operator (it is PageRank-only); this
is an engine addition required by BASELINE.json north_rule, built from the
same join/agg primitives as the PageRank contribution step (SURVEY §2.9).

Per-round driver scalar = changed-label count (same pattern as the PageRank
convergence readback, pagerank_custom.h:261-268). Labels are exact — tests
assert set-equality with a union-find oracle, not allclose.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.operators.degrees import symmetrize, vertices


@dataclass
class ComponentsResult:
    components: DataFrame  # [node: long, component: long] — component = min node id
    iterations: int
    iter_metrics: list[dict] = field(default_factory=list)


def connected_components(edges: DataFrame, max_iter: int = 100) -> ComponentsResult:
    sym = symmetrize(edges).persist()
    labels = vertices(edges).select("node", F.col("node").alias("component")).persist()
    sym.count()

    metrics: list[dict] = []
    it = 0
    for it in range(1, max_iter + 1):
        # neighbor-min message: label(src) delivered to dst (sym has both
        # directions, so one join covers both propagation senses)
        msgs = (
            sym.join(labels, sym.src == labels.node, "inner")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("component").alias("cand"))
        )
        new = (
            labels.join(msgs, "node", "left")
            .select(
                "node",
                F.least(F.col("component"), F.coalesce(F.col("cand"), F.col("component"))).alias(
                    "component"
                ),
                (
                    F.least(F.col("component"), F.coalesce(F.col("cand"), F.col("component")))
                    != F.col("component")
                ).alias("changed"),
            )
            .localCheckpoint(eager=False)
        )
        changed = new.agg(F.sum(F.col("changed").cast("long")).alias("c")).first()["c"] or 0
        old = labels
        labels = new.select("node", "component").persist()
        old.unpersist()
        metrics.append({"iteration": it, "changed": int(changed)})
        if changed == 0:
            break

    sym.unpersist()
    return ComponentsResult(components=labels, iterations=it, iter_metrics=metrics)
