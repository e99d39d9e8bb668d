"""Single-source BFS hop distances — frontier-free min-distance propagation.

The remaining classic link-graph primitive next to PageRank/HITS/CC/SCC/
LPA/triangles/k-core: dist(v) = minimum hop count from a source vertex.
Same O(diameter)-round join+aggregate loop shape as min-label components
(operators/components.py) — one hash join + hash aggregate + changed-count
action per round, lineage cut per round, no driver-side graph state — so
the 100x-scale posture is identical: shuffles keyed on the vertex id,
frontier skew absorbed by AQE. The propagation is monotone (distances only
decrease), so a vertex re-relaxes only when a strictly shorter path
arrives; rounds = eccentricity of the source.

Exact: tests pin against a pure-Python BFS; the contract query
hash-compares against a DuckDB recursive-CTE walk.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.operators.degrees import symmetrize, vertices


@dataclass
class BfsResult:
    distances: DataFrame  # [node, dist] — dist NULL = unreachable
    iterations: int
    iter_metrics: list[dict] = field(default_factory=list)


def hop_distances(
    edges: DataFrame,
    source,
    directed: bool = True,
    max_iter: int = 200,
) -> BfsResult:
    """[node, dist] minimum hop count from ``source`` (NULL when
    unreachable). ``directed=False`` walks the undirected view."""
    e = (edges.select("src", "dst") if directed else symmetrize(edges)).persist()
    dist = (
        vertices(edges)
        .select(
            "node",
            F.when(F.col("node") == F.lit(source), F.lit(0).cast("long")).alias("dist"),
        )
        .persist()
    )
    e.count()

    metrics: list[dict] = []
    it = 0
    for it in range(1, max_iter + 1):
        msgs = (
            e.join(dist.filter(F.col("dist").isNotNull()), e.src == F.col("node"))
            .groupBy(F.col("dst").alias("node"))
            .agg((F.min("dist") + 1).alias("cand"))
        )
        new = (
            dist.join(msgs, "node", "left")
            .select(
                "node",
                F.least(F.col("dist"), F.col("cand")).alias("_d"),
                (
                    F.coalesce(F.least(F.col("dist"), F.col("cand")), F.lit(-1))
                    != F.coalesce(F.col("dist"), F.lit(-1))
                ).alias("chg"),
            )
            .withColumnRenamed("_d", "dist")
            .localCheckpoint(eager=False)
        )
        changed = new.agg(F.sum(F.col("chg").cast("long"))).first()[0] or 0
        old = dist
        dist = new.select("node", "dist").persist()
        old.unpersist()
        metrics.append({"iteration": it, "relaxed": int(changed)})
        if changed == 0:
            break

    e.unpersist()
    return BfsResult(distances=dist, iterations=it, iter_metrics=metrics)
