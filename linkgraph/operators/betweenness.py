"""Sampled betweenness centrality — Brandes' algorithm over a source sample.

North-rule extension (the reference is PageRank-only): betweenness is the
classic "bridge" centrality; exact computation is O(nm) (Brandes, "A faster
algorithm for betweenness centrality", J. Math. Sociol. 2001), so at link-
graph scale everyone runs the sampled estimator (Brandes & Pich 2007):
bc(v) ≈ Σ_{s ∈ sample} δ_s(v), where δ_s is Brandes' dependency of s on v.

Both phases are level-synchronous joins keyed by (source, node) — the same
distributed shape as multi_source_hops (operators/bfs.py):

* FORWARD: BFS levels carrying σ (shortest-path counts). All shortest paths
  to a level-L vertex arrive from level L-1, so σ(v) = Σ σ(u) over frontier
  predecessors — one join + one sum + one anti-join per level.
* BACKWARD: δ(v) = Σ_{w : dist(w) = dist(v)+1, v→w} σ(v)/σ(w) · (1 + δ(w)),
  processed one level at a time from the deepest level down — one join +
  one aggregate per level; a vertex with no successors simply has δ = 0
  (absent row), handled by the left join + coalesce.

Levels = eccentricity of the sample (small for web-ish graphs); every
shuffle is keyed on (source, node); no driver-side state beyond the level
counter. σ/δ are float64 — σ can overflow exact integers on expander-like
graphs beyond ~2^53 paths, the standard float-Brandes caveat.

The whole computation is value-checkable: the contract query unrolls both
phases into fixed-level CTEs (DuckDB), so even the dependency accumulation
is hash-compared cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.operators.degrees import symmetrize


def betweenness_sample(
    edges: DataFrame,
    sources: DataFrame,
    directed: bool = False,
    max_iter: int = 200,
) -> DataFrame:
    """Raw sampled betweenness bc(v) = Σ_{s ∈ sources} δ_s(v) (no
    normalization, sources themselves excluded as v — Brandes' convention);
    vertices no sampled shortest path passes through are absent (bc = 0).
    Returns [node, bc].
    """
    # simple graph required: multi-edges would inflate σ multiplicatively
    e = (
        edges.select("src", "dst").distinct() if directed else symmetrize(edges)
    ).persist()
    frontier = sources.select(
        F.col("node").alias("s"),
        F.col("node").alias("node"),
        F.lit(1.0).alias("sig"),
        F.lit(0).alias("d"),
    ).localCheckpoint(eager=True)
    settled = frontier
    max_level = 0
    for lev in range(1, max_iter + 1):
        cand = (
            frontier.join(e, frontier["node"] == e["src"])
            .groupBy("s", F.col("dst").alias("n2"))
            .agg(F.sum("sig").alias("sig"))
            .withColumnRenamed("n2", "node")
        )
        new = (
            cand.join(settled.select("s", "node"), ["s", "node"], "left_anti")
            .withColumn("d", F.lit(lev))
            .localCheckpoint(eager=True)
        )
        if new.count() == 0:
            break
        settled = settled.union(new).localCheckpoint(eager=True)
        frontier = new
        max_level = lev

    spark = edges.sparkSession
    if max_level == 0:
        e.unpersist()
        return spark.createDataFrame([], "node " + dict(settled.dtypes)["node"] + ", bc double")

    deltas = []  # one sparse [s, node, delta] frame per level (descending)
    delta_above = None  # deltas at level lev+1
    for lev in range(max_level - 1, 0, -1):
        v = settled.filter(F.col("d") == lev).select("s", "node", "sig")
        w = settled.filter(F.col("d") == lev + 1).select(
            "s", F.col("node").alias("wnode"), F.col("sig").alias("wsig")
        )
        if delta_above is not None:
            w = w.join(
                delta_above.select(
                    "s", F.col("node").alias("wnode"), F.col("delta").alias("wdelta")
                ),
                ["s", "wnode"],
                "left",
            ).withColumn("wdelta", F.coalesce(F.col("wdelta"), F.lit(0.0)))
        else:
            w = w.withColumn("wdelta", F.lit(0.0))
        dl = (
            v.join(e, v["node"] == e["src"])
            .join(w, (F.col("dst") == w["wnode"]) & (v["s"] == w["s"]))
            .groupBy(v["s"].alias("s"), v["node"].alias("node"))
            .agg(
                F.sum(
                    F.col("sig") * (1.0 + F.col("wdelta")) / F.col("wsig")
                ).alias("delta")
            )
            .localCheckpoint(eager=True)
        )
        deltas.append(dl)
        delta_above = dl

    e.unpersist()
    if not deltas:
        return spark.createDataFrame([], "node " + dict(settled.dtypes)["node"] + ", bc double")
    all_d = deltas[0]
    for dl in deltas[1:]:
        all_d = all_d.union(dl)
    return all_d.groupBy("node").agg(F.sum("delta").alias("bc"))
