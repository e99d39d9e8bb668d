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

from linkgraph.lineage import cut
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


def multi_source_hops(
    edges: DataFrame,
    sources: DataFrame,
    directed: bool = True,
    max_iter: int = 200,
) -> BfsResult:
    """Hop distances from EVERY source in ``sources`` ([node]) in one
    frontier loop — the K-source building block for harmonic/closeness
    centrality estimates. Returns [source, node, dist] for REACHED pairs
    only (dist 0 = the source itself); unreached pairs are simply absent.

    Plan: the settled set is keyed by (source, node); each round joins only
    the NEW frontier against the edge table (BFS level order means a
    settled pair never improves, so frontier-only propagation is exact),
    min-combines per (source, dst), and anti-joins against the settled set
    — one join + one aggregate + one anti-join + one count action per
    round, lineage cut by localCheckpoint. At 100 TB: state is
    O(K·reached), shuffles keyed on (source, node); K is the sampling
    knob (Eppstein-Wang style estimators use K = O(log n / ε²))."""
    e = (edges.select("src", "dst") if directed else symmetrize(edges)).persist()
    settled = (
        sources.select(
            F.col("node").alias("source"),
            F.col("node").alias("node"),
            F.lit(0).cast("long").alias("dist"),
        )
        .localCheckpoint(eager=True)
    )
    frontier = settled
    metrics: list[dict] = []
    it = 0
    for it in range(1, max_iter + 1):
        cand = (
            frontier.join(e, frontier["node"] == e["src"])
            .groupBy("source", F.col("dst").alias("n2"))
            .agg((F.min("dist") + 1).alias("dist"))
            .withColumnRenamed("n2", "node")
        )
        new = cand.join(settled, ["source", "node"], "left_anti").localCheckpoint(
            eager=True
        )
        n_new = new.count()
        metrics.append({"iteration": it, "settled": int(n_new)})
        if n_new == 0:
            break
        # shuffle-rooted cut: settled-set union over the previous
        # checkpoint — the narrow-union lineage-compounding shape
        # (linkgraph/lineage.py)
        settled = cut(settled.union(new))
        frontier = new
    e.unpersist()
    return BfsResult(distances=settled, iterations=it, iter_metrics=metrics)


def harmonic_centrality(
    edges: DataFrame,
    sources: DataFrame,
    directed: bool = False,
    max_iter: int = 200,
) -> DataFrame:
    """Harmonic centrality restricted to a source sample: H(v) = Σ_{s ∈
    sources, s ≠ v, reachable} 1 / dist(s, v) (Boldi & Vigna, "Axioms for
    centrality", 2014 — the sampled form is the standard scalable
    estimator; exact when sources = all vertices). Returns
    [node, n_sources, harmonic] for nodes reached by at least one source."""
    hops = multi_source_hops(edges, sources, directed=directed, max_iter=max_iter)
    return (
        hops.distances.filter(F.col("dist") > 0)
        .groupBy("node")
        .agg(
            F.count(F.lit(1)).alias("n_sources"),
            F.sum(1.0 / F.col("dist")).alias("harmonic"),
        )
    )


def effective_diameter(
    edges: DataFrame,
    sources: DataFrame,
    q: float = 0.9,
    directed: bool = False,
    max_iter: int = 200,
) -> DataFrame:
    """Sampled effective diameter: the smallest hop distance d such that at
    least fraction ``q`` of the reached (source, node) pairs (dist ≥ 1) lie
    within d — the integer-valued form of the classic "90% effective
    diameter" (Leskovec-Kleinberg-Faloutsos KDD'05 use the interpolated
    variant; the integer form is exact and engine-portable). Also returns
    the sample's max distance (a diameter lower bound) and the pair count.
    Returns one row [n_pairs, max_dist, eff_diameter].

    Plan: multi_source_hops → per-distance counts (tiny: one row per
    distinct hop value) → running-sum window over that tiny table."""
    from pyspark.sql import Window as W

    hops = multi_source_hops(edges, sources, directed=directed, max_iter=max_iter)
    per_d = (
        hops.distances.filter(F.col("dist") > 0)
        .groupBy("dist")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = W.orderBy("dist").rowsBetween(W.unboundedPreceding, 0)
    cum = per_d.withColumn("cum", F.sum("c").over(w)).withColumn(
        "total", F.sum("c").over(W.partitionBy())
    )
    return cum.agg(
        F.max("total").alias("n_pairs"),
        F.max("dist").alias("max_dist"),
        F.min(
            F.when(F.col("cum") >= F.lit(q) * F.col("total"), F.col("dist"))
        ).alias("eff_diameter"),
    )


def closeness_centrality(
    edges: DataFrame,
    sources: DataFrame,
    directed: bool = False,
    max_iter: int = 200,
) -> DataFrame:
    """Per-source closeness over the sampled source set: for each s,
    c_raw(s) = (r-1) / Σ_v dist(s, v) with r = |reached(s)| (exact for
    each sampled source — the BFS gives s's full distance vector), plus
    the Wasserman-Faust disconnected-graph correction
    c_wf(s) = ((r-1)/(n-1)) · c_raw(s) (the networkx default). Isolated
    sources (r = 1) get 0 for both. Returns
    [source, n_reached, closeness, closeness_wf].

    Same frontier-loop footprint as harmonic_centrality — one
    multi-source BFS, then a per-source aggregate over the settled
    (source, node, dist) pairs."""
    from linkgraph.operators.degrees import vertices

    n = vertices(edges).count()
    hops = multi_source_hops(edges, sources, directed=directed, max_iter=max_iter)
    agg = hops.distances.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_reached"),
        F.sum("dist").alias("dist_sum"),
    )
    raw = F.when(
        F.col("dist_sum") > 0,
        (F.col("n_reached") - 1) / F.col("dist_sum"),
    ).otherwise(F.lit(0.0))
    return agg.select(
        "source",
        "n_reached",
        raw.alias("closeness"),
        (raw * (F.col("n_reached") - 1) / F.lit(max(n - 1, 1))).alias(
            "closeness_wf"
        ),
    )
