"""Bow-tie decomposition of a directed link graph.

The Broder et al. structure-of-the-web analysis ("Graph structure in
the Web", Computer Networks 33, 2000): relative to the largest
strongly-connected component (the CORE), every vertex is exactly one of

* ``CORE``          — member of the largest SCC (ties on size broken by
                      the minimum component label, so deterministic);
* ``IN``            — reaches the CORE but is not in it;
* ``OUT``           — reachable from the CORE but not in it (IN and OUT
                      are automatically disjoint: a vertex that both
                      reaches and is reached by the CORE is mutually
                      reachable with it, i.e. IS core);
* ``TENDRIL``       — weakly connected to the CORE but none of the
                      above (Broder's TENDRILS and TUBES, merged: both
                      are "attached but not through the core");
* ``DISCONNECTED``  — in a different weak component.

This is the canonical macro-analysis of exactly the graph family the
reference benchmarks PageRank on (web-Google,
/root/reference/pr_submit.sh:30), composed entirely from operators this
engine already certifies: SCC (trim+coloring), undirected connected
components, and two frontier set-closures.

Plan shape: one SCC run, one 1-row top-component aggregate
(TakeOrdered, broadcast back as a semi-join), forward and backward
frontier BFS from the core SET (each round = one edge hash join + one
anti-join against the reached set, lineage cut per round — O(diameter)
rounds, shuffles keyed on the vertex id, no driver-side graph state),
and one weak-components run for the DISCONNECTED split. Exactness is
pinned against pure-python reachability and networkx
(ancestors/descendants) in tests/test_bowtie.py; the contract query
value-hash-checks against a DuckDB recursive-closure oracle.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.lineage import cut


@dataclass
class BowtieResult:
    classes: DataFrame  # [node, bowtie] — one of the five class strings
    core_component: object  # label (min member id) of the CORE SCC
    rounds: dict = field(default_factory=dict)


def _reach_from(edges: DataFrame, seeds: DataFrame, max_iter: int) -> DataFrame:
    """All vertices reachable from the seed SET (seeds excluded unless
    re-entered) — frontier BFS treating the set as one source blob:
    per round one edge join + one anti-join, checkpointed. Runs to the
    empty-frontier fixpoint; ``max_iter`` is a safety cap and EXCEEDING
    it raises (a silent cut would misclassify every vertex beyond it as
    TENDRIL/DISCONNECTED). Returns [node]."""
    reached = seeds.select("node").localCheckpoint(eager=True)
    frontier = reached
    for _ in range(max_iter):
        nxt = (
            edges.join(frontier.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(reached, "node", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            return reached
        # shuffle-rooted cut: settled-set union over the previous
        # checkpoint — the narrow-union lineage-compounding shape
        # (linkgraph/lineage.py)
        reached = cut(reached.unionByName(nxt))
        frontier = nxt
    raise RuntimeError(
        f"bowtie reachability did not close within max_iter={max_iter} "
        "rounds (graph hop-diameter from the core exceeds the cap); "
        "raise max_iter"
    )


def bowtie_decomposition(edges: DataFrame, max_iter: int = 100) -> BowtieResult:
    """[node, bowtie] over a directed [src, dst] edge table (see module
    docstring for the five classes)."""
    from linkgraph.operators.components import connected_components
    from linkgraph.operators.scc import strongly_connected_components

    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    scc = strongly_connected_components(edges)
    comps = scc.components.localCheckpoint(eager=True)
    top = (
        comps.groupBy("component")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("component"))
        .limit(1)
        .collect()
    )
    if not top:  # vertex-free input
        return BowtieResult(
            classes=comps.select("node", F.lit("CORE").alias("bowtie")),
            core_component=None,
        )
    core_label = top[0]["component"]
    core = comps.filter(F.col("component") == F.lit(core_label)).select("node")

    fwd = _reach_from(e, core, max_iter)  # CORE ∪ OUT
    bwd = _reach_from(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst")),
        core,
        max_iter,
    )  # CORE ∪ IN

    wcc = connected_components(edges).components  # [node, component]
    core_wcc = (
        wcc.join(core.limit(1), "node").select("component").collect()[0][0]
    )

    classes = (
        comps.select("node", "component")
        .join(fwd.withColumn("f", F.lit(1)), "node", "left")
        .join(bwd.withColumn("b", F.lit(1)), "node", "left")
        .join(
            wcc.select("node", F.col("component").alias("wc")), "node"
        )
        .select(
            "node",
            F.when(F.col("component") == F.lit(core_label), "CORE")
            .when(F.col("b") == 1, "IN")
            .when(F.col("f") == 1, "OUT")
            .when(F.col("wc") == F.lit(core_wcc), "TENDRIL")
            .otherwise("DISCONNECTED")
            .alias("bowtie"),
        )
    )
    return BowtieResult(
        classes=classes,
        core_component=core_label,
        rounds={"scc_rounds": scc.rounds},
    )
