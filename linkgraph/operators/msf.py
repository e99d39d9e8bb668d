"""Minimum spanning forest — distributed Borůvka.

Borůvka (1926), THE parallel MST algorithm (every distributed-graph
framework's canonical example — e.g. the GraphX and Pregel papers):
each round, every component selects its minimum-weight outgoing edge;
all selected edges join the forest simultaneously; components merge;
the component count at least halves per round, so O(log n) rounds.

Correctness needs a UNIQUE minimum per cut: edges are totally ordered
by (w, a, b) — the canonical endpoint pair breaks weight ties — so the
forest is UNIQUE and deterministic (the cut property then guarantees
every selected edge belongs to the minimum spanning forest). Parallel
edges collapse to their minimum weight under the same order.

Plan, per round: one edge→label gather (two vertex-keyed hash joins),
one ``min_by(struct(w, a, b))`` hash aggregate per component side (the
candidate fan-in is the live cross-component edge set), a distinct on
the selected edges (both endpoints select the same edge when it is
minimal for both), and a component merge via the already-certified
min-label ``connected_components`` over the SELECTED edge graph — a
graph with at most one edge per live component, which shrinks
geometrically. Edges internal to a component are dropped each round, so
the shuffled edge set only shrinks. No driver-side graph state; the
accumulated forest is a union of per-round checkpointed fragments.

Exactness: python Kruskal replica (same (w, a, b) order) and networkx
``minimum_spanning_tree`` parity in tests/test_msf.py; the first
Borůvka round (components = single vertices — no recursion needed) is
value-hash-checked against a DuckDB argmin oracle (q_msf_round); the
full forest is the rows-only ``msf`` contract entry with forest
invariants (|E| = n − #components, acyclicity via the component count)
pinned in tests.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class MSFResult:
    forest: DataFrame  # [a, b, w] — edges of the minimum spanning forest
    labels: DataFrame  # [node, component] — final component per vertex
    rounds: int
    iter_metrics: list = field(default_factory=list)


def _canonical_weighted(edges: DataFrame, weight_col: str) -> DataFrame:
    """[a, b, w]: canonical a<b (self-loops dropped — never in a forest),
    parallel edges keep their MINIMUM weight."""
    return (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.col(weight_col).cast("double").alias("w"),
        )
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
    )


def min_component_edges(wedges: DataFrame, labels: DataFrame) -> DataFrame:
    """One Borůvka selection: per component, the (w, a, b)-minimal edge
    leaving it. ``labels`` is [node, component]. Returns the selected
    edges [a, b, w] deduplicated (an edge minimal for both sides is
    selected once)."""
    lab = labels.select("node", "component")
    tagged = (
        wedges.join(
            lab.withColumnRenamed("node", "a").withColumnRenamed(
                "component", "ca"
            ),
            "a",
        )
        .join(
            lab.withColumnRenamed("node", "b").withColumnRenamed(
                "component", "cb"
            ),
            "b",
        )
        .filter(F.col("ca") != F.col("cb"))
    )
    cand = tagged.select(
        F.col("ca").alias("comp"), "a", "b", "w"
    ).unionByName(tagged.select(F.col("cb").alias("comp"), "a", "b", "w"))
    return (
        cand.groupBy("comp")
        .agg(F.expr("min_by(struct(a, b, w), struct(w, a, b))").alias("e"))
        .select("e.a", "e.b", "e.w")
        .distinct()
    )


def min_spanning_forest(
    edges: DataFrame,
    weight_col: str = "w",
    max_rounds: int = 32,
) -> MSFResult:
    """Unique deterministic minimum spanning forest of the weighted
    undirected view of ``edges`` [src, dst, weight_col]."""
    from linkgraph.operators.components import connected_components_twophase
    from linkgraph.operators.degrees import vertices

    wedges = _canonical_weighted(edges, weight_col).localCheckpoint(
        eager=True
    )
    verts = vertices(edges.select("src", "dst"))
    labels = verts.select(
        "node", F.col("node").alias("component")
    ).localCheckpoint(eager=True)
    forest_parts: list[DataFrame] = []
    metrics: list[dict] = []
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        picked = min_component_edges(wedges, labels).localCheckpoint(
            eager=True
        )
        n_picked = picked.count()
        metrics.append({"round": rounds, "picked": n_picked})
        if n_picked == 0:
            rounds -= 1
            break
        forest_parts.append(picked)
        # merge: components over the COMPONENT graph of the picked edges
        # (vertex endpoints re-tagged to their current labels — from
        # round 2 on the endpoints are interior vertices, not component
        # representatives) via the O(log n) large-star/small-star
        # variant: picked graphs are PATH-LIKE (chains of hooked
        # components), exactly where min-label propagation's
        # O(diameter) rounds hurt. New label = min old label = min
        # vertex id overall, so labels stay canonical across rounds.
        lab0 = labels.select("node", "component")
        comp_edges = (
            picked.join(
                lab0.withColumnRenamed("node", "a").withColumnRenamed(
                    "component", "src"
                ),
                "a",
            )
            .join(
                lab0.withColumnRenamed("node", "b").withColumnRenamed(
                    "component", "dst"
                ),
                "b",
            )
            .select("src", "dst")
        )
        merged = connected_components_twophase(
            comp_edges
        ).components.withColumnRenamed("node", "old_comp").withColumnRenamed(
            "component", "new_comp"
        )
        labels = (
            labels.join(
                merged, labels["component"] == merged["old_comp"], "left"
            )
            .select(
                "node",
                F.coalesce("new_comp", "component").alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        # drop now-internal edges — the live set only shrinks
        lab = labels.select("node", "component")
        wedges = (
            wedges.join(
                lab.withColumnRenamed("node", "a").withColumnRenamed(
                    "component", "ca"
                ),
                "a",
            )
            .join(
                lab.withColumnRenamed("node", "b").withColumnRenamed(
                    "component", "cb"
                ),
                "b",
            )
            .filter(F.col("ca") != F.col("cb"))
            .select("a", "b", "w")
            .localCheckpoint(eager=True)
        )
        if wedges.isEmpty():
            break
    if forest_parts:
        from functools import reduce

        forest = reduce(DataFrame.unionByName, forest_parts).distinct()
    else:
        forest = wedges.filter(F.lit(False))
    return MSFResult(
        forest=forest,
        labels=labels,
        rounds=rounds,
        iter_metrics=metrics,
    )
