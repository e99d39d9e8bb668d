"""Strongly connected components — Trim + Coloring (MultiStep).

THE canonical directed-link-graph analysis (the Broder et al. 2000 bowtie
decomposition of the web graph is an SCC condensation); the reference is
PageRank-only, so like components/LPA/triangles this is an engine addition
under the same north rule. Algorithm: the coloring method of Orzan (2004)
as parallelised by Slota/Rajamanickam/Madduri (IPDPS'14 "BFS and
Coloring-based Parallel Algorithms for Strongly Connected Components"),
with the standard trim prepass:

1. TRIM — iteratively peel vertices with no in-edge or no out-edge inside
   the remaining subgraph: each is a singleton SCC. This removes all
   DAG-like structure (which would otherwise cost one coloring round per
   condensation level) in O(peel-depth) rounds of two semi-joins.
2. COLOR — propagate the MAX vertex id backward along edges to a fixpoint:
   color(v) = max id that can reach v. Every color class c contains the
   SCC of its root (the vertex with id c), and edges never leave a color
   class forward out of the root's SCC.
3. PEEL — inside each color class, propagate "reaches the root" along
   reversed edges to a fixpoint; the flagged set IS the root's SCC. All
   colors peel their root SCC in the SAME round — the parallelism that
   makes this terminate in (condensation-depth of the trimmed core) outer
   rounds, not one round per SCC like sequential FW-BW pivoting.

Every inner step is a hash join + aggregate with a changed-count action
and a per-round lineage cut — the same loop shape as
operators/components.py min-label propagation, so the 100x-scale story is
identical (shuffles keyed on the vertex id, no driver-side graph state).
Labels are exact: component = MIN member id (engine-independent — tests
pin against a pure-Python Tarjan oracle; the contract query hash-checks
against a DuckDB transitive-closure oracle).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.lineage import cut


@dataclass
class SCCResult:
    components: DataFrame  # [node, component] — component = min member id
    rounds: int
    iter_metrics: list[dict] = field(default_factory=list)


def _as(df: DataFrame, name: str) -> DataFrame:
    cols = df.columns
    assert len(cols) == 1
    return df.select(F.col(cols[0]).alias(name))


def strongly_connected_components(edges: DataFrame, max_iter: int = 100) -> SCCResult:
    """[node, component] over a directed [src, dst] edge table; two nodes
    share a component iff each reaches the other. Isolated self-loops
    count as singleton SCCs of themselves (self-edges don't merge)."""
    from linkgraph.operators.degrees import vertices

    e0 = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    verts = vertices(edges)

    labels: list[DataFrame] = []  # [node, component] fragments
    active = verts.select("node").persist()
    e = e0
    n_active = active.count()
    metrics: list[dict] = []
    rounds = 0
    while n_active > 0 and rounds < max_iter:
        rounds += 1
        # ---- 1. trim: peel no-in / no-out vertices (singleton SCCs) ----
        trims = 0
        while n_active > 0:
            has_out = _as(e.select("src").distinct(), "node")
            has_in = _as(e.select("dst").distinct(), "node")
            core = (
                active.join(has_out, "node", "leftsemi")
                .join(has_in, "node", "leftsemi")
                .localCheckpoint(eager=True)
            )
            n_core = core.count()
            if n_core == n_active:
                break
            trims += 1
            labels.append(
                active.join(core, "node", "left_anti")
                .select("node", F.col("node").alias("component"))
                .localCheckpoint(eager=True)
            )
            active.unpersist()
            active = core.persist()
            old_e = e
            e = (
                e.join(_as(core, "src"), "src", "leftsemi")
                .join(_as(core, "dst"), "dst", "leftsemi")
                .localCheckpoint(eager=True)
                .persist()
            )
            if old_e is not e0:
                old_e.unpersist()
            n_active = n_core
        if n_active == 0:
            metrics.append({"round": rounds, "trim_peels": trims, "peeled": 0})
            break

        # ---- 2. color: backward max-propagation to fixpoint ----
        # color(v) = max id u with a path u ->* v inside the core
        color = active.select("node", F.col("node").alias("color")).persist()
        color_iters = 0
        while True:
            color_iters += 1
            msgs = (
                e.join(color.withColumnRenamed("node", "src"), "src")
                .groupBy(F.col("dst").alias("node"))
                .agg(F.max("color").alias("cand"))
            )
            new = (
                color.join(msgs, "node", "left")
                .select(
                    "node",
                    F.greatest(F.col("color"), F.coalesce("cand", "color")).alias("color"),
                    (F.greatest(F.col("color"), F.coalesce("cand", "color")) != F.col("color")).alias(
                        "chg"
                    ),
                )
                .localCheckpoint(eager=False)
            )
            changed = new.agg(F.sum(F.col("chg").cast("long"))).first()[0] or 0
            old = color
            color = new.select("node", "color").persist()
            old.unpersist()
            if changed == 0:
                break

        # ---- 3. peel every color root's SCC at once ----
        # flag(v): v reaches its color root within its color class. Roots
        # start flagged; propagate along reversed edges between same-color
        # vertices.
        ce = (
            e.join(color.withColumnRenamed("node", "src").withColumnRenamed("color", "c_src"), "src")
            .join(color.withColumnRenamed("node", "dst").withColumnRenamed("color", "c_dst"), "dst")
            .filter(F.col("c_src") == F.col("c_dst"))
            .select("src", "dst")
            .localCheckpoint(eager=True)
            .persist()
        )
        flagged = color.filter(F.col("node") == F.col("color")).select("node", "color").persist()
        while True:
            nxt = (
                ce.join(_as(flagged.select("node"), "dst"), "dst", "leftsemi")
                .select(F.col("src").alias("node"))
                .distinct()
                .join(flagged.select("node"), "node", "left_anti")
                .join(color, "node")
                .localCheckpoint(eager=True)
            )
            if nxt.count() == 0:
                break
            # shuffle-rooted cut: the settled-set union over the previous
            # checkpoint is the narrow-union shape that compounds
            # partition lineage under bare localCheckpoint (lineage.py)
            flagged_new = cut(flagged.unionByName(nxt))
            flagged.unpersist()
            flagged = flagged_new.persist()
        # component label = min member id of each color's root SCC
        rep = flagged.groupBy("color").agg(F.min("node").alias("component"))
        labels.append(
            flagged.join(rep, "color").select("node", "component").localCheckpoint(eager=True)
        )
        peeled = flagged.count()
        metrics.append(
            {"round": rounds, "trim_peels": trims, "color_iters": color_iters, "peeled": peeled}
        )
        new_active = (
            active.join(flagged.select("node"), "node", "left_anti").localCheckpoint(eager=True)
        )
        active.unpersist()
        active = new_active.persist()
        old_e = e
        e = (
            e.join(_as(active, "src"), "src", "leftsemi")
            .join(_as(active, "dst"), "dst", "leftsemi")
            .localCheckpoint(eager=True)
            .persist()
        )
        if old_e is not e0:
            old_e.unpersist()
        color.unpersist()
        ce.unpersist()
        flagged.unpersist()
        n_active = active.count()

    e0.unpersist()
    if n_active > 0:
        # silence here would mean silently MISSING label rows downstream
        raise RuntimeError(
            f"strongly_connected_components: {n_active} vertices still "
            f"active after max_iter={max_iter} peel rounds (condensation "
            "deeper than the round budget) — raise max_iter"
        )
    if labels:
        out = labels[0]
        for part in labels[1:]:
            out = out.unionByName(part)
    else:
        out = verts.select("node", F.col("node").alias("component")).limit(0)
    return SCCResult(components=out, rounds=rounds, iter_metrics=metrics)
