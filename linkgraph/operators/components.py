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


def connected_components_twophase(edges: DataFrame, max_iter: int = 50) -> ComponentsResult:
    """Large-star / small-star connected components (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) — the
    O(log n)-round alternative to min-label propagation's O(diameter):

    * large-star: every node's neighbors that are LARGER than it attach to
      its current minimum neighbor;
    * small-star: every node and its smaller neighbors attach to the
      overall minimum.

    Each phase is one groupBy-min + join on the evolving parent-pointer
    edge set; rounds until the parent forest is stable. At 10^12-edge
    scale the round count (log n) rather than graph diameter is what makes
    components tractable — diameters of conversation graphs can be large.
    Output identical to ``connected_components`` (exact, component id =
    min node id in component); tests assert equality on every fixture."""
    # parent-pointer edge set, undirected init, self-loops dropped, distinct
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .persist()
    )
    prev_n = e.count()  # carried across rounds — never recounted
    metrics: list[dict] = []
    it = 0
    for it in range(1, max_iter + 1):
        # large-star: for each node u, link every neighbor v > u to
        # m(u) = min(N(u) ∪ {u})
        sym = e.select("src", "dst").unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        mins = sym.groupBy("src").agg(F.least(F.min("dst"), F.col("src")).alias("m")).select(
            "src", "m"
        )
        large = (
            sym.join(mins, "src")
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
        # small-star: for each node u, link all neighbors <= u (and u) to m(u)
        symL = large.select("src", "dst").unionByName(
            large.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        only_small = symL.filter(F.col("dst") <= F.col("src"))
        minsS = only_small.groupBy("src").agg(F.min("dst").alias("m"))
        small = (
            only_small.join(minsS, "src")
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .unionByName(minsS.select(F.col("src"), F.col("m").alias("dst")))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        # converged when the edge set reached a fixpoint (stable star forest).
        # ONE action per round: count(small) and |small \ e| piggybacked in
        # the same left-join aggregate (both sets are distinct, so equality
        # ⟺ same cardinality as last round AND no fresh pair). Replaces the
        # old 3-action pattern (e.count + small.count + subtract.count, the
        # subtract being a full extra shuffle each round).
        small = small.persist()
        stats = (
            small.join(e.withColumn("_in_old", F.lit(1)), ["src", "dst"], "left")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.when(F.col("_in_old").isNull(), 1).otherwise(0)).alias("fresh"),
            )
            .first()
        )
        n_small = int(stats["n"])
        changed = n_small != prev_n or int(stats["fresh"] or 0) > 0
        prev_n = n_small
        old = e
        e = small
        old.unpersist()
        metrics.append({"iteration": it, "edges": int(n_small)})
        if not changed:
            break

    # e is now a star forest: src -> component root (min id). Nodes absent
    # from e are singletons/roots.
    verts = vertices(edges)
    comp = (
        verts.join(e.select(F.col("src").alias("node"), F.col("dst").alias("root")), "node", "left")
        .select("node", F.coalesce("root", F.col("node")).alias("component"))
    )
    return ComponentsResult(components=comp, iterations=it, iter_metrics=metrics)


def connected_components(
    edges: DataFrame,
    max_iter: int = 100,
    init_labels: DataFrame | None = None,
) -> ComponentsResult:
    """``init_labels`` (optional [node, component]) warm-starts the
    min-label propagation — e.g. the previous snapshot when the edge
    table grew by a microbatch (streaming/components.py). Correctness is
    init-independent: the fixpoint is min over each (new) component of
    the init labels, and with previous component ids (each the min node
    id of an old component now contained in the new one) that min IS the
    new component's min node id — identical to a cold run, just fewer
    rounds (labels inside unmerged components are already uniform).
    Vertices absent from ``init_labels`` start at their own id."""
    sym = symmetrize(edges).persist()
    labels = vertices(edges).select("node", F.col("node").alias("component"))
    if init_labels is not None:
        labels = (
            labels.join(
                init_labels.select("node", F.col("component").alias("prev")),
                "node",
                "left",
            )
            # least(): a stale/foreign init can only lower toward the true
            # min, never raise above the vertex's own id
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("prev", F.col("component"))
                ).alias("component"),
            )
        )
    labels = labels.persist()
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
