"""Truncated SimRank — structural vertex similarity by recursive
in-neighbor agreement (Jeh & Widom, KDD'02).

    s(a, a) = 1
    s(a, b) = C / (|I(a)|·|I(b)|) · Σ_{i∈I(a), j∈I(b)} s(i, j)

computed for ``rounds`` fixed iterations from s₀ = identity on the simple
directed graph (multi-edges deduplicated, self-loops dropped). The state is
the SPARSE nonzero pair set: after t rounds a pair (a, b) is nonzero iff a
and b are co-reachable by two equal-length backward walks of length ≤ t, so
on link graphs the state stays near the co-citation pair count instead of
n².

Plan per round: the symmetric closure of the pair state (plus the implicit
diagonal) is pushed forward through two out-edge joins (pair (i, j) flows
to (a, b) for every i→a, j→b), one (a, b)-keyed sum, and one broadcast-free
scale by C/(indeg_a·indeg_b) — all vertex/pair-keyed shuffles, lineage cut
per round. The fan-out per source pair is outdeg(i)·outdeg(j): the same
Σ deg² wedge budget as clustering_coefficients, which is why
``max_degree`` exists — it deletes the OUT-edges of vertices whose
out-degree exceeds the cap before iterating (a vertex that points at
everyone manufactures similarity, not signal; same degree-tiered precedent
as project_bipartite's max_pivot_degree and the hub salting in
plans/shards.py). In-degrees are recomputed on the capped graph, so the
capped run is EXACTLY SimRank on the capped subgraph — and equals the
uncapped run whenever every out-degree ≤ cap (pinned in tests). None =
exact.

Reference parity: the reference engine (BorisRado/pagerank) has no SimRank;
this is an engine addition in the §2.9 north-rule family (link-graph vertex
similarity next to adamic_adar / link_scores). Value-checked against a
brute-force dense numpy oracle in tests and an unrolled-CTE DuckDB oracle
in the driver contract (`simrank_r2`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def simrank(
    edges: DataFrame,
    c: float = 0.8,
    rounds: int = 2,
    max_degree: int | None = None,
    cut_lineage: bool = True,
) -> DataFrame:
    """[a, b, sim] for unordered pairs a < b with nonzero truncated-SimRank
    score after ``rounds`` iterations (the symmetric half and the diagonal
    s(x,x)=1 are implicit). ``c`` is the decay constant. ``cut_lineage``
    checkpoints the pair state per round (the default for any real run);
    False keeps the full lineage so `.explain` shows the whole round plan
    (scripts/explain_plans.py uses it)."""
    if not (0.0 < c < 1.0):
        raise ValueError(f"c must be in (0, 1), got {c}")
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    if max_degree is not None and max_degree < 1:
        raise ValueError(f"max_degree must be >= 1, got {max_degree}")

    g = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    if max_degree is not None:
        keep = (
            g.groupBy("src")
            .agg(F.count(F.lit(1)).alias("od"))
            .filter(F.col("od") <= max_degree)
            .select("src")
        )
        g = g.join(keep, "src", "semi")
    g = g.persist()
    ind = (
        g.groupBy(F.col("dst").alias("node"))
        .agg(F.count(F.lit(1)).alias("ind"))
        .persist()
    )
    # diagonal sources: only vertices WITH out-edges can push their
    # s(x,x)=1 forward, so the diagonal is materialized over distinct srcs
    diag = g.select(F.col("src").alias("i")).distinct().select(
        "i", F.col("i").alias("j"), F.lit(1.0).alias("s")
    )

    sim = None  # DataFrame [a, b, s] with a < b
    for _ in range(rounds):
        if sim is None:
            ssym = diag
        else:
            ssym = diag.unionByName(
                sim.select(F.col("a").alias("i"), F.col("b").alias("j"), "s")
            ).unionByName(
                sim.select(F.col("b").alias("i"), F.col("a").alias("j"), "s")
            )
        e1 = g.select(F.col("src").alias("i"), F.col("dst").alias("a"))
        e2 = g.select(F.col("src").alias("j"), F.col("dst").alias("b"))
        tot = (
            ssym.join(e1, "i")
            .join(e2, "j")
            .filter(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.sum("s").alias("tot"))
        )
        new = (
            tot.join(ind.select(F.col("node").alias("a"), F.col("ind").alias("ia")), "a")
            .join(ind.select(F.col("node").alias("b"), F.col("ind").alias("ib")), "b")
            .select(
                "a",
                "b",
                (F.lit(c) * F.col("tot") / (F.col("ia") * F.col("ib"))).alias("s"),
            )
        )
        if cut_lineage:
            new = new.localCheckpoint(eager=True)
            if sim is not None:
                sim.unpersist()
        sim = new

    g.unpersist()
    ind.unpersist()
    return sim.select("a", "b", F.col("s").alias("sim"))
