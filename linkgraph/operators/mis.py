"""Maximal independent set — Luby's algorithm with keyed-hash priorities.

North-rule extension: MIS is the classic symmetry-breaking primitive of
parallel graph algorithms (Luby, "A simple parallel algorithm for the
maximal independent set problem", SIAM J. Comput. 1986) and the building
block for distributed coloring / scheduling / landmark selection. Luby
draws fresh random priorities each round; here the priority is
md5(seed | round | node) — the same derandomization-by-keyed-hash trick as
operators/walks.py, so the result is deterministic, repartition-stable,
and exactly value-checkable cross-engine (md5 is engine-portable).

Per round, over the still-active subgraph:
  * v enters the MIS iff its priority is strictly smaller than every
    active neighbor's (md5 ties are impossible for distinct node strings);
  * winners and their neighbors leave the active set.
Rounds = O(log n) with high probability (hash symmetry plays the role of
Luby's fresh randomness). Each round is two joins + one aggregate + one
anti-join, all keyed by the vertex id — no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.operators.degrees import symmetrize, vertices


def _priority(node_col, seed: str, rnd: int):
    return F.md5(F.concat_ws("|", F.lit(seed), F.lit(str(rnd)), node_col))


def maximal_independent_set(
    edges: DataFrame,
    seed: str = "mis",
    max_iter: int = 200,
    fixed_rounds: int | None = None,
) -> DataFrame:
    """[node, round] — the MIS members of the simple undirected graph and
    the round each entered. Isolated vertices (self-loop-only included)
    win round 0 by default (no active neighbor). With ``fixed_rounds``,
    runs exactly that many rounds and returns the partial MIS — the
    contract-query shape; the fixpoint's independence + maximality are
    pinned in tests."""
    und = symmetrize(edges).persist()
    active = vertices(edges).localCheckpoint(eager=True)
    ae = und
    winners_frames = []
    rounds = fixed_rounds if fixed_rounds is not None else max_iter
    for rnd in range(rounds):
        pri = active.select("node", _priority(F.col("node"), seed, rnd).alias("p"))
        nbr_min = (
            ae.join(pri.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("p").alias("np"))
        )
        win = (
            pri.join(nbr_min, "node", "left")
            .filter(F.col("np").isNull() | (F.col("p") < F.col("np")))
            .select("node", F.lit(rnd).alias("round"))
            .localCheckpoint(eager=True)
        )
        winners_frames.append(win)
        # winners + their neighbors leave the active set
        nbrs = ae.join(
            win.withColumnRenamed("node", "src"), "src"
        ).select(F.col("dst").alias("node"))
        removed = win.select("node").union(nbrs).distinct()
        active = active.join(removed, "node", "left_anti").localCheckpoint(
            eager=True
        )
        if fixed_rounds is None and active.count() == 0:
            und.unpersist()
            out = winners_frames[0]
            for f in winners_frames[1:]:
                out = out.union(f)
            return out
        ae = (
            ae.join(active.withColumnRenamed("node", "src"), "src", "left_semi")
            .join(active.withColumnRenamed("node", "dst"), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )
    und.unpersist()
    if not winners_frames:
        spark = edges.sparkSession
        return spark.createDataFrame(
            [], "node " + dict(active.dtypes)["node"] + ", round int"
        )
    out = winners_frames[0]
    for f in winners_frames[1:]:
        out = out.union(f)
    return out
