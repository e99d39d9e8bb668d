"""Distributed greedy vertex coloring — per-round local-minima tournament.

The symmetry-breaking core of Luby's MIS (operators/mis.py) reused for
proper coloring: in round r every still-uncolored vertex draws priority
md5(seed|r|node); a vertex whose priority is strictly below every
uncolored neighbor's takes color r. Adjacent vertices can never win the
same round (one of the two priorities is strictly smaller — md5 ties are
impossible for distinct node strings), so the assignment is a proper
coloring by construction; every active component colors at least its
local-minimum vertex each round, so the loop terminates. With fresh
hash-priorities per round a vertex wins with probability >= 1/(deg+1)
per round, giving O(Delta log n) rounds w.h.p. — the classic trade: more
colors than sequential greedy, but every round is two joins + one
aggregate, fully data-parallel (Jones & Plassmann, "A parallel graph
coloring heuristic", SIAM J. Sci. Comput. 14(3), 1993 — this is its
round-synchronous hashed-priority variant).

Determinism: like walks.py / mis.py, randomness is
derandomized-by-keyed-hash, so results are repartition-stable and the
round body is exactly value-checkable cross-engine (md5 is portable SQL).

Scale: per round one shuffle keyed by vertex id over the still-active
edge set, which shrinks monotonically; no driver state beyond the round
counter and one count action per round for the fixpoint test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.operators.degrees import symmetrize, vertices


def _priority(node_col, seed: str, rnd: int):
    return F.md5(F.concat_ws("|", F.lit(seed), F.lit(str(rnd)), node_col))


def greedy_coloring(
    edges: DataFrame,
    seed: str = "color",
    max_iter: int = 500,
    fixed_rounds: int | None = None,
) -> DataFrame:
    """[node, color] — proper coloring of the simple undirected graph.
    Isolated vertices (incl. self-loop-only) have no active neighbor and
    win color 0. With ``fixed_rounds``, runs exactly that many rounds and
    returns the partial coloring (the contract-query shape); the
    fixpoint's properness + totality are pinned in tests."""
    und = symmetrize(edges).persist()
    active = vertices(edges).localCheckpoint(eager=True)
    ae = und
    colored_frames = []
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
            .select("node", F.lit(rnd).alias("color"))
            .localCheckpoint(eager=True)
        )
        colored_frames.append(win)
        # ONLY winners leave (unlike MIS, where their neighbors go too)
        active = active.join(win.select("node"), "node", "left_anti").localCheckpoint(
            eager=True
        )
        if fixed_rounds is None and active.count() == 0:
            break
        ae = (
            ae.join(active.withColumnRenamed("node", "src"), "src", "left_semi")
            .join(active.withColumnRenamed("node", "dst"), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )
    und.unpersist()
    if not colored_frames:
        spark = edges.sparkSession
        return spark.createDataFrame(
            [], "node " + dict(active.dtypes)["node"] + ", color int"
        )
    out = colored_frames[0]
    for f in colored_frames[1:]:
        out = out.union(f)
    return out
