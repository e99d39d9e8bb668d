"""Maximal matching — local-minimum edge tournament with hash priorities.

The edge-side sibling of Luby MIS (operators/mis.py) and the coloring
tournament (operators/coloring.py): per round, every still-active edge
draws priority md5(seed|round|a|b); an edge enters the matching iff its
priority is strictly smaller than every active edge sharing either
endpoint (the classic distributed greedy matching — Israeli & Itai, "A
fast and simple randomized parallel algorithm for maximal matching",
IPL 22(2), 1986, derandomized here by keyed hash like walks/mis). Both
endpoints of a matched edge retire, removing every conflicting edge;
each active component matches at least its minimum-priority edge per
round, so the loop terminates, and the result is maximal by
construction (an edge only leaves when an endpoint is matched).

Plan per round: one per-vertex min aggregate over the active edges'
priorities (seen from each endpoint — two unions of the same scan), one
join back to test "min at BOTH endpoints", and one semi-join retirement
of touched edges — all keyed by vertex id, no driver state beyond the
round counter. Graph semantics: simple undirected (self-loops dropped —
a self-loop can never be matched — parallel edges collapsed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical(edges: DataFrame) -> DataFrame:
    e = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    return (
        e.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )


def maximal_matching(
    edges: DataFrame,
    seed: str = "match",
    max_iter: int = 500,
    fixed_rounds: int | None = None,
) -> DataFrame:
    """[a, b, round] — a maximal matching of the simple undirected graph
    and the round each pair matched. With ``fixed_rounds``, runs exactly
    that many rounds and returns the partial matching (the contract-query
    shape); validity + maximality of the fixpoint are pinned in tests."""
    active = _canonical(edges).localCheckpoint(eager=True)
    matched_frames = []
    rounds = fixed_rounds if fixed_rounds is not None else max_iter
    for rnd in range(rounds):
        pri = active.select(
            "a",
            "b",
            F.md5(
                F.concat_ws(
                    "|",
                    F.lit(seed),
                    F.lit(str(rnd)),
                    F.col("a").cast("string"),
                    F.col("b").cast("string"),
                )
            ).alias("p"),
        )
        ends = pri.select(F.col("a").alias("v"), "p").unionByName(
            pri.select(F.col("b").alias("v"), "p")
        )
        vmin = ends.groupBy("v").agg(F.min("p").alias("mp"))
        win = (
            pri.join(vmin.select(F.col("v").alias("a"), F.col("mp").alias("ma")), "a")
            .join(vmin.select(F.col("v").alias("b"), F.col("mp").alias("mb")), "b")
            .filter((F.col("p") == F.col("ma")) & (F.col("p") == F.col("mb")))
            .select("a", "b", F.lit(rnd).alias("round"))
            .localCheckpoint(eager=True)
        )
        matched_frames.append(win)
        touched = win.select(F.col("a").alias("v")).unionByName(
            win.select(F.col("b").alias("v"))
        )
        active = (
            active.join(touched.select(F.col("v").alias("a")), "a", "left_anti")
            .join(touched.select(F.col("v").alias("b")), "b", "left_anti")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
        if fixed_rounds is None and active.count() == 0:
            break
    spark = edges.sparkSession
    if not matched_frames:
        return spark.createDataFrame([], "a long, b long, round int")
    out = matched_frames[0]
    for f in matched_frames[1:]:
        out = out.union(f)
    return out
