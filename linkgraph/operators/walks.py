"""Deterministic random walks over the directed edge table.

North-rule extension (the reference, /root/reference/src/pagerank_custom.h,
is PageRank-only): random walks are the sampling primitive behind
node2vec/DeepWalk-style embedding pipelines and behind Monte-Carlo PageRank.
Naive `rand()`-driven walks are irreproducible under retries and
repartitioning — a correctness hazard this engine already refuses elsewhere
(see dataset_split's md5-keyed thresholds). Here the next hop is chosen by

    next(walk, step) = argmin_{(cur -> d) ∈ E}  md5(start || sep || seed
                                                    || sep || step || sep || d)

i.e. a keyed hash tournament over the out-neighbors. Properties:

* Deterministic and engine-portable: md5 of the same string is identical in
  Spark and DuckDB/ANSI SQL, so the whole walk table has an EXACT value
  oracle (q_randwalk_k3) — rare for anything named "random".
* Stable under re-run, repartitioning, and retries (no rand(), no row
  position); different `seed` strings give independent walk families.
* Marginally uniform per step: for a node with out-degree k each neighbor
  wins the min-hash tournament with probability 1/k (hash symmetry), which
  is exactly the uniform random walk PageRank/DeepWalk assume.

Scale posture: per step, one frontier->edges hash join (fan-out = Σ
out-degree over frontier) and one min_by aggregate keyed by walk — the
canonical distributed walk plan. No per-row Python, no collect; k steps =
k shuffles, each bounded by the live frontier. Dead ends (dangling nodes)
simply end their walk (the join drops them), matching the walk-restart-free
formulation.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def random_walks(
    edges: DataFrame,
    walk_len: int,
    seed: str = "w0",
    starts: DataFrame | None = None,
) -> DataFrame:
    """One deterministic walk of ``walk_len`` steps from every node in
    ``starts`` (default: every vertex of the simple directed graph).
    Returns [start, step, node] with step 0 = the start itself; walks that
    hit a dangling node stop early (no rows for later steps).
    """
    if walk_len < 0:
        raise ValueError("walk_len must be >= 0")
    e = edges.select("src", "dst").distinct()
    if starts is None:
        starts = (
            e.select(F.col("src").alias("node"))
            .union(e.select(F.col("dst").alias("node")))
            .distinct()
        )
    cur = starts.select(F.col("node").alias("start"), F.col("node").alias("node"))
    frames = [cur.select("start", F.lit(0).alias("step"), "node")]
    for i in range(1, walk_len + 1):
        hop = cur.join(e, cur["node"] == e["src"]).select(
            "start",
            F.col("dst").alias("cand"),
            F.md5(
                F.concat_ws("|", F.col("start"), F.lit(seed), F.lit(str(i)), F.col("dst"))
            ).alias("h"),
        )
        cur = hop.groupBy("start").agg(F.min_by("cand", "h").alias("node"))
        frames.append(cur.select("start", F.lit(i).alias("step"), "node"))
    return reduce(DataFrame.unionAll, frames)


def weighted_random_walks(
    wedges: DataFrame,
    walk_len: int,
    seed: str = "ww0",
    starts: DataFrame | None = None,
) -> DataFrame:
    """Deterministic WEIGHTED random walks: at each step the walk draws a
    48-bit uniform integer u = int(md5(start|seed|step)[:12], 16) and picks
    the out-neighbor whose cumulative-weight slot contains u mod W(node) —
    exact integer arithmetic, so P(neighbor) = w / W precisely, and the
    whole table is engine-portable (both Spark's conv() and DuckDB's
    '0x'-cast parse the same hex slice). The first-order weighted walk
    underneath node2vec/DeepWalk corpus generation, minus rand()'s
    irreproducibility. ``wedges`` is [src, dst, w] with integer w > 0;
    duplicate (src, dst) rows are combined by summing w.

    Plan per step: frontier ⋈ weighted edges, one per-walk window pass
    (ordered by dst for a canonical slot layout) selecting the single row
    whose [cum−w, cum) interval contains the draw — shuffles keyed by the
    walk, fan-out bounded by frontier out-degree, no driver state.
    Returns [start, step, node]; dead ends stop early."""
    if walk_len < 0:
        raise ValueError("walk_len must be >= 0")
    from pyspark.sql import Window as W

    e = (
        wedges.select("src", "dst", F.col("w").cast("long").alias("w"))
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
    )
    if starts is None:
        starts = (
            e.select(F.col("src").alias("node"))
            .union(e.select(F.col("dst").alias("node")))
            .distinct()
        )
    cur = starts.select(F.col("node").alias("start"), F.col("node").alias("node"))
    frames = [cur.select("start", F.lit(0).alias("step"), "node")]
    for i in range(1, walk_len + 1):
        u = F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.col("start"), F.lit(seed), F.lit(str(i)))),
                1,
                12,
            ),
            16,
            10,
        ).cast("long")
        slot_w = W.partitionBy("start").orderBy("dst").rowsBetween(
            W.unboundedPreceding, 0
        )
        tot_w = W.partitionBy("start")
        hop = (
            cur.join(e, cur["node"] == e["src"])
            .select("start", "dst", "w", u.alias("u"))
            .withColumn("cum", F.sum("w").over(slot_w))
            .withColumn("r", F.col("u") % F.sum("w").over(tot_w))
        )
        cur = (
            hop.filter(
                (F.col("cum") - F.col("w") <= F.col("r")) & (F.col("r") < F.col("cum"))
            )
            .select("start", F.col("dst").alias("node"))
        )
        frames.append(cur.select("start", F.lit(i).alias("step"), "node"))
    return reduce(DataFrame.unionAll, frames)


def node2vec_walks(
    edges: DataFrame,
    walk_len: int,
    w_return: int = 1,
    w_common: int = 4,
    w_far: int = 2,
    seed: str = "n2v0",
    starts: DataFrame | None = None,
) -> DataFrame:
    """Deterministic node2vec-style SECOND-ORDER biased walks (Grover &
    Leskovec, "node2vec: Scalable Feature Learning for Networks",
    KDD'16) on the simple directed graph — the corpus generator behind
    graph-embedding training. Step 1 is uniform (the same min-hash
    tournament as ``random_walks``); from step 2 each candidate next
    hop x of the state (prev -> cur -> x) carries an INTEGER bias

        w_return  if x == prev                     (node2vec 1/p)
        w_common  if prev->x or x->prev is an edge (distance 1, bias 1)
        w_far     otherwise                        (node2vec 1/q)

    and the hop is drawn by integer slot sampling from the shared
    48-bit draw u = md5(start|seed|step): deterministic exact-integer
    slot arithmetic with P(x) = bias_x / Σ bias up to the u % Σbias
    modulo remainder (relative bias O(Σbias / 2^48) — Σbias does not
    generally divide 2^48), with (p, q) = (w_common/w_return,
    w_common/w_far). Like
    the other walk operators this is rand()-free — stable under
    re-run/retries/repartitioning and value-checkable in ANSI SQL
    (q_node2vec_k3).

    Plan per step: frontier ⋈ out-edges (fan-out bounded by the live
    frontier's out-degree), one LEFT join against the symmetrized edge
    set to classify the distance (edge-keyed — the join node2vec's
    alias-table preprocessing also pays, here resolved per step instead
    of materializing O(Σ deg²) alias entries), and one per-walk window
    pass over the cumulative slots. Returns [start, step, node]; dead
    ends stop early."""
    if walk_len < 0:
        raise ValueError("walk_len must be >= 0")
    for name, w in (
        ("w_return", w_return), ("w_common", w_common), ("w_far", w_far)
    ):
        # bool is an int subclass but never a sensible bias
        if not isinstance(w, int) or isinstance(w, bool) or w < 1:
            raise ValueError(
                f"{name} must be a positive int (got {w!r}); the exact "
                "slot sampling is integer arithmetic — scale rational "
                "(p, q) to integers yourself"
            )
    from pyspark.sql import Window as W

    # simple directed graph: self-loops dropped (a self-hop is neither a
    # return nor an exploration in the node2vec taxonomy)
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    und = e.select(F.col("src").alias("a"), F.col("dst").alias("b")).union(
        e.select(F.col("dst").alias("a"), F.col("src").alias("b"))
    ).distinct()
    if starts is None:
        starts = (
            e.select(F.col("src").alias("node"))
            .union(e.select(F.col("dst").alias("node")))
            .distinct()
        )
    cur = starts.select(
        F.col("node").alias("start"),
        F.lit(None).cast(starts.schema["node"].dataType).alias("prev"),
        F.col("node").alias("node"),
    )
    frames = [cur.select("start", F.lit(0).alias("step"), "node")]
    for i in range(1, walk_len + 1):
        cand = cur.join(e, cur["node"] == e["src"]).select(
            "start", "prev", cur["node"].alias("cn"), F.col("dst").alias("nxt")
        )
        if i == 1:
            hop = cand.withColumn(
                "h",
                F.md5(
                    F.concat_ws(
                        "|", F.col("start"), F.lit(seed), F.lit("1"),
                        F.col("nxt"),
                    )
                ),
            )
            cur = hop.groupBy("start").agg(
                F.expr("min_by(struct(cn, nxt), h)").alias("s")
            ).select(
                "start", F.col("s.cn").alias("prev"),
                F.col("s.nxt").alias("node"),
            )
        else:
            flagged = cand.join(
                und.select(
                    F.col("a").alias("prev"), F.col("b").alias("nxt"),
                    F.lit(1).alias("near"),
                ),
                ["prev", "nxt"],
                "left",
            ).select(
                "start", "prev", "cn", "nxt",
                F.when(F.col("nxt") == F.col("prev"), F.lit(w_return))
                .when(F.col("near") == 1, F.lit(w_common))
                .otherwise(F.lit(w_far))
                .cast("long")
                .alias("w"),
            )
            u = F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|", F.col("start"), F.lit(seed), F.lit(str(i))
                        )
                    ),
                    1,
                    12,
                ),
                16,
                10,
            ).cast("long")
            win = W.partitionBy("start").orderBy("nxt")
            slot = (
                flagged.withColumn(
                    "cum",
                    F.sum("w").over(win.rowsBetween(W.unboundedPreceding, 0)),
                )
                .withColumn(
                    "tot",
                    F.sum("w").over(
                        win.rowsBetween(
                            W.unboundedPreceding, W.unboundedFollowing
                        )
                    ),
                )
                .withColumn("u", u)
            )
            cur = slot.filter(
                ((F.col("cum") - F.col("w")) <= F.col("u") % F.col("tot"))
                & (F.col("u") % F.col("tot") < F.col("cum"))
            ).select(
                "start", F.col("cn").alias("prev"), F.col("nxt").alias("node")
            )
        frames.append(cur.select("start", F.lit(i).alias("step"), "node"))
    return reduce(DataFrame.unionAll, frames)
