"""Temporal reachability — earliest-arrival over time-respecting paths.

A path in a temporal graph is valid only if edge timestamps are
non-decreasing along it (Kempe-Kleinberg-Kumar 2000; Holme & Saramäki,
"Temporal networks", Phys. Rep. 2012). Earliest-arrival from a source:

    arr(v) = min over edges (u, v, t) with t ≥ arr(u) of t

— information physically cannot flow backwards in time, which static
reachability over the same edge list gets wrong. This is the
contact-tracing / influence-propagation primitive for interaction logs.

Same synchronous relax-round shape as SSSP (operators/sssp.py): one hash
join + min-aggregate + outer-join-least per round, keyed by the vertex id;
rounds ≤ the longest time-respecting path's hop count; arrival times only
decrease, so convergence is monotone. Timestamps are epoch millis
(integers) end to end, so the fixed-round contract query (temporal_r3)
value-hashes EXACTLY against a k-unrolled CTE oracle — no float rounding
anywhere.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class TemporalResult:
    arrivals: DataFrame  # [node, arr_ms] — NULL = temporally unreachable
    iterations: int
    iter_metrics: list[dict] = field(default_factory=list)


def temporal_reachability(
    tedges: DataFrame,
    source,
    max_iter: int = 200,
    check_convergence: bool = True,
) -> TemporalResult:
    """Earliest arrival time (epoch millis) at every vertex over
    time-respecting paths from ``source``, whose own arrival is defined
    as 0 (any first hop qualifies). ``tedges`` is [src, dst, t_ms]; pass
    both directions explicitly for undirected contact semantics."""
    e = tedges.select("src", "dst", F.col("t_ms").cast("long").alias("t")).persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    arr = nodes.select(
        "node",
        F.when(F.col("node") == F.lit(source), F.lit(0).cast("long")).alias("arr"),
    ).persist()
    e.count()

    metrics: list[dict] = []
    it = 0
    for it in range(1, max_iter + 1):
        cand = (
            e.join(arr.filter(F.col("arr").isNotNull()), e["src"] == F.col("node"))
            .filter(F.col("t") >= F.col("arr"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("t").alias("cand"))
        )
        new = (
            arr.join(cand, "node", "left")
            .select(
                "node",
                F.least(F.col("arr"), F.col("cand")).alias("_a"),
                (
                    F.coalesce(F.least(F.col("arr"), F.col("cand")), F.lit(-1))
                    != F.coalesce(F.col("arr"), F.lit(-1))
                ).alias("chg"),
            )
            .withColumnRenamed("_a", "arr")
            .localCheckpoint(eager=False)
        )
        if check_convergence:
            changed = new.agg(F.sum(F.col("chg").cast("long"))).first()[0] or 0
            metrics.append({"iteration": it, "relaxed": int(changed)})
        else:
            changed = -1
        old = arr
        arr = new.select("node", "arr").persist()
        old.unpersist()
        if changed == 0:
            break

    e.unpersist()
    return TemporalResult(arrivals=arr, iterations=it, iter_metrics=metrics)


def bipartite_temporal_edges(events: DataFrame) -> DataFrame:
    """[src, dst, t_ms] — the user↔event-type temporal contact graph: each
    event connects its user node and type node in BOTH directions at the
    event's timestamp (epoch millis; parquet TIMESTAMP_NTZ read under the
    UTC session)."""
    base = events.select(
        F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("u"),
        F.concat(F.lit("e:"), F.col("event_type")).alias("e"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("t_ms"),
    )
    return base.selectExpr("u as src", "e as dst", "t_ms").union(
        base.selectExpr("e as src", "u as dst", "t_ms")
    )
