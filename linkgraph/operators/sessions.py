"""Sessionization + activity rollups over event/transcript streams.

Standard training-data-pipeline operators on timestamped interaction
tables; all pure Catalyst (window functions + aggregates), no UDFs.

* ``sessionize``      — gap-based session ids: a new session starts when the
                        actor's inter-event gap exceeds ``gap``; session id =
                        running count of session starts per actor (the
                        classic lag + cumulative-sum-over-window formulation).
* ``session_stats``   — per-session rollup (events, span, first/last ts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    actor_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple = ("event_id",),
    gap_seconds: int = 1800,
) -> DataFrame:
    """Append ``session_seq`` (1-based per actor): new session when the gap
    from the previous event exceeds ``gap_seconds``."""
    w = Window.partitionBy(actor_col).orderBy(ts_col, *order_cols)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev_us = F.lag(us).over(w)
    # exact integer microseconds (unix_timestamp truncates sub-second)
    new_sess = F.when(
        prev_us.isNull() | ((us - prev_us) > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    return events.withColumn(
        "session_seq",
        F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_stats(
    events: DataFrame,
    actor_col: str = "user_id",
    ts_col: str = "ts",
    order_cols: tuple = ("event_id",),
    gap_seconds: int = 1800,
) -> DataFrame:
    """[actor, session_seq, n_events, span_sec, first_ts, last_ts]."""
    s = sessionize(events, actor_col, ts_col, order_cols, gap_seconds)
    return s.groupBy(actor_col, "session_seq").agg(
        F.count("*").alias("n_events"),
        F.floor(
            (
                F.unix_micros(F.max(ts_col).cast("timestamp"))
                - F.unix_micros(F.min(ts_col).cast("timestamp"))
            )
            / 1000
        ).cast("long").alias("span_ms"),
        F.min(ts_col).alias("first_ts"),
        F.max(ts_col).alias("last_ts"),
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    actor_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel analysis: for each actor, the earliest completion
    time of each funnel step, where step i must occur strictly AFTER the
    actor's chosen step i−1 occurrence (greedy earliest-first matching —
    the standard product-analytics funnel; greedy-earliest is optimal for
    existence: if any time-respecting match exists, the greedy one does).
    Returns [<actor_col>, ts_1..ts_N, steps_completed].

    Plan: one conditional min-aggregate per step over the SAME grouped
    scan — N chained per-actor aggregates on an N-step funnel, each a
    partial+final min keyed by the actor; no joins, no window sort. The
    chain is expressed as N groupBy passes over the per-actor (type, ts)
    pairs collected once — at 100 TB this is one shuffle on the actor key
    plus per-group array work, the shape that survives skew via AQE."""
    pairs = events.select(
        F.col(actor_col).alias("actor"),
        F.col(type_col).alias("t"),
        F.col(ts_col).alias("ts"),
    )
    # one shuffle: all (type, ts) pairs per actor, sorted by ts
    grouped = pairs.groupBy("actor").agg(
        F.array_sort(F.collect_list(F.struct("ts", "t"))).alias("evs")
    )
    # greedy scan inside the array: earliest step-i occurrence after the
    # matched step-(i-1) time — pure Catalyst FILTER/element_at, no UDF
    cur = grouped
    ts_cols = []
    for i, step in enumerate(steps, start=1):
        # NULL upstream ts cascades: s.ts > NULL filters everything out.
        # try_element_at: an unmatched step leaves an empty filter result,
        # which must yield NULL, not an ANSI index error
        hit = F.try_element_at(
            F.expr(
                f"filter(evs, s -> s.t = '{step}'"
                + (f" and s.ts > ts_{i - 1}" if i > 1 else "")
                + ")"
            ),
            F.lit(1),
        )
        cur = cur.withColumn(f"ts_{i}", hit["ts"])
        ts_cols.append(f"ts_{i}")
    done = sum((F.col(c).isNotNull()).cast("int") for c in ts_cols)
    return cur.select(
        F.col("actor").alias(actor_col),
        *ts_cols,
        done.alias("steps_completed"),
    )
