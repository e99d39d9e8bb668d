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
