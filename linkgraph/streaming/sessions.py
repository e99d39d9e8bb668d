"""Streaming sessionization — per-actor gap sessions via
``applyInPandasWithState`` (the custom-stateful-operator path of
Structured Streaming; same discipline as streaming/edges.py).

Semantics are EXACTLY the batch rule (operators/sessions.py sessionize):
events of one actor ordered by (ts, event_id); a new session starts when
the inter-event gap exceeds ``gap_seconds`` (strict >, exact integer
microseconds); ``session_seq`` is the 1-based running count of session
starts. The carried state per actor is just the (last_us, last_event_id,
seq) frontier — O(1) per actor, the bounded-memory shape that scales to
any number of actors (state store is partitioned by the group key).

Ordering contract: parity with the batch rule holds when each actor's
events arrive across microbatches in non-decreasing (ts, event_id) order
(an append-ordered source). Rows at-or-behind the carried frontier are
duplicates / late arrivals and are DROPPED (documented at-least-once
semantics — the already-emitted numbering cannot be revised); within one
microbatch, arbitrary chunking/order is handled by concat + one bounded
per-group sort, exactly like the reply-edge derivation.

Parity after every drop is pinned in tests/test_streaming.py against
sessionize() on everything seen.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = "user_id long, event_id long, ts timestamp, session_seq long"
_STATE_SCHEMA = "last_us long, last_eid long, seq long"


def _us(ts_series: pd.Series) -> pd.Series:
    # exact integer microseconds regardless of the Arrow-side unit
    return pd.Series(
        ts_series.values.astype("datetime64[us]").astype("int64"),
        index=ts_series.index,
    )


def _session_fn(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    gap_us: int,
    set_ttl: bool,
) -> Iterable[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    last_us, last_eid, seq = state.get if state.exists else (-1, -1, 0)
    chunks = [p for p in pdfs if len(p)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True)
        pdf = pdf.sort_values(
            ["ts", "event_id"], kind="stable"
        ).reset_index(drop=True)
        us = _us(pdf["ts"])
        eid = pdf["event_id"].astype("int64")
        ahead = (us > last_us) | ((us == last_us) & (eid > last_eid))
        pdf, us = pdf[ahead].reset_index(drop=True), us[ahead].reset_index(drop=True)
    else:
        pdf = pd.DataFrame()
    if len(pdf):
        prev_us = us.shift(1)
        if last_us >= 0:
            prev_us.iloc[0] = last_us
        new_sess = prev_us.isna() | ((us - prev_us) > gap_us)
        pdf["session_seq"] = int(seq) + new_sess.cumsum().astype("int64")
        seq = int(pdf["session_seq"].iloc[-1])
        last_us = int(us.iloc[-1])
        last_eid = int(pdf["event_id"].iloc[-1])
        state.update((last_us, last_eid, seq))
        if set_ttl:
            state.setTimeoutDuration(3600 * 1000)
        yield pdf[["user_id", "event_id", "ts", "session_seq"]]
    else:
        state.update((last_us, last_eid, seq))
        if set_ttl:
            state.setTimeoutDuration(3600 * 1000)


def stream_sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    state_ttl: bool = True,
) -> DataFrame:
    """[user_id, event_id, ts, session_seq] — streaming twin of
    operators/sessions.py sessionize. ``state_ttl=True`` arms a 1-hour
    processing-time timer that garbage-collects idle actors' state; pass
    False for bounded availableNow backfills (same caveat as
    stream_reply_edges: TTL'd state keeps an availableNow drain alive
    until the timers fire)."""
    gap_us = int(gap_seconds) * 1_000_000
    if state_ttl:
        conf = GroupStateTimeout.ProcessingTimeTimeout

        def _fn(key, pdfs, state):
            return _session_fn(key, pdfs, state, gap_us, set_ttl=True)

    else:
        conf = GroupStateTimeout.NoTimeout

        def _fn(key, pdfs, state):
            return _session_fn(key, pdfs, state, gap_us, set_ttl=False)

    return (
        events.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _fn,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=conf,
        )
    )
