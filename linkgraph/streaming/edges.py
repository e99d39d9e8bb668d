"""Structured Streaming ingest: transcripts stream -> incremental edge table.

The reference is batch-only (its ingest is a one-shot file scan,
/root/reference/helpers/file_helper.h:34-88); this module is the engine
addition that keeps the edge table current as new conversation turns land —
the natural deployment for 10^12-turn transcript stores where full
recomputation is not an option.

Design (all standard Structured Streaming):

* ``read_transcript_stream``  — file-source stream over a parquet directory
  with the TRANSCRIPT_SCHEMA (an Iceberg/Kafka source drops in unchanged —
  the transformations below are source-agnostic).
* ``stream_reply_edges``      — per-conversation reply edges via
  ``applyInPandasWithState``: the stream analogue of the batch lag() window
  (sources/transcripts.py). State per conv_id = (last turn_idx, last actor),
  so a turn arriving later emits exactly the edge the batch rule derives;
  within-batch turns are processed in turn_idx order. State expires via a
  processing-time timeout so idle conversations are dropped.
* ``stream_edge_counts``      — watermarked sliding-window edge-weight
  aggregation (groupBy window + src/dst), late data handled by the
  watermark; this is the streaming form of the batch weight rollup
  (__spark_entry__.q_edge_derivation).

Batch/stream parity is pinned in tests: replaying a transcript table
through the stream must yield exactly the batch ``derive_edges`` multiset
when turns arrive in order.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from linkgraph.sources.transcripts import TRANSCRIPT_SCHEMA

_EDGE_SCHEMA = "src_name string, dst_name string, src long, dst long"
_STATE_SCHEMA = "last_turn int, last_actor string"


def read_transcript_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 16
) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def _reply_edge_fn(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    set_ttl: bool = True,
) -> Iterable[pd.DataFrame]:
    """Stateful per-conv_id reply-edge derivation. Emits one edge per turn
    t>=1: actor(t) -> actor(t-1) plus actor -> tool when tool is set —
    identical to the batch rule (sources/transcripts.py derive_edges)."""
    import numpy as np  # noqa: F401  (pandas ops only; kept vectorized)

    if state.hasTimedOut:
        state.remove()
        return
    last_turn, last_actor = state.get if state.exists else (-1, None)
    # applyInPandasWithState may deliver one group's rows as several chunks
    # with no ordering guarantee between them — concatenate first, sort ONCE
    # by turn_idx, then apply the lag logic (bounded per group per microbatch).
    chunks = [p for p in pdfs if len(p)]
    frames = []
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True)
        pdf = pdf.sort_values("turn_idx", kind="stable").reset_index(drop=True)
        # turns at-or-before the carried frontier are duplicates / late
        # out-of-order arrivals; the batch global ordering cannot be
        # recovered retroactively, so they are dropped (documented
        # at-least-once semantics for out-of-order sources)
        pdf = pdf[pdf["turn_idx"] > last_turn].reset_index(drop=True)
    else:
        pdf = pd.DataFrame()
    if len(pdf):
        # POSITIONAL lag, mirroring the batch rule (sources/transcripts.py
        # derive_edges: lag over ORDER BY turn_idx): every adjacent-in-order
        # pair yields an edge regardless of turn_idx gaps — filtered/sparse
        # turn indices must not silently drop edges.
        prev_actor = pdf["role"].shift(1)
        if last_actor is not None:
            prev_actor.iloc[0] = last_actor
        reply = prev_actor.notna()
        frames.append(
            pd.DataFrame(
                {"src_name": pdf.loc[reply, "role"], "dst_name": prev_actor[reply]}
            )
        )
        tool = pdf["tool"].notna()
        frames.append(
            pd.DataFrame(
                {"src_name": pdf.loc[tool, "role"], "dst_name": pdf.loc[tool, "tool"]}
            )
        )
        last_turn = int(pdf["turn_idx"].iloc[-1])
        last_actor = pdf["role"].iloc[-1]
    state.update((last_turn, last_actor))
    if set_ttl:
        state.setTimeoutDuration(3600 * 1000)
    out = pd.concat(frames, ignore_index=True) if frames else None
    if out is not None and len(out):
        # xxhash64 keying happens downstream (JVM-side) — emit names here
        out["src"] = 0
        out["dst"] = 0
        yield out


def stream_reply_edges(
    transcripts: DataFrame, state_ttl: bool = True
) -> DataFrame:
    """Streaming reply+tool edge derivation with per-conversation state.

    ``state_ttl=True`` (default, continuous mode) arms a 1-hour
    processing-time timer that garbage-collects idle conversations'
    state. CAVEAT for drains: under ``Trigger.AvailableNow`` Spark keeps
    the query alive scheduling empty microbatches until pending state
    timers fire, so an available-now backfill over a TTL'd stream never
    self-terminates inside the drain window — pass ``state_ttl=False``
    for bounded catch-up jobs (state then lives until the checkpoint is
    discarded, the right trade for a finite backfill)."""
    if state_ttl:
        fn, conf = _reply_edge_fn, GroupStateTimeout.ProcessingTimeTimeout

        def _fn(key, pdfs, state):
            return fn(key, pdfs, state, set_ttl=True)

    else:
        conf = GroupStateTimeout.NoTimeout

        def _fn(key, pdfs, state):
            return _reply_edge_fn(key, pdfs, state, set_ttl=False)

    derived = (
        transcripts.select("conv_id", "turn_idx", "role", "tool")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _fn,
            outputStructType=_EDGE_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=conf,
        )
    )
    return derived.select(
        "src_name",
        "dst_name",
        F.xxhash64("src_name").alias("src"),
        F.xxhash64("dst_name").alias("dst"),
    )


def stream_edge_counts(
    transcripts: DataFrame,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked windowed edge-weight rollup over the tool edges (the
    edges derivable without cross-row state): [window, src_name, dst_name,
    weight]. Late turns beyond the watermark are dropped — documented
    at-least-once semantics for the rollup sink."""
    tool_edges = transcripts.filter(F.col("tool").isNotNull()).select(
        F.col("role").alias("src_name"), F.col("tool").alias("dst_name"), "ts"
    )
    return (
        tool_edges.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window, slide or window).alias("win"),
            "src_name",
            "dst_name",
        )
        .agg(F.count("*").alias("weight"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "src_name",
            "dst_name",
            "weight",
        )
    )
