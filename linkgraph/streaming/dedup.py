"""Streaming exact deduplication — a maintained seen-hash table.

The ingestion-side twin of operators/dedup.exact_dedup: as document
microbatches land, keep ONE canonical copy per exact text (md5) — the
first arrival wins, batch-internal ties break to the smallest id (the
same deterministic keeper rule as the batch operator). This is the op a
streaming training-data pipeline runs on every arriving shard: probe the
corpus-wide seen table, drop known texts, admit and register the rest.

Plan per microbatch (all join/agg-rooted, no per-row Python):

1. hash the batch (md5(text)) and reduce to one candidate keeper per
   hash (min id) — a batch-sized partial aggregate;
2. LEFT ANTI join against the maintained seen table — only NEW hashes
   survive (the probe is hash-keyed; on a real cluster the seen table
   is bucketed by hash so the probe shuffles the batch, never the
   corpus);
3. append the survivors to the previous snapshot and promote via the
   shared atomic-manifest protocol (streaming/manifest.py) —
   epoch-idempotent, so crash replay of a committed epoch is a no-op
   and the table can never double-admit a text.

Scale note: step 3 rewrites the snapshot (O(corpus hashes)) because the
sandbox protocol favors the simple snapshot/manifest layout shared by
rank/components maintenance; at 100 TB the seen table would be a
hash-bucketed table with per-bucket appends (exactly streaming/hubs.py's
layout — only buckets touched by the batch are written) or an Iceberg
MERGE. The probe-side algebra (anti-join on the hash) is identical in
all three layouts.

Determinism: with microbatches arriving in ascending-id order the final
keeper per hash equals the BATCH exact_dedup keeper (global min id), so
a fixed two-chunk drive gets a full value-hash driver oracle
(`stream_dedup` — the SQL twin is one GROUP BY).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkgraph.streaming.manifest import read_manifest, write_manifest

SEEN_SCHEMA = "text_hash string, keeper_id long"


def stream_exact_dedup(
    docs: DataFrame,
    work_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = False,
):
    """Start a streaming query maintaining the seen-hash table
    [text_hash, keeper_id] under ``work_dir``/seen. ``docs`` is a
    streaming DataFrame with ``id_col`` and ``text_col``. Returns the
    StreamingQuery handle."""
    seen_root = f"{work_dir}/seen"

    def _apply(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        if batch.isEmpty():
            return
        prev = read_manifest(spark, seen_root)
        if prev is not None and int(prev["epoch"]) >= epoch_id:
            return  # replay of an already-committed epoch
        cand = (
            batch.select(
                F.col(id_col).alias("keeper_id"),
                F.md5(F.col(text_col)).alias("text_hash"),
            )
            .groupBy("text_hash")
            .agg(F.min("keeper_id").alias("keeper_id"))
        )
        if prev is not None:
            old = spark.read.schema(SEEN_SCHEMA).parquet(prev["path"])
            # persist the anti-join so the snapshot write and the admitted
            # count execute the probe ONCE (the probe is the O(batch)
            # delta work; re-running it per bookkeeping action would
            # double the per-batch cost)
            fresh = cand.join(old, "text_hash", "left_anti").persist()
            new_seen = old.unionByName(fresh.select("text_hash", "keeper_id"))
        else:
            fresh = cand.persist()
            new_seen = fresh.select("text_hash", "keeper_id")
        n_fresh = fresh.count()
        snap_path = f"{seen_root}/snap={epoch_id}"
        new_seen.write.mode("overwrite").parquet(snap_path)
        fresh.unpersist()
        # corpus size rides the manifest forward — no O(corpus) snapshot
        # re-scan per batch just to count rows
        prev_n = int(prev["n_hashes"]) if prev is not None else 0
        write_manifest(
            spark,
            seen_root,
            epoch_id,
            {
                "epoch": epoch_id,
                "path": snap_path,
                "n_hashes": prev_n + int(n_fresh),
                "admitted": int(n_fresh),
            },
        )

    writer = (
        docs.writeStream.outputMode("append")
        .foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_dedup_table(spark: SparkSession, work_dir: str) -> DataFrame:
    """[text_hash, keeper_id] — the latest committed seen-hash table."""
    m = read_manifest(spark, f"{work_dir}/seen")
    if m is None:
        raise FileNotFoundError(f"no committed seen snapshot under {work_dir}")
    return spark.read.schema(SEEN_SCHEMA).parquet(m["path"])


def dedup_maintenance_log(spark: SparkSession, work_dir: str) -> dict | None:
    """Latest commit record: corpus hash count + per-batch admissions."""
    return read_manifest(spark, f"{work_dir}/seen")
