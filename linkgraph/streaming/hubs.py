"""Streaming maintenance of the in-degree table + top-hubs snapshot.

The batch engine computes degree histograms with one aggregate
(operators/degrees.py — the reference scan's histograms,
/root/reference/helpers/file_helper.h:65-88). On a live transcript store
the same table must stay current as turns land; this module keeps it
current incrementally:

* a standard Structured Streaming aggregation (``groupBy(dst).count`` in
  UPDATE output mode) holds the running totals in streaming state — the
  microbatch output is exactly the set of (dst, new_total) rows whose
  totals changed;
* ``foreachBatch`` upserts those rows into a hash-bucketed parquet table
  with DYNAMIC partition overwrite: only buckets containing changed keys
  are rewritten (read-back of affected buckets + anti-join + union).
  At 10^8-vertex scale a microbatch touches the buckets of the vertices
  that actually received edges — not the whole table; bucket count is the
  rewrite-granularity knob. The same upsert becomes a single MERGE INTO
  when an Iceberg/Delta catalog is attached — the pattern (update-mode
  deltas + idempotent-by-epoch sink) is identical.

Exactly-once: the streaming aggregation state is checkpointed; a replayed
microbatch re-upserts the same totals (idempotent — totals are absolute,
not increments), so the table converges to the batch answer after any
retry. Parity with the batch ``in_degrees`` is pinned in tests.

Commit-window caveat (plain parquet has no atomic multi-partition commit):
the kept-keys union is materialized BEFORE the overwrite starts, so the
read never races the replace, but a crash inside the overwrite's own
commit window can still leave affected buckets partially replaced — and a
replayed microbatch re-upserts only the changed keys, not the unchanged
keys of those buckets. That residual window is the file-format's, not the
pattern's: pointing ``table_dir`` at an Iceberg/Delta table turns the same
upsert into a single atomic MERGE INTO (see linkgraph.checkpoint for the
jar-gated Iceberg wiring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEGREE_SCHEMA = "dst long, in_deg long, bucket int"


def stream_in_degree_totals(
    edges: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    n_buckets: int = 64,
    available_now: bool = False,
):
    """Start a streaming query maintaining [dst, in_deg] under ``table_dir``.

    ``edges`` is a streaming DataFrame with a ``dst`` column (e.g. the
    output of stream_reply_edges). ``available_now=True`` drains what is
    currently in the source then stops (catch-up/backfill mode); the
    default runs until stopped. Returns the StreamingQuery handle."""
    totals = edges.groupBy("dst").agg(F.count("*").alias("in_deg"))

    def _upsert(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        updated = batch.withColumn(
            "bucket", F.pmod(F.xxhash64("dst"), F.lit(n_buckets)).cast("int")
        )
        updated.persist()
        out = None
        try:
            affected = [r["bucket"] for r in updated.select("bucket").distinct().collect()]
            if not affected:
                return
            out = updated
            # existence probe through the Hadoop FS API (not os.*): table_dir
            # may live on HDFS/S3 — a local-only check would silently drop
            # the unchanged keys of rewritten buckets on a cluster.
            jvm = spark._jvm
            hpath = jvm.org.apache.hadoop.fs.Path(table_dir)
            fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
            if fs.exists(hpath) and fs.listStatus(hpath):
                # keep the unchanged keys living in the buckets we rewrite;
                # MATERIALIZE the union before the overwrite so the read of
                # the current table finishes before any of it is replaced
                # (self-referential read-then-overwrite)
                existing = spark.read.schema(DEGREE_SCHEMA).parquet(table_dir)
                keep = existing.filter(F.col("bucket").isin(affected)).join(
                    updated.select("dst"), "dst", "left_anti"
                )
                out = updated.unionByName(keep).persist()
                out.count()
            (
                out.repartition(max(1, len(affected)), "bucket")
                .write.mode("overwrite")
                # per-WRITE dynamic overwrite (not a session-conf mutation:
                # setting spark.sql.sources.partitionOverwriteMode on the
                # shared session would silently switch every later
                # partitioned overwrite in the app to dynamic semantics)
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("bucket")
                .parquet(table_dir)
            )
        finally:
            updated.unpersist()
            if out is not None and out is not updated:
                out.unpersist()

    writer = (
        totals.writeStream.outputMode("update")
        .foreachBatch(_upsert)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_degree_table(spark: SparkSession, table_dir: str) -> DataFrame:
    """[dst, in_deg] — the maintained table (bucket column dropped)."""
    return spark.read.schema(DEGREE_SCHEMA).parquet(table_dir).select("dst", "in_deg")


def top_hubs_snapshot(spark: SparkSession, table_dir: str, k: int = 10) -> DataFrame:
    """Top-k hubs off the maintained table — TakeOrderedAndProject over a
    bucketed scan; no stream restart needed for ad-hoc reads."""
    return read_degree_table(spark, table_dir).orderBy(
        F.desc("in_deg"), F.asc("dst")
    ).limit(k)
