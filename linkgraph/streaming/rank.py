"""Streaming PageRank maintenance — warm-start recompute per microbatch.

Extends the streaming layer past degree maintenance (streaming/hubs.py):
as reply edges land, keep a CURRENT rank table without ever paying a
cold-start convergence. Exact maintenance of PageRank under edge inserts
necessarily touches most ranks (the teleport renormalization couples every
vertex), so the honest incremental scheme is the classic warm-start one:
re-run the power iteration on the maintained edge table, initialized from
the previous snapshot instead of 1/n. For a microbatch that adds a small
edge delta the previous fixed point is within O(delta) of the new one and
the loop converges in a small number of iterations (the iteration log
records how few — pinned in tests), while the answer stays EXACTLY the
batch fixed point: parity with a cold `pagerank_dataframe` on the full
edge table is asserted to 1e-6 in tests after every drop.

Durability layout under ``work_dir`` (all writes epoch-idempotent, so a
replayed microbatch after any crash converges to the same state):

* ``edges/epoch=<k>/``  — the maintained edge table; each microbatch
  OVERWRITES its own epoch partition (replay rewrites, never duplicates).
* ``ranks/snap=<k>/``   — rank snapshot parquet per epoch.
* ``ranks/manifest-<k>.json`` — commit record; a snapshot is visible iff
  its manifest exists. The manifest lands via Hadoop-FS rename (atomic on
  HDFS; the sandbox's local FS too) onto a name that embeds the epoch, so
  promotion never overwrites in place and readers simply take the max
  epoch. Old snapshots are reaped after promote (previous one kept).

The recompute runs the UNBOUNDED dataframe engine
(operators/pagerank.py:pagerank_dataframe) — the path with no driver-size
assumptions — because the warm-start vector arrives as a distributed
[node, rank] table, never a driver array. Microbatch cadence (the
stream's trigger interval) is the freshness/cost knob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from linkgraph.streaming.manifest import read_manifest, write_manifest

EDGE_SCHEMA = "src long, dst long"
RANK_SCHEMA = "node long, rank double"


def stream_pagerank_maintenance(
    edges: DataFrame,
    work_dir: str,
    checkpoint_dir: str,
    d: float = 0.85,
    eps: float = 1e-6,
    max_iter: int = 200,
    available_now: bool = False,
):
    """Start a streaming query maintaining a converged rank table under
    ``work_dir`` as edges arrive. ``edges`` is a streaming DataFrame with
    ``src``/``dst`` (e.g. stream_reply_edges output). Returns the
    StreamingQuery handle; read results with ``read_rank_table`` /
    ``rank_maintenance_log``."""
    from linkgraph.operators.pagerank import pagerank_dataframe

    edges_root = f"{work_dir}/edges"
    ranks_root = f"{work_dir}/ranks"

    def _recompute(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        if batch.isEmpty():
            # stateful sources emit trailing no-data batches (timeout
            # handling); the edge table and fixed point are unchanged
            return
        # epoch-keyed OVERWRITE: a replayed microbatch rewrites its own
        # partition — the maintained edge table never holds duplicates
        batch.select("src", "dst").write.mode("overwrite").parquet(
            f"{edges_root}/epoch={epoch_id}"
        )
        full = spark.read.schema(EDGE_SCHEMA).option("basePath", edges_root).parquet(
            f"{edges_root}/epoch=*"
        ).select("src", "dst")
        prev = read_manifest(spark, ranks_root)
        warm = (
            spark.read.schema(RANK_SCHEMA).parquet(prev["path"])
            if prev is not None
            else None
        )
        res = pagerank_dataframe(
            full, d=d, eps=eps, max_iter=max_iter, init_ranks=warm
        )
        snap_path = f"{ranks_root}/snap={epoch_id}"
        # the loop's persisted state was already materialized by its own
        # actions, so this write re-reads nothing the overwrite touches
        res.ranks.write.mode("overwrite").parquet(snap_path)
        write_manifest(
            spark,
            ranks_root,
            epoch_id,
            {
                "epoch": epoch_id,
                "path": snap_path,
                "iterations": res.iterations,
                "norm": res.norm,
                "converged": res.converged,
                "warm_start": prev is not None,
            },
        )

    writer = (
        edges.writeStream.outputMode("append")
        .foreachBatch(_recompute)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_rank_table(spark: SparkSession, work_dir: str) -> DataFrame:
    """[node, rank] — the latest committed snapshot."""
    m = read_manifest(spark, f"{work_dir}/ranks")
    if m is None:
        raise FileNotFoundError(f"no committed rank snapshot under {work_dir}")
    return spark.read.schema(RANK_SCHEMA).parquet(m["path"])


def rank_maintenance_log(spark: SparkSession, work_dir: str) -> dict | None:
    """The latest commit record (epoch, iterations-to-converge from the
    warm start, norm, converged) — how cheap maintenance was."""
    return read_manifest(spark, f"{work_dir}/ranks")
