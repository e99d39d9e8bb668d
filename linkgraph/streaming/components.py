"""Streaming connected-components maintenance — warm-start recompute.

The third maintained table of the streaming layer (after degrees,
streaming/hubs.py, and PageRank, streaming/rank.py): as reply edges
land, keep a CURRENT [node, component] table. Under edge INSERTS
components only merge, so the previous labeling is a valid warm start
for min-label propagation (see connected_components(init_labels=...)):
the recompute converges in rounds proportional to the new merge paths —
typically 1-2 for a small microbatch — while the answer stays EXACTLY
the batch fixpoint (component id = min node id; parity with a cold run
on the full edge table asserted in tests after every drop).

Durability layout under ``work_dir`` mirrors rank.py exactly (same
atomic-manifest commit protocol, streaming/manifest.py):

* ``edges/epoch=<k>/``       — maintained edge table, epoch-keyed
  overwrite (replay rewrites, never duplicates);
* ``comps/snap=<k>/``        — labeling snapshot per epoch;
* ``comps/manifest-<k>.json`` — commit record; max epoch wins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from linkgraph.streaming.manifest import read_manifest, write_manifest

EDGE_SCHEMA = "src long, dst long"
COMP_SCHEMA = "node long, component long"


def stream_components_maintenance(
    edges: DataFrame,
    work_dir: str,
    checkpoint_dir: str,
    max_iter: int = 100,
    available_now: bool = False,
):
    """Start a streaming query maintaining the exact component labeling
    under ``work_dir`` as edges arrive. ``edges`` is a streaming
    DataFrame with ``src``/``dst``. Returns the StreamingQuery handle;
    read results with ``read_component_table`` / ``components_log``."""
    from linkgraph.operators.components import connected_components

    edges_root = f"{work_dir}/edges"
    comps_root = f"{work_dir}/comps"

    def _recompute(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        if batch.isEmpty():
            return
        batch.select("src", "dst").write.mode("overwrite").parquet(
            f"{edges_root}/epoch={epoch_id}"
        )
        full = (
            spark.read.schema(EDGE_SCHEMA)
            .option("basePath", edges_root)
            .parquet(f"{edges_root}/epoch=*")
            .select("src", "dst")
        )
        prev = read_manifest(spark, comps_root)
        warm = (
            spark.read.schema(COMP_SCHEMA).parquet(prev["path"])
            if prev is not None
            else None
        )
        res = connected_components(full, max_iter=max_iter, init_labels=warm)
        snap_path = f"{comps_root}/snap={epoch_id}"
        res.components.write.mode("overwrite").parquet(snap_path)
        write_manifest(
            spark,
            comps_root,
            epoch_id,
            {
                "epoch": epoch_id,
                "path": snap_path,
                "iterations": res.iterations,
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


def read_component_table(spark: SparkSession, work_dir: str) -> DataFrame:
    """[node, component] — the latest committed snapshot."""
    m = read_manifest(spark, f"{work_dir}/comps")
    if m is None:
        raise FileNotFoundError(f"no committed component snapshot under {work_dir}")
    return spark.read.schema(COMP_SCHEMA).parquet(m["path"])


def components_log(spark: SparkSession, work_dir: str) -> dict | None:
    """The latest commit record (epoch, iterations from the warm start) —
    how cheap maintenance was."""
    return read_manifest(spark, f"{work_dir}/comps")
