"""Streaming maintenance of a Count-Min Sketch.

The batch sketch (operators/sketches.py) is cell-wise ADDITIVE — exactly
the property that makes it the canonical STREAMING frequency summary
(Cormode-Muthukrishnan 2005 frame it as a stream algorithm). Here the
same md5 hash family runs as a Structured Streaming aggregation:

* items explode to their (row_idx, col_idx) probes and an UPDATE-mode
  ``groupBy.count`` holds the running cell totals in streaming state —
  each microbatch emits exactly the cells whose totals changed;
* ``foreachBatch`` upserts those cells into a parquet table. Unlike the
  degree table (vertex-sized, hence hash-bucketed dynamic overwrite,
  streaming/hubs.py), the sketch is CONSTANT-SIZE (≤ depth·width rows
  no matter the stream), so the upsert keeps unchanged cells with one
  anti-join and rewrites the whole tiny table — materialized before the
  overwrite so the read never races the replace.

Exactly-once: totals are absolute (not increments), so a replayed
microbatch re-upserts the same values — the table converges to the
batch ``cms_build`` answer after any retry; parity is pinned in
tests/test_streaming.py. Point queries / heavy hitters over the
maintained table reuse ``cms_estimate`` unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkgraph.operators.sketches import _cms_col

CMS_SCHEMA = "row_idx int, col_idx long, c long"


def stream_cms_totals(
    items: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    item_col: str = "item",
    depth: int = 3,
    width: int = 256,
    available_now: bool = False,
):
    """Start a streaming query maintaining the CMS counter table under
    ``table_dir``. ``items`` is a streaming DataFrame with ``item_col``.
    Returns the StreamingQuery handle."""
    tok = F.col(item_col).cast("string")
    pairs = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_idx"),
                        _cms_col(i, tok, width).alias("col_idx"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rc")
    ).select("rc.row_idx", "rc.col_idx")
    totals = pairs.groupBy("row_idx", "col_idx").agg(
        F.count(F.lit(1)).alias("c")
    )

    def _upsert(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        updated = batch.persist()
        out = None
        try:
            if updated.isEmpty():
                return
            out = updated
            jvm = spark._jvm
            hpath = jvm.org.apache.hadoop.fs.Path(table_dir)
            fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
            if fs.exists(hpath) and fs.listStatus(hpath):
                existing = spark.read.schema(CMS_SCHEMA).parquet(table_dir)
                keep = existing.join(
                    updated.select("row_idx", "col_idx"),
                    ["row_idx", "col_idx"],
                    "left_anti",
                )
                out = updated.unionByName(keep).persist()
                out.count()  # materialize BEFORE replacing what it reads
            out.coalesce(1).write.mode("overwrite").parquet(table_dir)
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


def read_cms_table(spark: SparkSession, table_dir: str) -> DataFrame:
    """[row_idx, col_idx, c] — the maintained sketch, directly usable by
    ``operators.sketches.cms_estimate``."""
    return spark.read.schema(CMS_SCHEMA).parquet(table_dir)
