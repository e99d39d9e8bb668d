"""Reference edge-file text format — interchange parity with the reference.

Format (reference /root/reference/helpers/file_helper.h:34-88, README.md:6-8):
first line ``nodes_count<TAB>edges_count``, then one ``src<TAB>dst`` per line,
ids dense in [0, n). We validate endpoints to [0, n) — the reference has an
off-by-one (`> nodes_count` instead of `>=`, file_helper.h:75-76) that we
deliberately do NOT replicate (SURVEY §1.4). Out-of-range lines are skipped,
matching the reference's skip-and-continue behavior. Comment lines starting
with '#' or '*' are skipped (reference py_src/prepare_graph.py:3-12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_edge_file(spark: SparkSession, path: str) -> DataFrame:
    """Read the reference text format -> DataFrame[src: long, dst: long].

    The header's node count is used only for range validation; the vertex
    set in this engine is always derived explicitly (SURVEY §1.4: isolated
    nodes must still receive the teleport base).
    """
    raw = spark.read.text(path)
    header = raw.limit(1).collect()[0][0].split("\t")
    n = int(header[0])
    body = (
        raw.filter(~F.col("value").startswith("#"))
        .filter(~F.col("value").startswith("*"))
        .filter(F.col("value").contains("\t"))
    )
    split = F.split(F.col("value"), "\t")
    edges = body.select(
        split.getItem(0).cast("long").alias("src"),
        split.getItem(1).cast("long").alias("dst"),
    ).filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    # drop the header row (it parses as (n, m)) by anti-matching its exact
    # content once: safer is to re-filter range; header (n,m) survives only
    # if it happens to be a valid edge, so remove the first line explicitly.
    first = header[0] + "\t" + header[1]
    edges = body.filter(F.col("value") != first).select(
        split.getItem(0).cast("long").alias("src"),
        split.getItem(1).cast("long").alias("dst"),
    )
    return edges.filter(
        (F.col("src") >= 0) & (F.col("src") < n) & (F.col("dst") >= 0) & (F.col("dst") < n)
    )


def write_edge_file(edges: DataFrame, n: int, path: str) -> None:
    """Write DataFrame[src, dst] in the reference text format (single file).

    Driver-side write — this format exists for small-fixture oracle
    interchange only; parquet/Iceberg is the engine's real sink.
    """
    rows = edges.select("src", "dst").collect()
    with open(path, "w") as f:
        f.write(f"{n}\t{len(rows)}\n")
        for r in rows:
            f.write(f"{r[0]}\t{r[1]}\n")
