"""Graph views: vertices, degrees, dangling set, weighted edges, symmetrize.

These are the engine's derived relations over the canonical edge table
DataFrame[src: long, dst: long] — the Spark form of the auxiliary arrays the
reference materializes during its scan (out_degrees/in_degrees:
/root/reference/helpers/file_helper.h:65-88; leaves/dangling list:
/root/reference/readers/custom_matrix.h:40-59; per-edge weight 1/outdeg —
the COO data[]: /root/reference/readers/mtx_sparse.h:123-132).
All are single Catalyst aggregates/joins; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def vertices(edges: DataFrame) -> DataFrame:
    """Full vertex set = src ∪ dst. The reference's implicit [0, n) vertex
    range (helpers/helper.h:56-58) — made explicit so isolated/dangling
    nodes still receive teleport mass (SURVEY §1.4)."""
    return (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )


def out_degrees(edges: DataFrame) -> DataFrame:
    """[node, out_deg] — counts multi-edges, like the reference scan."""
    return edges.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("out_deg"))


def in_degrees(edges: DataFrame) -> DataFrame:
    return edges.groupBy(F.col("dst").alias("node")).agg(F.count("*").alias("in_deg"))


def dangling(edges: DataFrame) -> DataFrame:
    """Vertices with out-degree 0 — the reference's leaves[] list
    (custom_matrix.h:40-59). Anti-join keeps it one shuffle-free broadcast
    at typical dangling-set sizes."""
    return vertices(edges).join(
        edges.select(F.col("src").alias("node")).distinct(), "node", "left_anti"
    )


def weighted_edges(edges: DataFrame) -> DataFrame:
    """[src, dst, weight=1/out_deg(src)] — loop-invariant gather hoisting
    (reference expand_out_degrees kernel, kernels/pr_custom_matrix_in.cl:270-292):
    join once before the iteration loop, reuse every iteration."""
    od = out_degrees(edges)
    return edges.join(od, edges.src == od.node, "inner").select(
        "src", "dst", (F.lit(1.0) / F.col("out_deg").cast("double")).alias("weight")
    )


def symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected view for components / LPA / triangles: edges ∪ reversed,
    deduped, self-loops dropped."""
    fwd = edges.select("src", "dst")
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return fwd.unionByName(rev).filter(F.col("src") != F.col("dst")).distinct()
