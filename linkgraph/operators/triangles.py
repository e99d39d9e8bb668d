"""Triangle counting — degree-ordered edge orientation + wedge-closing joins.

North-rule operator (SURVEY §2.9); no reference implementation exists. The
standard distributed formulation (Suri & Vassilvitskii, "Counting Triangles
and the Curse of the Last Reducer", WWW'11): orient each undirected edge from
the lower-(degree, id) endpoint to the higher one — every vertex's oriented
out-degree is then O(sqrt(m)), which is exactly the hub-skew bound that makes
the wedge self-join survive power-law graphs at scale (the same concern the
reference's JDS degree-bucketing addresses for SpMV,
/root/reference/readers/mtx_hybrid.h:39-221).

Plan shape: 2 self-joins of the oriented edge table (wedge build + closure
probe), both shuffle hash joins on long keys; Catalyst/AQE handles the rest.
Counts are exact integers on the SIMPLE undirected graph (multi-edges
deduped, self-loops dropped).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.operators.degrees import symmetrize


def _oriented(edges: DataFrame) -> DataFrame:
    """Orient the simple undirected graph: u -> v iff (deg(u), u) < (deg(v), v)."""
    sym = symmetrize(edges)
    deg = sym.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("deg"))
    return (
        sym.join(deg.withColumnRenamed("node", "src").withColumnRenamed("deg", "deg_src"), "src")
        .join(deg.withColumnRenamed("node", "dst").withColumnRenamed("deg", "deg_dst"), "dst")
        .filter(
            (F.col("deg_src") < F.col("deg_dst"))
            | ((F.col("deg_src") == F.col("deg_dst")) & (F.col("src") < F.col("dst")))
        )
        .select("src", "dst")
    )


def triangles_per_vertex(edges: DataFrame) -> DataFrame:
    """[node, triangles] for every vertex in a triangle (exact)."""
    matched = _matched_triangles(edges)
    return (
        matched.select(F.explode(F.array("u", "v", "w")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("triangles"))
    )


def _matched_triangles(edges: DataFrame) -> DataFrame:
    e = _oriented(edges).persist()
    e1 = e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    e2 = e.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    wedges = e1.join(e2, "v")
    e3 = e.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    return wedges.join(e3, ["u", "w"], "inner")


def triangle_count(edges: DataFrame) -> int:
    """Total triangle count (each triangle counted exactly once — the
    orientation is a total order, so every triangle has exactly one
    low->mid->high wedge closed by one low->high edge)."""
    return _matched_triangles(edges).count()
