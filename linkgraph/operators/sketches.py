"""Count-Min Sketch — bounded-memory frequency estimation.

Cormode & Muthukrishnan, "An improved data stream summary: the
count-min sketch and its applications", J. Algorithms 55(1), 2005. The
workhorse frequency sketch of large-scale pipelines: a depth×width
counter table where item t increments cell (i, h_i(t)) for each of
``depth`` hash rows; the estimate min_i cell(i, h_i(t)) never
UNDERcounts and overcounts by at most εN (ε = e/width) with probability
1 − e^−depth. Unlike an exact token count, the sketch is FIXED-SIZE
(depth·width cells) no matter the vocabulary — the 100-TB-scale path
for frequency queries, heavy-hitter screens, and cross-shard merges
(sketches add cell-wise).

Hash family: row i hashes token t to
``int(md5(i ':' t)[:8 hex], 16) % width`` — pairwise-independent enough
in practice, deterministic across engines, and exactly reproducible in
ANSI SQL (DuckDB twin in the driver contract). xxhash64 would be
faster but has no DuckDB equivalent; md5 keeps the sketch
VALUE-CHECKABLE, matching this repo's oracle-first convention.

Plan shape: build = one explode to (row, col) pairs and one
partial+final count aggregate — output is depth·width rows regardless
of input size (map-side combine does the heavy lifting; the shuffle
carries at most depth·width distinct keys per mapper). Estimate /
heavy-hitters = a depth-way join of candidate hashes against the
sketch and a min aggregate; candidates are vocabulary-sized, the
sketch is constant-sized broadcast material.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cms_col(row_i: int, tok_col, width: int):
    """Row-``i`` bucket of a token: md5-derived 32-bit int mod width."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{row_i}:"), tok_col)), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % width
    )


def cms_build(
    items: DataFrame,
    item_col: str = "item",
    depth: int = 3,
    width: int = 256,
) -> DataFrame:
    """Build the sketch over one item per input row. Returns the counter
    table [row_idx, col_idx, c] — at most depth·width rows. Sketches of
    disjoint inputs MERGE by summing c on (row_idx, col_idx)."""
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
    return pairs.groupBy("row_idx", "col_idx").agg(
        F.count(F.lit(1)).alias("c")
    )


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    item_col: str = "item",
    depth: int = 3,
    width: int = 256,
) -> DataFrame:
    """Point-query the sketch for each candidate item (one row per
    item). Returns [item, est] with est = min over the depth rows —
    never below the true count. Missing cells read as 0 (the candidate
    hashed to a bucket nothing incremented)."""
    tok = F.col(item_col).cast("string")
    cand = candidates.select(tok.alias("item")).distinct()
    probes = cand.select(
        "item",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_idx"),
                        _cms_col(i, F.col("item"), width).alias("col_idx"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rc"),
    ).select("item", "rc.row_idx", "rc.col_idx")
    return (
        probes.join(sketch, ["row_idx", "col_idx"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce("c", F.lit(0))).alias("est"))
    )


def cms_heavy_hitters(
    items: DataFrame,
    item_col: str = "item",
    k: int = 10,
    depth: int = 3,
    width: int = 256,
) -> DataFrame:
    """Top-k items by CMS estimate, deterministic ties (est desc, item
    asc). Returns [item, est, rank]. The scan finds candidates (the
    distinct items seen) and the constant-size sketch scores them; at
    stream scale the candidate set is whatever heavy-hitter candidate
    store accompanies the sketch."""
    from pyspark.sql import Window

    sketch = cms_build(items, item_col, depth, width)
    est = cms_estimate(sketch, items.select(item_col), item_col, depth, width)
    # TakeOrderedAndProject first (scale-safe top-k), THEN rank the k
    # survivors — the global window only ever sees k rows
    top = est.orderBy(F.desc("est"), F.asc("item")).limit(k)
    w = Window.orderBy(F.desc("est"), F.asc("item"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "item", "est", "rank"
    )
