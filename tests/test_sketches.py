"""Count-Min Sketch (operators/sketches.py) — guarantees + replica."""

from __future__ import annotations

import hashlib
from collections import Counter

import pytest
from pyspark.sql import functions as F

from linkgraph.operators.sketches import (
    cms_build,
    cms_estimate,
    cms_heavy_hitters,
)


def _h(i: int, tok: str, width: int) -> int:
    return int(hashlib.md5(f"{i}:{tok}".encode()).hexdigest()[:8], 16) % width


def _replica_sketch(tokens, depth, width):
    cells = Counter()
    for t in tokens:
        for i in range(depth):
            cells[(i, _h(i, t, width))] += 1
    return cells


def _replica_est(cells, tok, depth, width):
    return min(cells.get((i, _h(i, tok, width)), 0) for i in range(depth))


TOKENS = (
    ["alpha"] * 50 + ["beta"] * 30 + ["gamma"] * 12
    + [f"rare{i}" for i in range(40)]
)


def _items(spark):
    return spark.createDataFrame([(t,) for t in TOKENS], "item string")


def test_cms_matches_replica_and_never_undercounts(spark):
    depth, width = 3, 64
    sketch = cms_build(_items(spark), depth=depth, width=width)
    cells = {
        (r["row_idx"], r["col_idx"]): r["c"] for r in sketch.collect()
    }
    want = _replica_sketch(TOKENS, depth, width)
    assert cells == dict(want)
    est = {
        r["item"]: r["est"]
        for r in cms_estimate(
            sketch, _items(spark), depth=depth, width=width
        ).collect()
    }
    true = Counter(TOKENS)
    n = len(TOKENS)
    for t, c in true.items():
        assert est[t] >= c, (t, est[t], c)  # the one-sided guarantee
        assert est[t] == _replica_est(want, t, depth, width)
        # standard bound: overshoot <= (e/width)*N whp; generous pin
        assert est[t] - c <= max(1, (4 * n) // width)


def test_cms_exact_when_wide(spark):
    # width >> distinct items: collisions vanish, estimates are exact
    sketch = cms_build(_items(spark), depth=3, width=4096)
    est = {
        r["item"]: r["est"]
        for r in cms_estimate(
            sketch, _items(spark), depth=3, width=4096
        ).collect()
    }
    assert est == dict(Counter(TOKENS))


def test_cms_merge_is_cellwise_sum(spark):
    half_a = spark.createDataFrame([(t,) for t in TOKENS[:60]], "item string")
    half_b = spark.createDataFrame([(t,) for t in TOKENS[60:]], "item string")
    sa = cms_build(half_a, depth=2, width=32)
    sb = cms_build(half_b, depth=2, width=32)
    merged = (
        sa.unionByName(sb)
        .groupBy("row_idx", "col_idx")
        .agg(F.sum("c").alias("c"))
    )
    whole = cms_build(_items(spark), depth=2, width=32)
    got = {(r["row_idx"], r["col_idx"]): r["c"] for r in merged.collect()}
    want = {(r["row_idx"], r["col_idx"]): r["c"] for r in whole.collect()}
    assert got == want


def test_cms_heavy_hitters_order_and_missing_item(spark):
    hh = cms_heavy_hitters(_items(spark), k=3, depth=3, width=4096).collect()
    assert [(r["item"], r["est"]) for r in hh] == [
        ("alpha", 50),
        ("beta", 30),
        ("gamma", 12),
    ]
    assert [r["rank"] for r in hh] == [1, 2, 3]
    # an item never inserted estimates 0 on a wide sketch
    sk = cms_build(_items(spark), depth=3, width=4096)
    ghost = spark.createDataFrame([("nope",)], "item string")
    row = cms_estimate(sk, ghost, depth=3, width=4096).collect()[0]
    assert row["est"] == 0
