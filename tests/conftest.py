"""Shared fixtures: one local SparkSession per test run + FIXTURES.md §F3
canonical graphs (dense int ids; converted to DataFrames on demand)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import SparkSession

from linkgraph.session import get_spark


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    s = get_spark(app_name="linkgraph-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


def edges_df(spark, src, dst):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(src, dst)], "src long, dst long"
    )


# ---- FIXTURES.md §F3 canonical graphs (dense ids in [0, n)) ----

def toy_chain_dangling():
    # 0→1→2→3 ; node 3 dangling
    return np.array([0, 1, 2]), np.array([1, 2, 3]), 4


def toy_cycle():
    return np.array([0, 1, 2]), np.array([1, 2, 0]), 3


def two_components():
    src = np.array([0, 1, 2, 3, 4, 5, 6, 7, 8, 9])
    dst = np.array([1, 2, 3, 4, 0, 6, 7, 8, 9, 5])
    return src, dst, 10


def multi_edge():
    # duplicate (0,1) twice + self-loop (2,2) — reference keeps both (SURVEY §1.4)
    return np.array([0, 0, 0, 1, 2, 2]), np.array([1, 1, 2, 2, 0, 2]), 3


def star_hub(spokes: int = 1000):
    # hub node 0 pointed at by `spokes` spokes; hub points back at node 1
    src = np.concatenate([np.arange(1, spokes + 1), np.array([0])])
    dst = np.concatenate([np.zeros(spokes, dtype=np.int64), np.array([1])])
    return src, dst, spokes + 1


def isolated_nodes():
    # n=6 but only nodes 0..3 have edges; 4,5 isolated. Engine derives the
    # vertex set from edges, so the oracle comparison passes the edge-derived
    # n; the isolated-node case is tested via explicit vertex injection.
    return np.array([0, 1, 2, 3]), np.array([1, 2, 3, 0]), 6


def karate_club():
    """Zachary's karate club (public dataset; 34 nodes / 78 undirected edges),
    as a directed graph with both directions — the reference's own test graph
    (/root/reference/pr_submit.sh:33)."""
    und = [
        (0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (0, 6), (0, 7), (0, 8), (0, 10),
        (0, 11), (0, 12), (0, 13), (0, 17), (0, 19), (0, 21), (0, 31), (1, 2),
        (1, 3), (1, 7), (1, 13), (1, 17), (1, 19), (1, 21), (1, 30), (2, 3),
        (2, 7), (2, 8), (2, 9), (2, 13), (2, 27), (2, 28), (2, 32), (3, 7),
        (3, 12), (3, 13), (4, 6), (4, 10), (5, 6), (5, 10), (5, 16), (6, 16),
        (8, 30), (8, 32), (8, 33), (9, 33), (13, 33), (14, 32), (14, 33),
        (15, 32), (15, 33), (18, 32), (18, 33), (19, 33), (20, 32), (20, 33),
        (22, 32), (22, 33), (23, 25), (23, 27), (23, 29), (23, 32), (23, 33),
        (24, 25), (24, 27), (24, 31), (25, 31), (26, 29), (26, 33), (27, 33),
        (28, 31), (28, 33), (29, 32), (29, 33), (30, 32), (30, 33), (31, 32),
        (31, 33), (32, 33),
    ]
    src = np.array([u for u, v in und] + [v for u, v in und])
    dst = np.array([v for u, v in und] + [u for u, v in und])
    return src, dst, 34
