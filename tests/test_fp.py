"""Cross-engine certification of the floor-scale rounding mechanism.

The round-5 oracle hardening rests on one claim: floor(x·10^d + 0.5)/10^d
evaluated by Spark and by DuckDB is bit-identical for every double x —
including the exact .5-boundary values where their round() builtins can
disagree (the round-4 conductance/modularity driver-hash flip). This file
tests the claim directly, on adversarial boundary values AND random
doubles, by evaluating both engines on the same inputs.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from linkgraph.fp import floor_scale, floor_scale_key

# adversarial values: representable decimal boundaries, dyadics that land
# EXACTLY on .5 boundaries (2^-9 = 0.001953125 has '5' at the 9th digit),
# integer ratios (the conductance/jaccard class), negatives, zero, and
# magnitudes near the scheme's working range
BOUNDARY = [
    0.0,
    -0.0,
    2.0**-9,            # 0.001953125 — exact .5 at digit 9 for d=8
    -(2.0**-9),
    5e-9, 1.5e-8, 2.5e-8, 0.123456785, 0.999999995,
    1.0 / 3.0, 2.0 / 3.0, 1.0 / 7.0, 22.0 / 7.0,
    3.0 / 16.0, 7.0 / 8.0, 0.1, 0.2, 0.3, 0.7,
    1.0, -1.0, 0.5, -0.5, 123.456, -987.654321,
    1e-12, -1e-12, 8.7e7,  # near the 2^53/1e8 working bound
]


def _spark_floor_scale(spark, xs, digits):
    df = spark.createDataFrame([(float(x),) for x in xs], "x double")
    return [
        r["y"]
        for r in df.select(floor_scale("x", digits).alias("y"))
        .collect()
    ]


def _duck_floor_scale(xs, digits):
    con = duckdb.connect()
    out = []
    for x in xs:
        # bind the exact double as a parameter — no text round-trip
        out.append(
            con.execute(
                f"SELECT floor((?) * 1e{digits} + 0.5) / 1e{digits}", [float(x)]
            ).fetchone()[0]
        )
    return out


@pytest.mark.parametrize("digits", [2, 6, 8, 10])
def test_floor_scale_cross_engine_boundary_values(spark, digits):
    got_spark = _spark_floor_scale(spark, BOUNDARY, digits)
    got_duck = _duck_floor_scale(BOUNDARY, digits)
    for x, a, b in zip(BOUNDARY, got_spark, got_duck):
        assert a == b or (math.isnan(a) and math.isnan(b)), (
            f"floor_scale({x!r}, {digits}) diverges: spark={a!r} duck={b!r}"
        )


def test_floor_scale_cross_engine_random(spark):
    # deterministic pseudo-random doubles across magnitudes (no RNG state
    # in the test): golden-ratio low-discrepancy sequence scaled per decade
    xs = []
    phi = (5**0.5 - 1) / 2
    for decade in (-9, -6, -3, 0, 3, 6):
        for i in range(1, 40):
            frac = (i * phi) % 1.0
            xs.append((frac - 0.5) * (10.0**decade))
    got_spark = _spark_floor_scale(spark, xs, 8)
    got_duck = _duck_floor_scale(xs, 8)
    assert got_spark == got_duck


def test_floor_scale_matches_python_semantics(spark):
    # the same expression in plain python (IEEE doubles) is a third engine;
    # all three must agree
    xs = BOUNDARY
    want = [math.floor(x * 1e8 + 0.5) / 1e8 for x in xs]
    assert _spark_floor_scale(spark, xs, 8) == want
    assert _duck_floor_scale(xs, 8) == want


def test_floor_scale_key_orders_like_the_sql_twin(spark):
    # the ordering key must produce the same integers DuckDB's
    # floor(score * 1e10 + 0.5) produces — the sweep/ANN sort contract
    xs = [0.1, 0.1 + 1e-11, 1.0 / 3.0, 2.0**-9, 0.0, -0.25]
    df = spark.createDataFrame([(float(x),) for x in xs], "x double")
    got = [
        r["k"]
        for r in df.select(floor_scale_key("x", 10).alias("k")).collect()
    ]
    con = duckdb.connect()
    want = [
        con.execute(
            "SELECT CAST(floor((?) * 1e10 + 0.5) AS BIGINT)", [x]
        ).fetchone()[0]
        for x in xs
    ]
    assert got == want
    # scores within 1e-11 collapse to the same key (tie-break territory)
    assert got[0] == got[1]
