"""Cross-engine float determinism helpers.

THE floor-scale rounding expression — floor(x·10^d + 0.5) / 10^d in
plain IEEE-double ops — lives here and ONLY here on the Spark side.
Unlike round(), which Spark implements via exact-decimal BigDecimal
HALF_UP and DuckDB via float scaling (implementations that can disagree
by one step when an exact integer-ratio value lands on a representable
.5 boundary — the round-4 conductance/modularity driver-hash flip),
*, +, /, floor are correctly-rounded IEEE-754 ops in every engine and
version, so this expression is bit-deterministic given identical x.

Every contract column and every cross-engine-stable ordering key must go
through these helpers (the DuckDB twins are rewritten to the identical
expression centrally by __spark_entry__._floorscale_sql) — a drift in
ONE hand-rolled copy would silently desynchronize the two sides.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def floor_scale(col, digits: int) -> Column:
    """floor(x·10^digits + 0.5) / 10^digits — boundary-safe rounding."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.lit(float(10**digits))
    return F.floor(c * s + F.lit(0.5)) / s


def floor_scale_key(col, digits: int = 10) -> Column:
    """The integer ordering key floor(x·10^digits + 0.5) (no division):
    sort on this descending with an id tie-break so last-ulp summation
    differences cannot reorder results across engines."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * F.lit(float(10**digits)) + F.lit(0.5))
