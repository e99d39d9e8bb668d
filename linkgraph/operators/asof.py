"""As-of join — an operator Spark's join zoo lacks, composed from built-in
DataFrame ops (no UDF): for every left row, attach the single most recent
right row with ``right[on] <= left[on]`` (backward direction; ``strict``
demands ``<``) within the same ``by`` group.

Physical strategy — union + single window pass, NOT a range join:
tag both sides, union them into one relation, and run ``last(..,
ignorenulls)`` over a window partitioned by ``by`` and ordered by
``(on, side)``. One shuffle on ``by`` total; each partition is a single
ordered sweep. The range-join alternative (l JOIN r ON l.by=r.by AND
r.on<=l.on, then argmax per left row) explodes to O(|l|·|r|) pairs per
group before its aggregate — quadratic in group size, a scale-killer on
power-law groups. The sweep is O((|l|+|r|) log) for the sort and linear
after, and survives skewed groups at 100 TB as long as a single group's
rows fit a partition (same invariant every windowed operator here has).

Right-side duplicates on ``(by, on)`` must be pre-aggregated by the caller
(the contract query maxes them) — an as-of tie is otherwise ambiguous in
ANY engine (DuckDB's ASOF picks an arbitrary one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str],
    strict: bool = False,
) -> DataFrame:
    """Backward as-of join. Returns all left columns plus ``value_cols``
    from the matched right row (null when no right row precedes)."""
    # side ordering encodes tie semantics: right rows at the same `on`
    # sort BEFORE left rows unless strict (then after, so they don't match)
    r_side, l_side = (0, 1) if not strict else (1, 0)
    rtag = right.select(
        F.col(by).alias(by),
        F.col(on).alias(on),
        F.lit(r_side).alias("_side"),
        *[F.col(c) for c in value_cols],
    )
    ltag = left.select(
        by, on, F.lit(l_side).alias("_side"),
        *[F.lit(None).cast(rtag.schema[c].dataType).alias(c) for c in value_cols],
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
    )
    rtag = rtag.withColumn("_lrow", F.lit(None).cast(ltag.schema["_lrow"].dataType))
    unioned = ltag.unionByName(rtag)
    w = (
        Window.partitionBy(by)
        .orderBy(on, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "_lrow",
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
    ).where(F.col("_lrow").isNotNull())
    return filled.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns], *value_cols
    )
