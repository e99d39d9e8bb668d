"""Deterministic sampling primitives for training-data pipelines.

Sampling at corpus scale must be a pure function of a STABLE KEY — never
``rand()`` or row position, which reshuffle on every re-run / repartition
and make experiments unreproducible (and make incremental re-processing
impossible: a retried partition would sample different rows). The
primitives here express the keep decision as a string comparison between
an md5-hex digest prefix and a per-stratum cutoff, so the exact same rule
runs on any engine (ANSI SQL, DuckDB, Spark) and the sample is stable
under repartition, task retry, and incremental re-runs.

Scale shape: ONE scan, ZERO shuffles — the per-stratum rate lookup is a
CASE expression compiled into the filter (broadcast-joining a rates dim
would plan an exchange for a lookup table of a few rows), and the filter
pushes down to the parquet scan boundary like any other predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DIGITS = 8  # 32 bits of the digest: rate resolution 2^-32


def hex_cutoff(rate: float, digits: int = _DIGITS) -> str:
    """Hex-string cutoff c with P[digest_prefix < c] == rate (to 16^-digits).

    rate >= 1 returns ``"g"`` — every hex digit sorts below it, so the
    comparison keeps everything without a 9-digit carry string whose
    lexicographic order would be wrong against an 8-char prefix. rate <= 0
    returns ``"0"*digits`` (nothing sorts below it).
    """
    if rate >= 1.0:
        return "g"
    if rate <= 0.0:
        return "0" * digits
    return format(int(rate * 16**digits), f"0{digits}x")


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    default_rate: float = 1.0,
    salt: str = "strat",
) -> DataFrame:
    """Keep each row of stratum s with probability ``rates.get(s,
    default_rate)``, deterministically in the row's stable key:

        keep  iff  substr(md5(key || ':' || salt), 1, 8) < cutoff(rate_s)

    The salt decorrelates this sample from other md5-keyed decisions on
    the same key (e.g. the train/val/test split), so downsampling doesn't
    systematically favour one split. Filters only — composes with any
    downstream operator on the same scan.
    """
    h = F.substring(
        F.md5(F.concat_ws(":", F.col(key_col).cast("string"), F.lit(salt))),
        1,
        _DIGITS,
    )
    cut = F.lit(hex_cutoff(default_rate))
    for s in sorted(rates, reverse=True):
        cut = F.when(F.col(strata_col) == s, F.lit(hex_cutoff(rates[s]))).otherwise(cut)
    return df.where(h < cut)


def sample_vertices_induced(
    edges: DataFrame, rate: float, salt: str = "vsample"
) -> DataFrame:
    """Vertex-induced subgraph sample: keep vertex v iff

        substr(md5(v || ':' || salt), 1, 8) < cutoff(rate)

    and keep an edge iff BOTH endpoints are kept (so the expected edge
    survival is rate², and the sample is a true induced subgraph —
    Leskovec & Faloutsos, "Sampling from large graphs", KDD'06: induced
    vertex sampling preserves within-sample degree structure where edge
    sampling sparsifies it). Same md5-cutoff rule as stratified_sample /
    dataset_split: deterministic under re-run, retry, and repartition,
    and reproducible in ANSI SQL. The standard downsample-first move
    before expensive exact analytics (squares, betweenness, MSF) at
    100 TB.

    Plan: two pushdown-friendly filter expressions on one scan — no
    joins, no shuffle, no vertex table materialization."""
    cutoff = hex_cutoff(rate)

    def keep(col):
        return (
            F.substring(
                F.md5(F.concat_ws(":", col.cast("string"), F.lit(salt))),
                1,
                _DIGITS,
            )
            < cutoff
        )

    return edges.filter(keep(F.col("src")) & keep(F.col("dst")))
