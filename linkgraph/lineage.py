"""Lineage-cut helper for loop-carried DataFrame state.

Measured pathology (pyspark 4.1, local mode; first exposed by
scripts/bench_louvain_endgame.py, minimally pinned in
tests/test_lineage.py): when a per-round state whose plan is a UNION
with narrow branches over the previous round's checkpoint is re-
checkpointed every round (the filter-split local-move loop, settled-set
accumulators), per-round wall DOUBLES after ~12 cuts — 0.6 s rounds
become 10 s by round 18 and 300+ s by round 24 — while jobs (10), tasks
(129) and result rows stay CONSTANT. The growth sits in Catalyst's
'planning' + 'optimization' phases (queryExecution tracker), i.e. the
driver, not the cluster. It is carried by the Dataset chain itself:

* logical plan stays a 53-char `Scan ExistingRDD`; constraint count,
  constraint text, outputPartitioning and outputOrdering of the
  checkpointed LogicalRDD are all flat (measured),
* `.count()` on the already-planned round is flat ~0.1 s; re-planning
  the SAME round a second time is 0.03 s,
* rebuilding the state BY VALUE (collect + createDataFrame) makes the
  next round fast again — so the poison is Dataset-side metadata that
  `localCheckpoint(eager=True)` AND reliable `checkpoint()` both carry
  from the origin Dataset into the new LogicalRDD (originStats /
  originConstraints plumbing), compounding through self-referencing
  union shapes,
* a plain `repartition()` before the checkpoint does NOT sever it
  (measured: identical doubling), and neither does a reliable
  file-backed checkpoint.

What severs it: materialize once, then wrap the materialized
InternalRow RDD in a FRESH Dataset that carries none of the origin
metadata (`internalCreateDataFrame`). Measured on the same loop: flat
0.4-0.6 s/round through 30+ cuts (vs 10-300 s), identical values.
`internalCreateDataFrame(rdd, schema, isStreaming)` is Spark-internal
but stable across 3.x/4.x (scala `private[sql]` compiles to a public
JVM method); if it ever disappears, the fallback is the bare
checkpoint — correct, just exposed to the pathology — and the
parquet-roundtrip cut (write+read the state) is the public-API
alternative, measured flat as well.

Join/aggregate-rooted loop states (the PageRank / min-label CC / BFS
join+agg loops, 37+ chained cuts) never hit this; only loops whose
state embeds the previous cut through a union need cut().
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame

_WARNED_FALLBACK = False


def cut(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Eager lineage + metadata cut for loop-carried state: use instead
    of bare ``localCheckpoint(eager=True)`` in filter-union /
    settled-set-accumulator loops. Repartitions to ``num_partitions``
    (default: session shuffle partitions, falling back to the frame's
    current partition count when that conf is non-numeric, e.g. AQE
    'auto' on some platforms), materializes once, then re-wraps the
    materialized RDD in a fresh Dataset."""
    global _WARNED_FALLBACK
    n = num_partitions
    if n is None:
        try:
            n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        except Exception:  # non-numeric (AQE 'auto') or unset conf
            try:
                n = df.rdd.getNumPartitions() or 1
            except Exception:  # Spark Connect: DataFrame.rdd unsupported
                n = 200  # Spark's stock shuffle-partition default
    ck = df.repartition(n).localCheckpoint(eager=True)
    try:
        spark = df.sparkSession
        jdf = ck._jdf
        new_jdf = spark._jsparkSession.internalCreateDataFrame(
            jdf.queryExecution().toRdd(), jdf.schema(), False
        )
        return DataFrame(new_jdf, spark)
    except Exception:  # pragma: no cover — internal API moved/renamed
        # e.g. Spark Connect (no _jdf): the bare checkpoint is correct
        # but re-exposed to the exponential-planning pathology — say so
        # once instead of silently degrading
        if not _WARNED_FALLBACK:
            _WARNED_FALLBACK = True
            warnings.warn(
                "linkgraph.lineage.cut: internalCreateDataFrame "
                "unavailable (Spark Connect or internal API change) — "
                "falling back to bare localCheckpoint; long union-state "
                "loops may re-hit the exponential Catalyst planning "
                "pathology documented in linkgraph/lineage.py",
                RuntimeWarning,
                stacklevel=2,
            )
        return ck
