"""Approximate neighborhood function (HyperANF) — HLL-sketch BFS balls.

The exact distance-distribution operators here (bfs.py multi-source hops,
structure-sampled harmonic / effective diameter) are O(sources x BFS) —
the right exactness baselines, but the 100-TB path for "how big is the
t-hop ball of EVERY vertex" is HyperANF (Boldi, Rosa & Vigna, "HyperANF:
approximating the neighbourhood function of very large graphs on a
budget", WWW 2011): give each vertex a HyperLogLog sketch of its ball
B(v,t), and propagate

    sk_{t+1}(v) = sk_t(v)  union  max-merge over (v,u) in E of sk_t(u)

for t rounds. Register max-merge is associative/commutative, so each
round is ONE shuffle keyed by vertex id moving m bytes per vertex — the
same exchange shape as a PageRank step — versus n full BFS frontiers for
the exact answer. N(t) = sum_v |B(v,t)| estimates then come from the
standard HLL estimator per vertex.

Everything is pure Catalyst — no UDF anywhere:

* register init: bucket = low b bits of xxhash64(seed|node); rho = count
  of leading zeros of the remaining 64-b bits + 1, computed EXACTLY as
  (64-b) - length(bin(w)) + 1 (``bin`` drops leading zeros, so
  length(bin(w)) = floor(log2 w) + 1; no float log anywhere);
* merge: groupBy(node).agg(max(sk[j]) for each j) — m plain codegen'd
  aggregates, reassembled with array();
* estimate: F.aggregate over the register array (sum 2^-M_j, zero count)
  + the HLL small-range correction.

Determinism: xxhash64 is a fixed public function, so sketches and
estimates are bit-stable across re-runs and repartitioning (pinned in
tests against a numpy twin fed the engine's own (bucket, rho) pairs).
Accuracy: rse ~ 1.04/sqrt(m) per vertex (13% at the default m=64, one
long per 8 registers of state); the summed N(t) tracks the exact
BFS-computed curve well inside that (pinned on karate).

Scale: state is m bytes/vertex (64 B default — at n=10^9 that is 64 GB
spread across executors, never on the driver), one O(m_edges) shuffle
per round, rounds = effective diameter (tiny for web-ish graphs). This
is exactly the HyperANF plan re-expressed as DataFrame ops.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.operators.degrees import symmetrize, vertices

_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _alpha(m: int) -> float:
    return _ALPHA.get(m, 0.7213 / (1 + 1.079 / m))


def hll_init(
    nodes: DataFrame, b: int = 6, seed: str = "anf", hash: str = "xxhash64"
) -> DataFrame:
    """[node, sk] — singleton-ball sketches: one register set per vertex
    with the vertex's own (bucket, rho) observation. ``hash`` picks the
    register hash family: ``"xxhash64"`` (production — 64-bit, fastest)
    or ``"md5"`` (48-bit digest slice via conv(hex, 16, 10) — bit-for-bit
    replayable in ANSI SQL, the cross-engine value-check twin used by the
    ``anf_round`` contract oracle). Both share the identical downstream
    max-merge recurrence."""
    m = 1 << b
    key = F.concat_ws("|", F.lit(seed), F.col("node").cast("string"))
    if hash == "xxhash64":
        h, width = F.xxhash64(key), 64
    elif hash == "md5":
        # 12 hex chars = 48 bits: exact in BIGINT/long on both engines
        h, width = F.conv(F.substring(F.md5(key), 1, 12), 16, 10).cast("long"), 48
    else:
        raise ValueError(f"unknown register hash family {hash!r}")
    bucket = h.bitwiseAND(F.lit(m - 1))
    w = F.shiftrightunsigned(h, b)
    rho = F.when(w == 0, F.lit(width - b + 1)).otherwise(
        F.lit(width - b + 1) - F.length(F.bin(w))
    )
    sk = F.array(
        *[
            F.when(bucket == j, rho).otherwise(F.lit(0)).cast("int")
            for j in range(m)
        ]
    )
    return nodes.select("node", sk.alias("sk"))


def _merge_round(edges: DataFrame, sk: DataFrame, m: int) -> DataFrame:
    """sk' = sk union max-merge of out-neighbor sketches — [node, sk]."""
    nbr = edges.join(
        sk.select(F.col("node").alias("dst"), "sk"), "dst"
    ).select(F.col("src").alias("node"), "sk")
    both = sk.select("node", "sk").unionByName(nbr)
    agg = both.groupBy("node").agg(
        *[F.max(F.col("sk")[j]).alias(f"r{j}") for j in range(m)]
    )
    return agg.select(
        "node", F.array(*[F.col(f"r{j}") for j in range(m)]).alias("sk")
    )


def _hll_estimate(m: int):
    """Column expr: HLL cardinality estimate from register array ``sk``
    (raw estimator + small-range linear-counting correction)."""
    inv_sum = F.aggregate(
        F.col("sk"),
        F.lit(0.0),
        lambda acc, x: acc + F.pow(F.lit(2.0), -x.cast("double")),
    )
    zeros = F.size(F.filter(F.col("sk"), lambda x: x == 0))
    raw = F.lit(_alpha(m) * m * m) / inv_sum
    lin = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    return F.when((raw <= 2.5 * m) & (zeros > 0), lin).otherwise(raw)


def anf_register_rounds(
    edges: DataFrame,
    t: int = 2,
    b: int = 4,
    seed: str = "anf",
    hash: str = "md5",
    directed: bool = True,
) -> DataFrame:
    """[node, rho_sum, zero_regs] after exactly ``t`` register max-merge
    rounds — the integer-exact observable of the HyperANF recurrence.

    This is the contract value-check for the production
    ``neighborhood_function`` loop: it runs the SAME ``hll_init`` +
    ``_merge_round`` code (register max-merge along edges), but reports
    the raw register state (sum of registers, count of zero registers)
    instead of the floating HLL estimate, so a DuckDB twin can replay it
    bit-for-bit: after t rounds v's register set is the bucket-wise max
    over the t-hop out-ball of v, i.e. a plain 2-hop reachability +
    group-max in SQL. Integer columns only — no cross-engine float
    drift. Defaults (md5 hash family, b=4 → 16 registers, directed
    out-balls) match the ``anf_round`` oracle."""
    if t < 0:
        raise ValueError("t must be >= 0")
    m = 1 << b
    e = (edges.select("src", "dst") if directed else symmetrize(edges)).persist()
    sk = hll_init(vertices(edges), b=b, seed=seed, hash=hash)
    for _ in range(t):
        sk = _merge_round(e, sk, m).localCheckpoint(eager=True)
    e.unpersist()
    return sk.select(
        "node",
        F.aggregate(
            "sk", F.lit(0), lambda acc, x: acc + x.cast("int")
        ).alias("rho_sum"),
        F.size(F.filter("sk", lambda x: x == 0)).alias("zero_regs"),
    )


def neighborhood_function(
    edges: DataFrame,
    max_t: int = 16,
    b: int = 6,
    seed: str = "anf",
    directed: bool = False,
) -> DataFrame:
    """[t, nf_est] for t = 0..max_t — estimated N(t) = sum of t-hop ball
    sizes over all vertices. ``directed=False`` (default) measures balls
    in the symmetrized graph (the usual ANF setting); ``True`` follows
    out-edges only. One Spark job per t (the per-round union keeps the
    curve's rows tiny — max_t+1 rows total)."""
    m = 1 << b
    e = (symmetrize(edges) if not directed else edges.select("src", "dst")).persist()
    sk = hll_init(vertices(edges), b=b, seed=seed).localCheckpoint(eager=True)
    spark = edges.sparkSession
    curve = []
    est = _hll_estimate(m).alias("nf_est")
    curve.append((0, sk.select(est).agg(F.sum("nf_est")).first()[0]))
    for t in range(1, max_t + 1):
        sk = _merge_round(e, sk, m).localCheckpoint(eager=True)
        curve.append((t, sk.select(est).agg(F.sum("nf_est")).first()[0]))
        if len(curve) >= 2 and curve[-1][1] <= curve[-2][1] * (1 + 1e-4):
            break  # ball growth stalled: past the effective diameter
    e.unpersist()
    return spark.createDataFrame(
        [(int(t), float(v)) for t, v in curve], "t int, nf_est double"
    )


def effective_diameter_from_curve(curve, q: float = 0.9) -> float:
    """Interpolated t where N(t) first reaches q * N(t_max); ``curve`` is
    the collected [(t, nf_est)] list (tiny — max_t+1 points)."""
    pts = sorted((int(t), float(v)) for t, v in curve)
    target = q * pts[-1][1]
    for (t0, v0), (t1, v1) in zip(pts, pts[1:]):
        if v1 >= target:
            if v1 == v0:
                return float(t1)
            return t0 + (target - v0) / (v1 - v0)
    return float(pts[-1][0])
