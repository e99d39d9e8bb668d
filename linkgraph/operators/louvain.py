"""Louvain community detection — multi-level, synchronous-parallel.

The canonical modularity optimizer (Blondel, Guillaume, Lambiotte &
Lefebvre, "Fast unfolding of communities in large networks", J. Stat.
Mech. 2008) in its distributed form:

* **Local move** (phase 1): every vertex evaluates moving to a
  neighboring community with the standard weighted gain
  ``k_{i,c} − k_i·Σ'_c / 2m`` (i removed from its own community first).
  The sequential sweep is serialized per vertex; here ALL vertices of
  one hash class (md5 % classes, default 6) update per round (Lu,
  Halappanavar & Kalyanaraman, "Parallel heuristics for scalable
  community detection", Parallel Computing 47, 2015 — their
  coloring/partial-sweep relaxation). The argmax is exact and
  deterministic — (gain desc, own-community-wins-ties, community id
  asc) — and every ``classes`` rounds (one full sweep group) labels are
  CANONICALIZED to the minimum member id. A hash class is not a proper
  coloring, so two adjacent same-class vertices can profitably swap
  communities forever (measured: two 5-cycles contract to adjacent
  singleton supernodes in the same md5 class that trade labels with
  gain +0.8 each round, indefinitely); the swap permutes labels but
  fixes the PARTITION, so the canonical fixpoint test — stop when the
  min-member relabeling repeats — terminates exactly where label
  equality livelocks. A per-level group cap bounds the residual
  (non-permutation) oscillation modes; the cap is part of the
  deterministic definition, not a tuning knob.
* **Contract** (phase 2): communities become supernodes; edge weights
  sum; intra-community weight becomes a self-loop (it contributes to
  the supernode's degree — ``k_i = Σ_j w_ij + 2·w_ii`` — and to Σ_c,
  never to k_{i,c}). Repeat on the contracted graph until a level stops
  merging anything.

Plan shape, per round: only the moving class shuffles — the gather join
(edges with a moving source × all labels), one (node, cand) sum where a
zero-weight own-community row injected BEFORE the aggregate guarantees
"stay" is always a candidate (no anti-join), one community-degree sum,
and a ``min_by(cand, struct(-gain, -is_own, cand))`` hash aggregate in
place of a window sort. Rounds are checkpointed every ``ckpt_every``
rounds (the per-round plan references its input ~4×, so lineage — and
Catalyst planning time — blows up geometrically if chained); the
canonical relabel + fixpoint count run once per group, not per round.
O(m/classes) shuffle per round, rounds bounded per level, levels
~O(log n).

**Endgame kernel**: contraction shrinks levels geometrically, so after
one or two distributed levels the supernode graph is tiny relative to
the cluster. Driving 30+ more Spark rounds over a few thousand edges
would be all scheduler overhead — so once a level's edge count is
``<= kernel_edge_threshold`` the REMAINING levels run inside a single
executor task (``mapInArrow`` over ``coalesce(1)``) executing the
byte-identical recurrence. This is the standard coarsening endgame of
distributed multilevel partitioners (e.g. ParMETIS-style coarsen-
then-local); memory is bounded by the threshold, and the work never
touches the driver. ``kernel_edge_threshold=0`` forces the distributed
path everywhere (used by tests to pin path equivalence).

Exactness: a python replica runs the identical recurrence (same class
rule, same argmax, same canonicalization) and tests pin bit-equality
of the final labels via BOTH paths; quality is pinned on karate (final
modularity = the canonical 0.4198 optimum). Bit-equality relies on all
shuffle-order-dependent sums being exact in float64 (integer-valued
weights); with arbitrary fractional weights results remain
deterministic per-plan but replica equality is only approximate.

Reference parity: the reference repo is PageRank-only; community
detection extends it the same way its own multi-implementation design
races variants (/root/reference/main.c:36-37). Ids follow the
reference's dense-int convention (/root/reference/pagerank_custom.h).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.operators.degrees import vertices


def _weighted_simple(edges: DataFrame, weight_col: str | None) -> DataFrame:
    """[a, b, w] canonical a<=b (self-loops KEPT, parallel edges summed)."""
    if weight_col is None:
        e = edges.select("src", "dst", F.lit(1.0).alias("w"))
    else:
        e = edges.select("src", "dst", F.col(weight_col).cast("double").alias("w"))
    return (
        e.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            "w",
        )
        .groupBy("a", "b")
        .agg(F.sum("w").alias("w"))
    )


def _parity(node_col, classes: int):
    # deterministic hash split, portable to SQL: md5 hex first char.
    # More classes = fewer simultaneously-moving neighbors = closer to
    # the sequential sweep; 6 recovers the canonical karate optimum
    # (0.4198) where 2 stalls at ~0.31 (measured via the replica twin).
    return F.conv(F.substring(F.md5(node_col.cast("string")), 1, 1), 16, 10).cast(
        "int"
    ) % classes


def _sym_with_class(wedges: DataFrame, classes: int) -> DataFrame:
    """Directed doubling of the canonical simple edges (loops dropped —
    they never contribute to k_{i,c}), tagged with the source's move
    class so each round's gather filters to 1/classes of the edges."""
    plain = wedges.where(F.col("a") != F.col("b"))
    sym = plain.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "w"
    ).unionByName(
        plain.select(F.col("b").alias("src"), F.col("a").alias("dst"), "w")
    )
    return sym.withColumn("pclass", _parity(F.col("src"), classes))


def _one_round(
    sym: DataFrame, state: DataFrame, two_m: float, r: int, classes: int
) -> DataFrame:
    """One synchronous half-sweep: class ``r`` vertices take their exact
    argmax move; everyone else is carried through untouched. Purely
    lazy — the caller decides when to cut lineage."""
    moving = _parity(F.col("node"), classes) == F.lit(r)
    mov = state.where(moving)
    # candidate mass: neighbor-community weights for moving sources,
    # plus a zero row for the own community so "stay" always scores
    # (fused before the aggregate — replaces a left_anti join).
    pre = (
        sym.where(F.col("pclass") == F.lit(r))
        .join(
            state.select(
                F.col("node").alias("dst"), F.col("community").alias("cand")
            ),
            "dst",
        )
        .select(F.col("src").alias("node"), "cand", "w")
        .unionByName(
            mov.select("node", F.col("community").alias("cand"), F.lit(0.0).alias("w"))
        )
    )
    kic = pre.groupBy("node", "cand").agg(F.sum("w").alias("kic"))
    sigma = state.groupBy(F.col("community").alias("cand")).agg(
        F.sum("k").alias("sigma")
    )
    scored = (
        kic.join(mov.select("node", "k", "community"), "node")
        .join(sigma, "cand")
        .select(
            "node",
            "cand",
            (
                F.col("kic")
                - F.col("k")
                * (
                    F.col("sigma")
                    - F.when(
                        F.col("cand") == F.col("community"), F.col("k")
                    ).otherwise(F.lit(0.0))
                )
                / F.lit(two_m)
            ).alias("gain"),
            (F.col("cand") == F.col("community")).cast("int").alias("is_own"),
        )
    )
    # (gain desc, is_own desc, cand asc) argmax as a single hash agg:
    # min_by over (-gain, -is_own, cand) — negating only the numeric
    # keys keeps the ascending cand tie-break valid for ANY orderable
    # id type (ints in the kernel-tested path, strings in contract
    # queries).
    best = scored.groupBy("node").agg(
        F.expr("min_by(cand, struct(-gain, -is_own, cand))").alias("best")
    )
    return state.where(~moving).unionByName(
        mov.join(best, "node", "left").select(
            "node", "k", F.coalesce("best", "community").alias("community")
        )
    )


def _canonicalize(state: DataFrame) -> DataFrame:
    """community := min member node id (partition-invariant labels)."""
    canon = state.groupBy("community").agg(F.min("node").alias("clabel"))
    return state.join(canon, "community").select(
        "node", "k", F.col("clabel").alias("community")
    )


def local_move_group(
    sym: DataFrame,
    state: DataFrame,
    two_m: float,
    classes: int,
    ckpt_every: int = 3,
) -> DataFrame:
    """One full sweep group: ``classes`` half-sweep rounds (lazily
    chained, lineage cut every ``ckpt_every`` rounds) followed by the
    canonical min-member relabel. Returns the checkpointed state.

    The cuts MUST be shuffle-rooted (lineage.cut, not bare
    localCheckpoint): each half-sweep state is a filter-union over the
    previous cut — the exact shape whose chained localCheckpoints
    compound partition lineage and double per-round cost (see
    linkgraph/lineage.py; this loop, at classes x max_groups cuts per
    level, is where the pathology was first measured)."""
    from linkgraph.lineage import cut

    for r in range(classes):
        state = _one_round(sym, state, two_m, r, classes)
        if (r + 1) % ckpt_every == 0 and r != classes - 1:
            state = cut(state)
    return cut(_canonicalize(state))


def _init_state(wedges: DataFrame) -> DataFrame:
    """[node, k, community=node] with k = Σ w + 2·w_self over the
    level's own edge set."""
    plain = (
        wedges.where(F.col("a") != F.col("b"))
        .select(F.col("a").alias("node"), "w")
        .unionByName(
            wedges.where(F.col("a") != F.col("b")).select(
                F.col("b").alias("node"), "w"
            )
        )
    )
    loops = wedges.where(F.col("a") == F.col("b")).select(
        F.col("a").alias("node"), (2.0 * F.col("w")).alias("w")
    )
    return (
        plain.unionByName(loops)
        .groupBy("node")
        .agg(F.sum("w").alias("k"))
        .select("node", "k", F.col("node").alias("community"))
    )


def _kernel_multilevel(
    a_arr,
    b_arr,
    w_arr,
    two_m: float,
    classes: int,
    max_groups: int,
    max_levels: int,
    start_level: int,
):
    """The exact recurrence on one in-memory weighted edge list
    [(a<=b, w)] — byte-identical to the distributed rounds (same md5
    class rule, same (gain, is_own, -cand) argmax, same min-member
    canonicalization and fixpoint stop, same contraction). Returns
    (mapping: supernode -> final community, levels_done, metrics)."""
    import hashlib
    from collections import Counter, defaultdict

    def par(x: int) -> int:
        return int(hashlib.md5(str(x).encode()).hexdigest()[0], 16) % classes

    w = Counter()
    for a, b, wt in zip(a_arr, b_arr, w_arr):
        w[(int(a), int(b))] += float(wt)
    start_nodes = sorted({a for a, _ in w} | {b for _, b in w})
    mapping = {v: v for v in start_nodes}
    metrics: list[dict] = []
    lvls = 0
    for li in range(max_levels):
        nodes = sorted({a for a, _ in w} | {b for _, b in w})
        adj: dict = defaultdict(dict)
        k = Counter()
        for (a, b), wt in w.items():
            if a == b:
                k[a] += 2.0 * wt
            else:
                adj[a][b] = adj[a].get(b, 0.0) + wt
                adj[b][a] = adj[b].get(a, 0.0) + wt
                k[a] += wt
                k[b] += wt
        com = {v: v for v in nodes}
        prev = None
        groups = 0
        for _grp in range(max_groups):
            for r in range(classes):
                sigma = Counter()
                for v in nodes:
                    sigma[com[v]] += k[v]
                new = {}
                for i in nodes:
                    if par(i) != r:
                        new[i] = com[i]
                        continue
                    kic = Counter()
                    for j, wij in adj[i].items():
                        kic[com[j]] += wij
                    best = None
                    for c in set(kic) | {com[i]}:
                        s = sigma[c] - (k[i] if c == com[i] else 0.0)
                        gain = kic.get(c, 0.0) - k[i] * s / two_m
                        key = (gain, 1 if c == com[i] else 0, -c)
                        if best is None or key > best[0]:
                            best = (key, c)
                    new[i] = best[1]
                com = new
            mn: dict = {}
            for v, c in com.items():
                mn[c] = min(mn.get(c, v), v)
            com = {v: mn[c] for v, c in com.items()}
            groups += 1
            if com == prev:
                break
            prev = dict(com)
        n_super = len(set(com.values()))
        lvls = li + 1
        metrics.append(
            {
                "level": start_level + li,
                "groups": groups,
                "nodes": len(nodes),
                "communities": n_super,
            }
        )
        mapping = {v: com.get(s, s) for v, s in mapping.items()}
        if n_super == len(nodes):
            break
        w2 = Counter()
        for (a, b), wt in w.items():
            ca, cb = com[a], com[b]
            w2[(min(ca, cb), max(ca, cb))] += wt
        w = w2
    return mapping, lvls, metrics


def _kernel_finish(
    wedges: DataFrame,
    two_m: float,
    classes: int,
    max_groups: int,
    max_levels: int,
    start_level: int,
) -> DataFrame:
    """Run the endgame kernel in ONE executor task over the (bounded)
    level edge list. Output: [node, community, levels, metrics_json] —
    levels/metrics constant columns read back once by the driver."""
    import json

    def fn(batches):
        import pyarrow as pa

        tabs = [pa.Table.from_batches([b]) for b in batches]
        if not tabs:
            return
        tab = pa.concat_tables(tabs)
        mapping, lvls, metrics = _kernel_multilevel(
            tab.column("a").to_pylist(),
            tab.column("b").to_pylist(),
            tab.column("w").to_pylist(),
            two_m,
            classes,
            max_groups,
            max_levels,
            start_level,
        )
        nodes = sorted(mapping)
        yield pa.RecordBatch.from_pydict(
            {
                "node": nodes,
                "community": [mapping[v] for v in nodes],
                "levels": [lvls] * len(nodes),
                "metrics_json": [json.dumps(metrics)] * len(nodes),
            }
        )

    return wedges.coalesce(1).mapInArrow(
        fn, "node long, community long, levels long, metrics_json string"
    )


@dataclass
class LouvainResult:
    communities: DataFrame  # [node, community] over the ORIGINAL vertices
    levels: int
    level_metrics: list = field(default_factory=list)


def louvain(
    edges: DataFrame,
    weight_col: str | None = None,
    classes: int = 6,
    max_groups: int = 6,
    max_levels: int = 10,
    ckpt_every: int = 1,
    kernel_edge_threshold: int = 2_000_000,
) -> LouvainResult:
    """Full multi-level Louvain over integral node ids. Per level: up
    to ``max_groups`` sweep groups, stopping at the canonical-label
    fixpoint; then community contraction with self-loop bookkeeping;
    stops when a level ends with every supernode in its own community.
    Levels whose edge count is <= ``kernel_edge_threshold`` (and all
    levels after them — contraction only shrinks) run in the one-task
    executor endgame kernel; pass 0 to force the distributed path
    everywhere. Deterministic end-to-end and path-independent (hash
    classes + exact argmax + canonical relabel); python-replica
    bit-equality on both paths and karate-quality are pinned in
    tests/test_louvain.py."""
    integral = ("byte", "short", "int", "long", "integer", "bigint")
    dtypes = dict(edges.dtypes)
    bad = {c: dtypes[c] for c in ("src", "dst") if dtypes.get(c) not in integral}
    if bad:
        raise TypeError(
            f"louvain() requires integral node ids (src/dst), got {bad}; "
            "densify string ids first (e.g. F.xxhash64 or plans.shards id "
            "normalization) — the endgame kernel's output schema is "
            "'node long, community long'"
        )
    wedges = _weighted_simple(edges, weight_col).localCheckpoint(eager=True)
    verts = vertices(edges).localCheckpoint(eager=True)
    # Σ_i k_i: every canonical entry contributes 2w (a loop adds 2w to
    # its own vertex; a plain edge adds w to each endpoint). Invariant
    # under contraction, so computed once.
    two_m = (wedges.select(F.sum(2.0 * F.col("w"))).first()[0]) or 0.0
    if two_m == 0.0:
        return LouvainResult(
            communities=verts.select("node", F.col("node").alias("community")),
            levels=0,
        )
    # mapping from original vertex -> current supernode (starts identity)
    mapping = verts.select("node", F.col("node").alias("super"))
    metrics: list[dict] = []
    lvl = 0
    for lvl in range(1, max_levels + 1):
        if wedges.count() <= kernel_edge_threshold:
            fin = _kernel_finish(
                wedges, two_m, classes, max_groups, max_levels - lvl + 1, lvl
            ).localCheckpoint(eager=True)
            meta = fin.select(
                F.max("levels").alias("lvls"), F.max("metrics_json").alias("mj")
            ).first()
            import json as _json

            metrics.extend(_json.loads(meta["mj"]))
            mapping = mapping.join(
                fin.select(F.col("node").alias("super"), "community"),
                "super",
                "left",
            ).select(
                "node", F.coalesce("community", F.col("super")).alias("super")
            )
            return LouvainResult(
                communities=mapping.select(
                    "node", F.col("super").alias("community")
                ),
                levels=lvl - 1 + meta["lvls"],
                level_metrics=metrics,
            )
        sym = _sym_with_class(wedges, classes).persist()
        state = _init_state(wedges).localCheckpoint(eager=True)
        prev = None
        groups = 0
        for _grp in range(max_groups):
            state = local_move_group(sym, state, two_m, classes, ckpt_every)
            groups += 1
            if prev is not None:
                changed = (
                    state.join(
                        prev.select("node", F.col("community").alias("pc")), "node"
                    )
                    .where(F.col("community") != F.col("pc"))
                    .count()
                )
                if changed == 0:
                    break
            prev = state
        row = state.agg(
            F.count("*").alias("n"), F.countDistinct("community").alias("s")
        ).first()
        n_nodes, n_super = row["n"], row["s"]
        metrics.append(
            {"level": lvl, "groups": groups, "nodes": n_nodes,
             "communities": n_super}
        )
        # propagate to original vertices (left join: isolated originals
        # never enter any level's edge set and stay their own community)
        mapping = (
            mapping.join(
                state.select(F.col("node").alias("super"), "community"),
                "super",
                "left",
            )
            .select(
                "node", F.coalesce("community", F.col("super")).alias("super")
            )
            .localCheckpoint(eager=True)
        )
        sym.unpersist()
        if n_super == n_nodes:
            break
        # contract: communities become supernodes; weights sum; intra
        # mass becomes a self-loop
        lab = state.select("node", "community")
        wedges = (
            wedges.join(
                lab.withColumnRenamed("node", "a").withColumnRenamed(
                    "community", "ca"
                ),
                "a",
            )
            .join(
                lab.withColumnRenamed("node", "b").withColumnRenamed(
                    "community", "cb"
                ),
                "b",
            )
            .select(
                F.least("ca", "cb").alias("a"),
                F.greatest("ca", "cb").alias("b"),
                "w",
            )
            .groupBy("a", "b")
            .agg(F.sum("w").alias("w"))
            .localCheckpoint(eager=True)
        )
    return LouvainResult(
        communities=mapping.select("node", F.col("super").alias("community")),
        levels=lvl,
        level_metrics=metrics,
    )
