"""Streaming PageRank maintenance — warm-start recompute per microbatch.

Extends the streaming layer past degree maintenance (streaming/hubs.py):
as reply edges land, keep a CURRENT rank table without ever paying a
cold-start convergence. Exact maintenance of PageRank under edge inserts
necessarily touches most ranks (the teleport renormalization couples every
vertex), so the honest incremental scheme is the classic warm-start one:
re-run the power iteration on the maintained edge table, initialized from
the previous snapshot instead of 1/n. For a microbatch that adds a small
edge delta the previous fixed point is within O(delta) of the new one and
the loop converges in a small number of iterations (the iteration log
records how few — pinned in tests), while the answer stays EXACTLY the
batch fixed point: parity with a cold `pagerank_dataframe` on the full
edge table is asserted to 1e-6 in tests after every drop.

Durability layout under ``work_dir`` (all writes epoch-idempotent, so a
replayed microbatch after any crash converges to the same state):

* ``edges/epoch=<k>/``  — the maintained edge table; each microbatch
  OVERWRITES its own epoch partition (replay rewrites, never duplicates).
* ``ranks/snap=<k>/``   — rank snapshot parquet per epoch.
* ``ranks/manifest-<k>.json`` — commit record; a snapshot is visible iff
  its manifest exists. The manifest lands via Hadoop-FS rename (atomic on
  HDFS; the sandbox's local FS too) onto a name that embeds the epoch, so
  promotion never overwrites in place and readers simply take the max
  epoch. Old snapshots are reaped after promote (previous one kept).

The recompute runs the UNBOUNDED dataframe engine
(operators/pagerank.py:pagerank_dataframe) — the path with no driver-size
assumptions — because the warm-start vector arrives as a distributed
[node, rank] table, never a driver array. Microbatch cadence (the
stream's trigger interval) is the freshness/cost knob.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

from linkgraph.streaming.manifest import read_manifest, write_manifest

EDGE_SCHEMA = "src long, dst long"
RANK_SCHEMA = "node long, rank double"


def stream_pagerank_maintenance(
    edges: DataFrame,
    work_dir: str,
    checkpoint_dir: str,
    d: float = 0.85,
    eps: float = 1e-6,
    max_iter: int = 200,
    available_now: bool = False,
):
    """Start a streaming query maintaining a converged rank table under
    ``work_dir`` as edges arrive. ``edges`` is a streaming DataFrame with
    ``src``/``dst`` (e.g. stream_reply_edges output). Returns the
    StreamingQuery handle; read results with ``read_rank_table`` /
    ``rank_maintenance_log``."""
    from linkgraph.operators.pagerank import pagerank_dataframe

    edges_root = f"{work_dir}/edges"
    ranks_root = f"{work_dir}/ranks"

    def _recompute(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        if batch.isEmpty():
            # stateful sources emit trailing no-data batches (timeout
            # handling); the edge table and fixed point are unchanged
            return
        # epoch-keyed OVERWRITE: a replayed microbatch rewrites its own
        # partition — the maintained edge table never holds duplicates
        batch.select("src", "dst").write.mode("overwrite").parquet(
            f"{edges_root}/epoch={epoch_id}"
        )
        full = spark.read.schema(EDGE_SCHEMA).option("basePath", edges_root).parquet(
            f"{edges_root}/epoch=*"
        ).select("src", "dst")
        prev = read_manifest(spark, ranks_root)
        warm = (
            spark.read.schema(RANK_SCHEMA).parquet(prev["path"])
            if prev is not None
            else None
        )
        res = pagerank_dataframe(
            full, d=d, eps=eps, max_iter=max_iter, init_ranks=warm
        )
        snap_path = f"{ranks_root}/snap={epoch_id}"
        # the loop's persisted state was already materialized by its own
        # actions, so this write re-reads nothing the overwrite touches
        res.ranks.write.mode("overwrite").parquet(snap_path)
        write_manifest(
            spark,
            ranks_root,
            epoch_id,
            {
                "epoch": epoch_id,
                "path": snap_path,
                "iterations": res.iterations,
                "norm": res.norm,
                "converged": res.converged,
                "warm_start": prev is not None,
            },
        )

    writer = (
        edges.writeStream.outputMode("append")
        .foreachBatch(_recompute)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_rank_table(spark: SparkSession, work_dir: str) -> DataFrame:
    """[node, rank] — the latest committed snapshot."""
    m = read_manifest(spark, f"{work_dir}/ranks")
    if m is None:
        raise FileNotFoundError(f"no committed rank snapshot under {work_dir}")
    return spark.read.schema(RANK_SCHEMA).parquet(m["path"])


def rank_maintenance_log(spark: SparkSession, work_dir: str) -> dict | None:
    """The latest commit record (epoch, iterations-to-converge from the
    warm start, norm, converged) — how cheap maintenance was."""
    return read_manifest(spark, f"{work_dir}/ranks")


# ---------------------------------------------------------------------------
# Delta-push maintenance (round-4): O(affected) join work per microbatch
# ---------------------------------------------------------------------------

Y_SCHEMA = "node long, y double"


def _solve_y(
    full_edges: DataFrame,
    d: float = 0.85,
    eps_y: float = 1e-8,
    max_iter: int = 500,
    warm: DataFrame | None = None,
    fixed_rounds: int | None = None,
):
    """Solve the teleport-1 linear system y = 1 + d·Aᵀy (A = out-degree-
    normalized adjacency with multiplicity weights; dangling columns leak —
    the Family-B operator of operators/pagerank.py). The normalized vector
    y/Σy equals BOTH families' converged PageRank (the A↔B fixed-point
    identity: pi_A = pi_B/Σpi_B — see pagerank_dataframe's family doc), and
    y is scale-canonical (every vertex's teleport term is exactly 1), which
    is what lets stream deltas compose across batches. Returns (y_df
    [node, y], iterations). ``fixed_rounds`` runs exactly that many Jacobi
    rounds with no convergence action — the deterministic, CTE-unrollable
    shape the driver contract hashes."""
    from pyspark.sql import functions as F

    pairs = full_edges.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("c"))
    od = pairs.groupBy("src").agg(F.sum("c").alias("od"))
    wedges = (
        pairs.join(od, "src")
        .select("src", "dst", (F.col("c") / F.col("od")).alias("w"))
        .persist()
    )
    verts = (
        full_edges.select(F.col("src").alias("node"))
        .unionByName(full_edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    if warm is not None:
        y = verts.join(warm, "node", "left").select(
            "node", F.coalesce("y", F.lit(1.0)).alias("y")
        )
    else:
        y = verts.select("node", F.lit(1.0).alias("y"))
    y = y.localCheckpoint(eager=True)
    it = 0
    n_iter = fixed_rounds if fixed_rounds is not None else max_iter
    for it in range(1, n_iter + 1):
        contrib = (
            wedges.join(y.select(F.col("node").alias("src"), "y"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("y") * F.col("w")).alias("contrib"))
        )
        new_y = (
            y.join(contrib, "node", "left")
            .select(
                "node",
                (F.lit(1.0) + F.lit(d) * F.coalesce("contrib", F.lit(0.0))).alias("y"),
                F.col("y").alias("y_old"),
            )
            .localCheckpoint(eager=True)
        )
        if fixed_rounds is None:
            delta = new_y.agg(
                F.sum(F.pow(F.col("y") - F.col("y_old"), 2)).alias("sq")
            ).first()["sq"]
        y = new_y.select("node", "y")
        if fixed_rounds is None and float(delta) ** 0.5 <= eps_y:
            break
    wedges.unpersist()
    return y, it


def stream_pagerank_delta(
    edges: DataFrame,
    work_dir: str,
    checkpoint_dir: str,
    d: float = 0.85,
    eps_y: float = 1e-8,
    eps_rank: float = 1e-7,
    churn_threshold: float = 0.05,
    push_group: int = 10,
    available_now: bool = False,
    fixed_rounds: int | None = None,
):
    """Streaming PageRank maintenance by RESIDUAL DELTA PUSH — per-batch
    join work O(affected), not O(m) (round-3 VERDICT #5).

    ``fixed_rounds`` switches the whole maintenance to its deterministic,
    CTE-unrollable shape for the driver contract: full-solve batches run
    exactly that many Jacobi rounds (no convergence action), delta batches
    run exactly that many push hops with frontier pruning DISABLED
    (θ = 0 — only exact-zero entries drop), so the y table after any batch
    is pure fixed-depth linear algebra over the edge multiset — the same
    estimate+residual oracle argument as operators/push.py. Production
    leaves it None (converged maintenance).

    State is the teleport-1 solution y of (I − d·Aᵀ)y = 1 (`_solve_y`);
    the public rank table is y/Σy, which equals the converged Family-A
    PageRank exactly (pinned to 1e-6 against a cold pagerank_dataframe
    after every drop in tests). Because the system is LINEAR in the
    teleport vector, an edge microbatch only perturbs the right-hand
    residual locally:

        rho = d·(A_newᵀ − A_oldᵀ)·y0,   y_new = y0 + Σ_{k≥0} (d·A_newᵀ)^k rho

    rho's support is exactly the out-neighborhoods of srcs whose edge set
    changed (an out-degree change rescales that src's existing edges too —
    both terms live on `affected` srcs), plus nothing else; the push series
    is the Gauss-Southwell/Jacobi residual iteration whose frontier grows
    one hop per round and whose L1 mass contracts by ≥ d per round (column
    sums of d·Aᵀ ≤ d), so the truncation tail after stopping is bounded by
    ‖delta_K‖₁·d/(1−d).

    Stopping is SCALE-RELATIVE: the error budget is
    ``eps_eff = max(eps_y, eps_rank·Σy)`` in L1 on the y-scale, which
    bounds the published normalized-rank error by ``2·eps_rank`` per entry
    (|rank_err_i| ≤ |y_err_i|/Σy + (y_i/Σy)·|ΔΣy|/Σy ≤ 2·‖y_err‖₁/Σy).
    The default 1e-7 therefore guarantees 2e-7 max-abs on ranks per batch
    (error compounds roughly additively across delta batches) — well inside
    the 1e-6 parity pin — WITHOUT the absolute-1e-8-on-y overshoot that
    cost ~2× the push rounds the tolerance actually required. Half the
    budget pays the truncation tail; the other half pays FRONTIER PRUNING:
    per-round entries with |dv| below an analytic threshold θ are dropped
    (θ sized so worst-case injected mass over the analytic round budget
    stays ≤ eps_eff/2), which is what keeps per-round work O(affected)
    at scale instead of letting the frontier saturate to n.

    The loop is ADAPTIVE to frontier density. While the frontier is
    sparse (few src-hash buckets), each hop runs eagerly against a
    bucket-PRUNED probe: the maintained wedge table carries a
    pmod(xxhash64(src), 1024) bucket column and is range-partitioned +
    sorted by it, so the in-memory columnar cache's per-batch min/max
    stats let `bkt IN (frontier buckets)` skip every batch the frontier
    doesn't touch — per-round SCAN work tracks the affected edges, not m.
    Once the frontier saturates (hub-dominated graphs reach everything in
    two hops), pruning can't help, so hops are chained lazily in groups of
    ``push_group`` with ONE materialization per group: the group's partial
    sum and its final hop ride one tagged union through a single
    localCheckpoint (identical join subtrees dedup via ReusedExchange) —
    one job per group instead of one per hop. Which regime each batch ran
    in is recorded in the manifest (`pruned_rounds`, `frontier_rows`).
    On small-diameter hub graphs (e.g. transcript actor graphs) the
    saturated regime is a slower path to the same fixed point than the
    warm full recompute — measured in BENCH/stream_delta.json — so prefer
    stream_pagerank_maintenance there; the delta path is for graphs where
    perturbations stay local (high diameter / bounded expansion).

    Fallbacks keep the scheme honest: a batch whose affected out-edge mass
    exceeds ``churn_threshold``·m, or the first batch, runs a full
    `_solve_y` (warm-started) instead — delta push wins only when the
    change is local, and the threshold says when.

    Scale notes: the per-round join `wedges ⋈ delta` is broadcast-shaped
    (the frontier is small by construction); on a real cluster the
    maintained edge table would be bucketed by src so the scan side prunes
    too. The per-batch O(m) pair-count aggregation that builds `wedges`
    is the one non-delta cost — the same one-pass cost streaming/hubs.py
    pays, and incremental pair-count maintenance composes the same way if
    it ever dominates.

    Durability: same epoch-idempotent layout + atomic manifest protocol as
    stream_pagerank_maintenance (edges/epoch=k, y/snap=k, y/manifest-k);
    a replayed epoch k with a committed manifest ≥ k is a no-op, so crash
    replay can never double-apply a delta."""
    from pyspark.sql import functions as F

    edges_root = f"{work_dir}/edges"
    y_root = f"{work_dir}/y"

    def _apply(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        if batch.isEmpty():
            return
        prev = read_manifest(spark, y_root)
        if prev is not None and int(prev["epoch"]) >= epoch_id:
            return  # replay of an already-committed epoch
        batch.select("src", "dst").write.mode("overwrite").parquet(
            f"{edges_root}/epoch={epoch_id}"
        )
        all_e = spark.read.schema(EDGE_SCHEMA + ", epoch int").option(
            "basePath", edges_root
        ).parquet(f"{edges_root}/epoch=*")
        full = all_e.select("src", "dst")
        old = all_e.filter(F.col("epoch") != epoch_id).select("src", "dst")
        bpairs = (
            spark.read.parquet(f"{edges_root}/epoch={epoch_id}")
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).alias("cb"))
            .persist()
        )

        mode, rounds, rho_l1 = "full", 0, None
        frontier_rows: list[int] = []
        pruned_rounds = 0
        y_old = (
            spark.read.schema(Y_SCHEMA).parquet(prev["path"])
            if prev is not None
            else None
        )
        m_old = old.count()
        batch_rows = int(
            bpairs.agg(F.sum("cb").alias("s")).first()["s"] or 0
        )
        # affected srcs' TOTAL out-edge mass (old rows rescale too)
        affected = bpairs.select("src").distinct()
        aff_old = old.join(affected, "src", "left_semi")
        aff_old_rows = aff_old.count()
        churn = (aff_old_rows + batch_rows) / max(1, m_old)
        if prev is None or churn > churn_threshold:
            # scale-relative solve tolerance: an L2 successive-delta of ε
            # bounds the y error by ε·d/(1−d), so rank max-abs error by
            # ε·d/((1−d)·Σy); with Σy ≥ n (teleport term alone) the bound
            # below guarantees ≤ eps_rank on ranks — same budget as the
            # push path, WITHOUT burning 5–6 extra decades of contraction
            # on an absolute 1e-8 target over a Σy≈n/(1−d)-scale vector.
            n_now = (
                full.select(F.col("src").alias("node"))
                .unionByName(full.select(F.col("dst").alias("node")))
                .distinct()
                .count()
            )
            eps_solve = max(eps_y, eps_rank * n_now * (1.0 - d) / d)
            y_new, rounds = _solve_y(
                full, d=d, eps_y=eps_solve, warm=y_old,
                fixed_rounds=fixed_rounds,
            )
        else:
            mode = "delta"
            # --- residual rho on the affected out-neighborhoods ---
            old_aff_pairs = aff_old.groupBy("src", "dst").agg(
                F.count(F.lit(1)).alias("co")
            )
            new_aff_pairs = (
                old_aff_pairs.join(bpairs, ["src", "dst"], "full_outer")
                .select(
                    "src", "dst",
                    (F.coalesce("co", F.lit(0)) + F.coalesce("cb", F.lit(0))).alias("cn"),
                )
            )
            od_old = old_aff_pairs.groupBy("src").agg(F.sum("co").alias("odo"))
            od_new = new_aff_pairs.groupBy("src").agg(F.sum("cn").alias("odn"))
            y_src = F.coalesce("y", F.lit(1.0))  # new srcs enter at teleport 1
            new_term = (
                new_aff_pairs.join(od_new, "src")
                .join(y_old.select(F.col("node").alias("src"), "y"), "src", "left")
                .select("dst", (y_src * F.col("cn") / F.col("odn")).alias("t"))
            )
            old_term = (
                old_aff_pairs.join(od_old, "src")
                .join(y_old.select(F.col("node").alias("src"), "y"), "src", "left")
                .select("dst", (-y_src * F.col("co") / F.col("odo")).alias("t"))
            )
            rho = (
                new_term.unionByName(old_term)
                .groupBy(F.col("dst").alias("node"))
                .agg((F.lit(d) * F.sum("t")).alias("dv"))
                .filter(F.col("dv") != 0.0)
                .localCheckpoint(eager=True)
            )
            rho_l1 = float(
                rho.agg(F.sum(F.abs("dv")).alias("l1")).first()["l1"] or 0.0
            )
            # --- scale-relative budget: tail half + pruning half ---
            y_sum_old = float(
                prev.get("y_sum")
                or y_old.agg(F.sum("y").alias("s")).first()["s"]
            )
            n_nodes_old = int(prev.get("n_nodes") or y_old.count())
            eps_eff = max(eps_y, eps_rank * y_sum_old)
            # stop when truncation tail ‖delta_K‖₁·d/(1−d) ≤ eps_eff/2
            target = 0.5 * eps_eff * (1.0 - d) / d
            # analytic worst-case round budget at contraction d (actual
            # contraction is faster whenever dangling columns leak mass)
            k_budget = (
                max(
                    1,
                    math.ceil(
                        math.log(target / rho_l1) / math.log(d)
                    ),
                )
                if rho_l1 > target
                else 0
            )
            # prune threshold: ≤ n entries dropped per round, each ≤ θ,
            # each amplified ≤ d/(1−d) downstream →
            # total injected ≤ K·n·θ·d/(1−d) ≤ eps_eff/2
            theta = (
                0.5 * eps_eff * (1.0 - d)
                / (d * max(1, k_budget) * max(1, n_nodes_old))
            )
            if fixed_rounds is not None:
                # deterministic contract shape: no pruning (only exact
                # zeros drop), depth fixed below instead of l1-targeted
                theta = 0.0
            # --- push series: total = rho + Σ (d·Aᵀ)^k rho ---
            # The probe table carries a src-hash bucket column and is
            # range-partitioned + sorted by it, so the in-memory columnar
            # cache's batch stats (min/max per ~10k-row batch) let a
            # `bkt IN (...)` filter SKIP batches no frontier src touches —
            # the mechanism that makes a sparse-frontier round's SCAN
            # O(affected edges), not O(m).
            P = 1024
            pairs_new = full.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("c"))
            odf = pairs_new.groupBy("src").agg(F.sum("c").alias("od"))
            wedges = (
                pairs_new.join(odf, "src")
                .select(
                    "src",
                    "dst",
                    (F.col("c") / F.col("od")).alias("w"),
                    F.pmod(F.xxhash64("src"), F.lit(P)).alias("bkt"),
                )
                .repartitionByRange(32, "bkt")
                .sortWithinPartitions("bkt")
                .persist()
            )

            def _stats(df):
                r = df.agg(
                    F.sum(F.abs("dv")).alias("l1"),
                    F.count(F.lit(1)).alias("rows"),
                    F.collect_set(F.pmod(F.xxhash64("node"), F.lit(P))).alias("b"),
                ).first()
                return float(r["l1"] or 0.0), int(r["rows"] or 0), list(r["b"])

            def _hop(probe, seed):
                return (
                    probe.join(
                        seed.select(F.col("node").alias("src"), "dv"), "src"
                    )
                    .groupBy(F.col("dst").alias("node"))
                    .agg((F.lit(d) * F.sum(F.col("dv") * F.col("w"))).alias("dv"))
                    .filter(F.abs(F.col("dv")) > theta)
                )

            l1, _, bkts = _stats(rho)
            total_parts = [rho]
            delta = rho
            frontier_rows = []
            pruned_rounds = 0

            def _more():
                if fixed_rounds is not None:
                    return rounds < fixed_rounds
                return l1 > target and rounds < 4 * max(1, k_budget)

            while _more():
                if len(bkts) <= P // 4:
                    # SPARSE frontier: one eager hop against the bucket-
                    # pruned probe, lineage cut per hop. (Measured note:
                    # a persist()-chained variant that skipped the per-hop
                    # localCheckpoint re-planned/recomputed the growing
                    # chain each round — walls grew linearly; the eager
                    # cut is flat at ~0.5s/hop on local[32]. The bucket
                    # pruning is wall-neutral against an in-memory cache
                    # and exists for the on-disk scan at scale.)
                    nxt = _hop(
                        wedges.where(F.col("bkt").isin(bkts)), delta
                    ).localCheckpoint(eager=True)
                    l1, rows, bkts = _stats(nxt)
                    rounds += 1
                    pruned_rounds += 1
                    total_parts.append(nxt)
                    delta = nxt
                    frontier_rows.append(rows)
                    continue
                # SATURATED frontier: bucket pruning can't help; fuse
                # push_group hops into ONE job to amortize round latency.
                # Every hop feeds the partial sum (tag 't'); the final hop
                # additionally rides along as the next seed (tag 'd');
                # identical join subtrees dedup via ReusedExchange.
                group = []
                n_group = (
                    min(push_group, fixed_rounds - rounds)
                    if fixed_rounds is not None
                    else push_group
                )
                for _ in range(n_group):
                    delta = _hop(wedges, delta)
                    group.append(delta)
                    rounds += 1
                combined = group[-1].select("node", "dv", F.lit("d").alias("t"))
                for g in group:
                    combined = combined.unionByName(
                        g.select("node", "dv", F.lit("t").alias("t"))
                    )
                combined = (
                    combined.groupBy("node", "t")
                    .agg(F.sum("dv").alias("dv"))
                    .localCheckpoint(eager=True)
                )
                total_parts.append(
                    combined.filter(F.col("t") == "t").select("node", "dv")
                )
                delta = combined.filter(F.col("t") == "d").select("node", "dv")
                l1, rows, bkts = _stats(delta)
                frontier_rows.append(rows)
            total = total_parts[0]
            for p in total_parts[1:]:
                total = total.unionByName(p)
            total = total.groupBy("node").agg(F.sum("dv").alias("dv"))
            # --- apply: y0 (old ∪ teleport-1 rows for new vertices) + total
            verts_new = (
                full.select(F.col("src").alias("node"))
                .unionByName(full.select(F.col("dst").alias("node")))
                .distinct()
            )
            y_new = (
                verts_new.join(y_old, "node", "left")
                .join(total, "node", "left")
                .select(
                    "node",
                    (
                        F.coalesce("y", F.lit(1.0))
                        + F.coalesce("dv", F.lit(0.0))
                    ).alias("y"),
                )
            )
            wedges.unpersist()

        snap_path = f"{y_root}/snap={epoch_id}"
        y_new.write.mode("overwrite").parquet(snap_path)
        bpairs.unpersist()
        # Σy and n ride the manifest so the NEXT batch's scale-relative
        # stopping target costs zero extra actions; frontier_rows is the
        # O(affected) evidence (per-round pushed rows vs the edge count)
        snap_stats = (
            spark.read.schema(Y_SCHEMA)
            .parquet(snap_path)
            .agg(F.sum("y").alias("s"), F.count(F.lit(1)).alias("n"))
            .first()
        )
        write_manifest(
            spark,
            y_root,
            epoch_id,
            {
                "epoch": epoch_id,
                "path": snap_path,
                "mode": mode,
                "rounds": rounds,
                "rho_l1": rho_l1,
                "churn": churn,
                "batch_rows": batch_rows,
                "y_sum": float(snap_stats["s"]),
                "n_nodes": int(snap_stats["n"]),
                "frontier_rows": frontier_rows,
                "pruned_rounds": pruned_rounds,
            },
        )

    writer = (
        edges.writeStream.outputMode("append")
        .foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_rank_table_delta(spark: SparkSession, work_dir: str) -> DataFrame:
    """[node, rank] — the latest committed delta-push state, normalized
    (rank = y/Σy == converged Family-A PageRank)."""
    from pyspark.sql import functions as F

    m = read_manifest(spark, f"{work_dir}/y")
    if m is None:
        raise FileNotFoundError(f"no committed y snapshot under {work_dir}")
    y = spark.read.schema(Y_SCHEMA).parquet(m["path"])
    total = y.agg(F.sum("y")).first()[0]
    return y.select("node", (F.col("y") / F.lit(float(total))).alias("rank"))


def delta_maintenance_log(spark: SparkSession, work_dir: str) -> dict | None:
    """Latest commit record: mode (full|delta), push rounds, residual L1,
    churn fraction — evidence of how local each batch's work was."""
    return read_manifest(spark, f"{work_dir}/y")
