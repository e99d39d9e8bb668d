"""Measured evidence for stream_pagerank_delta (round-3 VERDICT #5).

Two scenarios, each driving BOTH maintenance schemes through identical
two-chunk availableNow triggers (~99% base, then a small delta batch),
timing each drop's wall and asserting final-table parity:

  * transcripts — the engine's own actor graph (100k convs ≈ 1.7M edges).
    Tool-sink hubs give it tiny diameter: any perturbation reaches every
    vertex in two hops, the push frontier SATURATES (manifest
    frontier_rows ≈ n), and the delta path is honestly SLOWER than the
    warm full recompute — the measured reason stream_pagerank_maintenance
    stays the recommended scheme for hub-dominated graphs.
  * ring_of_cliques — 6000 cliques of 16 (96k nodes / 1.45M edges), batch
    = extra out-edges for one node in each of 5 cliques. Perturbations
    decay by d/k per ring crossing, so with the analytic prune threshold
    the frontier stays a few hundred rows (manifest pruned_rounds ≈ all
    rounds), the bucket-pruned probe skips almost every cached batch, and
    the delta path's batch-2 wall beats the warm full recompute — the
    regime the operator exists for.

Schemes:
  * stream_pagerank_maintenance — warm-started FULL pagerank_dataframe
    solve per batch: batch work is O(m) regardless of churn.
  * stream_pagerank_delta — residual Gauss-Southwell push (adaptive
    sparse/saturated loop; delta_maintenance_log must report mode="delta"
    or the comparison is void and the JSON says so).

Run: python scripts/bench_stream_delta.py  -> BENCH/stream_delta.json
Env: DELTA_N_CONVS (default 100000), RING_CLIQUES (6000), RING_K (16),
     SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _drive(spark, ids_path: str, root: str, scheme: str, batch_expr: str) -> dict:
    """Run one maintenance scheme over the two staged chunks; return
    per-drop walls, the final commit log, and the final rank table."""
    from pyspark.sql import functions as F

    from linkgraph.streaming.rank import (
        delta_maintenance_log,
        rank_maintenance_log,
        read_rank_table,
        read_rank_table_delta,
        stream_pagerank_delta,
        stream_pagerank_maintenance,
    )

    ids = spark.read.parquet(ids_path)
    src_dir, work, ckpt = (f"{root}/src", f"{root}/work", f"{root}/ckpt")
    walls = []
    for chunk in (0, 1):
        pred = F.expr(batch_expr)
        part = ids.filter(pred if chunk else ~pred)
        part.write.mode("append").parquet(src_dir)
        stream = spark.readStream.schema("src long, dst long").parquet(src_dir)
        t0 = time.monotonic()
        if scheme == "delta":
            q = stream_pagerank_delta(stream, work, ckpt, available_now=True)
        else:
            q = stream_pagerank_maintenance(
                stream, work, ckpt, available_now=True
            )
        q.awaitTermination(1200)
        walls.append(round(time.monotonic() - t0, 3))
    if scheme == "delta":
        log = delta_maintenance_log(spark, work) or {}
        table = read_rank_table_delta(spark, work)
    else:
        log = rank_maintenance_log(spark, work) or {}
        table = read_rank_table(spark, work)
    final = {r["node"]: r["rank"] for r in table.collect()}
    return {"walls": walls, "final_log": log, "ranks": final}


def _scenario(spark, root: str, name: str, ids_path: str, batch_expr: str) -> dict:
    from pyspark.sql import functions as F

    ids = spark.read.parquet(ids_path)
    m = ids.count()
    m_batch2 = ids.filter(F.expr(batch_expr)).count()

    full = _drive(spark, ids_path, f"{root}/{name}/full", "full", batch_expr)
    delta = _drive(spark, ids_path, f"{root}/{name}/delta", "delta", batch_expr)

    keys = set(full["ranks"]) | set(delta["ranks"])
    max_abs = max(
        abs(full["ranks"].get(k, 0.0) - delta["ranks"].get(k, 0.0)) for k in keys
    )
    assert max_abs < 1e-4, f"{name}: parity clearly violated: {max_abs}"

    out = {
        "edges": m,
        "batch2_edges": m_batch2,
        "batch2_edge_fraction": round(m_batch2 / m, 5),
        "full_recompute_walls_s": full["walls"],
        "delta_push_walls_s": delta["walls"],
        "batch2_speedup_full_over_delta": round(
            full["walls"][1] / delta["walls"][1], 2
        ),
        "delta_final_log": delta["final_log"],
        "full_final_log": full["final_log"],
        "max_abs_rank_diff": max_abs,
        "parity_1e6": max_abs < 1e-6,
    }
    mode = str(delta["final_log"].get("mode", ""))
    if mode != "delta":
        out["caveat"] = (
            f"delta batch-2 took mode={mode!r}, not the push path — "
            "comparison void at this size"
        )
    print(f"{name}: " + json.dumps({k: out[k] for k in (
        "edges", "full_recompute_walls_s", "delta_push_walls_s",
        "batch2_speedup_full_over_delta", "max_abs_rank_diff")}))
    return out


def main() -> None:
    from pyspark.sql import functions as F

    from linkgraph.session import get_spark
    from linkgraph.sources import derive_edges, generate_transcripts

    n_convs = int(os.environ.get("DELTA_N_CONVS", "100000"))
    n_cliques = int(os.environ.get("RING_CLIQUES", "6000"))
    k = int(os.environ.get("RING_K", "16"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(app_name="stream-delta-bench", master=f"local[{cpus}]")
    root = tempfile.mkdtemp(prefix="lg_delta_bench_")
    try:
        # scenario 1: transcript actor graph (hub-dominated, saturating)
        t = generate_transcripts(spark, n_convs=n_convs, seed=42)
        tr_path = f"{root}/ids_transcripts"
        derive_edges(t).select(
            F.xxhash64("src").alias("src"), F.xxhash64("dst").alias("dst")
        ).write.parquet(tr_path)

        # scenario 2: ring of cliques (high diameter, local perturbations)
        cl = spark.range(n_cliques).select(F.col("id").alias("c"))
        ii = spark.range(k).select(F.col("id").alias("i"))
        jj = spark.range(k).select(F.col("id").alias("j"))
        intra = (
            cl.crossJoin(ii)
            .crossJoin(jj)
            .where("i <> j")
            .select(
                (F.col("c") * k + F.col("i")).alias("src"),
                (F.col("c") * k + F.col("j")).alias("dst"),
            )
        )
        ring = cl.select(
            (F.col("c") * k + (k - 1)).alias("src"),
            (((F.col("c") + 1) % n_cliques) * k).alias("dst"),
        )
        rg_path = f"{root}/ids_ring"
        intra.unionByName(ring).write.parquet(rg_path)

        out = {
            "what": (
                "per-drop wall: warm full-recompute maintenance vs residual "
                "delta push, two-chunk drive per scenario, parity asserted; "
                "transcripts = saturating hub graph (full recompute should "
                "win), ring_of_cliques = local-perturbation graph (delta "
                "push should win)"
            ),
            "cpus": cpus,
            "scenarios": {
                "transcripts": dict(
                    {"n_convs": n_convs},
                    **_scenario(
                        spark, root, "transcripts", tr_path,
                        "pmod(xxhash64(src), 100) = 0",
                    ),
                ),
                "ring_of_cliques": dict(
                    {"n_cliques": n_cliques, "clique_size": k},
                    **_scenario(
                        spark, root, "ring", rg_path,
                        f"src % {k} = 0 AND src < {5 * k}",
                    ),
                ),
            },
        }
        with open(os.path.join(REPO, "BENCH", "stream_delta.json"), "w") as f:
            json.dump(out, f, indent=1)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
