"""VERDICT r2 #3 evidence: per-iteration cost of the sharded engine's
regimes at large m (the regime where the single-task spmv_batch cannot
apply). Compares, on the same prebuilt shard layout:

* ``sharded`` (default, fused)  — the whole loop in ONE barrier gang job
* ``barrier``                   — the gang engine called directly
* ``sharded fused=False``       — legacy per-iteration driver loop
                                  (one Spark job + full-vector publish
                                  per iteration)

Fixed iteration count, convergence check off (the reference's benchmark
protocol, global_config.h:8-10). Prints one JSON line and writes
BENCH/fusion_eval.json.

Usage: python scripts/bench_fusion.py [shard_dir] [iters]
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    shard_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/lg_bench_bign/shards_16000000_64"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "48g")
        .appName("bench_fusion")
        .getOrCreate()
    )
    from linkgraph.operators.pagerank import pagerank_sharded
    from linkgraph.plans.barrier import pagerank_barrier
    from linkgraph.plans.shards import ShardedGraph

    g = ShardedGraph.load(spark, shard_dir)
    out = {"shard_dir": shard_dir, "n": g.n, "m": g.m, "iters": iters, "cpus": cpus}

    def run(label, fn):
        t0 = time.monotonic()
        res = fn()
        wall = time.monotonic() - t0
        per_iter = [m["wall_ms"] for m in res.iter_metrics]
        med = statistics.median(per_iter)
        out[label] = {
            "iters_run": res.iterations,
            "median_iter_ms": round(med, 2),
            "wall_s": round(wall, 2),
            "edges_per_s": round(g.m / (med / 1e3)),
        }
        print(label, out[label], flush=True)
        return res

    run("sharded_fused", lambda: pagerank_sharded(
        None, max_iter=iters, check_convergence=False, sharded_graph=g))
    run("barrier", lambda: pagerank_barrier(
        None, max_iter=iters, check_convergence=False, sharded_graph=g))
    run("sharded_periter", lambda: pagerank_sharded(
        None, max_iter=max(3, iters // 2), check_convergence=False,
        sharded_graph=g, fused=False))

    out["fused_over_barrier"] = round(
        out["sharded_fused"]["median_iter_ms"] / out["barrier"]["median_iter_ms"], 3
    )
    out["periter_over_fused"] = round(
        out["sharded_periter"]["median_iter_ms"]
        / out["sharded_fused"]["median_iter_ms"], 3
    )
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/fusion_eval.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    g.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
