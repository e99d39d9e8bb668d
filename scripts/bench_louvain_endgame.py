"""Measured evidence for louvain()'s kernel_edge_threshold default.

Round-3 VERDICT asked for the 2M-edge endgame threshold to be a
measurement, not a guess: at each graph size, run the SAME Louvain solve
with kernel_edge_threshold=0 (distributed rounds everywhere) vs the
default (one-task mapInArrow endgame kernel once the level's edge count
fits), assert the community assignments are IDENTICAL (the
path-equivalence pin from tests/test_louvain.py, re-checked here on the
measured inputs), and record both walls.

Run: python scripts/bench_louvain_endgame.py   -> BENCH/louvain_endgame.json
Env: LOUV_SIZES (comma n_convs list, default "2000,10000,40000").
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import functions as F

    from linkgraph.operators.louvain import louvain
    from linkgraph.session import get_spark
    from linkgraph.sources import derive_edges, generate_transcripts

    sizes = [
        int(s) for s in os.environ.get("LOUV_SIZES", "2000,10000,40000").split(",")
    ]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(app_name="louvain-endgame", master=f"local[{cpus}]")
    rows = []
    for n_convs in sizes:
        t = generate_transcripts(spark, n_convs=n_convs, seed=42)
        e = (
            derive_edges(t)
            .select(F.xxhash64("src").alias("src"), F.xxhash64("dst").alias("dst"))
            .persist()
        )
        m = e.count()

        t0 = time.monotonic()
        kern = louvain(e)  # default threshold: endgame kernel engages
        kern_assign = {r["node"]: r["community"] for r in kern.communities.collect()}
        kern_s = time.monotonic() - t0

        t0 = time.monotonic()
        dist = louvain(e, kernel_edge_threshold=0)  # force distributed rounds
        dist_assign = {r["node"]: r["community"] for r in dist.communities.collect()}
        dist_s = time.monotonic() - t0

        equal = kern_assign == dist_assign
        rows.append(
            {
                "n_convs": n_convs,
                "edges": m,
                "kernel_wall_s": round(kern_s, 2),
                "distributed_wall_s": round(dist_s, 2),
                "speedup": round(dist_s / max(kern_s, 1e-9), 2),
                "levels_kernel": kern.levels,
                "levels_distributed": dist.levels,
                "assignments_equal": equal,
            }
        )
        e.unpersist()
        print(json.dumps(rows[-1]), flush=True)
        if not equal:
            raise SystemExit("path-equivalence violated — do not record")

        # incremental dump: the forced-distributed path is latency-bound at
        # hundreds of tiny BSP jobs per solve (~tens of minutes each on this
        # host), so persist after EVERY size rather than only at the end
        out = {
            "what": "louvain endgame kernel vs forced-distributed, identical results asserted",
            "default_kernel_edge_threshold": 2_000_000,
            "cpus": cpus,
            "rows": rows,
        }
        with open(os.path.join(REPO, "BENCH", "louvain_endgame.json"), "w") as f:
            json.dump(out, f, indent=1)
    print("wrote BENCH/louvain_endgame.json")


if __name__ == "__main__":
    main()
