"""Debug harness: per-iteration timing breakdown of the barrier engine on a
prebuilt shard layout, per transport. Usage:

    python scripts/debug_barrier.py <shard_dir> <cores> <iters> [tcp|shm|auto]
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    shard_dir, cores, iters = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    transport = sys.argv[4] if len(sys.argv) > 4 else "auto"
    from linkgraph.plans.shards import ShardedGraph
    from linkgraph.plans.barrier import pagerank_barrier
    from linkgraph.session import get_spark

    spark = get_spark(app_name="debug-barrier", master=f"local[{cores}]")
    g = ShardedGraph.load(spark, shard_dir)
    res = pagerank_barrier(
        sharded_graph=g, eps=1e-6, max_iter=iters,
        check_convergence=False, mesh_transport=transport,
    )
    for m in res.iter_metrics:
        print({k: (round(v, 1) if isinstance(v, float) else v)
               for k, v in m.items() if k != "mass"})
    walls = sorted(m["wall_ms"] for m in res.iter_metrics)
    med = walls[len(walls) // 2]
    print(f"median iter {med:.1f} ms -> {g.m / (med / 1e3):,.0f} edges/s "
          f"({transport}, P<=cores={cores})")


if __name__ == "__main__":
    main()
