"""Ad-hoc profile of pagerank_sharded's per-iteration cost breakdown:
publish (np.save), Spark job (mapInArrow dispatch + toPandas), kernel wall
(from shard metrics), driver combine. Run: python scripts/profile_sharded.py
[n_convs]."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from linkgraph.session import get_spark
from linkgraph.sources import derive_edges, generate_transcripts
from linkgraph.plans.shards import ShardedGraph


def main():
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    spark = get_spark(app_name="profile-sharded", master="local[32]")
    t = generate_transcripts(spark, n_convs=n_convs, seed=42)
    edges = derive_edges(t).select("src", "dst").persist()
    m = edges.count()
    g = ShardedGraph.build(edges)
    print(f"m={m} n={g.n} shards={g.num_shards} parts={g.shard_df.count()}")

    rank = np.full(g.n, 1.0 / g.n)
    # warm up workers/caches
    for _ in range(3):
        g.spmv_partials(rank)

    iters = 15
    t_pub = t_job = t_comb = k_ms = 0.0
    for _ in range(iters):
        t0 = time.monotonic()
        g._publish_rank(rank)
        t1 = time.monotonic()
        pdf = g._step_df.toPandas()
        t2 = time.monotonic()
        idx = np.concatenate([np.frombuffer(b, dtype=np.int64) for b in pdf["idx"]])
        partial = np.concatenate([np.frombuffer(b, dtype=np.float64) for b in pdf["contrib"]])
        new = np.zeros(g.n)
        new += 0.85 * np.bincount(idx, weights=partial, minlength=g.n)
        t3 = time.monotonic()
        k_ms += pdf["wall_ms"].sum()
        t_pub += t1 - t0
        t_job += t2 - t1
        t_comb += t3 - t2
    print(
        f"per-iter ms: publish={t_pub/iters*1e3:.1f} job={t_job/iters*1e3:.1f} "
        f"combine={t_comb/iters*1e3:.1f} kernel_sum={k_ms/iters:.1f} "
        f"rows_back={len(pdf)}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
