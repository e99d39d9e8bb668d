"""Bench harness — one JSON line to stdout (driver contract).

Headline metric: PageRank edges-processed/sec to 1e-6 convergence
(edges × iterations ÷ wall_sec, BASELINE.json metric) on the deterministic
synthetic transcript-derived edge table sized by the sf of
$SPARK_GRAFT_SF_DIR, run on local[$SPARK_GRAFT_CPUS] via the sharded
Arrow-kernel path. Secondary: wall times for representative driver-contract
queries at the sf dir.

Scaling evidence (N vs 4N executors) lives in bench_scaling.py →
BENCH/BASELINE.md; this file is the per-round feedback loop.
"""

from __future__ import annotations

import json
import os
import sys
import time


def run() -> dict:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from linkgraph.session import get_spark
    from linkgraph.sources import derive_edges, generate_transcripts
    from linkgraph.operators.pagerank import pagerank_sharded
    from linkgraph.plans.barrier import pagerank_barrier
    from linkgraph.plans.shards import ShardedGraph
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="linkgraph-bench", master=f"local[{cpus}]")

    # --- headline: transcript -> edges -> converged PageRank ---
    n_convs = max(200, int(1_000_000 * sf))  # sf0.1 -> 100k convs ≈ 1.6M edges
    t_gen0 = time.monotonic()
    transcripts = generate_transcripts(spark, n_convs=n_convs, seed=42)
    edges = derive_edges(transcripts).select("src", "dst").persist()
    m = edges.count()
    gen_sec = time.monotonic() - t_gen0

    t0 = time.monotonic()
    g = ShardedGraph.build(edges)
    build_sec = time.monotonic() - t0

    # barrier engine (gang loop, the headline number)
    t0 = time.monotonic()
    res = pagerank_barrier(sharded_graph=g, eps=1e-6, max_iter=200)
    pr_sec = time.monotonic() - t0
    iter_sec = sum(mm["wall_ms"] for mm in res.iter_metrics) / 1e3
    edges_per_sec = m * res.iterations / max(iter_sec, 1e-9)

    # driver-loop mapInArrow path (the north-star pandas/Arrow-UDF SpMV)
    t0 = time.monotonic()
    res_sh = pagerank_sharded(edges, eps=1e-6, max_iter=200, sharded_graph=g)
    sharded_sec = time.monotonic() - t0
    per_iter_ms = (
        sum(mm["wall_ms"] for mm in res_sh.iter_metrics)
        / max(1, len(res_sh.iter_metrics))
    )
    g.unpersist()
    edges.unpersist()

    # --- secondary: representative relational/pipeline queries at sf_dir ---
    queries = {}
    qs = entry_mod.queries()
    for name in ["edge_derivation", "out_degrees", "pagerank_step", "top_hubs",
                 "exact_dedup", "token_count", "quality", "cosine_topk",
                 "minhash_near_dups", "components", "triangles",
                 "pagerank_k5", "lpa_k3", "scc", "repetition",
                 "stratified_sample", "decontaminate", "bfs_hops",
                 "hits_k3", "pagerank_w_k5", "ppr_k5", "clustering",
                 "adamic_adar", "ktruss_r2", "link_scores", "randwalk_k3",
                 "chunk_dedup", "knn_curve", "top_bigrams", "harmonic_k4",
                 "eff_diameter", "betweenness_k4", "len_percentiles",
                 "sssp_r4", "mis_r2", "temporal_r3", "funnel3",
                 "unigram_xent", "centroid_cosine", "transitivity",
                 "coreness_r2", "coloring_r2", "anf_curve", "katz_k4",
                 "modularity", "eigen_k4", "trussness_r2", "salsa_k3",
                 "closeness_k4", "matching_r2", "ball2", "louvain_round",
                 "louvain", "conductance", "bm25", "bowtie", "tfidf_topk",
                 "cms_hh", "node2vec_k3", "emb_cov", "msf_round", "msf",
                 "squares", "coengagement", "kmeans_round", "slpa_k3",
                 "vsample", "doulion",
                 # round-4 additions (streaming drives excluded per the
                 # contract-runtime budget; they're benched in BENCH/)
                 "densest_r2", "pii_scan", "tpch_ship_priority",
                 "tpch_returned_rev", "tpch_part_supplier_counts",
                 "pagerank_ws_k5", "pagerank_bs_k5", "squares_p",
                 "coeng_capped", "anf_round", "simrank_r2", "ppr_sweep",
                 "ppr_push"]:
        t0 = time.monotonic()
        qs[name](spark, sf_dir).count()  # force full execution
        queries[name] = round(time.monotonic() - t0, 3)

    out = {
        "metric": "pagerank_edges_per_sec_to_1e-6",
        "value": round(edges_per_sec, 1),
        "unit": "edges/sec",
        "queries": queries,
        "sf": sf,
        "detail": {
            "edges": m,
            "iterations": res.iterations,
            "converged": res.converged,
            "barrier_wall_sec": round(pr_sec, 3),
            "barrier_iterate_sec": round(iter_sec, 3),
            "sharded_wall_sec": round(sharded_sec, 3),
            "sharded_iter_ms": round(per_iter_ms, 1),
            "sharded_edges_per_sec": round(m * res_sh.iterations / sharded_sec, 1),
            "shard_build_sec": round(build_sec, 3),
            "gen_wall_sec": round(gen_sec, 3),
            "cpus": cpus,
        },
    }
    spark.stop()
    return out


if __name__ == "__main__":
    print(json.dumps(run()))
