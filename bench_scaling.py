"""Scaling-efficiency bench: N vs 4N parallelism on identical input.

The north rule demands "spark-submit --py-files on a multi-executor cluster
at two cluster sizes (N and 4N executors) with throughput scaling efficiency
>= 0.8". The sandbox has one 32-core host, so (per the driver instruction)
the two cluster sizes are evidenced by running the SAME job on the SAME
materialized edge table at two parallelism levels:

    spark-submit --master local[8]  --py-files dist/linkgraph.zip jobs/pagerank_job.py ...
    spark-submit --master local[32] --py-files dist/linkgraph.zip jobs/pagerank_job.py ...

Shard count and every other config are held constant across levels, so the
work is identical (SURVEY §7.3). Efficiency:

    eff = throughput(local[32]) / (4 x throughput(local[8]))

Writes BENCH/BASELINE.md + BENCH/scaling.json. Run:  python bench_scaling.py
Env knobs: SCALING_CONVS (default 400000), SCALING_REPEATS (default 3).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
SPARK_SUBMIT = shutil.which("spark-submit") or os.path.join(
    os.path.dirname(shutil.which("python") or sys.executable), "spark-submit"
)


def _materialize_edges(n_convs: int, path: str) -> int:
    """Write the deterministic synthetic edge table once; both levels read it."""
    sys.path.insert(0, REPO)
    from linkgraph.session import get_spark
    from linkgraph.sources import derive_edges, generate_transcripts

    spark = get_spark(app_name="bench-scaling-gen", master="local[32]")
    edges = derive_edges(generate_transcripts(spark, n_convs=n_convs, seed=42)).select(
        "src", "dst"
    )
    edges.repartition(32).write.mode("overwrite").parquet(path)
    m = spark.read.parquet(path).count()
    spark.stop()
    return m


def _run_level(cores: int, edges_path: str, zip_path: str, num_shards: int,
               repeats: int) -> list[dict]:
    runs = []
    for i in range(repeats + 1):  # +1 warm-up, discarded
        cmd = [
            SPARK_SUBMIT,
            "--master", f"local[{cores}]",
            "--conf", "spark.driver.memory=24g",
            "--conf", f"spark.sql.shuffle.partitions={num_shards}",
            "--conf", "spark.sql.adaptive.enabled=true",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "pagerank_job.py"),
            "--edges", edges_path,
            "--num-shards", str(num_shards),
            "--eps", "1e-6",
            "--max-iter", "200",
        ]
        t0 = time.monotonic()
        out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
        if out.returncode != 0:
            raise RuntimeError(f"spark-submit failed at local[{cores}]:\n{out.stderr[-4000:]}")
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        rec = json.loads(line)
        rec["launcher_wall_sec"] = round(time.monotonic() - t0, 1)
        if i > 0:  # discard warm-up
            runs.append(rec)
        print(f"  local[{cores}] run {i}: {rec['edges_per_sec']:.0f} edges/s "
              f"({rec['wall_sec']}s, {rec['iterations']} iters)", file=sys.stderr)
    return runs


def main() -> dict:
    n_convs = int(os.environ.get("SCALING_CONVS", 400_000))
    repeats = int(os.environ.get("SCALING_REPEATS", 3))
    num_shards = 32  # held constant across levels: identical work

    from scripts.package import build_zip

    sys.path.insert(0, REPO)
    zip_path = build_zip()

    tmp = tempfile.mkdtemp(prefix="lg_scaling_")
    edges_path = os.path.join(tmp, "edges.parquet")
    print(f"materializing {n_convs} convs of edges -> {edges_path}", file=sys.stderr)
    m = _materialize_edges(n_convs, edges_path)
    print(f"edge table: {m} edges", file=sys.stderr)

    levels = {}
    for cores in (8, 32):
        runs = _run_level(cores, edges_path, zip_path, num_shards, repeats)
        tps = [r["edges_per_sec"] for r in runs]
        levels[cores] = {
            "runs": runs,
            "mean_edges_per_sec": statistics.mean(tps),
            "var_edges_per_sec": statistics.pvariance(tps) if len(tps) > 1 else 0.0,
            "mean_wall_sec": statistics.mean(r["wall_sec"] for r in runs),
            "iterations": runs[0]["iterations"],
        }

    eff = levels[32]["mean_edges_per_sec"] / (4.0 * levels[8]["mean_edges_per_sec"])
    result = {
        "edges": m,
        "num_shards": num_shards,
        "repeats": repeats,
        "levels": levels,
        "scaling_efficiency_8_to_32": round(eff, 4),
        "passes_north_rule": eff >= 0.8,
    }

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(result, f, indent=1)
    _write_md(result)
    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps({"scaling_efficiency": round(eff, 4), "edges": m,
                      "tp8": round(levels[8]["mean_edges_per_sec"], 1),
                      "tp32": round(levels[32]["mean_edges_per_sec"], 1)}))
    return result


def _write_md(r: dict) -> None:
    l8, l32 = r["levels"][8], r["levels"][32]
    md = f"""# BENCH/BASELINE — measured throughput & scaling (this engine)

Protocol: BASELINE.md. Metric: PageRank edges-processed/sec to L2<=1e-6
convergence (Family-A semantics, d=0.85, float64) = edges x iterations /
wall_sec of the iterate phase. One 32-core host; the north rule's N vs 4N
executors is evidenced as two parallelism levels via
`spark-submit --master local[8|32] --py-files dist/linkgraph.zip
jobs/pagerank_job.py --edges <same table> --num-shards {r["num_shards"]}`.
Same materialized edge table, same shard count ({r["num_shards"]}), same
configs at both levels; {r["repeats"]} timed runs per level after one
discarded JVM warm-up run.

| quantity | local[8] (N) | local[32] (4N) |
|---|---|---|
| edges | {r["edges"]:,} | {r["edges"]:,} |
| iterations to 1e-6 | {l8["iterations"]} | {l32["iterations"]} |
| mean wall (iterate) s | {l8["mean_wall_sec"]:.2f} | {l32["mean_wall_sec"]:.2f} |
| mean throughput edges/s | {l8["mean_edges_per_sec"]:,.0f} | {l32["mean_edges_per_sec"]:,.0f} |
| variance (edges/s)^2 | {l8["var_edges_per_sec"]:,.0f} | {l32["var_edges_per_sec"]:,.0f} |

**Scaling efficiency** = throughput(local[32]) / (4 x throughput(local[8]))
= **{r["scaling_efficiency_8_to_32"]:.3f}** (north-rule target >= 0.8:
{"PASS" if r["passes_north_rule"] else "FAIL"}).

Raw per-run records: `BENCH/scaling.json`.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
