"""Re-measure the round-4 >2x bench movers under the interleaved protocol.

BENCH_r04 vs BENCH_r03 showed chunk_dedup 4.8x, eff_diameter 3.6x,
ppr_k5 3.5x, anf_curve 2.6x, pagerank_w_k5 2.6x on raw single-shot walls
inside an 82-query bench session, with the query code git-unchanged — the
same signature BENCH/outliers_r4.json resolved as session weather for the
round-3 movers. This script gives each suspect the same treatment: a
FRESH session runs the five movers plus two stable controls
(exact_dedup, top_hubs), INTERLEAVED round-robin for REPEATS rounds, and
records per-query medians/mins next to the r03/r04 single-shot walls.

Run: python scripts/bench_outliers_r5.py  -> BENCH/outliers_r5.json
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), REPEATS (5).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = [
    "chunk_dedup", "eff_diameter", "ppr_k5", "anf_curve", "pagerank_w_k5",
    "exact_dedup", "top_hubs",
]
# single-shot walls from the committed per-round tables
R03 = {"chunk_dedup": 1.077, "eff_diameter": 1.147, "ppr_k5": 3.592,
       "anf_curve": 6.075, "pagerank_w_k5": 5.084,
       "exact_dedup": 0.255, "top_hubs": 0.332}
R04 = {"chunk_dedup": 5.162, "eff_diameter": 4.164, "ppr_k5": 12.609,
       "anf_curve": 16.054, "pagerank_w_k5": 13.378,
       "exact_dedup": 0.326, "top_hubs": 0.382}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = int(os.environ.get("REPEATS", "5"))
    from linkgraph.session import get_spark
    import __spark_entry__ as entry

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(app_name="outliers-r5", master=f"local[{cpus}]")
    qs = entry.queries()
    qs["top_hubs"](spark, sf_dir).count()  # untimed warmup
    walls: dict[str, list[float]] = {q: [] for q in QUERIES}
    for r in range(repeats):
        for q in QUERIES:
            t0 = time.monotonic()
            qs[q](spark, sf_dir).count()
            walls[q].append(round(time.monotonic() - t0, 3))
        print(f"round {r}: " + json.dumps({q: walls[q][-1] for q in QUERIES}))
    out = {
        "sf_dir": sf_dir,
        "repeats": repeats,
        "protocol": "fresh session, untimed warmup, round-robin "
                    "interleaved, median reported",
        "r03_single_shot": R03,
        "r04_single_shot": R04,
        "median": {q: statistics.median(w) for q, w in walls.items()},
        "min": {q: min(w) for q, w in walls.items()},
        "all": walls,
    }
    with open(os.path.join(REPO, "BENCH", "outliers_r5.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["median"]))


if __name__ == "__main__":
    main()
