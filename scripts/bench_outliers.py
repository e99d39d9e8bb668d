"""Re-measure the round-3 bench outliers under an interleaved protocol.

BENCH_r03 showed pagerank_k5 +37%, triangles +40%, components +34% vs
BENCH_r02 on raw single-shot walls inside a 68-query bench process; the
query functions were git-unchanged, so the suspects were host weather and
session-level pressure. This script isolates both: a FRESH session runs
only the three outliers plus two stable controls (exact_dedup, top_hubs),
INTERLEAVED round-robin for `REPEATS` rounds (each query once per round,
so slow windows hit all queries equally), and records per-query medians.

Run: python scripts/bench_outliers.py  -> BENCH/outliers_r4.json
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

QUERIES = ["pagerank_k5", "triangles", "components", "exact_dedup", "top_hubs"]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = int(os.environ.get("REPEATS", "5"))
    from linkgraph.session import get_spark
    import __spark_entry__ as entry

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(app_name="outliers", master=f"local[{cpus}]")
    qs = entry.queries()
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
        "protocol": "fresh session, round-robin interleaved, median reported",
        "r02_single_shot": {"pagerank_k5": 3.66, "triangles": 1.55, "components": 2.61},
        "r03_single_shot": {"pagerank_k5": 5.03, "triangles": 2.16, "components": 3.49},
        "median": {q: statistics.median(w) for q, w in walls.items()},
        "min": {q: min(w) for q, w in walls.items()},
        "all": walls,
    }
    with open(os.path.join(REPO, "BENCH", "outliers_r4.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["median"]))


if __name__ == "__main__":
    main()
