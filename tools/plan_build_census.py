"""Driver-side plan-BUILD census over the full registry (guide §1.2).

For each of the 180 registry queries, times the pure Python-side build
(`fn(spark, sf_dir)` — py4j chatter + analysis triggers, no action) and,
separately, one forced Catalyst optimize of the built frame. The ranked
build times point at the builders whose Column-by-Column construction
pays the py4j round-trip tax; the optimize column separates driver
socket wait from genuine Catalyst cost.

Usage: python tools/plan_build_census.py [sf_dir] [--top N]
Writes the full table to /tmp/plan_build_census.json and prints the top.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clockpipe_spark.queries import all_queries  # noqa: E402
from clockpipe_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    top_n = 25
    if "--top" in sys.argv:
        top_n = int(sys.argv[sys.argv.index("--top") + 1])

    spark = get_spark("plan-build-census")
    queries = all_queries()
    # warm the session (JVM, parquet footers, catalog memo cold paths)
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    rows = []
    for name, fn in sorted(queries.items()):
        # two reps, min: the first build pays one-time per-query costs
        # (module imports, centroid training collects) that a deployed
        # planner would amortize — both numbers recorded
        build = []
        optimize = []
        for _ in range(2):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            build.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            df._jdf.queryExecution().optimizedPlan()
            optimize.append(time.perf_counter() - t0)
        rows.append(
            {
                "name": name,
                "build_min_s": round(min(build), 4),
                "build_first_s": round(build[0], 4),
                "optimize_min_s": round(min(optimize), 4),
            }
        )
    rows.sort(key=lambda r: r["build_min_s"], reverse=True)
    total = round(sum(r["build_min_s"] for r in rows), 2)
    out = {"sf_dir": sf_dir, "total_build_min_s": total, "rows": rows}
    with open("/tmp/plan_build_census.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"total build (min-of-2) over {len(rows)} queries: {total} s")
    print(f"{'query':44s} {'build':>8s} {'first':>8s} {'optimize':>9s}")
    for r in rows[:top_n]:
        print(
            f"{r['name']:44s} {r['build_min_s']:8.3f} "
            f"{r['build_first_s']:8.3f} {r['optimize_min_s']:9.4f}"
        )


if __name__ == "__main__":
    main()
