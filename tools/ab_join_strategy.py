"""Paired A/B: sort-merge vs shuffled-hash join preference (guide §3.1).

Times a set of join-heavy registry queries under arm A = repo defaults
(preferSortMergeJoin=true, Spark default) and arm B =
preferSortMergeJoin=false + a 64 MB AQE local-map threshold so the
planner/AQE may pick shuffled hash joins where the per-partition build
side fits. Both are runtime SQL confs, so ONE warm session hosts both
arms; arms alternate ABBA per rep so host drift hits both. Min-of-reps
per arm is the statistic. Each timed run is build+execute to a noop
sink, matching bench.py methodology.

Usage: python tools/ab_join_strategy.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clockpipe_spark.queries import all_queries
from clockpipe_spark.session import get_spark

# exactly the 9 registry queries whose sf0.01 plan dumps contain a
# SortMergeJoin (grep over plans/*.txt after tools/dump_plans.py)
QUERIES = [
    "q21_waiting_suppliers",
    "q2_min_cost_supplier",
    "q20_part_promotion",
    "cdc_incremental_agg",
    "cdc_snapshot_diff",
    "join_full_outer_daily",
    "neardup_triangle_stats",
    "dedup_cluster_assign_lsh",
    "dedup_components_chain",
]

B_CONF = {
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": str(64 * 1024 * 1024),
}
A_CONF = {
    "spark.sql.join.preferSortMergeJoin": "true",
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "0",
}


def run_arm(spark, tag: str, conf: dict, sf_dir: str, qs) -> dict:
    for k, v in conf.items():
        spark.conf.set(k, v)
    out = {}
    for name in QUERIES:
        q = qs[name]
        spark.sparkContext.setJobDescription(f"ab-{tag}:{name}")
        t0 = time.time()
        q(spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 3)
    spark.sparkContext.setJobDescription(None)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    qs = all_queries()
    spark = get_spark("ab-join")
    # warmup (not recorded): populate page cache + JIT on arm-A shapes
    run_arm(spark, "warm", A_CONF, sf_dir, qs)
    res = {"A": [], "B": []}
    order = ["A", "B"]
    for rep in range(reps):
        for arm in order:
            conf = B_CONF if arm == "B" else A_CONF
            res[arm].append(run_arm(spark, arm, conf, sf_dir, qs))
        order.reverse()  # ABBA alternation
    print(f"{'query':32s} {'A min':>7s} {'B min':>7s} {'B/A':>6s}")
    ta = tb = 0.0
    for n in QUERIES:
        a = min(r[n] for r in res["A"])
        b = min(r[n] for r in res["B"])
        ta += a
        tb += b
        print(f"{n:32s} {a:7.3f} {b:7.3f} {b / a:6.2f}")
    print(f"{'TOTAL(min-of-reps)':32s} {ta:7.3f} {tb:7.3f} {tb / ta:6.2f}")
    for arm in ("A", "B"):
        print(f"all {arm} reps:", res[arm])


if __name__ == "__main__":
    main()
