"""Paired code-vs-code A/B across two checkouts (r21 protocol).

Arms are two repo paths (e.g. a git worktree of the previous commit vs
the working tree). Each rep launches a fresh python process per arm
pointed at that arm's package, which runs the query list with
min-of-TRIALS warm in-session trials (trial 1 warms JIT/page cache,
matching bench.py's min-of-3 discipline) to a noop sink. Arms alternate
ABBA so host drift hits both. The min over reps per arm is the
statistic; every rep is printed so the spread is visible.

Usage:
  python tools/ab_tree.py --a /tmp/r20_tree --b /root/repo \
      --queries embedding_kmeans_clusters,dedup_cluster_assign_lsh \
      [--sf-dir /root/testdata/sf0.1] [--reps 3] [--trials 3]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys

CHILD = r"""
import json, sys, time
repo, sf_dir, names, trials = sys.argv[1], sys.argv[2], sys.argv[3].split(","), int(sys.argv[4])
sys.path.insert(0, repo)
from clockpipe_spark.queries import all_queries
from clockpipe_spark.session import get_spark
spark = get_spark("ab-tree")
qs = all_queries()
import os
spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
def _noop(b):
    yield from b
spark.range(1024).repartition(32).mapInPandas(_noop, "id long").count()
out = {}
for name in names:
    best = 9e9
    for _ in range(trials):
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    out[name] = round(best, 3)
print("ABTREE_RESULT " + json.dumps(out))
"""


def run_arm(repo: str, sf_dir: str, names: list[str], trials: int) -> dict:
    p = subprocess.run(
        [sys.executable, "-c", CHILD, repo, sf_dir, ",".join(names), str(trials)],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    for line in p.stdout.splitlines():
        if line.startswith("ABTREE_RESULT "):
            return json.loads(line[len("ABTREE_RESULT "):])
    raise RuntimeError(
        f"arm {repo} produced no result; tail:\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", required=True, help="repo path for arm A (baseline)")
    ap.add_argument("--b", required=True, help="repo path for arm B (candidate)")
    ap.add_argument("--queries", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()
    names = args.queries.split(",")

    res: dict[str, list[dict]] = {"A": [], "B": []}
    order = ["A", "B"]
    for rep in range(args.reps):
        for arm in order:
            repo = args.a if arm == "A" else args.b
            r = run_arm(repo, args.sf_dir, names, args.trials)
            res[arm].append(r)
            print(f"rep {rep} arm {arm}: {r}", flush=True)
        order.reverse()  # ABBA
    print(f"\n{'query':36s} {'A min':>7s} {'B min':>7s} {'B/A':>6s}")
    ta = tb = 0.0
    for n in names:
        a = min(r[n] for r in res["A"])
        b = min(r[n] for r in res["B"])
        ta += a
        tb += b
        print(f"{n:36s} {a:7.3f} {b:7.3f} {b / a:6.2f}")
    print(f"{'TOTAL(min-of-reps)':36s} {ta:7.3f} {tb:7.3f} {tb / ta:6.2f}")


if __name__ == "__main__":
    main()
