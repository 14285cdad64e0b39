"""Mechanical scale-risk linter over the dumped physical plans
(plans/*.txt, produced by tools/dump_plans.py) — turns the per-round
manual plan audit into a repeatable check.

Hard failures (exit 1):
- ``CartesianProduct`` anywhere: an unconditional all-pairs join never
  survives a 100x scale-up.
- ``BroadcastNestedLoopJoin`` in a plan with NO zero-key aggregate
  (``Keys: []``) and no allowlist entry: the repo's accepted BNLJ
  shapes are (a) broadcasting a 1-row bound/total aggregate and (b)
  the explicitly allowlisted bounded broadcast sets below.  Anything
  else is a join that degenerates to per-row scans of the build side.

Informational (printed, never failing):
- Exchange / SortMergeJoin / BNLJ / scan counts per plan;
- SMJ co-occurring with a dimension-table scan — dims must broadcast,
  so a new co-occurrence deserves a human look (the one known case is
  q21's LeftAnti lineitem SELF-join; its dims all broadcast).

Usage: python tools/lint_plans.py [plans_dir]
"""

from __future__ import annotations

import glob
import os
import re
import sys

# BNLJ without a zero-key aggregate, accepted by name with the reason
ALLOW_BNLJ = {
    # broadcasts the seeded, LIMIT-bounded query set (<= 2048 rows) —
    # the deliberate brute-force baseline shape (similarity.py)
    "cosine_topk_brute": "broadcast bounded query set",
    "ann_hard_negatives": "broadcast bounded query set",
    "embedding_neardup_pairs": "broadcast bounded probe block",
}

_DIM_SCAN = re.compile(
    r"Location.*\b(region|nation|supplier|part|customer)\.parquet"
)


def lint(plans_dir: str) -> int:
    failures: list[str] = []
    infos: list[str] = []
    paths = sorted(glob.glob(os.path.join(plans_dir, "*.txt")))
    if not paths:
        print(f"no plans in {plans_dir}")
        return 1
    for path in paths:
        name = os.path.basename(path)[:-4]
        text = open(path).read()
        n_cart = text.count("CartesianProduct")
        n_bnlj = text.count("BroadcastNestedLoopJoin (")
        n_smj = text.count("SortMergeJoin (")
        n_exch = text.count("Exchange (")
        has_zero_key_agg = "Keys: []" in text
        if n_cart:
            failures.append(f"{name}: CartesianProduct x{n_cart}")
        if n_bnlj and not has_zero_key_agg and name not in ALLOW_BNLJ:
            failures.append(
                f"{name}: BroadcastNestedLoopJoin x{n_bnlj} with no "
                "zero-key aggregate and no allowlist entry"
            )
        if n_smj and _DIM_SCAN.search(text):
            infos.append(
                f"{name}: SortMergeJoin + dim-table scan co-occur "
                f"(smj={n_smj}) — verify the dims broadcast"
            )
        infos.append(
            f"{name}: exchanges={n_exch} smj={n_smj} bnlj={n_bnlj}"
        )
    for line in infos:
        print("INFO", line)
    for line in failures:
        print("FAIL", line)
    print(f"\n== {len(paths)} plans, {len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(lint(sys.argv[1] if len(sys.argv) > 1 else "plans"))
