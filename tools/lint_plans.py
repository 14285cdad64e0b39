"""Mechanical scale-risk linter over the dumped physical plans
(plans/*.txt, produced by tools/dump_plans.py) — turns the per-round
manual plan audit into a repeatable check.

Hard failures (exit 1):
- ``CartesianProduct`` anywhere: an unconditional all-pairs join never
  survives a 100x scale-up.
- More ``BroadcastNestedLoopJoin``s than zero-key aggregates
  (``Keys: []``) in a plan without an allowlist entry: the repo's
  accepted BNLJ shapes are (a) broadcasting a 1-row bound/total
  aggregate — each such join is fed by its OWN zero-key aggregate, so
  the counts must cover — and (b) the explicitly allowlisted bounded
  broadcast sets below.  Anything else is a join that degenerates to
  per-row scans of the build side.  (Count comparison, not a
  whole-plan boolean: one legitimate 1-row broadcast must not exempt
  unrelated BNLJs in the same plan.)

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
    # surfaced when the node counting was fixed in r9 (the old
    # substring patterns never matched, so these three were never
    # machine-audited; each verified by hand):
    # cross with the constant K=3 Range of Bloom hash indexes —
    # build side is 3 literal rows at any corpus size
    "contamination_bloom": "cross with constant K-row hash-index Range",
    # every vector scored against the K cluster centroids — build side
    # bounded by K x dim (the kmeans assign shape)
    "embedding_centroid_report": "broadcast K-cluster centroid table",
    # dense histogram-bin domain (distinct FLOOR(value/8) bins) —
    # bounded by the fixed value domain, not the row count
    "quantile_histogram_rollup": "broadcast bounded bin domain",
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
        # count the formatted-explain DETAIL headers "(nn) NodeName" —
        # one per physical node.  The old "NodeName (" substrings never
        # matched the actual rendering ("BroadcastNestedLoopJoin Inner
        # BuildRight (45)" in the tree, "(45) BroadcastNestedLoopJoin"
        # in the detail), so the BNLJ/SMJ gates silently counted zero.
        nodes = re.findall(r"^\(\d+\)\s+([A-Za-z]+)", text, re.M)
        n_cart = nodes.count("CartesianProduct") + text.count(
            "CartesianProduct"
        ) * (not nodes)  # plain-count fallback for non-formatted dumps
        n_bnlj = nodes.count("BroadcastNestedLoopJoin")
        n_smj = nodes.count("SortMergeJoin")
        n_exch = nodes.count("Exchange")
        # every accepted non-allowlisted BNLJ broadcasts its own 1-row
        # zero-key aggregate, so the aggregate count must COVER the
        # BNLJ count — a single "Keys: []" must not exempt unrelated
        # BNLJs elsewhere in the same plan (ADVICE r8)
        n_zero_key_agg = len(re.findall(r"Keys: \[\]", text))
        if n_cart:
            failures.append(f"{name}: CartesianProduct x{n_cart}")
        if n_bnlj > n_zero_key_agg and name not in ALLOW_BNLJ:
            failures.append(
                f"{name}: BroadcastNestedLoopJoin x{n_bnlj} exceeds "
                f"zero-key aggregates x{n_zero_key_agg} and no "
                "allowlist entry"
            )
        # Grouped-map (applyInPandas) stages must PIN their shuffle
        # parallelism (r16): AQE's byte-based partition coalescing
        # collapsed the z-score grouped exchange to ONE post-shuffle
        # partition — bytes are tiny but the stage pays one Python call
        # per group, so every group ran serially (3.5 s vs 0.95 s
        # 32-way). A FlatMapGroupsInPandas fed by a coalescible
        # ENSURE_REQUIREMENTS exchange instead of an explicit
        # REPARTITION_BY_NUM re-creates that trap.
        n_gmap = nodes.count("FlatMapGroupsInPandas")
        if n_gmap and "REPARTITION_BY_NUM" not in text:
            failures.append(
                f"{name}: FlatMapGroupsInPandas x{n_gmap} without a "
                "REPARTITION_BY_NUM exchange — AQE can coalesce the "
                "grouped shuffle to 1 partition and serialize every "
                "per-group Python call"
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
