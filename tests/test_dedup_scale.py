"""Pin the dedup10x harness mechanism (bench.bench_dedup_scale): the
replica-disjoint token prefixing must make the N× corpus exactly N
independent copies of the 1× workload — pair and cluster counts scale
EXACTLY by the factor, or the linearity ratio the bench reports is
measuring a different workload than it claims.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import bench_dedup_scale


def test_dedup_scale_replicas_are_independent_copies(spark, sf_dir):
    out = bench_dedup_scale(spark, sf_dir, factor=2, extra_factors=(3,))
    one, big = out["per_factor"]["1x"], out["per_factor"]["2x"]
    # doubled corpus: every doc has a clone, so docs = 2 * table * factor
    assert big["docs"] == 2 * one["docs"]
    # the hard anchor (r12): the CLONE census is replica-invariant —
    # identical text gives identical signatures whatever the replica
    # token prefix — so it must replicate exactly at every factor.
    # (The total census can drift by ppm at high factors: threshold-
    # borderline natural pairs are LSH-sampled afresh per replica.)
    assert out["clone_census_exact"]
    assert big["clone_pairs"] == 2 * one["clone_pairs"]
    assert one["clone_pairs"] == one["docs"] // 2  # every doc + its clone
    # at tiny factors the total census replicates exactly too
    assert out["pairs_scale_exact"] and out["pair_dev_ppm"] == 0
    assert big["pairs"] == 2 * one["pairs"]
    assert big["clusters"] == 2 * one["clusters"]
    # every doc belongs to a cluster and each clone pair collapses:
    # clusters <= docs/2 + singletons bound sanity
    assert 0 < one["clusters"] <= one["docs"]
    assert {"pair_mine_wall_ratio", "cluster_wall_ratio",
            "pair_mine_linearity"} <= out.keys()
    # extra factors get their own census + ratio block
    x3 = out["scale_3x"]
    assert x3["clone_census_exact"]
    assert {"pairs_scale_exact", "pair_dev_ppm", "pair_mine_wall_ratio",
            "cluster_wall_ratio", "linearity"} <= x3.keys()
