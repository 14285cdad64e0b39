"""The driver records only the last 2000 chars of bench stdout; round 5's
oversized JSON line cost the round its BENCH record (parsed:null). These
tests pin the emit contract: one line, parseable, under the tail budget,
for any plausible registry size."""

import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, TAIL_BUDGET, emit_line


def _payload(n_queries: int) -> dict:
    return {
        "metric": "headline_total",
        "value": 123.456,
        "unit": "sec",
        "timing": "build+execute",
        "stat": "min",
        "trials": 2,
        "sf": 0.1,
        "detail": "BENCH_DETAIL.json",
        "queries": {
            f"some_fairly_long_query_name_{i:03d}": round(0.1 * i + 0.123, 2)
            for i in range(n_queries)
        },
        "shared_vs_prev": {
            "prev": "BENCH_r05.json",
            "n": n_queries,
            "ratio": 0.563,
            "worst": "ann_ivf_topk",
            "worst_ratio": 3.493,
        },
        "cdc": {"snapshot_rows_per_sec": 61360.3, "cdc_events_per_sec": 22119.5},
        "state10x": {
            "keys": 10_000_000,
            "flat_drain_sec": 28.52,
            "bucketed_drain_sec": 16.27,
            "rewrite_ratio": 25.9,
            "speedup": 1.75,
            "sweep": {"256": 18.11, "1024": 16.27, "4096": 17.93},
            "sweep_rw_mrows": {"256": 7.8, "1024": 3.1, "4096": 0.9},
            "best_n_rewrite": 4096,
        },
        # the blocks that shed first in the r10-shaped payload — present
        # here so the guard measures the REAL compact line, and the new
        # cheap-query elision (not block shedding) is what absorbs any
        # overflow
        "iso": {
            "dedup_exact": 0.375, "neardup_jaccard_pairs": 2.269,
            "ann_lsh_topk": 1.32, "embedding_neardup_pairs": 0.896,
            "dedup_minhash_lsh": 1.4, "cdc_pgoutput_roundtrip": 1.17,
            "text_c4_filters": 0.599,
        },
        "live_pg": {
            "snapshot_rows_per_sec": 66703.4,
            "cdc_events_per_sec": 23661.2,
        },
        "ingest": {"docs_per_sec": 350.0, "compact_sec": 1.28},
        "ingest_dps_by_batches": {"2": 558.3, "8": 172.7},
        "ingest_2x_docs_2_batches_dps": 1026.3,
        "ivf_prewarm_sec": 1.275,
        "noise_mitigation": "min-of-3",
        "dedup10x": {
            "pairs_scale_exact": True, "clone_census_exact": True,
            "pair_dev_ppm": 0.0, "pair_mine_wall_ratio": 5.48,
            "cluster_wall_ratio": 1.31, "linearity": 0.55,
        },
        "dedup30x": {
            "clone_census_exact": True, "pairs_scale_exact": False,
            "pair_dev_ppm": 22.1, "pair_mine_wall_ratio": 18.22,
            "cluster_wall_ratio": 2.16, "linearity": 0.61,
        },
        "noise_sentinel": 0.43,
        "sentinel_pre_gate": {"attempts": [0.522], "clean": True},
    }


def test_current_headline_keeps_directive_evidence():
    """The REAL r13-shaped payload must keep this round's directive
    evidence on the driver's record: iso (directive #5), live_pg
    (directive #3), the ingest dps numbers (directive #7), and the
    sentinel pre-gate (directive #4). Cheap-query elision (disclosed,
    floor 18, full list in BENCH_DETAIL.json) plus shedding the
    cumulative blocks (state10x/dedup10x, fully recorded in DETAIL)
    absorb the overflow instead."""
    payload = _payload(0)
    payload["queries"] = {name: 12.34 for name in HEADLINE}
    line = emit_line(payload)
    assert len(line) <= TAIL_BUDGET
    parsed = json.loads(line)
    for block in ("iso", "live_pg", "ingest", "ingest_dps_by_batches",
                  "ingest_2x_docs_2_batches_dps", "sentinel_pre_gate",
                  "noise_sentinel", "cdc"):
        assert parsed.get(block) is not None, f"{block} must survive emit_line"
    assert len(parsed["queries"]) >= 18
    assert (
        len(parsed["queries"]) + parsed.get("queries_elided", 0)
        == len(HEADLINE)
    )


def test_oversized_registry_still_parses_within_budget():
    for n in (60, 120, 400):
        line = emit_line(_payload(n))
        assert len(line) <= TAIL_BUDGET, n
        parsed = json.loads(line)
        assert parsed["metric"] == "headline_total"
        assert parsed["value"] == 123.456
        # queries may be elided but the count is disclosed
        assert len(parsed["queries"]) + parsed.get("queries_elided", 0) == n


def test_single_line_output():
    assert "\n" not in emit_line(_payload(40))
