#!/usr/bin/env python
"""Stamp the round's headline-band record (PLANS.md "the headline band,
decided once", VERDICT r17 directive #1).

The <=31 s headline band is judged against BENCH_BAND.json — the
round's best FULLY-GATED run — not against the driver's BENCH_r{N}
deposit (a drift sample for the headline; its own section gates keep
governing the iso/live-PG/ingest bars).  This tool is the only writer
of BENCH_BAND.json and refuses to stamp a record that does not qualify:

* every section gate must have found a quiet window
  (``section_loaded: false`` for all four sections);
* the headline gate's picked worst canary ratio must be <= its
  threshold (redundant with the flag, asserted anyway);
* ``run1_warm`` is carried through so cold-start consumers know
  whether queries_run1 means anything.

Usage:
    python tools/band_record.py [BENCH_DETAIL.json] [--band 31.0]

Run bench.py, then stamp while BENCH_DETAIL.json still holds that run
(the driver's post-wrap deposit overwrites it).  Exit 0 and write
BENCH_BAND.json iff the run qualifies; exit 2 with the disqualifying
sections named otherwise.  band_met / q10_vs_r01 are RECORDED, not
gated — a qualifying quiet run that misses the band is a real
regression and must be visible, not suppressed.
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_BAND_SEC = 31.0
# q1_pricing_summary-era first-round record: q10_returned_items read
# 0.602 s in BENCH_r01.json; the baseline contract is <=2x per query.
Q10_R01_SEC = 0.602
# Fallback steal budget for records written before the gate carried
# its own ``steal_max_pct`` field. ADVICE r18 #2: the live threshold is
# READ FROM THE GATE RECORD (like threshold_ratio), so bench.py's
# budget can never silently drift from the invariant check here; this
# constant only backstops pre-field records, matching the
# bench.SECTION_STEAL_MAX_PCT value they were gated with.
PRE_FIELD_STEAL_MAX_PCT = 5.0

# Memory-bandwidth warn band (ADVICE r19 #1): the gate floor (24 GB/s)
# deliberately admits the 24-31 GB/s intermediate-bus band, and the
# r18/r19 paired readings show such windows can inflate timings
# (PLANS.md "the memory-bandwidth vote": quiet cluster ≥31.2 GB/s
# across two days; a fully-gated 25.6 GB/s window read +19% vs the
# clean-bus run). Stamps whose picked readings fall in the band are
# ANNOTATED — visibly flagged, not refused — so a band-miss on an
# intermediate-bus window attributes itself.
MEM_WARN_BAND_GBPS = 31.0


def _budget_drift_warnings(hg: dict) -> list[str]:
    """ADVICE r19 #2: the gate-invariant checks judge the record
    against thresholds the record itself declares, so a bench build
    with a silently loosened budget would self-certify. Compare the
    recorded budgets against the live bench constants and warn on
    mismatch — the loosened-budget record is then visible at stamp
    time. Warn (not refuse): re-stamping an OLD record after a
    deliberate, documented budget change must stay possible."""
    warnings = []
    try:
        sys.path.insert(0, HERE)
        import bench
    except Exception as ex:  # bench must stay importable; never crash a stamp
        return [f"budget cross-check skipped (bench import failed: {ex})"]
    rec_steal = hg.get("steal_max_pct")
    if rec_steal is not None and rec_steal != bench.SECTION_STEAL_MAX_PCT:
        warnings.append(
            f"record's steal budget {rec_steal}% != live "
            f"bench.SECTION_STEAL_MAX_PCT {bench.SECTION_STEAL_MAX_PCT}%"
        )
    rec_mem = hg.get("mem_min_gbps")
    if rec_mem is not None and rec_mem != bench.MEM_CANARY_MIN_GBPS:
        warnings.append(
            f"record's mem floor {rec_mem} GB/s != live "
            f"bench.MEM_CANARY_MIN_GBPS {bench.MEM_CANARY_MIN_GBPS} GB/s"
        )
    return warnings


def _mem_of(gate: dict):
    """Picked attempt's bandwidth reading, wherever the writing era put
    it: gate-level ``mem_gbps`` (r19 vote), else inside the picked
    attempt's canary_post/canary_pre dicts (r18 record-only era — the
    burn ran in both probes then; post is the fresher read), else None
    (pre-probe records)."""
    if gate.get("mem_gbps") is not None:
        return gate["mem_gbps"]
    for side in ("canary_post", "canary_pre"):
        probe = gate.get(side)
        if isinstance(probe, dict) and probe.get("mem_gbps") is not None:
            return probe["mem_gbps"]
    return None


def main(argv: list[str]) -> int:
    band = DEFAULT_BAND_SEC
    paths = []
    it = iter(argv)
    for a in it:
        if a == "--band":
            band = float(next(it))
        elif a.startswith("--band="):
            band = float(a.split("=", 1)[1])
        else:
            paths.append(a)
    src = paths[0] if paths else os.path.join(HERE, "BENCH_DETAIL.json")

    with open(src) as f:
        detail = json.load(f)

    gates = detail.get("section_gates") or {}
    required = ("headline", "iso", "live_pg", "ingest")
    missing = [s for s in required if s not in gates]
    if missing:
        print(f"band_record: REFUSED — record has no gate for: {missing} "
              f"(pre-gate-era record? re-run bench.py)", file=sys.stderr)
        return 2
    loaded = [s for s in required if gates[s].get("section_loaded")]
    if loaded:
        print(f"band_record: REFUSED — sections stamped loaded (no quiet "
              f"window within the re-run budget): {loaded}; this run is a "
              f"disclosed-warm drift sample, not band evidence",
              file=sys.stderr)
        return 2
    hg = gates["headline"]
    if hg["worst_ratio"] > hg["threshold_ratio"]:
        print(f"band_record: REFUSED — headline picked ratio "
              f"{hg['worst_ratio']} > {hg['threshold_ratio']} yet "
              f"section_loaded is false (gate invariant broken)",
              file=sys.stderr)
        return 2
    # r18 steal certification, scoped to what the band measures: the
    # headline value is the sum of the HEADLINE section's timings only,
    # so the steal that can corrupt it is the headline gate's own
    # window — which already votes in that gate (a >5%-steal attempt is
    # hot, and an exhausted budget lands section_loaded, refused
    # above). The first version of this tool refused on SUITE-wide
    # steal and promptly refused a run whose headline was
    # steal-certified at 2.33% because the post-headline scale stories
    # crossed a co-tenant burst (7.46% suite) — contention there cannot
    # touch the headline sum. The defensive check below catches only a
    # broken gate (loaded=false yet picked steal over budget); suite
    # steal is recorded as annotation. Pre-steal records carry no
    # steal fields and qualify on their canary gates alone.
    suite_steal = detail.get("suite_steal_pct")
    hl_steal = hg.get("steal_pct")
    steal_max = hg.get("steal_max_pct", PRE_FIELD_STEAL_MAX_PCT)
    if hl_steal is not None and hl_steal > steal_max:
        print(f"band_record: REFUSED — headline section ran under "
              f"{hl_steal}% steal (max {steal_max}%) yet "
              f"section_loaded is false (gate invariant broken)",
              file=sys.stderr)
        return 2
    # r19 memory-bandwidth vote, same defensive shape: the vote already
    # lands section_loaded inside the gate, so a below-floor picked
    # reading with loaded=false can only mean the gate is broken.
    # Pre-vote (r18) records carry mem_gbps as record-only attribution
    # INSIDE canary_pre/canary_post (or not at all) and no gate-level
    # floor — no invariant to check there, attribution still stamped
    # via _mem_of below.
    hl_mem = hg.get("mem_gbps")
    mem_floor = hg.get("mem_min_gbps")
    if hl_mem is not None and mem_floor is not None and hl_mem < mem_floor:
        print(f"band_record: REFUSED — headline section ran at "
              f"{hl_mem} GB/s memory bandwidth (floor {mem_floor}) yet "
              f"section_loaded is false (gate invariant broken)",
              file=sys.stderr)
        return 2

    for w in _budget_drift_warnings(hg):
        print(f"band_record: WARNING — {w}", file=sys.stderr)

    value = detail["value"]
    q10 = (detail.get("queries") or {}).get("q10_returned_items")
    mem_by_section = {s: _mem_of(gates[s]) for s in required}
    record = {
        "stamped_from": os.path.basename(src),
        "metric": detail.get("metric"),
        "value": value,
        "unit": detail.get("unit"),
        "sf": detail.get("sf"),
        "band_sec": band,
        "band_met": value <= band,
        "queries": detail.get("queries"),
        "run1_warm": bool(detail.get("run1_warm")),
        "q10_returned_items_sec": q10,
        # ADVICE r18 #3: identity check, not truthiness — a measured
        # ~0.0 s q10 must report as 0.0x, never conflate with "absent"
        "q10_vs_r01": (round(q10 / Q10_R01_SEC, 3)
                       if q10 is not None else None),
        "section_worst_ratios": {s: gates[s]["worst_ratio"] for s in required},
        "section_picked_attempts": {
            s: gates[s]["picked_attempt"] for s in required},
        "section_steal_pct": {
            s: gates[s].get("steal_pct") for s in required},
        "section_mem_gbps": mem_by_section,
        # ADVICE r19 #1: intermediate-bus annotation — readings in
        # [gate floor, 31) GB/s passed the vote but sit below the
        # quiet-window cluster; a band-miss on such a stamp reads as
        # bus contention first, regression second
        "mem_warn_band_gbps": MEM_WARN_BAND_GBPS,
        "section_mem_warn": {
            s: (m is not None and m < MEM_WARN_BAND_GBPS)
            for s, m in mem_by_section.items()
        },
        "suite_steal_pct": suite_steal,
    }
    # written next to the source record: repo root in real use (the
    # default src is HERE/BENCH_DETAIL.json), a tmp dir under test
    out = os.path.join(os.path.dirname(os.path.abspath(src)), "BENCH_BAND.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"band_record: stamped {out} — headline {value}s "
          f"(band <={band}: {'MET' if record['band_met'] else 'MISSED'}), "
          f"q10 {q10}s = {record['q10_vs_r01']}x r01, "
          f"worst gate ratios {record['section_worst_ratios']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
