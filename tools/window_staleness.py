"""Driver-row staleness report: for every registry query, the most
recent CORRECTNESS_r*.json round it appeared in and the status it got —
the input to each round's gate-window rotation (the driver checks only
the FIRST 50 registry entries, so staleness must be managed
deliberately; VERDICT r8 directive #4).

Usage: python tools/window_staleness.py [--propose]
Prints queries sorted stalest-first with their oracle/rows-only kind,
then a per-round histogram and the current window's composition.

--propose additionally emits a ready-to-paste ``_PRIORITY`` tuple for
the NEXT rotation: the 5 standing canaries first, then the stalest
non-canary rows in (round, name) order until the window is full. Run it
AFTER the driver writes the round's CORRECTNESS file so the history
includes the freshest gate rows; the output is a starting point — the
verdict's round-specific directives (new oracles needing a first hash
row, watch-item movers) still get hand-placed.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def history() -> dict[str, list[tuple[int, str]]]:
    """name -> [(round, status)] across all recorded gate files."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hist: dict[str, list[tuple[int, str]]] = {}
    for p in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
        for name, rec in json.load(open(p)).items():
            if rec.get("hash_match"):
                status = "green"
            elif rec.get("err") == "no_oracle":
                status = "rows"
            else:
                status = "red"
            hist.setdefault(name, []).append((rnd, status))
    return hist


def main() -> int:
    from clockpipe_spark.queries import _PRIORITY, all_oracles, all_queries

    qs, oracles = all_queries(), all_oracles()
    hist = history()
    rows = []
    for name in qs:
        h = hist.get(name, [])
        rnd, status = h[-1] if h else (0, "never")
        rows.append((rnd, name, status, "oracle" if name in oracles else "rows-only"))
    rows.sort()

    window = set(_PRIORITY)
    for rnd, name, status, kind in rows:
        mark = "*" if name in window else " "
        print(f"{mark} r{rnd:<2} {status:<6} {kind:<9} {name}")

    counts: dict[int, int] = {}
    for rnd, *_ in rows:
        counts[rnd] = counts.get(rnd, 0) + 1
    print("\nby last-checked round:",
          " ".join(f"r{k}:{v}" for k, v in sorted(counts.items())))
    out_stale = [r for r in rows if r[1] not in window][:10]
    print(f"window size: {len(window)}  registry: {len(rows)}")
    print("stalest OUTSIDE the window (rotate these next):")
    for rnd, name, status, kind in out_stale:
        print(f"  r{rnd} {status} {kind} {name}")

    if "--propose" in sys.argv:
        canaries = [
            "q1_pricing_summary", "cdc_pgoutput_roundtrip",
            "cdc_apply_to_snapshot", "cdc_replica_state", "dedup_exact",
        ]
        budget = len(window) - len(canaries)
        queue = [r for r in rows if r[1] not in canaries][:budget]
        print("\n# --propose: paste-ready _PRIORITY draft "
              "(canaries + stalest queue)")
        print("_PRIORITY = (")
        for n in canaries:
            print(f'    "{n}",')
        cur = None
        for rnd, name, status, kind in queue:
            if rnd != cur:
                print(f"    # ---- last driver row r{rnd} ----")
                cur = rnd
            print(f'    "{name}",')
        print(")")
    return 0


if __name__ == "__main__":
    sys.exit(main())
