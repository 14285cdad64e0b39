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

The proposal is FAMILY-AWARE (VERDICT r13 directive #1): once the
proposed window becomes the newest CORRECTNESS file, the rolling guard
(tests/test_registry_window.py) checks coverage over (window UNION the
previous 2 rounds' rows).  The r13 proposal — a pure stalest-first
queue — mechanically orphaned the 'recursive surface' and 'data
layout' families and flipped that guard red at judge time.  Now the
proposer force-includes the stalest member of every family that has no
row in the last 2 rounds, and refuses to emit any proposal that would
leave a family uncovered.
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


def family_canaries() -> dict[str, set[str]]:
    """The SURVEY-§2 family sets live next to the guard test that
    enforces them; load them from there so tool and test can't drift."""
    import importlib.util

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "_registry_window_guard",
        os.path.join(here, "tests", "test_registry_window.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod._FAMILY_CANARIES


def last_n_round_rows(hist: dict[str, list[tuple[int, str]]], n: int) -> set[str]:
    """Names with a driver row in the newest *n* recorded rounds."""
    rounds = sorted({rnd for h in hist.values() for rnd, _ in h})[-n:]
    keep = set(rounds)
    return {name for name, h in hist.items() if any(r in keep for r, _ in h)}


_CANARIES = (
    "q1_pricing_summary", "cdc_pgoutput_roundtrip",
    "cdc_apply_to_snapshot", "cdc_replica_state", "dedup_exact",
)


def propose_window(
    rows: list[tuple[int, str, str, str]],
    recent2: set[str],
    families: dict[str, set[str]],
    size: int,
    canaries: tuple[str, ...] = _CANARIES,
) -> tuple[list[str], list[str]]:
    """Family-aware window draft (VERDICT r13 directive #1).

    ``rows`` is (last_round, name, status, kind) sorted stalest-first;
    ``recent2`` is the set of names whose driver rows remain visible to
    the strict 2-round guard AFTER the proposal lands as the newest
    CORRECTNESS file — i.e. the NEWEST round only (the caller passes
    last_n_round_rows(hist, 1); r16 lesson — forcing against the newest
    TWO rounds let families riding the older one orphan on deposit, the
    judge-time red of both r13 and r15).  Any family with no member in
    ``recent2`` gets its stalest member force-included.  Returns (proposal, forced); raises SystemExit if a
    family would still be uncovered (families larger than the window
    can't happen in practice — the check is a loud backstop).
    """
    rank = {name: i for i, (_rnd, name, *_rest) in enumerate(rows)}
    forced: list[str] = []
    for _fam, names in sorted(families.items()):
        if names & (recent2 | set(canaries)):
            continue
        stalest = min(names, key=lambda n: rank.get(n, len(rank)))
        if stalest not in forced:
            forced.append(stalest)
    budget = size - len(canaries)
    if len(forced) > budget:
        # ADVICE r14 #4: fail HERE, not at the paste-time _PRIORITY
        # length assert — a silent over-budget proposal is worse than
        # a loud tool error naming the overflow.
        raise SystemExit(
            f"--propose BUG: {len(forced)} forced family includes "
            f"exceed the window budget {budget} (size {size} - "
            f"{len(canaries)} canaries); raise the window size or "
            f"trim families: {forced}")
    picked = list(forced)
    for _rnd, name, _status, _kind in rows:
        if len(picked) >= budget:
            break
        if name not in canaries and name not in picked:
            picked.append(name)
    proposal = list(canaries) + sorted(picked, key=lambda n: rank.get(n, len(rank)))
    uncovered = [fam for fam, names in families.items()
                 if not (names & (set(proposal) | recent2))]
    if uncovered:
        raise SystemExit(
            f"--propose BUG: draft leaves families uncovered even "
            f"after force-include: {uncovered}")
    return proposal, forced


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
        # Newest-1, not newest-2 (r16): once the proposal becomes the
        # newest CORRECTNESS file, the strict guard sees (proposal UNION
        # the round that was newest at proposal time) — coverage against
        # two prior rounds let families riding the OLDER one orphan on
        # deposit, the exact judge-time red of r13 and r15.
        proposal, forced = propose_window(
            rows, last_n_round_rows(hist, 1), family_canaries(), len(window))
        print("\n# --propose: paste-ready _PRIORITY draft (canaries + "
              "family force-includes + stalest queue)")
        if forced:
            print("# family force-includes (no row in the newest round): "
                  + ", ".join(forced))
        print("_PRIORITY = (")
        for n in _CANARIES:
            print(f'    "{n}",')
        cur = None
        for name in proposal[len(_CANARIES):]:
            rnd = next(r for r, n, *_ in rows if n == name)
            if rnd != cur:
                print(f"    # ---- last driver row r{rnd} ----")
                cur = rnd
            print(f'    "{name}",')
        print(")")
    return 0


if __name__ == "__main__":
    sys.exit(main())
