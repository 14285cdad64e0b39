"""Driver-row staleness report: for every registry query, the most
recent CORRECTNESS_r*.json round it appeared in and the status it got —
the input to each round's gate-window rotation (the driver checks only
the FIRST 50 registry entries, so staleness must be managed
deliberately; VERDICT r8 directive #4).

Usage: python tools/window_staleness.py [--propose]
Prints queries sorted stalest-first with their oracle/rows-only kind,
then a per-round histogram and the current window's composition.

--propose additionally emits a ready-to-paste ``_PRIORITY`` tuple for
the NEXT rotation: the 5 standing canaries first, then one in-window
canary per SURVEY-§2 family, then the stalest remaining rows until the
window is full. Run it AFTER the driver writes the round's CORRECTNESS
file so the history includes the freshest gate rows; the output is a
starting point — the verdict's round-specific directives (new oracles
needing a first hash row, watch-item movers) still get hand-placed.

DEPOSIT-INVARIANT family coverage (VERDICT r16 directive #1): three
consecutive rounds (r13, r15, r16) went judge-time red on the same
structural trap — any guard of the form "family covered by (_PRIORITY
UNION recent driver rows)" dies when the driver deposits the next
CORRECTNESS file post-wrap, because after the deposit the newest
round's rows ARE the window, so the union collapses to _PRIORITY
alone.  The only deposit-proof shape is coverage from _PRIORITY with
NO union: every family keeps one member IN the window every round.
The proposer therefore builds a greedy hitting set over the family
sets (coverage-first, stalest-member tie-break — queries spanning
several families free slots; stale members double as staleness
refresh), then fills the remaining slots stalest-first.  Measured on
the r17 registry: 30 hitting-set slots cover all 34 families, leaving
20 rotation slots — the 42-query r12/r13 backlog clears in ~2 rounds.
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


_CANARIES = (
    "q1_pricing_summary", "cdc_pgoutput_roundtrip",
    "cdc_apply_to_snapshot", "cdc_replica_state", "dedup_exact",
)


def propose_window(
    rows: list[tuple[int, str, str, str]],
    families: dict[str, set[str]],
    size: int,
    canaries: tuple[str, ...] = _CANARIES,
) -> tuple[list[str], list[str]]:
    """Deposit-invariant window draft (VERDICT r16 directive #1).

    ``rows`` is (last_round, name, status, kind) sorted stalest-first.
    Every family gets a member IN the proposal itself — coverage never
    references past CORRECTNESS files, so the strict guard
    (tests/test_registry_window.py) survives any driver deposit by
    construction: the deposit can only ever ADD rows for names already
    in the window.

    Build: greedy hitting set seeded with the standing ``canaries`` —
    among members of still-uncovered families, repeatedly take the one
    covering the most uncovered families (stalest-member tie-break, so
    family canaries rotate within their family and refresh staleness);
    then fill the remaining slots with the stalest non-picked rows.
    Returns (proposal, family_picks); raises SystemExit if the hitting
    set alone overflows the window (34 families into 50 slots cannot
    overflow today — the check is a loud backstop for family growth).
    """
    rank = {name: i for i, (_rnd, name, *_rest) in enumerate(rows)}

    def fams_of(q: str) -> set[str]:
        return {f for f, names in families.items() if q in names}

    picked = list(canaries)
    covered = {f for f, names in families.items() if names & set(picked)}
    family_picks: list[str] = []
    while len(covered) < len(families):
        cands = set().union(
            *[names for f, names in families.items() if f not in covered])
        if not cands:
            # ADVICE r17 low: a family declared with an EMPTY member set
            # would otherwise surface as min()'s bare ValueError; name
            # the uncoverable families in the loud backstop instead.
            empty = sorted(f for f in families if f not in covered)
            raise SystemExit(
                f"--propose BUG: families with no registered members "
                f"cannot be covered: {empty}")
        best = min(cands, key=lambda q: (-len(fams_of(q) - covered),
                                         rank.get(q, len(rank)), q))
        picked.append(best)
        family_picks.append(best)
        covered |= fams_of(best)
    if len(picked) > size:
        # ADVICE r14 #4: fail HERE, not at the paste-time _PRIORITY
        # length assert — a silent over-budget proposal is worse than
        # a loud tool error naming the overflow.
        raise SystemExit(
            f"--propose BUG: {len(picked)} hitting-set slots exceed the "
            f"window size {size}; raise the window size or merge "
            f"families: {family_picks}")
    for _rnd, name, _status, _kind in rows:
        if len(picked) >= size:
            break
        if name not in picked:
            picked.append(name)
    proposal = (list(canaries)
                + sorted(picked[len(canaries):],
                         key=lambda n: rank.get(n, len(rank))))
    uncovered = [fam for fam, names in families.items()
                 if not (names & set(proposal))]
    if uncovered:
        raise SystemExit(
            f"--propose BUG: draft leaves families uncovered by the "
            f"window alone: {uncovered}")
    return proposal, family_picks


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
        # Deposit-invariant (r17): every family covered by the proposal
        # ITSELF — no union with any CORRECTNESS round — so the strict
        # guard cannot go red when the driver deposits post-wrap (the
        # structural judge-time red of r13, r15, and r16).
        proposal, family_picks = propose_window(
            rows, family_canaries(), len(window))
        print("\n# --propose: paste-ready _PRIORITY draft (standing "
              "canaries + family hitting set + stalest queue)")
        if family_picks:
            print("# family hitting-set picks (coverage from the window "
                  "alone): " + ", ".join(family_picks))
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
