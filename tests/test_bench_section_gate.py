"""Unit tests for bench.py's per-section canary gate (gated_section_run).

VERDICT r17 directive #5: the "2 re-runs exhausted -> section_loaded:
true stamped" branch had never fired on a real record (every committed
run found a quiet window within the budget), so the discount-flag path
was shipping untested.  These tests drive the extracted module-level
helper with injected probes and a no-op sleep:

* all attempts hot -> the budget is exhausted, section_loaded lands
  True, and the record keeps the QUIETEST attempt (not the last);
* a later quiet attempt -> early exit, section_loaded False;
* quiet attempt 0 -> exactly one attempt, no sleep.

Consumer contract (PLANS.md "the headline band, decided once"): a bar
reading whose gate carries section_loaded: true is a disclosed-warm
drift sample — it cannot satisfy a band/bar by itself, and
tools/band_record.py refuses to stamp such a record as the round's
band evidence.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import gated_section_run

_SCAN_REF = 0.52
_CPU_REF = 0.55


def _mk_probe(readings):
    """Probe returning successive {scan, cpu} dicts from a list of
    (scan_ratio, cpu_ratio) tuples expressed vs the quiet references."""
    it = iter(readings)

    def probe():
        scan_r, cpu_r = next(it)
        return {"scan": round(_SCAN_REF * scan_r, 4),
                "cpu": round(_CPU_REF * cpu_r, 4)}

    return probe


def _run(result_seq):
    it = iter(result_seq)
    calls = []

    def run():
        r = next(it)
        calls.append(r)
        return r

    return run, calls


def test_exhausted_reruns_stamp_section_loaded():
    # 3 attempts (max_reruns=2), every envelope hot; quietest is the
    # middle one (worst 1.5) — it must be picked AND flagged loaded.
    probe = _mk_probe([
        (2.0, 1.0), (1.0, 1.9),   # attempt 0: worst 2.0
        (1.5, 1.0), (1.2, 1.0),   # attempt 1: worst 1.5  <- quietest
        (1.8, 1.0), (1.0, 1.7),   # attempt 2: worst 1.8
    ])
    run, calls = _run(["r0", "r1", "r2"])
    slept = []
    result, gate = gated_section_run(
        "unit", run, probe, scan_ref=_SCAN_REF, cpu_ref=_CPU_REF,
        threshold=1.3, max_reruns=2, wait_sec=45, sleep=slept.append,
        steal_reader=lambda: None)
    assert len(calls) == 3, "budget is max_reruns+1 attempts"
    assert slept == [45, 45], "sleeps between attempts only, not after the last"
    assert gate["section_loaded"] is True
    assert gate["picked_attempt"] == 1 and result == "r1"
    assert [a["hot"] for a in gate["attempts"]] == [True, True, True]
    assert gate["worst_ratio"] == 1.5
    # the flag's consumer needs the full re-run trail on the record
    assert len(gate["attempts"]) == 3


def test_quiet_rerun_clears_the_flag():
    probe = _mk_probe([
        (1.6, 1.0), (1.0, 1.4),   # attempt 0: hot (1.6)
        (1.0, 1.0), (1.1, 1.0),   # attempt 1: quiet (1.1)
    ])
    run, calls = _run(["hot", "quiet"])
    result, gate = gated_section_run(
        "unit", run, probe, scan_ref=_SCAN_REF, cpu_ref=_CPU_REF,
        threshold=1.3, max_reruns=2, wait_sec=45, sleep=lambda _s: None,
        steal_reader=lambda: None)
    assert len(calls) == 2, "early exit on the first quiet envelope"
    assert gate["section_loaded"] is False
    assert gate["picked_attempt"] == 1 and result == "quiet"
    assert [a["hot"] for a in gate["attempts"]] == [True, False]


def test_quiet_first_attempt_runs_once_and_never_sleeps():
    probe = _mk_probe([(1.0, 1.0), (1.0, 1.0)])
    run, calls = _run(["only"])
    slept = []
    result, gate = gated_section_run(
        "unit", run, probe, scan_ref=_SCAN_REF, cpu_ref=_CPU_REF,
        threshold=1.3, max_reruns=2, wait_sec=45, sleep=slept.append,
        steal_reader=lambda: None)
    assert len(calls) == 1 and result == "only"
    assert slept == []
    assert gate["section_loaded"] is False and gate["picked_attempt"] == 0


def _mk_steal(pcts):
    """Steal reader: per attempt, (pre, post) tick pairs producing the
    given steal percentages over 1000 busy ticks."""
    seq = []
    base = 0
    for p in pcts:
        stolen = int(10 * p)  # p% of 1000 busy ticks
        seq.append((base, base * 10))
        seq.append((base + stolen, base * 10 + 1000))
        base += stolen + 7
    it = iter(seq)
    return lambda: next(it)


def test_steal_votes_hot_even_when_canaries_are_quiet():
    # the r18 blind spot: every scan/cpu canary quiet while kernel
    # accounting shows the section ran under heavy hypervisor steal —
    # the steal vote must force the re-run and, exhausted, the flag
    probe = _mk_probe([(1.0, 1.0)] * 6)  # all canaries quiet
    run, calls = _run(["s0", "s1", "s2"])
    result, gate = gated_section_run(
        "unit", run, probe, scan_ref=_SCAN_REF, cpu_ref=_CPU_REF,
        threshold=1.3, max_reruns=2, wait_sec=45, sleep=lambda _s: None,
        steal_reader=_mk_steal([19.9, 14.0, 16.5]), steal_max_pct=5.0)
    assert len(calls) == 3
    assert gate["section_loaded"] is True
    assert gate["picked_attempt"] == 1 and result == "s1"  # least-stolen
    assert gate["steal_pct"] == 14.0
    assert [a["steal_pct"] for a in gate["attempts"]] == [19.9, 14.0, 16.5]


def test_low_steal_and_quiet_canaries_pass_first_attempt():
    probe = _mk_probe([(1.0, 1.0)] * 2)
    run, calls = _run(["ok"])
    result, gate = gated_section_run(
        "unit", run, probe, scan_ref=_SCAN_REF, cpu_ref=_CPU_REF,
        threshold=1.3, max_reruns=2, wait_sec=45, sleep=lambda _s: None,
        steal_reader=_mk_steal([1.2]), steal_max_pct=5.0)
    assert len(calls) == 1 and gate["section_loaded"] is False
    assert gate["steal_pct"] == 1.2


def test_steal_breaks_canary_tie_when_picking():
    # canaries identical-hot on both attempts; the steal numbers must
    # decide which attempt's result is stamped
    probe = _mk_probe([(1.5, 1.0)] * 6)
    run, calls = _run(["a0", "a1", "a2"])
    result, gate = gated_section_run(
        "unit", run, probe, scan_ref=_SCAN_REF, cpu_ref=_CPU_REF,
        threshold=1.3, max_reruns=2, wait_sec=45, sleep=lambda _s: None,
        steal_reader=_mk_steal([18.0, 3.0, 12.0]), steal_max_pct=5.0)
    # attempt 1: canary ratio 1.5/1.3 = 1.154 badness vs steal 3/5 = 0.6
    # -> badness 1.154, still hot on canaries, but the LEAST bad
    assert gate["picked_attempt"] == 1 and result == "a1"
    assert gate["section_loaded"] is True


def _mk_mem(gbps_seq):
    """Mem probe: one post-section bandwidth reading per attempt."""
    it = iter(gbps_seq)
    return lambda: next(it)


def test_mem_vote_hot_even_when_canaries_and_steal_quiet():
    # the r18 deposit's blind spot (VERDICT r18 directive #1): steal
    # 0.75%, worst canary 1.009 — "fully gated" — yet the headline ran
    # on a 17.3/21.9 GB/s memory-bus-contended window and missed the
    # band by 6.6%. The mem vote must force the re-run and, exhausted,
    # the section_loaded flag; the quietest (highest-bandwidth) attempt
    # is the one stamped.
    probe = _mk_probe([(1.0, 1.0)] * 6)          # canaries quiet
    run, calls = _run(["m0", "m1", "m2"])
    result, gate = gated_section_run(
        "unit", run, probe, scan_ref=_SCAN_REF, cpu_ref=_CPU_REF,
        threshold=1.3, max_reruns=2, wait_sec=45, sleep=lambda _s: None,
        steal_reader=_mk_steal([0.8, 0.7, 0.9]), steal_max_pct=5.0,
        mem_probe=_mk_mem([17.3, 21.9, 16.2]), mem_min_gbps=24.0)
    assert len(calls) == 3
    assert gate["section_loaded"] is True
    assert gate["picked_attempt"] == 1 and result == "m1"  # least-contended
    assert gate["mem_gbps"] == 21.9 and gate["mem_min_gbps"] == 24.0
    assert [a["mem_gbps"] for a in gate["attempts"]] == [17.3, 21.9, 16.2]
    assert [a["hot"] for a in gate["attempts"]] == [True, True, True]


def test_mem_recovery_on_rerun_clears_the_flag():
    probe = _mk_probe([(1.0, 1.0)] * 4)
    run, calls = _run(["warm", "quiet"])
    result, gate = gated_section_run(
        "unit", run, probe, scan_ref=_SCAN_REF, cpu_ref=_CPU_REF,
        threshold=1.3, max_reruns=2, wait_sec=45, sleep=lambda _s: None,
        steal_reader=_mk_steal([0.5, 0.4]), steal_max_pct=5.0,
        mem_probe=_mk_mem([12.4, 38.2]), mem_min_gbps=24.0)
    assert len(calls) == 2
    assert gate["section_loaded"] is False
    assert gate["picked_attempt"] == 1 and result == "quiet"
    assert [a["hot"] for a in gate["attempts"]] == [True, False]
    assert gate["mem_gbps"] == 38.2


def test_quiet_mem_passes_first_attempt():
    probe = _mk_probe([(1.0, 1.0)] * 2)
    run, calls = _run(["ok"])
    result, gate = gated_section_run(
        "unit", run, probe, scan_ref=_SCAN_REF, cpu_ref=_CPU_REF,
        threshold=1.3, max_reruns=2, wait_sec=45, sleep=lambda _s: None,
        steal_reader=_mk_steal([0.5]), steal_max_pct=5.0,
        mem_probe=_mk_mem([33.5]), mem_min_gbps=24.0)
    assert len(calls) == 1 and gate["section_loaded"] is False
    assert gate["mem_gbps"] == 33.5


def test_no_mem_probe_keeps_legacy_record_shape():
    # unit probes without a mem reading (and any pre-r19 caller) must
    # see no mem vote and explicit nulls on the record, never a KeyError
    probe = _mk_probe([(1.0, 1.0)] * 2)
    run, _calls = _run(["legacy"])
    _result, gate = gated_section_run(
        "unit", run, probe, scan_ref=_SCAN_REF, cpu_ref=_CPU_REF,
        threshold=1.3, max_reruns=2, wait_sec=45, sleep=lambda _s: None,
        steal_reader=lambda: None)
    assert gate["section_loaded"] is False
    assert gate["mem_gbps"] is None and gate["mem_min_gbps"] is None
    assert gate["attempts"][0]["mem_gbps"] is None
