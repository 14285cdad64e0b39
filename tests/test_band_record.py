"""tools/band_record.py is the only writer of BENCH_BAND.json — the
record the <=31 s headline band is judged against (PLANS.md "the
headline band, decided once").  These tests pin its refusal contract:
a record with any section stamped ``section_loaded: true`` (or with no
gates at all) must NEVER become band evidence, while a qualifying run
is stamped with band_met / q10_vs_r01 RECORDED, not gated."""

import json
import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import band_record


def _gate(loaded=False, worst=1.0, picked=0):
    return {
        "section_loaded": loaded,
        "worst_ratio": worst,
        "threshold_ratio": 1.3,
        "picked_attempt": picked,
    }


def _detail(value=30.5, q10=0.62, **gate_overrides):
    gates = {s: _gate() for s in ("headline", "iso", "live_pg", "ingest")}
    for s, g in gate_overrides.items():
        gates[s] = g
    return {
        "metric": "headline_total",
        "value": value,
        "unit": "sec",
        "sf": 0.1,
        "queries": {"q10_returned_items": q10},
        "run1_warm": False,
        "section_gates": gates,
    }


def _write(tmp_path, detail):
    src = tmp_path / "BENCH_DETAIL.json"
    src.write_text(json.dumps(detail))
    return str(src)


def test_qualifying_run_is_stamped_with_band_and_q10_recorded(tmp_path):
    src = _write(tmp_path, _detail(value=30.5, q10=0.62))
    assert band_record.main([src]) == 0
    rec = json.loads((tmp_path / "BENCH_BAND.json").read_text())
    assert rec["band_met"] is True and rec["band_sec"] == 31.0
    assert rec["q10_vs_r01"] == round(0.62 / band_record.Q10_R01_SEC, 3)
    assert rec["stamped_from"] == "BENCH_DETAIL.json"
    assert set(rec["section_worst_ratios"]) == {
        "headline", "iso", "live_pg", "ingest"}


def test_band_miss_on_a_quiet_run_is_recorded_not_suppressed(tmp_path):
    # a fully-gated quiet run that misses the band is a REAL regression:
    # the tool must stamp it (visible) rather than refuse it (hidden)
    src = _write(tmp_path, _detail(value=33.0, q10=1.3))
    assert band_record.main([src]) == 0
    rec = json.loads((tmp_path / "BENCH_BAND.json").read_text())
    assert rec["band_met"] is False
    assert rec["q10_vs_r01"] > 2.0  # recorded, judged elsewhere


def test_loaded_section_refused(tmp_path):
    src = _write(tmp_path, _detail(
        live_pg=_gate(loaded=True, worst=1.6, picked=2)))
    assert band_record.main([src]) == 2
    assert not (tmp_path / "BENCH_BAND.json").exists()


def test_pre_gate_era_record_refused(tmp_path):
    detail = _detail()
    del detail["section_gates"]["ingest"]
    src = _write(tmp_path, detail)
    assert band_record.main([src]) == 2
    assert not (tmp_path / "BENCH_BAND.json").exists()


def test_gate_invariant_breach_refused(tmp_path):
    # section_loaded false but the picked ratio over threshold — a
    # broken gate must not silently become band evidence
    src = _write(tmp_path, _detail(
        headline=_gate(loaded=False, worst=1.5)))
    assert band_record.main([src]) == 2


def test_high_suite_steal_with_certified_sections_is_stamped(tmp_path):
    # contention during the post-headline scale stories cannot touch
    # the headline sum — a run whose four sections each found a quiet
    # window qualifies even when the suite-wide number is high (the
    # r18 29.87 s record: headline steal 2.33%, suite 7.46%). The
    # suite number rides along as annotation.
    detail = _detail(value=29.9)
    detail["suite_steal_pct"] = 7.46
    detail["section_gates"]["headline"]["steal_pct"] = 2.33
    src = _write(tmp_path, detail)
    assert band_record.main([src]) == 0
    rec = json.loads((tmp_path / "BENCH_BAND.json").read_text())
    assert rec["suite_steal_pct"] == 7.46 and rec["band_met"] is True


def test_headline_steal_gate_invariant_breach_refused(tmp_path):
    # loaded=false yet the picked headline attempt's steal over budget
    # means the gate itself is broken — never band evidence
    detail = _detail(value=30.5)
    detail["section_gates"]["headline"]["steal_pct"] = 9.0
    src = _write(tmp_path, detail)
    assert band_record.main([src]) == 2
    assert not (tmp_path / "BENCH_BAND.json").exists()


def test_suite_steal_recorded_when_quiet(tmp_path):
    detail = _detail(value=30.5)
    detail["suite_steal_pct"] = 1.3
    src = _write(tmp_path, detail)
    assert band_record.main([src]) == 0
    rec = json.loads((tmp_path / "BENCH_BAND.json").read_text())
    assert rec["suite_steal_pct"] == 1.3


def test_pre_steal_record_passes_on_canary_gates_alone(tmp_path):
    # records written before the steal instrument carry no field —
    # they qualify on the canary gates (the _detail fixture has none)
    src = _write(tmp_path, _detail(value=30.5))
    assert band_record.main([src]) == 0
    rec = json.loads((tmp_path / "BENCH_BAND.json").read_text())
    assert rec["suite_steal_pct"] is None


def test_band_override_flag(tmp_path):
    src = _write(tmp_path, _detail(value=33.0))
    assert band_record.main([src, "--band", "34.5"]) == 0
    rec = json.loads((tmp_path / "BENCH_BAND.json").read_text())
    assert rec["band_sec"] == 34.5 and rec["band_met"] is True


def test_headline_mem_gate_invariant_breach_refused(tmp_path):
    # r19 mem vote: loaded=false yet the picked headline attempt's
    # bandwidth under the gate's own recorded floor — broken gate,
    # never band evidence
    detail = _detail(value=30.5)
    detail["section_gates"]["headline"]["mem_gbps"] = 17.3
    detail["section_gates"]["headline"]["mem_min_gbps"] = 24.0
    src = _write(tmp_path, detail)
    assert band_record.main([src]) == 2
    assert not (tmp_path / "BENCH_BAND.json").exists()


def test_pre_vote_mem_attribution_does_not_refuse(tmp_path):
    # r18-era records carried mem_gbps as record-only attribution
    # INSIDE the picked attempt's canary_pre/canary_post probe dicts
    # (the real shape bench.py wrote that round — e.g. the r18 deposit
    # headline: canary_pre {'scan':0.239,'cpu':0.514,'mem_gbps':17.3})
    # with no gate-level floor. A warm reading there is disclosure, not
    # a broken gate; the record still qualifies on its voting gates and
    # the attribution is stamped from the probe dicts (post preferred).
    detail = _detail(value=30.5)
    hg = detail["section_gates"]["headline"]
    hg["canary_pre"] = {"scan": 0.239, "cpu": 0.514, "mem_gbps": 17.3}
    hg["canary_post"] = {"scan": 0.244, "cpu": 0.520, "mem_gbps": 21.9}
    src = _write(tmp_path, detail)
    assert band_record.main([src]) == 0
    rec = json.loads((tmp_path / "BENCH_BAND.json").read_text())
    assert rec["section_mem_gbps"]["headline"] == 21.9


def test_pre_probe_era_record_stamps_null_mem(tmp_path):
    # records older than the mem instrument entirely: no reading
    # anywhere -> null attribution, never a KeyError or a refusal
    src = _write(tmp_path, _detail(value=30.5))
    assert band_record.main([src]) == 0
    rec = json.loads((tmp_path / "BENCH_BAND.json").read_text())
    assert rec["section_mem_gbps"]["headline"] is None


def test_quiet_mem_voting_record_is_stamped_with_mem_recorded(tmp_path):
    detail = _detail(value=29.9)
    for s in ("headline", "iso", "live_pg", "ingest"):
        detail["section_gates"][s]["mem_gbps"] = 37.2
        detail["section_gates"][s]["mem_min_gbps"] = 24.0
    src = _write(tmp_path, detail)
    assert band_record.main([src]) == 0
    rec = json.loads((tmp_path / "BENCH_BAND.json").read_text())
    assert rec["section_mem_gbps"] == {
        s: 37.2 for s in ("headline", "iso", "live_pg", "ingest")}


def test_steal_threshold_read_from_gate_record_not_a_local_copy(tmp_path):
    # ADVICE r18 #2: a record gated with a LOOSER bench budget (e.g.
    # 10%) must be judged against that budget, not a hand-copied 5 —
    # the tool reads steal_max_pct from the gate like threshold_ratio
    detail = _detail(value=30.5)
    detail["section_gates"]["headline"]["steal_pct"] = 9.0
    detail["section_gates"]["headline"]["steal_max_pct"] = 10.0
    src = _write(tmp_path, detail)
    assert band_record.main([src]) == 0


def test_q10_zero_reading_reports_zero_ratio_not_missing(tmp_path):
    # ADVICE r18 #3: 0.0 is a measurement, None is an absence
    src = _write(tmp_path, _detail(value=30.5, q10=0.0))
    assert band_record.main([src]) == 0
    rec = json.loads((tmp_path / "BENCH_BAND.json").read_text())
    assert rec["q10_vs_r01"] == 0.0 and rec["q10_returned_items_sec"] == 0.0


def test_q10_absent_reports_none(tmp_path):
    detail = _detail(value=30.5)
    detail["queries"] = {}
    src = _write(tmp_path, detail)
    assert band_record.main([src]) == 0
    rec = json.loads((tmp_path / "BENCH_BAND.json").read_text())
    assert rec["q10_vs_r01"] is None and rec["q10_returned_items_sec"] is None


def test_mem_warn_band_annotates_intermediate_bus_stamp(tmp_path):
    # ADVICE r19 #1: a picked reading in [floor, 31) GB/s qualifies but
    # is visibly flagged so a band-miss attributes to bus contention
    g = _gate()
    g["mem_gbps"] = 25.6
    g["mem_min_gbps"] = 24.0
    src = _write(tmp_path, _detail(headline=g))
    assert band_record.main([src]) == 0
    rec = json.loads((tmp_path / "BENCH_BAND.json").read_text())
    assert rec["mem_warn_band_gbps"] == band_record.MEM_WARN_BAND_GBPS
    assert rec["section_mem_warn"]["headline"] is True
    assert rec["section_mem_warn"]["iso"] is False  # no reading -> no flag


def test_quiet_bus_stamp_carries_no_mem_warn(tmp_path):
    g = _gate()
    g["mem_gbps"] = 37.8
    g["mem_min_gbps"] = 24.0
    src = _write(tmp_path, _detail(headline=g))
    assert band_record.main([src]) == 0
    rec = json.loads((tmp_path / "BENCH_BAND.json").read_text())
    assert rec["section_mem_warn"]["headline"] is False


def test_loosened_budget_record_warns_at_stamp_time(tmp_path, capsys):
    # ADVICE r19 #2: a record whose self-declared budgets drift from the
    # live bench constants must not SILENTLY self-certify — the stamp
    # still succeeds (re-stamping old records after a documented budget
    # change stays possible) but the drift is printed
    g = _gate()
    g["steal_pct"] = 4.0
    g["steal_max_pct"] = 50.0  # loosened vs bench.SECTION_STEAL_MAX_PCT
    g["mem_gbps"] = 37.0
    g["mem_min_gbps"] = 1.0  # loosened vs bench.MEM_CANARY_MIN_GBPS
    src = _write(tmp_path, _detail(headline=g))
    assert band_record.main([src]) == 0
    err = capsys.readouterr().err
    assert "WARNING" in err and "steal budget" in err and "mem floor" in err


def test_matching_budgets_stamp_without_warning(tmp_path, capsys):
    import bench

    g = _gate()
    g["steal_pct"] = 4.0
    g["steal_max_pct"] = bench.SECTION_STEAL_MAX_PCT
    g["mem_gbps"] = 37.0
    g["mem_min_gbps"] = bench.MEM_CANARY_MIN_GBPS
    src = _write(tmp_path, _detail(headline=g))
    assert band_record.main([src]) == 0
    assert "WARNING" not in capsys.readouterr().err
