"""Unit tests for the shuffle-audit cross-round contract
(tools/shuffle_audit.contract_diff) — the gate that fails a wrap on a
shuffle-write jump and warns on shuffle-neutral wall regressions.
Spark-free: a silent bug here would disable enforcement without any
symptom, so the thresholds and exemption path are pinned directly.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from tools.shuffle_audit import contract_diff  # noqa: E402


def _row(shw: float, wall: float) -> dict:
    return {"shuffle_write_mb": shw, "wall_sec": wall}


def test_byte_growth_above_both_thresholds_flags():
    base = {"q": _row(2.0, 1.0)}
    new = {"q": _row(4.0, 1.0)}  # 2x and +2 MB
    regs, walls = contract_diff(new, base, set())
    assert len(regs) == 1 and "q" in regs[0]
    assert walls == []


def test_byte_growth_needs_absolute_floor():
    # 10x growth but only +0.45 MB — KB-scale noise must not flag
    base = {"q": _row(0.05, 1.0)}
    new = {"q": _row(0.5, 1.0)}
    regs, _ = contract_diff(new, base, set())
    assert regs == []


def test_byte_growth_needs_ratio():
    # +5 MB but only 1.25x — under the 1.5x ratio gate
    base = {"q": _row(20.0, 1.0)}
    new = {"q": _row(25.0, 1.0)}
    regs, _ = contract_diff(new, base, set())
    assert regs == []


def test_allow_exempts_byte_and_wall():
    base = {"q": _row(2.0, 1.0)}
    new = {"q": _row(40.0, 9.0)}
    regs, walls = contract_diff(new, base, {"q"})
    assert regs == [] and walls == []


def test_wall_regression_warns_not_fails():
    # the r15 lesson case: identical shuffle, doubled wall
    base = {"q": _row(5.21, 1.42)}
    new = {"q": _row(5.21, 3.1)}
    regs, walls = contract_diff(new, base, set())
    assert regs == []
    assert len(walls) == 1 and "q" in walls[0]


def test_wall_needs_absolute_floor():
    # 3x but +0.2 s — sub-second noise must not warn
    base = {"q": _row(0.0, 0.1)}
    new = {"q": _row(0.0, 0.3)}
    _, walls = contract_diff(new, base, set())
    assert walls == []


def test_new_and_errored_queries_skipped():
    base = {"gone": _row(1.0, 1.0), "err": {"error": "boom"}}
    new = {"fresh": _row(50.0, 9.0), "err": _row(50.0, 9.0)}
    regs, walls = contract_diff(new, base, set())
    # "fresh" has no baseline, "err" has an errored baseline — neither
    # can be judged; both skipped
    assert regs == [] and walls == []


def test_shrink_never_flags():
    base = {"q": _row(10.0, 5.0)}
    new = {"q": _row(1.0, 0.5)}
    regs, walls = contract_diff(new, base, set())
    assert regs == [] and walls == []


def test_errored_query_green_in_baseline_fails_gate():
    # ADVICE r15 #3: a query that errors in the new sweep while green in
    # the committed baseline is the hardest regression — must exit 1.
    base = {"q": _row(2.0, 1.0)}
    regs, walls = contract_diff({}, base, set(), errored={"q"})
    assert len(regs) == 1 and "ERRORED" in regs[0] and "q" in regs[0]
    assert walls == []


def test_errored_query_also_errored_in_baseline_skipped():
    base = {"q": {"error": "boom"}}
    regs, _ = contract_diff({}, base, set(), errored={"q"})
    assert regs == []


def test_errored_query_allowlist_exempts():
    base = {"q": _row(2.0, 1.0)}
    regs, _ = contract_diff({}, base, {"q"}, errored={"q"})
    assert regs == []


def test_stage_attempt_tie_prefers_complete():
    # ADVICE r15 #2: on an attemptId tie the complete attempt's fuller
    # metrics must win regardless of fetch order.
    from tools.shuffle_audit import _stages

    fetched = {
        "complete": [{"stageId": 1, "attemptId": 0, "status": "COMPLETE",
                      "shuffleWriteBytes": 1000}],
        "failed": [{"stageId": 1, "attemptId": 0, "status": "FAILED",
                    "shuffleWriteBytes": 10}],
    }

    import tools.shuffle_audit as sa
    orig = sa._get
    sa._get = lambda url: fetched["complete" if "complete" in url else "failed"]
    try:
        out = _stages("http://x", "app")
    finally:
        sa._get = orig
    assert out[1]["status"] == "COMPLETE"
    assert out[1]["shuffleWriteBytes"] == 1000

    # a strictly newer failed retry still wins (its bytes are the
    # newest ground truth for that stage id)
    fetched["failed"][0]["attemptId"] = 1
    sa._get = lambda url: fetched["complete" if "complete" in url else "failed"]
    try:
        out = _stages("http://x", "app")
    finally:
        sa._get = orig
    assert out[1]["attemptId"] == 1 and out[1]["status"] == "FAILED"
