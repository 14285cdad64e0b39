"""Per-query shuffle-volume audit: the transferable scale metric.

Wall-clock on local[32] NVMe transfers poorly to a 1000-executor
cluster; SHUFFLE BYTES transfer almost exactly — every shuffled byte
is a network byte at scale, and spill means a partition didn't fit an
executor. This tool runs each registry query against $SPARK_GRAFT_SF_DIR
and attributes, from Spark's status REST API, the shuffle read/write,
spill, and scan input of the stages it launched.

Attribution: the driver loop is single-threaded, so every stage whose
stageId is newer than the pre-query snapshot belongs to the query.
Each query runs THREE times: the FIRST is the cold run (its bytes are
kept alongside for the cache-build story), the SECOND's bytes are the
reported steady-state shuffle (signature caches etc. are a train-once
cost, not a per-execution one), and the reported wall is the MIN of
the two warm runs (r16: single-warm-run walls kept flagging mid-sweep
self-contention — 4 false WALL-WARNs in each of r15 and r16's sweeps,
each costing an iso-confirmation pass; min-of-2 matches the bench's
min-of-N discipline and bytes are load-invariant either way).

Usage: python tools/shuffle_audit.py [name-filter ...] [--allow=name ...]
Writes SHUFFLE_AUDIT.json at the repo root and prints a ranked table.
A zero-shuffle query is map-side only (scan -> project/filter/limit);
spill_mb > 0 anywhere is a sizing bug at ANY scale and is flagged.

Cross-round contract (VERDICT r14 directive #5, enforced here): before
a full sweep overwrites the committed SHUFFLE_AUDIT.json, the new
numbers are diffed against it — ANY spiller, or any query whose warm
shuffle write grew >1.5x (above a 1 MB absolute floor, so KB-scale
noise doesn't flag), fails the run with exit 1. A query whose plan you
INTENTIONALLY changed this round is exempted with --allow=<name>
(record the why in PLANS.md); an unexplained jump on an untouched
query is a plan regression caught before it ships.

Wall regressions are flagged too (r15): warm wall >2x the committed
record AND >0.5 s absolute growth. Walls swing +-30% with host state
(unlike shuffle bytes), so the threshold is loose — it exists because
shuffle-neutral regressions are real: the r15 overflow-guard rework
left shuffle bytes identical while an interpreted per-element regex
doubled cdc_mongo_bson_casts' wall, and only the wall column caught
it. Wall flags are WARNINGS (printed, recorded in the summary), not
exit-1 failures — a loaded host must not fail the wrap.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _get(url: str):
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def _stages(api: str, app_id: str) -> dict[int, dict]:
    """Newest attempt per stage id, across COMPLETE and FAILED stages.

    ADVICE r14 #5: fetching only status=complete and keeping whichever
    attempt the REST API listed last silently dropped retried/failed
    stages' shuffle and spill bytes — understating spill, the one
    metric this tool exists to flag. Pick max attemptId explicitly.
    """
    out: dict[int, dict] = {}
    for status in ("complete", "failed"):
        try:
            stages = _get(f"{api}/applications/{app_id}/stages?status={status}")
        except Exception:
            continue  # e.g. no failed stages endpoint variance
        for st in stages:
            sid = st["stageId"]
            prev = out.get(sid)
            # ADVICE r15 #2: on an attemptId TIE, prefer the complete
            # attempt — a failed retry that died early has partial task
            # metrics and would understate shuffle/spill bytes (the old
            # >= tie-break kept whichever status list was fetched last).
            key = (st.get("attemptId", 0), 1 if status == "complete" else 0)
            prev_key = (
                (prev.get("attemptId", 0), 1 if prev.get("status") == "COMPLETE" else 0)
                if prev is not None else (-1, -1)
            )
            if key > prev_key:
                out[sid] = st
    return out


def _delta(stages: dict[int, dict], after_id: int) -> dict[str, float]:
    mb = 1024 * 1024
    agg = {"shuffle_write_mb": 0.0, "shuffle_read_mb": 0.0, "spill_mb": 0.0,
           "input_mb": 0.0, "input_records": 0, "stages": 0}
    for sid, st in stages.items():
        if sid <= after_id:
            continue
        agg["shuffle_write_mb"] += st.get("shuffleWriteBytes", 0) / mb
        agg["shuffle_read_mb"] += st.get("shuffleReadBytes", 0) / mb
        agg["spill_mb"] += (st.get("memoryBytesSpilled", 0)
                            + st.get("diskBytesSpilled", 0)) / mb
        agg["input_mb"] += st.get("inputBytes", 0) / mb
        agg["input_records"] += st.get("inputRecords", 0)
        agg["stages"] += 1
    return {k: (round(v, 2) if isinstance(v, float) else v)
            for k, v in agg.items()}


def contract_diff(
    ok: dict[str, dict],
    base: dict[str, dict],
    allowed_growth: set[str],
    errored: frozenset[str] | set[str] = frozenset(),
) -> tuple[list[str], list[str]]:
    """Pure cross-round contract check (unit-tested, Spark-free):
    returns (byte regressions — exit-1 failures, wall warnings).
    Thresholds per the module docstring: shuffle write >1.5x and >1 MB
    absolute; wall >2x and >0.5 s absolute. A query that ERRORS in the
    new sweep while green in the committed baseline is the hardest
    regression of all and fails the gate (ADVICE r15 #3 — previously it
    was silently skipped and the run exited 0)."""
    regressions: list[str] = []
    wall_warnings: list[str] = []
    for n in sorted(errored):
        b = base.get(n)
        if b and "error" not in b and n not in allowed_growth:
            regressions.append(
                f"{n}: ERRORED in this sweep but was green in the "
                f"committed baseline — fix or --allow={n} explicitly")
    for n, r in ok.items():
        b = base.get(n)
        if not b or "error" in b:
            continue
        old_w, new_w = b.get("shuffle_write_mb", 0.0), r["shuffle_write_mb"]
        if (new_w > 1.5 * old_w and new_w - old_w > 1.0
                and n not in allowed_growth):
            regressions.append(
                f"{n}: warm shuffle write {old_w} -> {new_w} MB "
                f"({new_w / max(old_w, 1e-9):.2f}x) — plan regression "
                f"unless intentionally changed (then --allow={n})")
        old_t, new_t = b.get("wall_sec", 0.0), r["wall_sec"]
        if (new_t > 2.0 * old_t and new_t - old_t > 0.5
                and n not in allowed_growth):
            wall_warnings.append(
                f"{n}: warm wall {old_t} -> {new_t} s "
                f"({new_t / max(old_t, 1e-9):.2f}x) — shuffle-neutral "
                f"regression or host load; iso-confirm before blaming")
    return regressions, wall_warnings


def main() -> int:
    from clockpipe_spark.queries import all_queries
    from clockpipe_spark.session import get_spark

    filters = [a for a in sys.argv[1:] if not a.startswith("-")]
    allowed_growth = {a.split("=", 1)[1] for a in sys.argv[1:]
                      if a.startswith("--allow=")}
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("shuffle_audit", extra_conf={"spark.ui.enabled": "true"})
    sc = spark.sparkContext
    api = f"{sc.uiWebUrl}/api/v1"
    app_id = _get(f"{api}/applications")[0]["id"]

    queries = all_queries()
    if filters:
        queries = {n: q for n, q in queries.items()
                   if any(f in n for f in filters)}

    results: dict[str, dict] = {}
    for name, fn in queries.items():
        runs = []
        try:
            for _ in range(3):
                before = max(_stages(api, app_id), default=-1)
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                wall = round(time.perf_counter() - t0, 3)
                d = _delta(_stages(api, app_id), before)
                d["wall_sec"] = wall
                runs.append(d)
        except Exception as exc:  # noqa: BLE001 — audit must finish the sweep
            results[name] = {"error": str(exc)[:200]}
            continue
        warm = runs[1]
        # bytes from the first warm run; wall = min of the two warm
        # runs (module docstring: single-run walls flag self-contention)
        warm["wall_sec"] = round(min(r["wall_sec"] for r in runs[1:]), 3)
        warm["cold_shuffle_write_mb"] = runs[0]["shuffle_write_mb"]
        results[name] = warm
        print(f"{name:38s} shW {warm['shuffle_write_mb']:9.2f} MB  "
              f"shR {warm['shuffle_read_mb']:9.2f} MB  "
              f"spill {warm['spill_mb']:8.2f} MB  "
              f"inRec {warm['input_records']:>10d}  "
              f"stages {warm['stages']:3d}  {warm['wall_sec']:6.2f}s",
              flush=True)

    ok = {n: r for n, r in results.items() if "error" not in r}
    spillers = {n: r["spill_mb"] for n, r in ok.items() if r["spill_mb"] > 0}
    top = sorted(ok.items(), key=lambda kv: -kv[1]["shuffle_write_mb"])[:10]
    summary = {
        "sf_dir": sf_dir,
        "n_queries": len(results),
        "errors": [n for n, r in results.items() if "error" in r],
        "total_shuffle_write_mb": round(
            sum(r["shuffle_write_mb"] for r in ok.values()), 2),
        "spillers": spillers,
        "top10_shuffle_write": {n: r["shuffle_write_mb"] for n, r in top},
        "queries": results,
    }
    # Cross-round diff against the committed record BEFORE overwriting
    # it (see module docstring). Runs on full sweeps only — filtered
    # probes have no complete baseline to compare.
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    record = os.path.join(here, "SHUFFLE_AUDIT.json")
    regressions: list[str] = []
    wall_warnings: list[str] = []
    if not filters and os.path.exists(record):
        with open(record) as f:
            base = json.load(f).get("queries", {})
        regressions, wall_warnings = contract_diff(
            ok, base, allowed_growth,
            errored={n for n, r in results.items() if "error" in r})
    summary["contract_regressions"] = regressions
    summary["wall_warnings"] = wall_warnings
    # name-filtered runs are iteration probes — only a FULL sweep may
    # replace the committed per-round record
    if not filters:
        with open(record, "w") as f:
            json.dump(summary, f, indent=1)
    print(f"\n== {len(ok)} audited, {len(summary['errors'])} errors, "
          f"total warm shuffle write {summary['total_shuffle_write_mb']} MB, "
          f"{len(spillers)} spillers")
    for n, s in spillers.items():
        print(f"  SPILL {n}: {s} MB")
    for msg in regressions:
        print(f"  GROWTH {msg}")
    for msg in wall_warnings:
        print(f"  WALL-WARN {msg}")
    return 1 if (spillers or regressions) else 0


if __name__ == "__main__":
    sys.exit(main())
