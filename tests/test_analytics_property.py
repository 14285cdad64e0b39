"""Property-based checks for the analytics tier: sessionization and
funnel against pure-Python references on RANDOM event streams — the
value is adversarial timing (duplicate timestamps, boundary-exact
30-minute gaps and 24-hour windows) the fixture can't guarantee.

Each example writes a tiny events.parquet and drives the real query
functions through catalog.load_table, so the timestamp-normalization
path is under test too.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clockpipe_spark.queries.timeseries import (
    _FUNNEL_WINDOW_H,
    _SESSION_GAP_MIN,
    funnel_conversion,
    sessionize_lag_gap,
)

_BASE = dt.datetime(2024, 1, 1, 0, 0, 0)
_TYPES = ["view", "click", "purchase", "signup", "error"]


@st.composite
def event_streams(draw):
    n = draw(st.integers(min_value=1, max_value=30))
    rows = []
    for i in range(n):
        # minute offsets as multiples of 10 up to 2 days, so exact
        # 30-minute gaps and exact 24-hour funnel deadlines occur often
        minutes = draw(st.integers(min_value=0, max_value=288)) * 10
        rows.append(
            (
                i,
                _BASE + dt.timedelta(minutes=minutes),
                draw(st.integers(min_value=0, max_value=2)),
                draw(st.sampled_from(_TYPES)),
                float(i),
                "{}",
            )
        )
    return rows


def _write_events(tmpdir, rows):
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, str(tmpdir / "events.parquet"))
    return str(tmpdir)


def _collected(spark, sf_dir):
    from clockpipe_spark.catalog import load_table

    return [
        (r["event_id"], r["ts"], r["user_id"], r["event_type"])
        for r in load_table(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type")
        .collect()
    ]


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(event_streams())
def test_sessionize_property(spark, tmp_path_factory, rows):
    sf_dir = _write_events(tmp_path_factory.mktemp("ev"), rows)
    evs = _collected(spark, sf_dir)
    # pure-python gaps-and-islands, break at gap >= 30 min
    by_user: dict[int, list] = {}
    for eid, ts, uid, _et in evs:
        by_user.setdefault(uid, []).append((ts, eid))
    expect = {}
    gap = dt.timedelta(minutes=_SESSION_GAP_MIN)
    for uid, es in by_user.items():
        es.sort()
        idx, prev = 0, None
        sessions: dict[int, list] = {}
        for ts, _eid in es:
            if prev is None or ts - prev >= gap:
                idx += 1
            sessions.setdefault(idx, []).append(ts)
            prev = ts
        for sidx, tss in sessions.items():
            expect[(uid, sidx)] = (
                len(tss),
                int((max(tss) - min(tss)).total_seconds()),
            )
    got = {
        (r["user_id"], r["session_idx"]): (r["n_events"], r["duration_s"])
        for r in sessionize_lag_gap(spark, sf_dir).collect()
    }
    assert got == expect


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(event_streams())
def test_funnel_property(spark, tmp_path_factory, rows):
    sf_dir = _write_events(tmp_path_factory.mktemp("ev"), rows)
    evs = _collected(spark, sf_dir)
    by_user: dict[int, list] = {}
    for _eid, ts, uid, et in evs:
        by_user.setdefault(uid, []).append((ts, et))
    win = dt.timedelta(hours=_FUNNEL_WINDOW_H)
    expect = {}
    for uid, es in by_user.items():
        views = [t for t, e in es if e == "view"]
        if not views:
            continue
        s1 = min(views)
        steps = 1
        clicks = [t for t, e in es if e == "click" and s1 <= t <= s1 + win]
        if clicks:
            s2 = min(clicks)
            steps = 2
            if any(t for t, e in es if e == "purchase" and s2 <= t <= s1 + win):
                steps = 3
        expect[uid] = steps
    got = {
        r["user_id"]: r["steps_completed"]
        for r in funnel_conversion(spark, sf_dir).collect()
    }
    assert got == expect


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(event_streams())
def test_gapfill_property(spark, tmp_path_factory, rows):
    import math

    from clockpipe_spark.queries.timeseries import ts_gapfill_locf

    sf_dir = _write_events(tmp_path_factory.mktemp("ev"), rows)
    from clockpipe_spark.catalog import load_table

    evs = [
        (r["ts"], r["event_type"], r["value"])
        for r in load_table(spark, sf_dir, "events")
        .select("ts", "event_type", "value")
        .collect()
    ]
    hour = dt.timedelta(hours=1)
    trunc = lambda t: t.replace(minute=0, second=0, microsecond=0)
    hours = [trunc(t) for t, _e, _v in evs]
    lo, hi = min(hours), max(hours)
    grid = []
    h = lo
    while h <= hi:
        grid.append(h)
        h += hour
    types = sorted({e for _t, e, _v in evs})
    hourly: dict = {}
    for t, e, v in evs:
        hourly.setdefault((trunc(t), e), []).append(v)
    expect = {}
    for e in types:
        last = None
        for h in grid:
            vals = hourly.get((h, e))
            if vals:
                last = math.floor(sum(vals) / len(vals) * 100)
                expect[(h, e)] = (len(vals), last)
            else:
                expect[(h, e)] = (0, last)
    got = {
        (r["bucket_start"], r["event_type"]): (r["n"], r["locf_avg_x100"])
        for r in ts_gapfill_locf(spark, sf_dir).collect()
    }
    assert got == expect


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(event_streams())
def test_retention_property(spark, tmp_path_factory, rows):
    """Cohort retention vs a pure-python model: day-window edges are
    half-open [first+N d, first+N+1 d) and the cohort is keyed on the
    user's FIRST signup — duplicate timestamps and windows landing
    exactly on a boundary are the adversarial cases."""
    from clockpipe_spark.queries.timeseries import retention_cohorts

    sf_dir = _write_events(tmp_path_factory.mktemp("ev"), rows)
    evs = _collected(spark, sf_dir)
    first = {}
    for _eid, ts, uid, et in evs:
        if et == "signup" and (uid not in first or ts < first[uid]):
            first[uid] = ts
    day = dt.timedelta(days=1)
    cohorts: dict[dt.datetime, list] = {}
    for uid, f0 in first.items():
        d1 = any(
            f0 + day <= ts < f0 + 2 * day for _e, ts, u, _t in evs if u == uid
        )
        d7 = any(
            f0 + 7 * day <= ts < f0 + 8 * day for _e, ts, u, _t in evs if u == uid
        )
        cohorts.setdefault(f0.replace(hour=0, minute=0, second=0), []).append(
            (d1, d7)
        )
    expect = {
        c: (len(us), sum(d1 for d1, _ in us), sum(d7 for _, d7 in us))
        for c, us in cohorts.items()
    }
    got = {
        r["cohort_day"]: (r["n_users"], r["n_day1"], r["n_day7"])
        for r in retention_cohorts(spark, sf_dir).collect()
    }
    assert got == expect


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(event_streams())
def test_gapfill_locf_property(spark, tmp_path_factory, rows):
    """Gap-fill + LOCF vs a pure-python model: the full hour x type
    grid exists, absent cells carry n=0, the hourly mean carries
    forward per type, and cells BEFORE a type's first observation stay
    NULL (locf, never interpolation)."""
    from clockpipe_spark.queries.timeseries import ts_gapfill_locf

    from clockpipe_spark.catalog import load_table

    sf_dir = _write_events(tmp_path_factory.mktemp("ev"), rows)
    evs = [
        (r["ts"], r["event_type"], r["value"])
        for r in load_table(spark, sf_dir, "events")
        .select("ts", "event_type", "value")
        .collect()
    ]
    import math

    hour = lambda ts: ts.replace(minute=0, second=0, microsecond=0)
    hours = [hour(ts) for ts, _t, _v in evs]
    lo, hi = min(hours), max(hours)
    types = sorted({t for _ts, t, _v in evs})
    per_cell: dict[tuple, list] = {}
    for ts, t, v in evs:
        per_cell.setdefault((hour(ts), t), []).append(v)
    expect = {}
    for t in types:
        carry = None
        h = lo
        while h <= hi:
            vals = per_cell.get((h, t))
            if vals:
                carry = math.floor(sum(vals) / len(vals) * 100)
            expect[(h, t)] = (len(vals) if vals else 0, carry)
            h += dt.timedelta(hours=1)
    got = {
        (r["bucket_start"], r["event_type"]): (r["n"], r["locf_avg_x100"])
        for r in ts_gapfill_locf(spark, sf_dir).collect()
    }
    assert got == expect
