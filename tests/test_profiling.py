"""Property checks for the profiling tier: TWAP against a pure-python
model on random event streams (duplicate timestamps, single-event
users, zero-length holds), and the replica checksum's defining
property — invariance to physical row order (sum-mod digests must not
depend on partitioning or arrival order)."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clockpipe_spark.queries.cdc import cdc_table_checksum
from clockpipe_spark.queries.profiling import ts_time_weighted_avg

_BASE = dt.datetime(2024, 1, 1, 0, 0, 0)
_TYPES = ["view", "click", "purchase", "signup", "error"]


@st.composite
def event_streams(draw):
    n = draw(st.integers(min_value=1, max_value=30))
    rows = []
    for i in range(n):
        minutes = draw(st.integers(min_value=0, max_value=288)) * 10
        rows.append(
            (
                i,
                _BASE + dt.timedelta(minutes=minutes),
                draw(st.integers(min_value=0, max_value=2)),
                draw(st.sampled_from(_TYPES)),
                # non-negative domain, matching the TWAP contract
                draw(st.integers(min_value=0, max_value=400)) / 4.0,
                "{}",
            )
        )
    return rows


def _write_events(tmpdir, rows):
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([r[5] for r in rows], pa.string()),
            }
        ),
        str(tmpdir / "events.parquet"),
    )
    return str(tmpdir)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(event_streams())
def test_twap_property(spark, tmp_path_factory, rows):
    import math

    sf_dir = _write_events(tmp_path_factory.mktemp("ev"), rows)
    by_user: dict[int, list] = {}
    for eid, ts, uid, _et, val, _p in rows:
        by_user.setdefault(uid, []).append((ts, eid, val))
    expect = {}
    for uid, es in by_user.items():
        es.sort(key=lambda r: (r[0], r[1]))
        intervals = []
        for (ts, _eid, val), (nts, _neid, _nval) in zip(es, es[1:]):
            hold = int((nts - ts).total_seconds() * 1_000_000)
            intervals.append((math.floor(val * 100), hold))
        if intervals:
            tot = sum(h for _, h in intervals)
            num = sum(c * h for c, h in intervals)
            # all-zero holds (every event at one instant) -> NULL twap
            expect[uid] = (len(intervals), tot, num // tot if tot else None)
    got = {
        r["user_id"]: (r["n_intervals"], r["total_us"], r["twap_cents"])
        for r in ts_time_weighted_avg(spark, sf_dir).collect()
    }
    assert got == expect


@settings(max_examples=4, deadline=None, suppress_health_check=list(HealthCheck))
@given(event_streams(), st.randoms())
def test_checksum_row_order_invariant(spark, tmp_path_factory, rows, rnd):
    sf_dir_a = _write_events(tmp_path_factory.mktemp("ev"), rows)
    shuffled = list(rows)
    rnd.shuffle(shuffled)
    sf_dir_b = _write_events(tmp_path_factory.mktemp("ev"), shuffled)
    a = {
        r["tbl"]: (r["n_rows"], r["checksum"])
        for r in cdc_table_checksum(spark, sf_dir_a).collect()
    }
    b = {
        r["tbl"]: (r["n_rows"], r["checksum"])
        for r in cdc_table_checksum(spark, sf_dir_b).collect()
    }
    assert a == b
