"""As-of join edge semantics: >= tie inclusion, missing-match NULL,
per-key isolation."""

from __future__ import annotations

import datetime

from clockpipe_spark.operators.asof import asof_join


def _ts(m):
    return datetime.datetime(2024, 1, 1, 12, m)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 1, _ts(0)),    # before any right row -> NULL
            (2, 1, _ts(5)),    # exactly at right ts -> tie included (>=)
            (3, 1, _ts(7)),    # between -> takes 12:05
            (4, 1, _ts(20)),   # after both -> takes 12:10
            (5, 2, _ts(30)),   # other key, no right rows -> NULL
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts(5), 50.0), (1, _ts(10), 99.0)],
        "user_id long, ts timestamp, px double",
    )
    out = {
        r["event_id"]: r["px_asof"]
        for r in asof_join(
            left, right, by=["user_id"], on="ts", value_cols=["px"]
        ).collect()
    }
    assert out == {1: None, 2: 50.0, 3: 50.0, 4: 99.0, 5: None}


def test_asof_join_forward(spark):
    left = spark.createDataFrame(
        [
            (1, 1, _ts(0)),    # before both -> earliest following = 12:05
            (2, 1, _ts(5)),    # exactly at right ts -> tie included (<=)
            (3, 1, _ts(7)),    # between -> takes 12:10
            (4, 1, _ts(20)),   # after both -> NULL
            (5, 2, _ts(30)),   # other key, no right rows -> NULL
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts(5), 50.0), (1, _ts(10), 99.0)],
        "user_id long, ts timestamp, px double",
    )
    out = {
        r["event_id"]: r["px_asof"]
        for r in asof_join(
            left, right, by=["user_id"], on="ts", value_cols=["px"],
            direction="forward",
        ).collect()
    }
    assert out == {1: 50.0, 2: 50.0, 3: 99.0, 4: None, 5: None}


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame(
        [
            (1, 1, _ts(6)),    # 1 min after 12:05 -> within 2-min tol
            (2, 1, _ts(9)),    # 4 min after 12:05 -> out of tolerance
            (3, 1, _ts(11)),   # 1 min after 12:10 -> within
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts(5), 50.0), (1, _ts(10), 99.0)],
        "user_id long, ts timestamp, px double",
    )
    tol = 2 * 60 * 1_000_000  # 2 minutes in microseconds
    back = {
        r["event_id"]: r["px_asof"]
        for r in asof_join(
            left, right, by=["user_id"], on="ts", value_cols=["px"],
            tolerance_us=tol,
        ).collect()
    }
    assert back == {1: 50.0, 2: None, 3: 99.0}
    fwd = {
        r["event_id"]: r["px_asof"]
        for r in asof_join(
            left, right, by=["user_id"], on="ts", value_cols=["px"],
            direction="forward", tolerance_us=tol,
        ).collect()
    }
    # 12:06 -> next is 12:10 (4 min, out); 12:09 -> 12:10 (1 min, in);
    # 12:11 -> nothing follows -> NULL
    assert fwd == {1: None, 2: 99.0, 3: None}
