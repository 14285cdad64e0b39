"""Event-time window semantics (SURVEY.md §2.7 T6 — a new capability, not
in the reference) expressed in batch so DuckDB can oracle-check them. The
*streaming* execution of the identical logic (withWatermark + the same
window exprs) lives in clockpipe_spark.streaming and is tested for
batch/stream equivalence in pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clockpipe_spark.catalog import load_table


def stream_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h event-time windows per event_type."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


TUMBLING_SQL = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n, round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2
"""


def stream_sliding_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 1h length, 30m slide — every event lands in
    exactly two windows (epoch-aligned, same as Spark's window())."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n", "sum_value")
    )


SLIDING_SQL = """
WITH assigned AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) - (k * INTERVAL '30 minutes')
             AS window_start,
         value
  FROM events, (SELECT unnest([0, 1]) AS k)
)
SELECT window_start, count(*) AS n, round(sum(value), 2) AS sum_value
FROM assigned GROUP BY 1
"""


_SESSION_GAP_MIN = 30


def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows per user with a 30-minute inactivity gap —
    F.session_window works identically in batch groupBy and streaming."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            "user_id",
            F.session_window("ts", f"{_SESSION_GAP_MIN} minutes").alias("w"),
        )
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


# gaps-and-islands twin: a session breaks when the gap is >= 30 minutes
# (Spark's event window [t, t+gap) does not overlap a successor starting
# exactly at t+gap).
SESSION_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   >= INTERVAL '{_SESSION_GAP_MIN} minutes'
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
islands AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, min(ts) AS session_start,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM islands GROUP BY user_id, session_id
"""


def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join, batch-expressed: each view event
    joined to the same user's purchases within [view_ts, view_ts + 1h)
    — the canonical two-stream correlation (Structured Streaming's
    watermarked stream-stream join; the identical join condition runs
    in real streaming mode in tests/test_streaming_join.py and is
    pinned equal to this batch result). Purchase values in integer
    cents so the sum is engine-exact.

    Shape: both sides shuffle once on user_id; the time predicate
    evaluates inside the co-partitioned join — at 100 TB this is the
    plan Spark's streaming join executes per micro-batch with state
    bounded by the watermark + interval."""
    events = load_table(spark, sf_dir, "events")
    views = events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id", F.col("ts").alias("vts")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("pts"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    joined = views.join(
        purchases,
        ["user_id"],
    ).filter(
        (F.col("pts") >= F.col("vts"))
        & (F.col("pts") < F.col("vts") + F.expr("INTERVAL 1 HOUR"))
    )
    return (
        joined.groupBy("view_id", "user_id")
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum("cents").alias("sum_cents"),
        )
        # no final orderBy (r15): pipeline join output — the sampler
        # re-ran the interval join; the gate sorts canonically
    )


INTERVAL_JOIN_SQL = """
SELECT v.event_id AS view_id, v.user_id,
       count(*) AS n_purchases,
       CAST(sum(floor(p.value * 100)) AS BIGINT) AS sum_cents
FROM events v JOIN events p
  ON v.user_id = p.user_id
 AND p.ts >= v.ts AND p.ts < v.ts + INTERVAL 1 HOUR
WHERE v.event_type = 'view' AND p.event_type = 'purchase'
GROUP BY v.event_id, v.user_id
"""


QUERIES = {
    "stream_tumbling_hourly": stream_tumbling_hourly,
    "stream_sliding_30m": stream_sliding_30m,
    "stream_session_windows": stream_session_windows,
    "stream_interval_join": stream_interval_join,
}

ORACLES = {
    "stream_tumbling_hourly": TUMBLING_SQL,
    "stream_sliding_30m": SLIDING_SQL,
    "stream_session_windows": SESSION_SQL,
    "stream_interval_join": INTERVAL_JOIN_SQL,
}
