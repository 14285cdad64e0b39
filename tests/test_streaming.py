"""Streaming pipeline semantics: batch/stream equivalence, cursor
protocol (peek-then-advance), replay idempotence."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from clockpipe_spark.cdc.changelog import changelog_from_events
from clockpipe_spark.cdc.ops import replica_state
from clockpipe_spark.config import PipeConfig
from clockpipe_spark.queries.streamlike import stream_tumbling_hourly
from clockpipe_spark.streaming.pipeline import ParquetCdcPipe, run_cdc_stream
from clockpipe_spark.streaming.windows import tumbling_counts


@pytest.fixture
def events_dir(spark, sf_dir, tmp_path):
    """Streaming sources need a directory; re-write the fixture events
    (with ts already normalized to micros) into one."""
    from clockpipe_spark.catalog import load_table

    d = str(tmp_path / "events_src")
    load_table(spark, sf_dir, "events").repartition(2).write.parquet(d)
    return d


def _expected_replica(spark, events_dir):
    clog = changelog_from_events(spark.read.parquet(events_dir))
    return {
        r["user_id"]: (r["seq"], round(r["value"], 6))
        for r in replica_state(clog, ["user_id"]).collect()
    }


def test_batch_pipe_matches_replica_state(spark, events_dir, tmp_path):
    """Draining the pipe in capped iterations must land on the same final
    state as the one-shot batch dedup-on-read view."""
    pipe = ParquetCdcPipe(
        spark,
        events_dir,
        str(tmp_path / "target"),
        PipeConfig(peek_changes_limit=300),  # force multiple iterations
    )
    iterations = pipe.run_pipe()
    assert iterations >= 4  # 1000 events / 300
    got = {
        r["user_id"]: (r["last_seq"], round(r["value"], 6))
        for r in pipe.store.read(spark).collect()
    }
    assert got == _expected_replica(spark, events_dir)


def test_pipe_cursor_advances_after_write(spark, events_dir, tmp_path):
    pipe = ParquetCdcPipe(
        spark, events_dir, str(tmp_path / "t2"), PipeConfig(peek_changes_limit=100)
    )
    pipe.initialize()
    assert pipe.read_cursor() == -1
    pipe.sync_iteration()
    c1 = pipe.read_cursor()
    assert c1 >= 0
    pipe.sync_iteration()
    assert pipe.read_cursor() > c1


def test_pipe_replay_is_idempotent(spark, events_dir, tmp_path):
    """Crash-between-write-and-advance (T2): re-applying the same batch
    must not change the state (keyed merge absorbs duplicates)."""
    pipe = ParquetCdcPipe(
        spark, events_dir, str(tmp_path / "t3"), PipeConfig(peek_changes_limit=500)
    )
    pipe.run_pipe()
    before = sorted(
        (r["user_id"], r["last_seq"]) for r in pipe.store.read(spark).collect()
    )
    # simulate the crash: rewind the cursor and replay the last batch
    pipe.advance_cursor(400)
    pipe.sync_iteration()
    after = sorted(
        (r["user_id"], r["last_seq"]) for r in pipe.store.read(spark).collect()
    )
    assert before == after


def test_streaming_pipe_matches_batch(spark, events_dir, tmp_path):
    """foreachBatch embodiment lands on the identical replica."""
    q = run_cdc_stream(
        spark, events_dir, str(tmp_path / "t4"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    from clockpipe_spark.streaming.replica import ReplicaStore

    store = ReplicaStore(str(tmp_path / "t4" / "replica"))
    got = {
        r["user_id"]: (r["last_seq"], round(r["value"], 6))
        for r in store.read(spark).collect()
    }
    assert got == _expected_replica(spark, events_dir)


def test_routed_streaming_matches_per_table_views(spark, events_dir, tmp_path):
    """The routed foreachBatch embodiment lands each table's replica on
    its per-table FINAL view — streaming twin of the SyncJob test."""
    from clockpipe_spark.streaming.pipeline import run_routed_cdc_stream
    from clockpipe_spark.streaming.replica import ReplicaStore

    q = run_routed_cdc_stream(
        spark, events_dir, str(tmp_path / "routed"), str(tmp_path / "rckpt")
    )
    q.awaitTermination(180)
    clog = changelog_from_events(spark.read.parquet(events_dir))
    for tbl in ("t0", "t1", "t2", "t3"):
        expected = {
            r["user_id"]: r["seq"]
            for r in replica_state(
                clog.filter(clog["tbl"] == tbl), ["user_id"]
            ).collect()
        }
        store = ReplicaStore(str(tmp_path / "routed" / tbl))
        got = {
            r["user_id"]: r["last_seq"] for r in store.read(spark).collect()
        }
        assert got == expected, tbl


def test_streaming_window_matches_batch_query(spark, sf_dir, events_dir, tmp_path):
    """The watermarked streaming tumbling agg and the batch twin
    (oracle-checked) produce identical rows."""
    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    agg = tumbling_counts(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.sql("SELECT * FROM tumbling_test").collect()
    }
    batch = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in stream_tumbling_hourly(spark, sf_dir).collect()
    }
    assert streamed == batch
