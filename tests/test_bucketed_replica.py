"""Bucketed replica store: merge correctness == flat store, and merges
rewrite only touched buckets."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from clockpipe_spark.cdc.changelog import changelog_from_events
from clockpipe_spark.cdc.ops import replica_state
from clockpipe_spark.catalog import load_table
from clockpipe_spark.streaming.bucketed_replica import BucketedReplicaStore


def _clog(spark, rows):
    return spark.createDataFrame(
        rows, "seq long, op string, user_id long, value double"
    )


def test_bucketed_matches_final_view(spark, sf_dir, tmp_path):
    clog = changelog_from_events(load_table(spark, sf_dir, "events")).select(
        "seq", "op", "user_id", "value"
    )
    store = BucketedReplicaStore(str(tmp_path / "b"), n_buckets=8)
    # three uneven micro-batches
    for lo, hi in [(0, 300), (300, 700), (700, 10_000_000)]:
        store.merge_changes(
            spark,
            clog.filter((F.col("seq") >= lo) & (F.col("seq") < hi)),
            ["user_id"],
        )
    got = {
        r["user_id"]: (r["last_seq"], round(r["value"], 6))
        for r in store.read(spark).collect()
    }
    expected = {
        r["user_id"]: (r["seq"], round(r["value"], 6))
        for r in replica_state(clog, ["user_id"]).collect()
    }
    assert got == expected


def test_only_touched_buckets_rewritten(spark, tmp_path):
    store = BucketedReplicaStore(str(tmp_path / "b2"), n_buckets=8)
    # seed many keys across all buckets
    seed = _clog(spark, [(i, "I", i, float(i)) for i in range(64)])
    store.merge_changes(spark, seed, ["user_id"])
    m1 = store.read_manifest()
    # update ONE key -> exactly one bucket path should change
    store.merge_changes(spark, _clog(spark, [(100, "U", 7, 700.0)]), ["user_id"])
    m2 = store.read_manifest()
    changed = [b for b in m1 if m1[b] != m2.get(b)]
    assert len(changed) == 1
    # untouched buckets literally reuse the old files
    untouched = [b for b in m1 if b not in changed]
    assert all(m1[b] == m2[b] for b in untouched)
    # and the updated value is visible
    got = {r["user_id"]: r["value"] for r in store.read(spark).collect()}
    assert got[7] == 700.0 and got[6] == 6.0


def test_bucketed_delete_and_replay(spark, tmp_path):
    store = BucketedReplicaStore(str(tmp_path / "b3"), n_buckets=4)
    store.merge_changes(
        spark, _clog(spark, [(1, "I", 1, 1.0), (2, "I", 2, 2.0)]), ["user_id"]
    )
    store.merge_changes(spark, _clog(spark, [(3, "D", 1, 0.0)]), ["user_id"])
    assert {r["user_id"] for r in store.read(spark).collect()} == {2}
    # replay an OLD pre-delete insert: tombstone must win
    store.merge_changes(spark, _clog(spark, [(1, "I", 1, 1.0)]), ["user_id"])
    assert {r["user_id"] for r in store.read(spark).collect()} == {2}
