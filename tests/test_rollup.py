"""Incremental rollup == full recompute."""

from __future__ import annotations

from pyspark.sql import functions as F

from clockpipe_spark.catalog import load_table
from clockpipe_spark.streaming.rollup import ContinuousRollup


def test_incremental_rollup_matches_full_recompute(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").cache()
    rollup = ContinuousRollup(str(tmp_path / "rollup"))
    # feed in 4 uneven batches by event_id ranges (micro-batch simulation)
    for lo, hi in [(0, 100), (100, 450), (450, 451), (451, 10_000_000)]:
        batch = events.filter(
            (F.col("event_id") >= lo) & (F.col("event_id") < hi)
        )
        rollup.apply_batch(spark, batch)

    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in rollup.read(spark).collect()
    }
    full = {
        (r["window_start"], r["event_type"]): (r["n"], round(r["sum_value"], 2))
        for r in ContinuousRollup.aggregate_batch(events).collect()
    }
    assert got.keys() == full.keys()
    for k, (n, s) in full.items():
        gn, gs = got[k]
        assert gn == n, k
        assert abs(gs - s) < 0.05, k  # additive float merge tolerance
