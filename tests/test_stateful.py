"""applyInPandasWithState: running totals carried across micro-batches
must equal a batch groupBy at stream end."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from clockpipe_spark.catalog import load_table
from clockpipe_spark.operators.grouped import running_totals_stateful


def test_stateful_running_totals(spark, sf_dir, tmp_path):
    src = str(tmp_path / "ev")
    events = load_table(spark, sf_dir, "events")
    # two files -> two micro-batches (maxFilesPerTrigger=1)
    events.filter(F.col("event_id") < 500).coalesce(1).write.mode("append").parquet(src)
    events.filter(F.col("event_id") >= 500).coalesce(1).write.mode("append").parquet(src)

    schema = events.schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        running_totals_stateful(stream)
        .writeStream.format("memory")
        .queryName("stateful_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # in update mode the memory sink appends each batch's rows; the LAST
    # row per user is the final state
    rows = spark.sql(
        "SELECT * FROM stateful_totals"
    ).collect()
    final: dict[int, tuple[int, float]] = {}
    for r in rows:  # memory sink preserves batch order
        final[r["user_id"]] = (r["n"], r["total"])

    expected = {
        r["user_id"]: (r["n"], round(r["total"], 6))
        for r in events.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert final.keys() == expected.keys()
    for u, (n, t) in expected.items():
        gn, gt = final[u]
        assert gn == n, u
        assert abs(gt - t) < 1e-3, u
