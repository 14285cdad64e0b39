"""Source registry + cross-batch streaming dedup."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from clockpipe_spark.catalog import load_table
from clockpipe_spark.sources import read_source
from clockpipe_spark.streaming.windows import dedup_within_watermark


def test_read_parquet(spark, sf_dir):
    df = read_source(spark, "parquet", os.path.join(sf_dir, "nation.parquet"))
    assert df.count() == 25


def test_read_csv_copy_shaped(spark, tmp_path):
    path = str(tmp_path / "t.tsv")
    with open(path, "w") as f:
        f.write("1\talpha\t\\N\n2\tbeta\t3.5\n")
    df = read_source(spark, "csv", path)
    rows = df.collect()
    assert rows[0][2] is None  # \N -> NULL
    assert rows[1][1] == "beta"


def test_read_jsonl(spark, tmp_path):
    path = str(tmp_path / "docs.jsonl")
    with open(path, "w") as f:
        f.write(json.dumps({"_id": "a", "n": 1}) + "\n")
        f.write(json.dumps({"_id": "b", "n": 2, "extra": "x"}) + "\n")
    df = read_source(spark, "jsonl", path)
    assert df.count() == 2 and "extra" in df.columns


def test_jdbc_gated(spark):
    with pytest.raises(ValueError, match="dbtable"):
        read_source(spark, "jdbc", "jdbc:postgresql://host/db")
    with pytest.raises(ValueError, match="unknown source format"):
        read_source(spark, "avro", "x")


def test_streaming_dedup_within_watermark(spark, sf_dir, tmp_path):
    """Duplicate event_ids split ACROSS micro-batches are removed —
    beyond the reference's per-batch dedup."""
    src = str(tmp_path / "dup_src")
    events = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    events.coalesce(1).write.mode("append").parquet(src)
    events.coalesce(1).write.mode("append").parquet(src)  # full duplicate file

    schema = events.schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        dedup_within_watermark(stream, ["event_id"], watermark="10 days")
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT event_id, count(*) AS c FROM dedup_stream GROUP BY 1")
    assert out.count() == 100
    assert out.filter(F.col("c") > 1).count() == 0  # no key emitted twice
