"""Partition pruning: a filter on the partition column must reach the
scan as a PartitionFilter (zero data files read from other partitions)
— the 100 TB table-layout contract."""

from __future__ import annotations

import io
import contextlib

from pyspark.sql import functions as F

from clockpipe_spark.catalog import load_table


def test_partition_filter_reaches_scan(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_by_type")
    load_table(spark, sf_dir, "events").write.partitionBy("event_type").parquet(out)

    df = spark.read.parquet(out).filter(F.col("event_type") == "purchase")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "purchase" in pf[0], pf
    # and the result only contains the pruned partition
    types = {r["event_type"] for r in df.select("event_type").distinct().collect()}
    assert types == {"purchase"}
