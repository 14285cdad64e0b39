"""Source format registry — a uniform ``read_source`` front door.

The reference has exactly two sources (Postgres via COPY+pgoutput,
MongoDB via find+change streams, main.rs:38-49); their harness analogs
are parquet snapshots + the events change log. This registry keeps that
dispatch extensible the way the reference's ``source_type`` enum is:

- parquet  — snapshot tables (primary fixture format)
- csv      — COPY-text-shaped delimited files (sep/\\N null, header opt);
             the typed cousin of cdc/copy_decoder.py for escape-free data
- jsonl    — Mongo-collection-shaped documents (schema inference or
             first-type-wins via cdc/mongo_schema for dynamic columns)
- jdbc     — real databases in deployment; gated here (no driver in the
             container) with the partitioned-read options pre-wired
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _read_parquet(spark: SparkSession, path: str, **opts) -> DataFrame:
    return spark.read.options(**opts).parquet(path)


def _read_csv(spark: SparkSession, path: str, **opts) -> DataFrame:
    defaults = {"sep": "\t", "nullValue": "\\N", "header": "false"}
    defaults.update(opts)
    return spark.read.options(**defaults).csv(path)


def _read_jsonl(spark: SparkSession, path: str, **opts) -> DataFrame:
    return spark.read.options(**opts).json(path)


def _read_jdbc(spark: SparkSession, path: str, **opts) -> DataFrame:
    """path = JDBC URL. Requires a driver jar on the classpath; in
    deployment pass numPartitions/partitionColumn/lowerBound/upperBound
    so the snapshot scan parallelizes across the PK range (the Spark
    equivalent of the reference's single COPY stream, but partitioned)."""
    required = {"dbtable"}
    missing = required - opts.keys()
    if missing:
        raise ValueError(f"jdbc source requires options: {sorted(missing)}")
    return spark.read.format("jdbc").option("url", path).options(**opts).load()


SOURCE_FORMATS = {
    "parquet": _read_parquet,
    "csv": _read_csv,
    "jsonl": _read_jsonl,
    "jdbc": _read_jdbc,
}


def read_source(
    spark: SparkSession, fmt: str, path: str, **opts
) -> DataFrame:
    if fmt not in SOURCE_FORMATS:
        raise ValueError(
            f"unknown source format {fmt!r}; known: {sorted(SOURCE_FORMATS)}"
        )
    return SOURCE_FORMATS[fmt](spark, path, **opts)
