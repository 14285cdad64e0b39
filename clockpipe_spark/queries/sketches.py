"""Sketch-backed operators surfaced as queries: bounded-memory heavy
hitters over the document token stream.

The reference has no sketch tier; this extends SURVEY §2.10's analytics
mandate alongside approx_count_distinct. The MG + exact-verify
composition is deliberately oracle-checkable: the sketch only bounds
candidate-generation memory, the verification pass restores exactness,
so the driver hash-compares against a plain GROUP BY twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clockpipe_spark.catalog import load_table
from clockpipe_spark.operators.sketches import heavy_hitters_exact

_HH_K = 32  # heavy hitter = token with count > total/32 (~3.1% of stream)


def frequent_items_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter tokens via distributed Misra-Gries + one exact
    verification pass (operators/sketches.py). At 100 TB the exact
    GROUP BY over all tokens shuffles the full vocabulary; this plan
    shuffles only <= k x partitions candidate rows plus their exact
    counts — the sketch is the memory/shuffle bound, the verify pass
    the correctness guarantee, and the output is provably identical to
    the exact query (pytest pins candidate-set coverage; the oracle
    below IS the exact query)."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("term")
    )
    return heavy_hitters_exact(tokens, "term", _HH_K).select(
        "term",
        F.col("cnt").cast("bigint").alias("cnt"),
        F.col("total").cast("bigint").alias("total"),
    )


FREQUENT_ITEMS_SQL = f"""
WITH tokens AS (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
  FROM documents
),
tot AS (SELECT count(*) AS total FROM tokens)
SELECT term, CAST(cnt AS BIGINT) AS cnt, CAST(total AS BIGINT) AS total
FROM (SELECT term, count(*) AS cnt FROM tokens GROUP BY term), tot
WHERE cnt * {_HH_K} > total
"""


def hll_user_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily + cumulative distinct-user counts from MERGEABLE HLL
    sketches (Datasketches via Spark's hll_sketch_agg/hll_union_agg):
    the raw stream is scanned ONCE to build one binary sketch per day;
    every cumulative count is then a union over those day sketches —
    never a rescan. This is the 100 TB shape for distinct-over-time:
    per-partition sketch state is KB-sized regardless of cardinality,
    the day->sketch table is dashboard-sized, and any window (cumulative,
    trailing 7-day, arbitrary range) is a sketch merge, which pytest
    pins as lossless (union of day sketches == one-pass whole-stream
    sketch, exactly).

    Estimates are approximate by nature, so this entry is rows-only for
    the driver; test_sketches.py bounds the error vs the exact counts
    and asserts the merge identity."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count("*").alias("n_events"),
    )
    # cumulative merge as a RUNNING hll_union_agg window, not a
    # day<=as_of pair self-join (r16: the 180-plan lint flagged the
    # old shape's BroadcastNestedLoopJoin; the window is O(days) state
    # instead of O(days^2) pairs and produced bit-identical estimates).
    # The global window's single partition is correct, not a smell:
    # the day table is calendar-bounded (one row per day) regardless
    # of corpus size — thousands of rows at any scale.
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return daily.select(
        "day",
        "n_events",
        F.hll_sketch_estimate("sk").cast("long").alias("daily_users_est"),
        F.hll_sketch_estimate(F.hll_union_agg("sk").over(w))
        .cast("long")
        .alias("cum_users_est"),
    ).orderBy("day")


QUERIES = {
    "frequent_items_mg": frequent_items_mg,
    "hll_user_rollup": hll_user_rollup,
}

ORACLES = {
    "frequent_items_mg": FREQUENT_ITEMS_SQL,
}
