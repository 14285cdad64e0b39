"""Time-series operators: as-of join, keyed range join, percentiles,
correlated scalar subquery, hourly gap-fill with LOCF — the
custom-operator tier the reference's users would run on the replica."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clockpipe_spark.catalog import load_table
from clockpipe_spark.operators.asof import asof_join


def asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every event, the user's most recent purchase value at or
    before that event (ASOF JOIN — DuckDB runs its native one)."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    joined = asof_join(
        events.select("event_id", "user_id", "ts", "event_type"),
        purchases,
        by=["user_id"],
        on="ts",
        value_cols=["purchase_value"],
        suffix="",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.round("purchase_value", 2).alias("last_purchase_value"),
    )


ASOF_SQL = """
SELECT e.event_id, e.user_id, round(p.purchase_value, 2) AS last_purchase_value
FROM events e
ASOF LEFT JOIN (
  SELECT user_id, ts, value AS purchase_value
  FROM events WHERE event_type = 'purchase'
) p ON e.user_id = p.user_id AND e.ts >= p.ts
"""


def range_join_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed range join: lineitems shipped within 30 days of their
    order's date, bucketed by latency week."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).filter(
        (F.col("l_shipdate") >= F.col("o_orderdate"))
        & (F.col("l_shipdate") < F.date_add(F.col("o_orderdate"), 30))
    )
    week = F.floor(F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) / 7)
    return joined.groupBy(week.alias("latency_week")).agg(
        F.count("*").alias("n_items"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


RANGE_JOIN_SQL = """
SELECT CAST(floor(datediff('day', o_orderdate, l_shipdate) / 7) AS BIGINT)
           AS latency_week,
       count(*) AS n_items,
       round(sum(l_extendedprice), 2) AS sum_price
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= o_orderdate
  AND l_shipdate < o_orderdate + INTERVAL 30 DAY
GROUP BY 1
"""


def stats_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (median + p95)."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.round(F.percentile("value", 0.5), 4).alias("p50"),
        F.round(F.percentile("value", 0.95), 4).alias("p95"),
        F.round(F.min("value"), 2).alias("vmin"),
        F.round(F.max("value"), 2).alias("vmax"),
    )


PERCENTILES_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 4)  AS p50,
       round(quantile_cont(value, 0.95), 4) AS p95,
       round(min(value), 2) AS vmin,
       round(max(value), 2) AS vmax
FROM events GROUP BY event_type
"""


def correlated_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (Catalyst decorrelates it to a join):
    orders pricier than their own customer's average."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("corr_orders")
    return spark.sql(
        """
        SELECT o_custkey, count(*) AS n_above
        FROM corr_orders o
        WHERE o_totalprice > (
            SELECT avg(o2.o_totalprice) FROM corr_orders o2
            WHERE o2.o_custkey = o.o_custkey
        )
        GROUP BY o_custkey
        """
    )


CORRELATED_SQL = """
SELECT o_custkey, count(*) AS n_above
FROM orders o
WHERE o_totalprice > (
    SELECT avg(o2.o_totalprice) FROM orders o2
    WHERE o2.o_custkey = o.o_custkey
)
GROUP BY o_custkey
"""


def ts_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly gap-fill with last-observation-carried-forward — the
    TimescaleDB ``time_bucket_gapfill``+``locf`` / ClickHouse ``WITH
    FILL`` pattern over the events table: every (hour, event_type) cell
    of the full min→max grid exists, empty hours report n=0, and the
    hourly mean value carries forward until the next observation (NULL
    before a type's first observation — locf, not interpolation).

    Shape: ONE hourly aggregation of the fact stream (map-side partial
    combine); the grid is hours × types — built from a 1-row bounds
    aggregate and the distinct type list, both broadcast — so the
    gap-fill left join never shuffles the fact side, and the LOCF
    window shuffles only grid-sized rows (tiny at any corpus scale).
    Floor-scaled avg keeps the LOCF lane integer-exact across engines."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    hourly = events.groupBy(hour.alias("h"), F.col("event_type")).agg(
        F.count("*").alias("n"),
        F.floor(F.avg("value") * 100).cast("bigint").alias("avg_x100"),
    )
    bounds = events.select(hour.alias("h")).agg(
        F.min("h").alias("lo"), F.max("h").alias("hi")
    )
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    types = events.select("event_type").distinct()
    full = F.broadcast(grid).crossJoin(F.broadcast(types))
    filled = full.join(hourly, ["h", "event_type"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        F.col("h").alias("bucket_start"),
        "event_type",
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        F.last("avg_x100", ignorenulls=True).over(w).alias("locf_avg_x100"),
    )


GAPFILL_SQL = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n,
         CAST(floor(avg(value) * 100) AS BIGINT) AS avg_x100
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT min(date_trunc('hour', ts)) AS lo, max(date_trunc('hour', ts)) AS hi
  FROM events
),
grid AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds
),
types AS (SELECT DISTINCT event_type FROM events),
filled AS (
  SELECT g.h, t.event_type, coalesce(hr.n, 0) AS n, hr.avg_x100
  FROM grid g CROSS JOIN types t
  LEFT JOIN hourly hr ON hr.h = g.h AND hr.event_type = t.event_type
)
SELECT h AS bucket_start, event_type, n,
       last_value(avg_x100 IGNORE NULLS) OVER (
         PARTITION BY event_type ORDER BY h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS locf_avg_x100
FROM filled
"""


QUERIES = {
    "asof_last_purchase": asof_last_purchase,
    "range_join_ship_latency": range_join_ship_latency,
    "stats_percentiles": stats_percentiles,
    "correlated_above_avg_orders": correlated_above_avg_orders,
    "ts_gapfill_locf": ts_gapfill_locf,
}

ORACLES = {
    "asof_last_purchase": ASOF_SQL,
    "range_join_ship_latency": RANGE_JOIN_SQL,
    "stats_percentiles": PERCENTILES_SQL,
    "correlated_above_avg_orders": CORRELATED_SQL,
    "ts_gapfill_locf": GAPFILL_SQL,
}
