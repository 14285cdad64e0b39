"""Time-series operators: as-of join, keyed range join, percentiles,
correlated scalar subquery — the custom-operator tier the reference's
users would run on the replica."""

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


QUERIES = {
    "asof_last_purchase": asof_last_purchase,
    "range_join_ship_latency": range_join_ship_latency,
    "stats_percentiles": stats_percentiles,
    "correlated_above_avg_orders": correlated_above_avg_orders,
}

ORACLES = {
    "asof_last_purchase": ASOF_SQL,
    "range_join_ship_latency": RANGE_JOIN_SQL,
    "stats_percentiles": PERCENTILES_SQL,
    "correlated_above_avg_orders": CORRELATED_SQL,
}
