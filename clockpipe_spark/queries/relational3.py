"""Relational battery, part 3: GROUPING SETS via the SQL API, and a
salted skew-join (results identical to the plain join — the salt is a
physical-plan device, which is exactly what the oracle proves)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clockpipe_spark.catalog import load_table
from clockpipe_spark.operators.skew import salted_join


def grouping_sets_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS through spark.sql — the engine's SQL front door
    (same Catalyst plan as the DataFrame API)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "gs_lineitem"
    )
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               round(sum(l_extendedprice), 2) AS sum_price,
               count(*) AS n
        FROM gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


GROUPING_SETS_SQL = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       round(sum(l_extendedprice), 2) AS sum_price,
       count(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


def skew_salted_user_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join of events (fact) to a per-user dimension, then
    aggregate — output must equal the unsalted join, which the DuckDB
    oracle computes the plain way."""
    events = load_table(spark, sf_dir, "events")
    user_dim = (
        events.groupBy("user_id")
        .agg(F.count("*").alias("user_events"))
    )
    joined = salted_join(
        events.select("event_id", "user_id", "event_type", "value"),
        user_dim,
        on=["user_id"],
        n_salts=8,
        salt_source="event_id",
    )
    return joined.groupBy("event_type").agg(
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.round(F.avg("user_events"), 4).alias("avg_user_events"),
        F.count("*").alias("n"),
    )


SKEW_SALTED_SQL = """
WITH user_dim AS (
  SELECT user_id, count(*) AS user_events FROM events GROUP BY user_id
)
SELECT event_type,
       round(sum(value), 2) AS sum_value,
       round(avg(user_events), 4) AS avg_user_events,
       count(*) AS n
FROM events JOIN user_dim USING (user_id)
GROUP BY event_type
"""


QUERIES = {
    "grouping_sets_lineitem": grouping_sets_lineitem,
    "skew_salted_user_revenue": skew_salted_user_revenue,
}

ORACLES = {
    "grouping_sets_lineitem": GROUPING_SETS_SQL,
    "skew_salted_user_revenue": SKEW_SALTED_SQL,
}
