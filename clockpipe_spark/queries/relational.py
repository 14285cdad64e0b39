"""The replica query surface (SURVEY.md §2.9): the standard relational
battery users run on the synced tables. All pure DataFrame/SQL built-ins —
Catalyst does pushdown/pruning/join planning; our job is breadth +
oracle-checked correctness.

Float aggregates are ROUND()ed identically on both engines so the driver's
value-hash is stable against summation-order noise (doubles at sf0.1 agree
to ~1e-10; rounding to 2-4 decimals absorbs that).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clockpipe_spark.catalog import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- TPC-H-shaped analytics ------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-agg over lineitem. One shuffle (groupBy
    on two low-cardinality keys), partial aggregation map-side."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                           AS sum_qty,
       round(sum(l_extendedprice), 2)                                      AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                   AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)     AS sum_charge,
       round(avg(l_quantity), 4)                                           AS avg_qty,
       round(avg(l_extendedprice), 4)                                      AS avg_price,
       round(avg(l_discount), 4)                                           AS avg_disc,
       count(*)                                                            AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + top-10. customer is tiny ->
    broadcast; orders⋈lineitem shuffles on orderkey only."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join. All dims broadcast; the only big
    shuffle is lineitem⋈orders on orderkey."""
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


Q5_SQL = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter+agg — checks predicate pushdown (all
    three filters reach the parquet scan) and map-side-only aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


Q6_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, c_acctbal, n_name, c_mktsegment,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-07-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --- join flavors -----------------------------------------------------------

def join_broadcast_brand_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast join: part (small dim) into lineitem (fact) —
    zero shuffle on the fact side."""
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
            F.count("*").alias("n_items"),
        )
    )


JOIN_BROADCAST_SQL = """
SELECT p_brand, round(sum(l_quantity), 2) AS total_qty, count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


def join_semi_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): customers that have at least one open order,
    counted per market segment."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


JOIN_SEMI_SQL = """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
GROUP BY c_mktsegment
"""


def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers with no 'F' order."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


JOIN_ANTI_SQL = """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
GROUP BY c_mktsegment
"""


# --- grouping sets / rollup / cube -------------------------------------------

def agg_rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus) with grouping-set labels."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count("*").alias("n_rows"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n_rows",
        )
    )


AGG_ROLLUP_SQL = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       count(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def agg_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.count("*").alias("n_orders"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "sum_price",
            "n_orders",
        )
    )


AGG_CUBE_SQL = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       round(sum(o_totalprice), 2) AS sum_price,
       count(*) AS n_orders
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# --- window functions ---------------------------------------------------------

def window_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number() per customer — top-3 orders by price. Deterministic
    tiebreak on o_orderkey so both engines rank identically."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("price"), "rn")
    )


WINDOW_TOP3_SQL = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
WHERE rn <= 3
"""


def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer over order time — explicit ROWS frame +
    unique order key so the prefix sums agree bit-for-bit across engines."""
    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


WINDOW_RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
FROM orders
"""


def window_lag_event_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() per user: value delta between consecutive events."""
    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    return events.select(
        "user_id",
        "event_id",
        F.round(F.col("value") - F.lag("value").over(w), 2).alias("value_delta"),
    )


WINDOW_LAG_SQL = """
SELECT user_id, event_id,
       round(value - lag(value) OVER (PARTITION BY user_id ORDER BY event_id), 2)
           AS value_delta
FROM events
"""


# --- sorts / top-k / set ops ---------------------------------------------------

def topk_orders_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 — Spark plans TakeOrderedAndProject (no full sort)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .select("o_orderkey", F.round("o_totalprice", 2).alias("price"))
        .limit(10)
    )


TOPK_SQL = """
SELECT o_orderkey, round(o_totalprice, 2) AS price
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def setop_active_both_statuses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers with both an 'O' and an 'F' order."""
    orders = _t(spark, sf_dir, "orders")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return o.intersect(f)


SETOP_INTERSECT_SQL = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
"""


def setop_only_open_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customers with an 'O' order but no 'F' order."""
    orders = _t(spark, sf_dir, "orders")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return o.exceptAll(f).distinct()


SETOP_EXCEPT_SQL = """
SELECT DISTINCT o_custkey FROM (
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
  EXCEPT ALL
  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
)
"""


def setop_union_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two customer segments."""
    cust = _t(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.filter(F.col("c_mktsegment") == "MACHINERY").select("c_custkey")
    return a.union(b).distinct()


SETOP_UNION_SQL = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
UNION
SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
"""


# --- scalar function battery ----------------------------------------------------

def scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar path over the events props column (kept as string,
    exactly like the reference keeps json/jsonb as String, §1.3)."""
    events = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        events.groupBy("event_type")
        .agg(
            F.sum(k).alias("sum_k"),
            F.count_distinct(F.col("user_id")).alias("n_users"),
        )
    )


SCALAR_JSON_SQL = """
SELECT event_type,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


def scalar_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar battery: truncation + extraction over events."""
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_trunc("day", "ts").alias("day"),
            F.dayofweek("ts").alias("dow"),
        )
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 4).alias("avg_value"))
    )


SCALAR_DATE_SQL = """
SELECT date_trunc('day', ts) AS day,
       dayofweek(ts) + 1 AS dow,
       count(*) AS n, round(avg(value), 4) AS avg_value
FROM events GROUP BY 1, 2
"""


def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar battery over part: case, substring, replace, length,
    concat."""
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
    )


SCALAR_STRING_SQL = """
SELECT p_partkey,
       upper(p_brand)            AS brand_upper,
       substring(p_name, 1, 5)   AS name_prefix,
       replace(p_type, ' ', '_') AS type_snake,
       length(p_name)            AS name_len,
       concat_ws('|', p_brand, p_type) AS brand_type
FROM part
"""


def distinct_users_per_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) per group (the approx variant is
    approx_distinct_users — rows-only checked, HLL sketches differ by
    engine)."""
    events = _t(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users")
    )


DISTINCT_USERS_SQL = """
SELECT event_type, count(DISTINCT user_id) AS n_users FROM events GROUP BY event_type
"""


def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++). No value-oracle: sketch estimates are
    engine-specific; correctness bounded-error-tested in pytest instead."""
    events = _t(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users")
    )


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "q6_revenue_forecast": q6_revenue_forecast,
    "q10_returned_items": q10_returned_items,
    "join_broadcast_brand_volume": join_broadcast_brand_volume,
    "join_semi_customers_with_orders": join_semi_customers_with_orders,
    "join_anti_customers_without_orders": join_anti_customers_without_orders,
    "agg_rollup_lineitem": agg_rollup_lineitem,
    "agg_cube_orders": agg_cube_orders,
    "window_top3_orders_per_customer": window_top3_orders_per_customer,
    "window_running_revenue": window_running_revenue,
    "window_lag_event_delta": window_lag_event_delta,
    "topk_orders_by_price": topk_orders_by_price,
    "setop_active_both_statuses": setop_active_both_statuses,
    "setop_only_open_customers": setop_only_open_customers,
    "setop_union_segments": setop_union_segments,
    "scalar_json_extract": scalar_json_extract,
    "scalar_date_parts": scalar_date_parts,
    "scalar_string_funcs": scalar_string_funcs,
    "distinct_users_per_event_type": distinct_users_per_event_type,
    "approx_distinct_users": approx_distinct_users,
}

ORACLES = {
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q5_local_supplier_volume": Q5_SQL,
    "q6_revenue_forecast": Q6_SQL,
    "q10_returned_items": Q10_SQL,
    "join_broadcast_brand_volume": JOIN_BROADCAST_SQL,
    "join_semi_customers_with_orders": JOIN_SEMI_SQL,
    "join_anti_customers_without_orders": JOIN_ANTI_SQL,
    "agg_rollup_lineitem": AGG_ROLLUP_SQL,
    "agg_cube_orders": AGG_CUBE_SQL,
    "window_top3_orders_per_customer": WINDOW_TOP3_SQL,
    "window_running_revenue": WINDOW_RUNNING_SQL,
    "window_lag_event_delta": WINDOW_LAG_SQL,
    "topk_orders_by_price": TOPK_SQL,
    "setop_active_both_statuses": SETOP_INTERSECT_SQL,
    "setop_only_open_customers": SETOP_EXCEPT_SQL,
    "setop_union_segments": SETOP_UNION_SQL,
    "scalar_json_extract": SCALAR_JSON_SQL,
    "scalar_date_parts": SCALAR_DATE_SQL,
    "scalar_string_funcs": SCALAR_STRING_SQL,
    "distinct_users_per_event_type": DISTINCT_USERS_SQL,
    # approx_distinct_users: intentionally no oracle (engine-specific sketch)
}
