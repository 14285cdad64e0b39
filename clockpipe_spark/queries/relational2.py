"""Relational battery, part 2: subquery shapes, HAVING, CASE
aggregation, disjunctive predicates, pivot — rounding out the replica
query surface (SURVEY.md §2.9)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clockpipe_spark.catalog import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: CASE aggregation — high/low priority line counts
    per return flag (the fixture lacks shipmode; returnflag stands in)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("bigint")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(high).alias("high_priority"),
            F.sum(1 - high).alias("low_priority"),
        )
    )


Q12_SQL = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS high_priority,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)
            AS BIGINT) AS low_priority
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_returnflag
"""


def q14_promo_revenue_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-sum ratio (promo share of revenue)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("STANDARD"), rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(F.sum(promo) * 100.0 / F.sum(rev), 4).alias("promo_pct"),
            F.count("*").alias("n_items"),
        )
    )


Q14_SQL = """
SELECT round(sum(CASE WHEN p_type LIKE 'STANDARD%'
                      THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
             * 100.0 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: DISTINCT-count per group with exclusion
    subquery (suppliers with negative balance excluded)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING on an aggregate, then join back to
    dimensions — customers' largest orders."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("total_qty", 2).alias("total_qty"),
        )
    )


Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey,
       o_orderdate AS orderdate,
       round(o_totalprice, 2) AS totalprice,
       round(total_qty, 2) AS total_qty
FROM (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
) big
JOIN orders   ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate batteries across the join."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#11") & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 20) & (F.col("p_size") <= 10))
        | ((F.col("p_brand") == "Brand#22") & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 30) & (F.col("p_size") <= 20))
        | ((F.col("p_brand") == "Brand#33") & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 40) & (F.col("p_size") <= 30))
    )
    return joined.filter(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count("*").alias("n_items"),
    )


Q19_SQL = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#11' AND l_quantity BETWEEN 1 AND 20 AND p_size <= 10)
   OR (p_brand = 'Brand#22' AND l_quantity BETWEEN 10 AND 30 AND p_size <= 20)
   OR (p_brand = 'Brand#33' AND l_quantity BETWEEN 20 AND 40 AND p_size <= 30)
"""


def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery (global average) + anti-join —
    well-funded customers who never placed an URGENT order."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    # Scalar subquery kept inside one plan: a 1-row aggregate broadcast
    # cross-joined against customer, instead of a driver-side .first()
    # round-trip (two jobs + a literal re-plan).
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("_avg_bal"))
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


Q22_SQL = """
SELECT c_nationkey, count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_bal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
"""


def subquery_in_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery shape: orders from top-spending-segment customers."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return (
        orders.join(building, orders.o_custkey == building.c_custkey, "left_semi")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), F.round(F.avg("o_totalprice"), 4).alias("avg_price"))
    )


SUBQUERY_IN_SQL = """
SELECT o_orderstatus, count(*) AS n, round(avg(o_totalprice), 4) AS avg_price
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
GROUP BY o_orderstatus
"""


def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts, status rows × priority columns."""
    orders = _t(spark, sf_dir, "orders")
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    df = (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", prios)
        .agg(F.count(F.lit(1)))  # '*' is not allowed inside Pivot
    )
    renames = {p: f"p{i+1}" for i, p in enumerate(prios)}
    for old, new in renames.items():
        df = df.withColumnRenamed(old, new)
    return df


PIVOT_SQL = """
SELECT o_orderstatus,
       count(*) FILTER (o_orderpriority = '1-URGENT')        AS p1,
       count(*) FILTER (o_orderpriority = '2-HIGH')          AS p2,
       count(*) FILTER (o_orderpriority = '3-MEDIUM')        AS p3,
       count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS p4,
       count(*) FILTER (o_orderpriority = '5-LOW')           AS p5
FROM orders GROUP BY o_orderstatus
"""


def window_frame_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit ROWS frame: centered 7-row moving average of daily order
    totals — exercises bounded window frames."""
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(F.date_trunc("day", "o_orderdate").alias("day")).agg(
        F.sum("o_totalprice").alias("day_total")
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    return daily.select(
        "day",
        F.round("day_total", 2).alias("day_total"),
        F.round(F.avg("day_total").over(w), 4).alias("ma7"),
    )


WINDOW_FRAME_SQL = """
SELECT day, round(day_total, 2) AS day_total,
       round(avg(day_total) OVER (ORDER BY day
             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING), 4) AS ma7
FROM (
  SELECT date_trunc('day', o_orderdate) AS day, sum(o_totalprice) AS day_total
  FROM orders GROUP BY 1
)
"""


def ntile_customer_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile + rank battery over customer balances.

    The unpartitioned window is the SEMANTICS here — global quartiles
    need a total order — and is the known cost of this query class at
    scale. The scale-out variant (not this battery's contract) computes
    approx percentile bounds first and assigns tiles by range: one scan
    + a 3-value broadcast instead of a single-partition sort."""
    from pyspark.sql import Window

    cust = _t(spark, sf_dir, "customer")
    w = Window.orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return cust.select(
        "c_custkey",
        F.round("c_acctbal", 2).alias("acctbal"),
        F.ntile(4).over(w).alias("quartile"),
        F.rank().over(w).alias("rnk"),
    )


NTILE_SQL = """
SELECT c_custkey, round(c_acctbal, 2) AS acctbal,
       ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS quartile,
       rank()   OVER (ORDER BY c_acctbal DESC, c_custkey) AS rnk
FROM customer
"""


def array_agg_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collect + sort an array per group (array functions surface).

    The sorted array is emitted as a canonical comma-joined string: the
    driver's canonicalizer cannot hash list-typed cells (round-1 harness
    crash), and a deterministic string form is hash-stable on both sides.
    """
    cust = _t(spark, sf_dir, "customer")
    top = cust.filter(F.col("c_acctbal") > 9000)
    keys = F.array_sort(F.collect_list("c_custkey"))
    return top.groupBy("c_nationkey").agg(
        F.concat_ws(",", F.transform(keys, lambda x: x.cast("string"))).alias(
            "custkeys"
        ),
        F.count("*").alias("n"),
    )


ARRAY_AGG_SQL = """
SELECT c_nationkey,
       array_to_string(list_sort(list(c_custkey)), ',') AS custkeys,
       count(*) AS n
FROM customer WHERE c_acctbal > 9000
GROUP BY c_nationkey
"""


QUERIES = {
    "q12_shipmode_priority": q12_shipmode_priority,
    "q14_promo_revenue_pct": q14_promo_revenue_pct,
    "q16_supplier_part_counts": q16_supplier_part_counts,
    "q18_large_orders": q18_large_orders,
    "q19_disjunctive_predicates": q19_disjunctive_predicates,
    "q22_global_sales_opportunity": q22_global_sales_opportunity,
    "subquery_in_filter": subquery_in_filter,
    "pivot_status_by_priority": pivot_status_by_priority,
    "window_frame_moving_avg": window_frame_moving_avg,
    "ntile_customer_quartiles": ntile_customer_quartiles,
    "array_agg_per_nation": array_agg_per_nation,
}

ORACLES = {
    "q12_shipmode_priority": Q12_SQL,
    "q14_promo_revenue_pct": Q14_SQL,
    "q16_supplier_part_counts": Q16_SQL,
    "q18_large_orders": Q18_SQL,
    "q19_disjunctive_predicates": Q19_SQL,
    "q22_global_sales_opportunity": Q22_SQL,
    "subquery_in_filter": SUBQUERY_IN_SQL,
    "pivot_status_by_priority": PIVOT_SQL,
    "window_frame_moving_avg": WINDOW_FRAME_SQL,
    "ntile_customer_quartiles": NTILE_SQL,
    "array_agg_per_nation": ARRAY_AGG_SQL,
}
