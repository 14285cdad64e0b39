"""TPC-H battery completion (SURVEY.md §2.9): the 11 query SHAPES the
registry still lacked — q2 q4 q7 q8 q9 q11 q13 q15 q17 q20 q21.

The fixture has no partsupp table and lineitem carries no commit/receipt
dates, so where the canonical query touches those, a documented stand-in
preserves the SHAPE (the operator composition Catalyst must plan) while
staying oracle-checkable: min(l_extendedprice) per (part, supplier)
plays ps_supplycost, l_shipdate vs o_orderdate (+ interval) plays the
late-delivery predicates — the same substitution q16 already made for
supplier counts.

Hash discipline as everywhere: float aggregates ROUND()ed identically
on both engines, int/int ratios floor-scaled to ints, LIMIT always
under a tie-free ORDER BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clockpipe_spark.catalog import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated min-subquery — for each small part,
    the EUROPE supplier(s) offering the minimum cost. Cost stand-in:
    min(l_extendedprice) per (part, supplier). Plan: the per-part min is
    a groupBy re-joined on equality (Catalyst's decorrelation of the
    scalar subquery); dims broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") < 10)
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    # Both predicates COMMUTE with the correlated per-part min (the
    # subquery correlates on partkey over EU suppliers only, and the
    # part filter just selects which partkeys survive), so they push
    # BELOW the pair aggregation: semi-joins cut the agg input ~25x
    # (shuffle audit r14: 11.2 MB -> pair rows only for small parts x
    # EU suppliers). Join strategy is left to Catalyst/AQE — at bench
    # scale both filter sides broadcast; at 100 TB they shuffle, which
    # is then the right plan too.
    li_small = li.join(
        part.select("p_partkey"),
        li.l_partkey == F.col("p_partkey"),
        "left_semi",
    ).join(
        eu_supp.select("s_suppkey"),
        F.col("l_suppkey") == F.col("s_suppkey"),
        "left_semi",
    )
    ps = li_small.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("cost")
    )
    # min-per-part via window over the already-aggregated pair set —
    # replaces the groupBy+self-rejoin (one shuffle of the small pair
    # frame instead of an agg shuffle plus a join)
    w = Window.partitionBy("l_partkey")
    return (
        ps.withColumn("min_cost", F.min("cost").over(w))
        .filter(F.col("cost") == F.col("min_cost"))
        .join(eu_supp, F.col("l_suppkey") == eu_supp.s_suppkey)
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            F.round("cost", 2).alias("cost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


Q2_SQL = """
WITH ps AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice) AS cost
  FROM lineitem GROUP BY 1, 2
),
ps_eu AS (
  SELECT ps.*, s_name, s_acctbal, n_name
  FROM ps
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
)
SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey, p_type,
       round(cost, 2) AS cost
FROM ps_eu
JOIN part ON l_partkey = p_partkey
WHERE p_size < 10
  AND cost = (SELECT min(cost) FROM ps_eu i WHERE i.l_partkey = ps_eu.l_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join + priority histogram. Late-ship
    stand-in for commit<receipt: some lineitem shipped after the order
    date + 60 days. One semi-join on orderkey, then a tiny agg."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate <  TIMESTAMP '1996-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: two-nation bilateral trade — nation dim joined
    TWICE (supplier side, customer side) with a disjunctive pair
    predicate, grouped by both nations + ship year."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
       round(sum(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INT) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: market share — conditional-sum / total-sum per
    year for one supplier nation inside one customer region. The share
    is an int-stable floor-scaled ratio of two rounded sums."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("c_rkey")
    )
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(region), F.col("c_rkey") == region.r_regionkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0)),
                2,
            ).alias("nation_volume"),
            F.round(F.sum(vol), 2).alias("total_volume"),
        )
        .withColumn(
            "mkt_share_x10000",
            F.floor(F.col("nation_volume") / F.col("total_volume") * 10000),
        )
        .orderBy("o_year")
    )


Q8_SQL = """
WITH vols AS (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         round(sum(CASE WHEN n1.n_name = 'NATION_3'
                        THEN l_extendedprice * (1 - l_discount)
                        ELSE 0.0 END), 2) AS nation_volume,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_volume
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region   ON n2.n_regionkey = r_regionkey
  WHERE r_name = 'AMERICA'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate <  TIMESTAMP '1998-01-01'
  GROUP BY 1
)
SELECT o_year, nation_volume, total_volume,
       CAST(floor(nation_volume / total_volume * 10000) AS BIGINT)
         AS mkt_share_x10000
FROM vols
ORDER BY o_year
"""


def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation × year over a part-name
    substring filter. Profit stand-in (no ps_supplycost):
    extprice*(1-disc) - p_retailprice*qty*0.1."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity") * 0.1
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").alias("o_year"))
        .agg(F.round(F.sum(profit), 2).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


Q9_SQL = """
SELECT n_name AS nation, CAST(year(l_shipdate) AS INT) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)
                 - p_retailprice * l_quantity * 0.1), 2) AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE contains(p_name, 'widget')
GROUP BY n_name, year(l_shipdate)
ORDER BY nation, o_year DESC
"""


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: group-sum with a HAVING threshold that is a
    scalar subquery over the SAME aggregation (fraction of the global
    total). The scalar is a broadcast cross-join — one row against the
    grouped frame. Stock value stand-in: sum(extprice * qty) of one
    nation's suppliers' lineitems."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    base = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select("l_partkey", (F.col("l_extendedprice") * F.col("l_quantity")).alias("v"))
    )
    per_part = base.groupBy("l_partkey").agg(F.round(F.sum("v"), 2).alias("value"))
    total = base.agg((F.sum("v") * 0.001).alias("threshold"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .select("l_partkey", "value")
        .orderBy(F.col("value").desc(), "l_partkey")
    )


Q11_SQL = """
WITH base AS (
  SELECT l_partkey, l_extendedprice * l_quantity AS v
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_5'
)
SELECT l_partkey, round(sum(v), 2) AS value
FROM base
GROUP BY l_partkey
HAVING round(sum(v), 2) > (SELECT sum(v) * 0.001 FROM base)
ORDER BY value DESC, l_partkey
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: left outer join + double aggregation — orders
    per customer (zero included), then the histogram of those counts.
    Priority filter stands in for the comment LIKE exclusion."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: revenue view + max() scalar-subquery equality.
    Revenue is rounded BEFORE the max/equality so the comparison is
    engine-stable (raw double equality would hash-flip on summation
    order)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supp = _t(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue
JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated average — lineitems under 20% of
    their part's average quantity, for one brand; yearly revenue is the
    sum / 7, floor-scaled."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    avg_q = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_cut")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(avg_q, li.l_partkey == F.col("ap_key"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            F.floor(F.sum("l_extendedprice") / 7 * 100)
            .cast("bigint")
            .alias("avg_yearly_x100")
        )
    )


Q17_SQL = """
SELECT CAST(floor(sum(l_extendedprice) / 7 * 100) AS BIGINT) AS avg_yearly_x100
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#3'
  AND l_quantity < (
    SELECT 0.2 * avg(l_quantity) FROM lineitem i
    WHERE i.l_partkey = lineitem.l_partkey
  )
"""


def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN-subqueries with a half-of-sum
    threshold. Stand-in (no ps_availqty): suppliers of NATION_7 who
    shipped more than 10% of some 'cold' part's total quantity
    (the fixture's max per-supplier share is ~19%)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").startswith("cold"))
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    cold = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    per_sp = cold.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("sq")
    )
    per_part = cold.groupBy(F.col("l_partkey").alias("tp_key")).agg(
        (F.sum("l_quantity") * 0.1).alias("cut")
    )
    big_suppliers = (
        per_sp.join(per_part, per_sp.l_partkey == F.col("tp_key"))
        .filter(F.col("sq") > F.col("cut"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(big_suppliers, supp.s_suppkey == big_suppliers.l_suppkey, "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )


Q20_SQL = """
SELECT s_name, round(s_acctbal, 2) AS s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_7'
  AND s_suppkey IN (
    WITH cold AS (
      SELECT l_partkey, l_suppkey, l_quantity
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE 'cold%'
    )
    SELECT l_suppkey FROM cold
    GROUP BY l_partkey, l_suppkey
    HAVING sum(l_quantity) > (
      SELECT 0.1 * sum(l_quantity) FROM cold i WHERE i.l_partkey = cold.l_partkey
    )
  )
ORDER BY s_name
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: semi + anti SELF-joins on lineitem — the
    supplier is the ONLY late one on a multi-supplier finished order.
    Late stand-in: shipped > 30 days after the order date."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    l1 = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
        )
        .select(
            F.col("l_orderkey").alias("o_key"),
            F.col("l_suppkey").alias("s_key"),
        )
    )
    # another supplier contributed to the same order
    l2 = li.select(F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2"))
    with_other = l1.join(
        l2, (F.col("o_key") == F.col("o2")) & (F.col("s_key") != F.col("s2")),
        "left_semi",
    )
    # ...but no OTHER supplier was late on it
    l3 = l1.select(F.col("o_key").alias("o3"), F.col("s_key").alias("s3"))
    only_late = with_other.join(
        l3, (F.col("o_key") == F.col("o3")) & (F.col("s_key") != F.col("s3")),
        "left_anti",
    )
    return (
        only_late.join(F.broadcast(supp), F.col("s_key") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


Q21_SQL = """
WITH l1 AS (
  SELECT l_orderkey AS o_key, l_suppkey AS s_key
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
    AND l_shipdate > o_orderdate + INTERVAL 30 DAY
)
SELECT s_name, count(*) AS numwait
FROM l1
JOIN supplier ON s_key = s_suppkey
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.o_key AND l2.l_suppkey <> l1.s_key
  )
  AND NOT EXISTS (
    SELECT 1 FROM l1 i
    WHERE i.o_key = l1.o_key AND i.s_key <> l1.s_key
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q4_order_priority": q4_order_priority,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q9_product_type_profit": q9_product_type_profit,
    "q11_important_stock": q11_important_stock,
    "q13_customer_distribution": q13_customer_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q20_part_promotion": q20_part_promotion,
    "q21_waiting_suppliers": q21_waiting_suppliers,
}

ORACLES = {
    "q2_min_cost_supplier": Q2_SQL,
    "q4_order_priority": Q4_SQL,
    "q7_volume_shipping": Q7_SQL,
    "q8_market_share": Q8_SQL,
    "q9_product_type_profit": Q9_SQL,
    "q11_important_stock": Q11_SQL,
    "q13_customer_distribution": Q13_SQL,
    "q15_top_supplier": Q15_SQL,
    "q17_small_quantity_revenue": Q17_SQL,
    "q20_part_promotion": Q20_SQL,
    "q21_waiting_suppliers": Q21_SQL,
}
