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


def lateral_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW / explode: top-20 most frequent document tokens
    (deterministic tiebreak on the token)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("token")
    )
    return (
        toks.groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(20)
    )


LATERAL_SQL = r"""
SELECT token, count(*) AS n
FROM (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
  FROM documents
)
GROUP BY token
ORDER BY n DESC, token
LIMIT 20
"""


def pg_array_literal_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 array path as a driver-gated query: build PG-style array
    literals from part columns, parse with the engine's
    pg_array_parse, return elements + cardinality."""
    from clockpipe_spark.functions.casts import pg_array_parse

    part = load_table(spark, sf_dir, "part")
    literal = F.concat(
        F.lit("{"), F.col("p_brand"), F.lit(","), F.col("p_type"), F.lit("}")
    )
    arr = pg_array_parse(literal)
    return part.select(
        "p_partkey",
        F.size(arr).alias("n_elems"),
        F.element_at(arr, 1).alias("elem1"),
        F.element_at(arr, 2).alias("elem2"),
    )


PG_ARRAY_SQL = """
SELECT p_partkey,
       len(string_split(p_brand || ',' || p_type, ',')) AS n_elems,
       string_split(p_brand || ',' || p_type, ',')[1] AS elem1,
       string_split(p_brand || ',' || p_type, ',')[2] AS elem2
FROM part
"""


def window_function_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead / first_value / last_value / percent_rank in one pass over
    per-customer order history."""
    orders = load_table(spark, sf_dir, "orders")
    # selectExpr strings (r21, guide §1.2 driver boundary): same trees,
    # parsed JVM-side in one call (plan_equiv-verified + oracle hash)
    w = "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey"
    wf = f"{w} ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING"
    return orders.selectExpr(
        "o_custkey",
        "o_orderkey",
        f"lead(o_orderkey) OVER ({w}) AS next_orderkey",
        f"first_value(o_orderkey) OVER ({wf}) AS first_orderkey",
        f"last_value(o_orderkey) OVER ({wf}) AS last_orderkey",
        f"round(percent_rank() OVER ({w}), 6) AS pct_rank",
    )


WINDOW_BATTERY_SQL = """
SELECT o_custkey, o_orderkey,
       lead(o_orderkey) OVER w AS next_orderkey,
       first_value(o_orderkey) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND UNBOUNDED FOLLOWING) AS first_orderkey,
       last_value(o_orderkey)  OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND UNBOUNDED FOLLOWING) AS last_orderkey,
       round(percent_rank() OVER w, 6) AS pct_rank
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def scalar_math_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math + conditional scalar battery over lineitem.

    Transcendental outputs are emitted as floor(x * 1e6) integers, not
    round(x, 6) doubles: round() half-even/half-away tie handling differs
    between Spark and DuckDB at the 6th decimal and flips hashes on a
    handful of the 60k rows (round-1 driver failure)."""
    li = load_table(spark, sf_dir, "lineitem")
    # selectExpr strings (r21, guide §1.2): same trees, one parse call
    # (plan_equiv-verified + oracle hash)
    return li.selectExpr(
        "l_orderkey",
        "l_linenumber",
        "floor(sqrt(abs(l_extendedprice)) * 1.0E6) AS sqrt_price",
        "floor(ln(l_quantity + 1) * 1.0E6) AS log_qty",
        "floor(pow(l_discount, 2) * 1.0E6) AS disc_sq",
        "ceil(l_quantity) AS qty_ceil",
        "floor(l_tax * 100) AS tax_pct_floor",
        "CAST(signum(l_quantity - 25) AS INT) AS qty_sign",
        "nullif(l_returnflag, 'N') AS flag_or_null",
        "coalesce(nullif(l_linestatus, 'O'), 'open') AS status_label",
    )


SCALAR_MATH_SQL = """
SELECT l_orderkey, l_linenumber,
       CAST(floor(sqrt(abs(l_extendedprice)) * 1000000) AS BIGINT) AS sqrt_price,
       CAST(floor(ln(l_quantity + 1) * 1000000) AS BIGINT)         AS log_qty,
       CAST(floor(pow(l_discount, 2) * 1000000) AS BIGINT)         AS disc_sq,
       CAST(ceil(l_quantity) AS BIGINT)     AS qty_ceil,
       CAST(floor(l_tax * 100) AS BIGINT)   AS tax_pct_floor,
       CAST(sign(l_quantity - 25) AS INT)   AS qty_sign,
       nullif(l_returnflag, 'N')            AS flag_or_null,
       coalesce(nullif(l_linestatus, 'O'), 'open') AS status_label
FROM lineitem
"""


def scalar_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL scalar battery (ClickHouse URL-function family: domain(),
    path(), extractURLParameter()): a deterministic URL is synthesized
    per document, then decomposed with Spark's built-in ``parse_url``
    (HOST / PATH / QUERY / per-parameter). The DuckDB oracle rebuilds
    the same URL and decomposes it with INDEPENDENT regexps — a
    parse_url that mishandles any component fails the hash. Pure
    projection, scan speed."""
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/"),
        F.col("lang"),
        F.lit("/doc/"),
        F.col("doc_id").cast("string"),
        F.lit("?ref="),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("&tag="),
        F.col("lang"),
    )
    with_url = docs.select("doc_id", url.alias("url"))
    return with_url.select(
        "doc_id",
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY")).alias("query"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("ref")).alias("ref_param"),
        F.regexp_extract(
            F.parse_url(F.col("url"), F.lit("HOST")), r"([^.]+\.[^.]+)$", 1
        ).alias("registered_domain"),
    )


SCALAR_URL_SQL = """
WITH u AS (
  SELECT doc_id,
         'https://' || source || '.example.com/' || lang || '/doc/' ||
         CAST(doc_id AS VARCHAR) || '?ref=' || CAST(doc_id % 7 AS VARCHAR) ||
         '&tag=' || lang AS url
  FROM documents
)
SELECT doc_id,
       regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
       regexp_extract(url, '^https?://[^/?#]+([^?#]*)', 1) AS path,
       regexp_extract(url, '\\?([^#]*)', 1) AS query,
       regexp_extract(url, '[?&]ref=([^&#]*)', 1) AS ref_param,
       regexp_extract(regexp_extract(url, '^https?://([^/?#]+)', 1),
                      '([^.]+\\.[^.]+)$', 1) AS registered_domain
FROM u
"""


def window_range_time_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE frame (the time-windowed running aggregate rows
    frames cannot express): per user, count and cents-sum of events in
    the PRECEDING HOUR of each event — frame membership decided by
    timestamp distance, not row position, so bursts widen the frame and
    quiet periods shrink it. Ordered on integer microseconds in both
    engines (RANGE peers = equal-ts events included wholly, identical
    tie semantics); cents keep the running sum exact.

    Shape: one shuffle on user_id, then a single sorted range-frame
    pass per partition — the same budget as any lag/cumsum window."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, 0)
    )
    cents = F.floor(F.col("value") * 100).cast("long")
    return events.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_last_hour"),
        F.sum(cents).over(w).alias("sum_cents_last_hour"),
    ).orderBy("event_id")


WINDOW_RANGE_TIME_SQL = """
SELECT event_id, user_id,
       count(*) OVER w AS n_last_hour,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER w AS BIGINT)
           AS sum_cents_last_hour
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY epoch_us(ts)
  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
)
ORDER BY event_id
"""


def scalar_bitops_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar surface (ClickHouse bitAnd/bitOr/bitXor/
    bitShift*/bitCount family): AND/OR/XOR against masks, shifts, and
    popcount over the event id/user id pair, plus the bucket-by-
    low-bits idiom (id & 1023) every hash-partitioned pipeline uses.
    DuckDB's ``^`` is exponentiation, so the oracle spells xor();
    Spark's SQL ``^`` is xor — a classic cross-engine quirk this
    battery pins. Pure projection, whole-stage codegen, scan speed."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.expr("event_id & user_id").alias("bit_and"),
        F.expr("event_id | user_id").alias("bit_or"),
        F.expr("event_id ^ user_id").alias("bit_xor"),
        F.expr("~event_id").alias("bit_not"),
        F.expr("shiftleft(user_id, 3)").alias("shl3"),
        F.expr("shiftright(event_id, 2)").alias("shr2"),
        F.bit_count("event_id").alias("popcount"),
        F.expr("event_id & 1023").alias("bucket_lo10"),
        F.expr("cast(event_id & -event_id as bigint)").alias("lowest_set_bit"),
    )


SCALAR_BITOPS_SQL = """
SELECT event_id,
       event_id & user_id AS bit_and,
       event_id | user_id AS bit_or,
       xor(event_id, user_id) AS bit_xor,
       ~event_id AS bit_not,
       user_id << 3 AS shl3,
       event_id >> 2 AS shr2,
       CAST(bit_count(event_id) AS INT) AS popcount,
       event_id & 1023 AS bucket_lo10,
       event_id & -event_id AS lowest_set_bit
FROM events
"""


QUERIES = {
    "scalar_bitops_battery": scalar_bitops_battery,
    "window_range_time_frame": window_range_time_frame,
    "window_function_battery": window_function_battery,
    "scalar_math_battery": scalar_math_battery,
    "grouping_sets_lineitem": grouping_sets_lineitem,
    "skew_salted_user_revenue": skew_salted_user_revenue,
    "lateral_explode_tokens": lateral_explode_tokens,
    "pg_array_literal_parse": pg_array_literal_parse,
    "scalar_url_parse": scalar_url_parse,
}

ORACLES = {
    "scalar_bitops_battery": SCALAR_BITOPS_SQL,
    "window_range_time_frame": WINDOW_RANGE_TIME_SQL,
    "window_function_battery": WINDOW_BATTERY_SQL,
    "scalar_math_battery": SCALAR_MATH_SQL,
    "grouping_sets_lineitem": GROUPING_SETS_SQL,
    "skew_salted_user_revenue": SKEW_SALTED_SQL,
    "lateral_explode_tokens": LATERAL_SQL,
    "pg_array_literal_parse": PG_ARRAY_SQL,
    "scalar_url_parse": SCALAR_URL_SQL,
}
