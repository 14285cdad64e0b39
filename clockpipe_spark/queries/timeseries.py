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


_FUNNEL_WINDOW_H = 24


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (ClickHouse ``windowFunnel`` analog):
    per user, how far through view -> click -> purchase they got, each
    step at-or-after the previous and the whole chain within 24 h of
    the first step. Earliest-qualifying-timestamp semantics per step
    (min-chain), the standard product-analytics funnel.

    Shape: one aggregation per step, each joined back on user_id — all
    shuffles share the user_id key, so at scale AQE plans them as
    co-partitioned exchanges over the (small) per-user step table; the
    fact stream is scanned once per step with its filter pushed down."""
    events = load_table(spark, sf_dir, "events")
    deadline = F.col("s1") + F.expr(f"INTERVAL {_FUNNEL_WINDOW_H} HOURS")
    s1 = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s1"))
    )
    s2 = (
        events.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter((F.col("ts") >= F.col("s1")) & (F.col("ts") <= deadline))
        .groupBy("user_id")
        .agg(F.min("ts").alias("s2"))
    )
    s3 = (
        events.filter(F.col("event_type") == "purchase")
        .join(s2.join(s1, "user_id"), "user_id")
        .filter((F.col("ts") >= F.col("s2")) & (F.col("ts") <= deadline))
        .groupBy("user_id")
        .agg(F.min("ts").alias("s3"))
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            "user_id",
            (
                F.lit(1)
                + F.when(F.col("s2").isNotNull(), 1).otherwise(0)
                + F.when(F.col("s3").isNotNull(), 1).otherwise(0)
            ).alias("steps_completed"),
        )
        .orderBy("user_id")
    )


FUNNEL_SQL = f"""
WITH s1 AS (
  SELECT user_id, min(ts) AS s1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS s2
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts >= s1.s1
    AND e.ts <= s1.s1 + INTERVAL {_FUNNEL_WINDOW_H} HOUR
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS s3
  FROM events e JOIN s2 USING (user_id) JOIN s1 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= s2.s2
    AND e.ts <= s1.s1 + INTERVAL {_FUNNEL_WINDOW_H} HOUR
  GROUP BY e.user_id
)
SELECT s1.user_id,
       1 + (s2.user_id IS NOT NULL)::INT + (s3.user_id IS NOT NULL)::INT
           AS steps_completed
FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
ORDER BY user_id
"""


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention (ClickHouse ``retention()`` analog): users
    cohorted by signup day; a user retains at day N when ANY event of
    theirs lands in [first_signup + N days, first_signup + N+1 days).
    Reports cohort size and day-1 / day-7 retained counts.

    Shape: first-signup aggregation, one co-partitioned join back to
    the fact stream, conditional aggregation per user, then the
    (tiny) cohort rollup."""
    events = load_table(spark, sf_dir, "events")
    first = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"))
    )

    def in_day(n: int):
        lo = F.col("first_ts") + F.expr(f"INTERVAL {n} DAYS")
        hi = F.col("first_ts") + F.expr(f"INTERVAL {n + 1} DAYS")
        return (F.col("ts") >= lo) & (F.col("ts") < hi)

    per_user = (
        events.join(first, "user_id")
        .groupBy("user_id", "first_ts")
        .agg(
            F.max(in_day(1).cast("int")).alias("d1"),
            F.max(in_day(7).cast("int")).alias("d7"),
        )
    )
    return (
        per_user.groupBy(F.date_trunc("day", F.col("first_ts")).alias("cohort_day"))
        .agg(
            F.count("*").alias("n_users"),
            F.sum("d1").alias("n_day1"),
            F.sum("d7").alias("n_day7"),
        )
        .orderBy("cohort_day")
    )


RETENTION_SQL = """
WITH first AS (
  SELECT user_id, min(ts) AS first_ts FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
per_user AS (
  SELECT e.user_id, f.first_ts,
         max(CASE WHEN e.ts >= f.first_ts + INTERVAL 1 DAY
                   AND e.ts <  f.first_ts + INTERVAL 2 DAY
                  THEN 1 ELSE 0 END) AS d1,
         max(CASE WHEN e.ts >= f.first_ts + INTERVAL 7 DAY
                   AND e.ts <  f.first_ts + INTERVAL 8 DAY
                  THEN 1 ELSE 0 END) AS d7
  FROM events e JOIN first f USING (user_id)
  GROUP BY e.user_id, f.first_ts
)
SELECT date_trunc('day', first_ts) AS cohort_day, count(*) AS n_users,
       CAST(sum(d1) AS BIGINT) AS n_day1, CAST(sum(d7) AS BIGINT) AS n_day7
FROM per_user GROUP BY 1 ORDER BY 1
"""


_SESSION_GAP_MIN = 30


def sessionize_lag_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization by inactivity gap (the lag/cumsum idiom):
    a user's events split into sessions wherever the gap from the
    previous event reaches 30 minutes (>= gap, matching
    F.session_window's half-open [t, t+gap) semantics — pinned equal in
    tests); per session — ordinal, event count, duration. The batch complement of the watermarked session
    windows (streaming/windows.py): identical session boundaries,
    derived from plain window functions instead of streaming state.

    Shape: one shuffle on user_id for the lag/cumsum windows, then a
    per-(user, session) aggregation on the same key — co-partitioned,
    no second exchange of the fact stream."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond integers on both engines: DuckDB's epoch() is a DOUBLE
    # with fractional seconds while a Spark long cast truncates — micros
    # keep the gap comparison and durations integer-exact
    us = F.unix_micros(F.col("ts"))
    gap_us = us - F.lag(us).over(w)
    new_sess = (
        F.when(
            gap_us.isNull() | (gap_us >= _SESSION_GAP_MIN * 60 * 1_000_000), 1
        ).otherwise(0)
    )
    sessions = events.withColumn("session_idx", F.sum(new_sess).over(w)).withColumn(
        "us", us
    )
    return (
        sessions.groupBy("user_id", "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            ((F.max("us") - F.min("us")) / F.lit(1_000_000))
            .cast("long")
            .alias("duration_s"),
        )
        # no final orderBy (r15): session-level pipeline output — the
        # sampler re-ran the lag-gap window chain
    )


SESSIONIZE_SQL = f"""
WITH gaps AS (
  SELECT user_id, event_id, ts,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS gap_us
  FROM events
),
marked AS (
  SELECT user_id, ts,
         -- CAST: DuckDB window SUM yields HUGEINT (int128 -> float64 in
         -- pandas) while Spark emits BIGINT; the driver hash is
         -- representation-sensitive, so pin the oracle to BIGINT
         CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us >= {_SESSION_GAP_MIN * 60 * 1_000_000}
                  THEN 1 ELSE 0 END) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS BIGINT) AS session_idx
  FROM gaps
)
SELECT user_id, session_idx, count(*) AS n_events,
       CAST((max(epoch_us(ts)) - min(epoch_us(ts))) // 1000000 AS BIGINT)
           AS duration_s
FROM marked GROUP BY user_id, session_idx
ORDER BY user_id, session_idx
"""


def stats_regression_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical-aggregate battery (the §2.9 family beyond plain
    avg/stddev): per returnflag over lineitem — Pearson correlation,
    sample covariance/stddev, and the least-squares slope/intercept of
    extendedprice on quantity. All JVM built-ins in Spark and native
    aggregates in DuckDB; floor-scaled to dodge float-sum ties."""
    li = load_table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.floor(F.corr(x, y) * 1e6).cast("bigint").alias("corr_x1e6"),
            F.floor(F.covar_samp(x, y) * 100).cast("bigint").alias("covar_x100"),
            F.floor(F.stddev_samp(y) * 100).cast("bigint").alias("stddev_price_x100"),
            F.floor(F.regr_slope(y, x) * 1e4).cast("bigint").alias("slope_x1e4"),
            F.floor(F.regr_intercept(y, x) * 100).cast("bigint").alias("icept_x100"),
        )
        .orderBy("l_returnflag")
    )


STATS_REGRESSION_SQL = """
SELECT l_returnflag, count(*) AS n,
       CAST(floor(corr(l_quantity, l_extendedprice) * 1000000) AS BIGINT)
           AS corr_x1e6,
       CAST(floor(covar_samp(l_quantity, l_extendedprice) * 100) AS BIGINT)
           AS covar_x100,
       CAST(floor(stddev_samp(l_extendedprice) * 100) AS BIGINT)
           AS stddev_price_x100,
       CAST(floor(regr_slope(l_extendedprice, l_quantity) * 10000) AS BIGINT)
           AS slope_x1e4,
       CAST(floor(regr_intercept(l_extendedprice, l_quantity) * 100) AS BIGINT)
           AS icept_x100
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


QUERIES = {
    "asof_last_purchase": asof_last_purchase,
    "range_join_ship_latency": range_join_ship_latency,
    "stats_percentiles": stats_percentiles,
    "correlated_above_avg_orders": correlated_above_avg_orders,
    "ts_gapfill_locf": ts_gapfill_locf,
    "funnel_conversion": funnel_conversion,
    "retention_cohorts": retention_cohorts,
    "sessionize_lag_gap": sessionize_lag_gap,
    "stats_regression_battery": stats_regression_battery,
}

ORACLES = {
    "asof_last_purchase": ASOF_SQL,
    "range_join_ship_latency": RANGE_JOIN_SQL,
    "stats_percentiles": PERCENTILES_SQL,
    "correlated_above_avg_orders": CORRELATED_SQL,
    "ts_gapfill_locf": GAPFILL_SQL,
    "funnel_conversion": FUNNEL_SQL,
    "retention_cohorts": RETENTION_SQL,
    "sessionize_lag_gap": SESSIONIZE_SQL,
    "stats_regression_battery": STATS_REGRESSION_SQL,
}


def ts_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-user anomaly detection: flag events whose absolute
    deviation from the user's median value exceeds 3x the median
    absolute deviation (MAD) — the outlier rule monitoring pipelines
    run on metric replicas (robust to the outliers themselves, unlike
    z-scores). Exact medians via percentile().

    Cross-engine exactness: values are floor-scaled to integer cents
    and DOUBLED before each median, so even-count interpolation lands
    on exact integers in both engines (midpoint of two even ints) —
    Spark's (1-f)*a + f*b and DuckDB's a + (b-a)*f differ by ulps on
    arbitrary doubles but are exact here. The outlier comparison
    adev4 > 3*mad4 is pure int64 arithmetic: no float boundary can
    flip between engines.

    Shape: two co-partitioned aggregations on user_id + one grid-sized
    broadcast-back join — the fact stream shuffles once."""
    events = load_table(spark, sf_dir, "events")
    base = events.select(
        "user_id", (F.floor(F.col("value") * 100) * 2).cast("long").alias("v2")
    )
    med = base.groupBy("user_id").agg(
        F.expr("percentile(v2, 0.5)").alias("med2"), F.count("*").alias("n")
    )
    dev = base.join(med, "user_id").withColumn(
        "adev4", (F.abs(F.col("v2") - F.col("med2")) * 2).cast("long")
    )
    mad = dev.groupBy("user_id").agg(F.expr("percentile(adev4, 0.5)").alias("mad4"))
    return (
        dev.join(mad, "user_id")
        .groupBy("user_id")
        .agg(
            F.max("n").alias("n"),
            F.max(F.col("med2").cast("long")).alias("med2"),
            F.max(F.col("mad4").cast("long")).alias("mad4"),
            F.sum(
                (F.col("adev4") > 3 * F.col("mad4")).cast("int")
            ).cast("long").alias("n_outliers"),
        )
        # no final orderBy (r15): per-user pipeline scores — the
        # sampler re-ran the MAD window cascade
    )


TS_ANOMALY_SQL = """
WITH base AS (
  SELECT user_id, CAST(floor(value * 100) * 2 AS BIGINT) AS v2 FROM events
),
med AS (
  SELECT user_id, quantile_cont(v2, 0.5) AS med2, count(*) AS n
  FROM base GROUP BY user_id
),
dev AS (
  SELECT b.user_id, CAST(abs(b.v2 - m.med2) * 2 AS BIGINT) AS adev4,
         m.med2, m.n
  FROM base b JOIN med m USING (user_id)
),
mad AS (
  SELECT user_id, quantile_cont(adev4, 0.5) AS mad4 FROM dev GROUP BY user_id
)
SELECT d.user_id, CAST(max(d.n) AS BIGINT) AS n,
       CAST(max(d.med2) AS BIGINT) AS med2,
       CAST(max(m.mad4) AS BIGINT) AS mad4,
       CAST(sum(CASE WHEN d.adev4 > 3 * m.mad4 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_outliers
FROM dev d JOIN mad m USING (user_id)
GROUP BY d.user_id ORDER BY d.user_id
"""


QUERIES["ts_anomaly_mad"] = ts_anomaly_mad
ORACLES["ts_anomaly_mad"] = TS_ANOMALY_SQL
