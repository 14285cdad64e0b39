"""Data-profiling tier: the ANALYZE TABLE / column-statistics pass and
a contingency-table independence test — the "what is in this table"
operators an engine runs before planning and a data pipeline runs
before training (null screens, cardinality estimates, drift checks).

Every emitted value is engine-portable by construction: counts are
BIGINT, and min/max render through type-specific integer or string
forms (doubles become floor-cents, dates become ISO strings) — never a
double printed to text, which the two engines format differently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from clockpipe_spark.catalog import load_table

_PROFILE_TABLE = "orders"


def _repr_expr(c, dtype: T.DataType):
    """A deterministic string rendering applied to an ALREADY
    AGGREGATED native-typed value: raw for strings, decimal text for
    integers, floor-cents for doubles, ISO for dates/timestamps.
    NULL-safe (min/max of an all-null column).

    The aggregate runs on the native type and the rendering wraps the
    result — min(o_orderkey) then text, never min(text(o_orderkey)),
    whose lexicographic order reports '999' as a max above 1499
    (ADVICE r7). floor(x*100) is monotonic, so rendering after the
    native min/max equals the true floor-cents extreme."""
    if isinstance(dtype, T.StringType):
        return c
    if isinstance(dtype, (T.DoubleType, T.FloatType)):
        return F.floor(c * 100).cast("long").cast("string")
    if isinstance(dtype, T.DateType):
        return F.date_format(c, "yyyy-MM-dd")
    if isinstance(dtype, T.TimestampType):
        return F.date_format(c, "yyyy-MM-dd HH:mm:ss")
    return c.cast("string")


def profile_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-statistics profile of the orders table: per column its
    null count, exact distinct count, and NATIVE-TYPE min/max in a
    portable rendering — the ANALYZE-pass every optimizer keeps (the
    reference target's ClickHouse side stores the same per-part
    min/max; Spark's CBO stores these in the catalog).

    Plan shape (VERDICT r7 #6): nulls + min/max come from ONE full
    scan with no distinct aggregate; each exact count_distinct runs as
    its OWN single-distinct aggregation, which Catalyst rewrites to a
    two-phase hash aggregate — never the Expand (row multiplication x
    N distinct columns) that a multi-distinct agg plans. The per-column
    distinct scans are column-pruned parquet reads (one column each),
    and all partial results are 1-row frames broadcast-crossjoined
    back together, so no row data ever shuffles. Exact count_distinct
    is the correctness-gated choice here; approx_count_distinct (one
    scan, no rewrite needed) is the 100 TB default and is benched
    separately (approximate.py)."""
    df = load_table(spark, sf_dir, _PROFILE_TABLE)
    aggs, stack_parts = [], []
    for f in df.schema.fields:
        col = f.name
        aggs += [
            F.sum(F.col(col).isNull().cast("long")).alias(f"{col}__nulls"),
            _repr_expr(F.min(F.col(col)), f.dataType).alias(f"{col}__min"),
            _repr_expr(F.max(F.col(col)), f.dataType).alias(f"{col}__max"),
        ]
        stack_parts.append(
            f"'{col}', {col}__nulls, {col}__distinct, {col}__min, {col}__max"
        )
    wide = df.agg(*aggs)
    for f in df.schema.fields:
        one = df.agg(
            F.count_distinct(F.col(f.name)).alias(f"{f.name}__distinct")
        )
        wide = wide.crossJoin(F.broadcast(one))
    n = len(df.schema.fields)
    return wide.select(
        F.expr(
            f"stack({n}, {', '.join(stack_parts)}) AS "
            "(column_name, n_nulls, n_distinct, min_repr, max_repr)"
        )
    )


def _profile_oracle() -> str:
    # mirrors _repr_expr per column of the orders table; schema is
    # fixed by TESTDATA.md so the column list is static here. The
    # template wraps the NATIVE aggregate (min(c)/max(c)), matching
    # the Spark side's aggregate-then-render order.
    cols = {
        "o_orderkey": "CAST({c} AS VARCHAR)",
        "o_custkey": "CAST({c} AS VARCHAR)",
        "o_orderstatus": "{c}",
        "o_totalprice": "CAST(CAST(floor({c} * 100) AS BIGINT) AS VARCHAR)",
        "o_orderdate": "strftime({c}, '%Y-%m-%d %H:%M:%S')",
        "o_orderpriority": "{c}",
    }
    parts = []
    for c, tmpl in cols.items():
        rep_min = tmpl.format(c=f"min({c})")
        rep_max = tmpl.format(c=f"max({c})")
        parts.append(
            f"SELECT '{c}' AS column_name,"
            f" CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
            f"   AS n_nulls,"
            f" CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,"
            f" {rep_min} AS min_repr, {rep_max} AS max_repr"
            f" FROM {_PROFILE_TABLE}"
        )
    return " UNION ALL ".join(parts)


PROFILE_SQL = _profile_oracle()


def chi_square_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence scan over the (lang, source) contingency
    table of the documents corpus — the drift/bias check a curation
    pipeline runs to see whether sources skew per language.

    Exact integer arithmetic: with d = obs*N - row_tot*col_tot, each
    cell's chi-square contribution (obs - exp)^2 / exp equals
    d^2 / (N * row_tot * col_tot); d^2 * 1e6 is computed in
    DECIMAL(38,0) (DuckDB: HUGEINT) so the ppm-scaled contribution is
    exact for any corpus below ~1e9 docs (d <= N^2 must fit int64
    before the decimal widening). Output: per-cell observed, expected
    (ppm), contribution (ppm) — the summary statistic is the sum of a
    25-cell frame, left to the reader, so every number stays pinned.

    Plan: one (lang, source) hash aggregation; row/col totals are
    window sums over the tiny cell grid; nothing beyond the first
    aggregation touches corpus-sized data."""
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(F.count("*").alias("obs"))
    from pyspark.sql import Window

    row_w = Window.partitionBy("lang")
    col_w = Window.partitionBy("source")
    tot_w = Window.partitionBy()
    with_tot = cells.select(
        "lang",
        "source",
        "obs",
        F.sum("obs").over(row_w).alias("row_tot"),
        F.sum("obs").over(col_w).alias("col_tot"),
        F.sum("obs").over(tot_w).alias("n"),
    )
    d = F.col("obs") * F.col("n") - F.col("row_tot") * F.col("col_tot")
    return with_tot.select(
        "lang",
        "source",
        "obs",
        # DECIMAL(38,0)-widened like contrib_ppm (ADVICE r7): in
        # int64, row_tot * col_tot * 1e6 overflows past ~3e6 docs
        # while the DuckDB oracle auto-promotes to HUGEINT — the
        # widening keeps the Spark side exact to the same ~1e9-doc
        # envelope the docstring promises.
        F.expr(
            "CAST(CAST(row_tot AS DECIMAL(38,0)) * col_tot * 1000000"
            " div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"
        ).alias("expected_ppm"),
        F.expr(
            "CAST((CAST(obs * n - row_tot * col_tot AS DECIMAL(38,0))"
            " * (obs * n - row_tot * col_tot) * 1000000)"
            " div (CAST(n AS DECIMAL(38,0)) * row_tot * col_tot)"
            " AS BIGINT)"
        ).alias("contrib_ppm"),
    )


CHI_SQUARE_SQL = """
WITH cells AS (
  SELECT lang, source, count(*) AS obs FROM documents GROUP BY 1, 2
),
tot AS (
  SELECT lang, source, obs,
         sum(obs) OVER (PARTITION BY lang) AS row_tot,
         sum(obs) OVER (PARTITION BY source) AS col_tot,
         sum(obs) OVER () AS n
  FROM cells
)
SELECT lang, source, obs,
       CAST(row_tot * col_tot * 1000000 // (n * n) AS BIGINT) AS expected_ppm,
       CAST((obs * n - row_tot * col_tot)
            * (obs * n - row_tot * col_tot) * 1000000
            // (n * row_tot * col_tot) AS BIGINT) AS contrib_ppm
FROM tot
"""


_DRIFT_BIN_CENTS = 1 << 13  # fixed-width bins: 8192 cents per bucket


def dist_drift_l1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: per event type, the L1 distance (in
    ppm, i.e. total-variation x2e6) between the value histograms of
    the stream's first and second time halves — the deploy-time drift
    alarm an ML pipeline keeps on its feature streams. PSI's log-ratio
    is replaced by L1 so the statistic stays exact integer arithmetic
    (log of a count ratio is not engine-portable at the ulp level).

    The half boundary is the midpoint of [min ts, max ts] in integer
    microseconds (broadcast 1-row aggregate, never a collect); bins
    are fixed 8192-cent buckets, so histograms are mergeable and the
    binning never depends on the data beyond the scan. One (type, bin,
    half) aggregation, then a bin-grid-sized rollup; runs at scan
    speed at any corpus size."""
    events = load_table(spark, sf_dir, "events")
    # `div`, not `/2 + cast`: DuckDB CAST(x.5) rounds while Spark's
    # cast truncates — integer division floors identically in both
    bounds = events.agg(
        F.expr(
            "(min(unix_micros(ts)) + max(unix_micros(ts))) div 2L"
        ).alias("mid_us")
    )
    binned = events.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        (F.unix_micros("ts") > F.col("mid_us")).cast("int").alias("half"),
        F.expr(
            f"CAST(floor(value * 100) AS BIGINT) div {_DRIFT_BIN_CENTS}"
        ).alias("bin"),
    )
    cells = binned.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("c1"),
    )
    from pyspark.sql import Window

    tw = Window.partitionBy("event_type")
    with_tot = cells.select(
        "event_type",
        "bin",
        "c0",
        "c1",
        F.sum("c0").over(tw).alias("n0"),
        F.sum("c1").over(tw).alias("n1"),
    )
    # ppm shares per half; guard the degenerate all-in-one-half type
    diff = F.abs(
        F.expr("CASE WHEN n0 > 0 THEN c0 * 1000000L div n0 ELSE 0L END")
        - F.expr("CASE WHEN n1 > 0 THEN c1 * 1000000L div n1 ELSE 0L END")
    )
    return with_tot.groupBy("event_type").agg(
        F.max("n0").alias("n_first_half"),
        F.max("n1").alias("n_second_half"),
        F.count("*").alias("n_bins"),
        F.sum(diff).cast("bigint").alias("l1_ppm"),
    )


DRIFT_SQL = f"""
WITH bounds AS (
  SELECT CAST((min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS BIGINT) AS mid_us
  FROM events
),
binned AS (
  SELECT event_type,
         CAST(epoch_us(ts) > b.mid_us AS INT) AS half,
         CAST(floor(value * 100) AS BIGINT) // {_DRIFT_BIN_CENTS} AS bin
  FROM events, bounds b
),
cells AS (
  SELECT event_type, bin,
         sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS c0,
         sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS c1
  FROM binned GROUP BY 1, 2
),
tot AS (
  SELECT event_type, bin, c0, c1,
         sum(c0) OVER (PARTITION BY event_type) AS n0,
         sum(c1) OVER (PARTITION BY event_type) AS n1
  FROM cells
)
SELECT event_type,
       CAST(max(n0) AS BIGINT) AS n_first_half,
       CAST(max(n1) AS BIGINT) AS n_second_half,
       count(*) AS n_bins,
       CAST(sum(abs(
         (CASE WHEN n0 > 0 THEN c0 * 1000000 // n0 ELSE 0 END)
         - (CASE WHEN n1 > 0 THEN c1 * 1000000 // n1 ELSE 0 END)
       )) AS BIGINT) AS l1_ppm
FROM tot GROUP BY event_type
"""


def dq_constraint_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality constraint screen (the Deequ / dbt-test role): one
    row per declared rule with its violation count over the
    lineitem/orders pair — uniqueness of the (orderkey, linenumber)
    PK, referential integrity lineitem→orders, value-domain rules
    (non-negative quantity/price, discount within [0, 1]), and a
    cross-column rule (discounted price must not exceed list price).

    Each rule is a scan-speed conditional aggregate; the PK check is
    one groupBy on the key; the FK check a broadcast-able left anti
    join. Counts union into the rule report — at 100 TB every rule
    stays a single pass and the report is rule-count-sized."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    dup_pk = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("violations"))
        .select(F.lit("pk_unique_orderkey_linenumber").alias("rule"), "violations")
    )
    fk_orphans = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti")
        .agg(F.count("*").alias("violations"))
        .select(F.lit("fk_lineitem_orders").alias("rule"), "violations")
    )
    domain = li.agg(
        F.sum((F.col("l_quantity") < 0).cast("long")).alias("neg_qty"),
        F.sum((F.col("l_extendedprice") < 0).cast("long")).alias("neg_price"),
        F.sum(
            ((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).cast("long")
        ).alias("bad_discount"),
        F.sum(
            (
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
                > F.col("l_extendedprice")
            ).cast("long")
        ).alias("discount_inflates"),
    )
    domain_rows = domain.select(
        F.expr(
            "stack(4,"
            " 'domain_quantity_nonneg', neg_qty,"
            " 'domain_price_nonneg', neg_price,"
            " 'domain_discount_0_1', bad_discount,"
            " 'cross_discount_not_inflating', discount_inflates"
            ") AS (rule, violations)"
        )
    )
    return dup_pk.unionByName(fk_orphans).unionByName(domain_rows)


DQ_SQL = """
SELECT 'pk_unique_orderkey_linenumber' AS rule,
       CAST(coalesce(sum(c), 0) AS BIGINT) AS violations
FROM (
  SELECT count(*) AS c FROM lineitem
  GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1
)
UNION ALL
SELECT 'fk_lineitem_orders',
       CAST(count(*) AS BIGINT)
FROM lineitem l WHERE NOT EXISTS (
  SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey
)
UNION ALL
SELECT 'domain_quantity_nonneg',
       CAST(sum(CASE WHEN l_quantity < 0 THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'domain_price_nonneg',
       CAST(sum(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'domain_discount_0_1',
       CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END)
            AS BIGINT)
FROM lineitem
UNION ALL
SELECT 'cross_discount_not_inflating',
       CAST(sum(CASE WHEN l_extendedprice * (1 - l_discount) > l_extendedprice
                THEN 1 ELSE 0 END) AS BIGINT)
FROM lineitem
"""


def ts_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average value (TWAP): each observation
    holds until the next one, weighted by its holding duration in
    integer microseconds; the last observation of a user carries zero
    weight (nothing after it to hold over) — the standard irregular-
    series mean that a plain AVG gets wrong whenever sampling is
    bursty.

    One lead() window per user (the same keyed exchange the rest of
    the per-user battery shares); the weighted sum stays in integer
    cents x micros, divided once at the end (floor-div, so both
    engines agree). Users with a single event emit NULL (no interval)."""
    events = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    stepped = events.select(
        "user_id",
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
        (
            F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts")
        ).alias("hold_us"),
    ).filter(F.col("hold_us").isNotNull())
    # guard the all-zero-hold user (every event at one instant):
    # div-by-zero must yield NULL, not an ANSI abort. Overflow bound:
    # max_cents x user time range in µs must fit int64 (~3 years at
    # cents <= 1e5) — the per-user holds sum to the user's range.
    # Non-negative cents assumed (testdata: value >= 0); a negative
    # domain would need a floor-div shim because Spark div truncates
    # while DuckDB // floors.
    return stepped.groupBy("user_id").agg(
        F.count("*").alias("n_intervals"),
        F.sum("hold_us").alias("total_us"),
        F.expr(
            "CASE WHEN sum(hold_us) > 0"
            " THEN sum(cents * hold_us) div sum(hold_us) END"
        ).alias("twap_cents"),
    )


TWAP_SQL = """
WITH stepped AS (
  SELECT user_id,
         CAST(floor(value * 100) AS BIGINT) AS cents,
         lead(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) - epoch_us(ts) AS hold_us
  FROM events
)
SELECT user_id,
       count(*) AS n_intervals,
       CAST(sum(hold_us) AS BIGINT) AS total_us,
       CAST(CASE WHEN sum(hold_us) > 0
                 THEN sum(cents * hold_us) // sum(hold_us) END
            AS BIGINT) AS twap_cents
FROM stepped WHERE hold_us IS NOT NULL
GROUP BY user_id
"""


def fk_fanout_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality profile of the customer→orders FK: the
    log2-bucketed histogram of orders-per-customer, INCLUDING
    zero-order customers (the left-join blind spot a naive GROUP BY
    on the fact table misses) — what a planner consults to predict
    join fan-out and what a modeler reads to spot hub keys.

    floor(log2(n + 0.5)) buckets (the +0.5 keeps the argument off
    exact powers of two so a 1-ulp libm difference can never flip the
    floor — the corpus histogram's trick); n=0 lands in bucket -1.
    One left-join aggregation on the key + a bucket-grained rollup."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.sum(F.col("o_custkey").isNotNull().cast("long")).alias("n"))
    )
    bucket = F.floor(F.log2(F.col("n") + 0.5)).cast("long")
    return per_cust.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n_customers"),
        F.min("n").alias("min_orders"),
        F.max("n").alias("max_orders"),
        F.sum("n").alias("total_orders"),
    )


FK_FANOUT_SQL = """
WITH per_cust AS (
  SELECT c.c_custkey,
         CAST(sum(CASE WHEN o.o_custkey IS NULL THEN 0 ELSE 1 END) AS BIGINT)
             AS n
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
SELECT CAST(floor(log2(n + 0.5)) AS BIGINT) AS bucket,
       count(*) AS n_customers,
       min(n) AS min_orders,
       max(n) AS max_orders,
       CAST(sum(n) AS BIGINT) AS total_orders
FROM per_cust GROUP BY 1
"""


QUERIES = {
    "profile_table_stats": profile_table_stats,
    "dist_drift_l1": dist_drift_l1,
    "dq_constraint_violations": dq_constraint_violations,
    "ts_time_weighted_avg": ts_time_weighted_avg,
    "fk_fanout_histogram": fk_fanout_histogram,
    "chi_square_lang_source": chi_square_lang_source,
}

ORACLES = {
    "profile_table_stats": PROFILE_SQL,
    "dist_drift_l1": DRIFT_SQL,
    "dq_constraint_violations": DQ_SQL,
    "ts_time_weighted_avg": TWAP_SQL,
    "fk_fanout_histogram": FK_FANOUT_SQL,
    "chi_square_lang_source": CHI_SQUARE_SQL,
}
