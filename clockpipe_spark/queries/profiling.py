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


def _repr_col(col: str, dtype: T.DataType):
    """A deterministic string rendering for min/max: raw for strings,
    decimal text for integers, floor-cents for doubles, ISO for
    dates/timestamps. NULL-safe (min/max of an all-null column)."""
    c = F.col(col)
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
    null count, exact distinct count, and min/max in a portable
    rendering — the ANALYZE-pass every optimizer keeps (the reference
    target's ClickHouse side stores the same per-part min/max; Spark's
    CBO stores these in the catalog).

    One scan, one aggregation row (3 aggregates per column, map-side
    combined), exploded to long form on the driver-free stack path —
    the profile never shuffles row data, only the single summary row.
    Exact count_distinct is the correctness-gated choice here;
    approx_count_distinct is the 100 TB default and is benched
    separately (approximate.py)."""
    df = load_table(spark, sf_dir, _PROFILE_TABLE)
    aggs, stack_parts = [], []
    for f in df.schema.fields:
        col = f.name
        rep = _repr_col(col, f.dataType)
        aggs += [
            F.sum(F.col(col).isNull().cast("long")).alias(f"{col}__nulls"),
            F.count_distinct(F.col(col)).alias(f"{col}__distinct"),
            F.min(rep).alias(f"{col}__min"),
            F.max(rep).alias(f"{col}__max"),
        ]
        stack_parts.append(
            f"'{col}', {col}__nulls, {col}__distinct, {col}__min, {col}__max"
        )
    wide = df.agg(*aggs)
    n = len(df.schema.fields)
    return wide.select(
        F.expr(
            f"stack({n}, {', '.join(stack_parts)}) AS "
            "(column_name, n_nulls, n_distinct, min_repr, max_repr)"
        )
    )


def _profile_oracle() -> str:
    # mirrors _repr_col per column of the orders table; schema is fixed
    # by TESTDATA.md so the column list is static here
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
        rep = tmpl.format(c=c)
        parts.append(
            f"SELECT '{c}' AS column_name,"
            f" CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
            f"   AS n_nulls,"
            f" CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,"
            f" min({rep}) AS min_repr, max({rep}) AS max_repr"
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
        F.expr("row_tot * col_tot * 1000000L div (n * n)").alias(
            "expected_ppm"
        ),
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


QUERIES = {
    "profile_table_stats": profile_table_stats,
    "dist_drift_l1": dist_drift_l1,
    "chi_square_lang_source": chi_square_lang_source,
}

ORACLES = {
    "profile_table_stats": PROFILE_SQL,
    "dist_drift_l1": DRIFT_SQL,
    "chi_square_lang_source": CHI_SQUARE_SQL,
}
