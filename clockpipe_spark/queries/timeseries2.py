"""Time-series tier 2: OHLC resampling, event-transition matrix, and
bounded-frame EWMA smoothing over the replica's event stream.

These extend SURVEY §2.9's analytics mandate with the downsample /
path-analysis / smoothing trio a reference user runs on the synced
replica (the ClickHouse-side `GROUP BY toStartOfHour` /
`neighbor()` / exponentialMovingAverage idioms re-expressed as
Spark window + higher-order-function plans). Every query here is
oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clockpipe_spark.catalog import load_table
from clockpipe_spark.operators.asof import asof_join


def ts_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type: open/close are the first/last
    value in sequence order (event_id — the LSN role, unique, so the
    pick is deterministic), high/low the extremes, plus volume.

    Plan shape: ONE hash aggregation keyed on (event_type, hour) with
    map-side partial min_by/max_by/min/max/count combine — the classic
    downsample runs at scan speed and the shuffle carries only
    bar-grained rows (types x hours), never the raw stream. At 100 TB
    the same plan holds; bars-per-key stays bounded by the time range.
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("hour_start")
        )
        .agg(
            F.round(F.min_by("value", "event_id"), 2).alias("open_value"),
            F.round(F.max("value"), 2).alias("high_value"),
            F.round(F.min("value"), 2).alias("low_value"),
            F.round(F.max_by("value", "event_id"), 2).alias("close_value"),
            F.count("*").alias("n_events"),
            F.floor(F.sum("value") * 100).cast("long").alias("volume_cents"),
        )
    )


OHLC_SQL = """
SELECT event_type,
       date_trunc('hour', ts) AS hour_start,
       round(arg_min(value, event_id), 2) AS open_value,
       round(max(value), 2) AS high_value,
       round(min(value), 2) AS low_value,
       round(arg_max(value, event_id), 2) AS close_value,
       count(*) AS n_events,
       CAST(floor(sum(value) * 100) AS BIGINT) AS volume_cents
FROM events
GROUP BY 1, 2
"""


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event paths:
    count and probability of each (previous event type -> event type)
    step, ordered by (ts, event_id) within user.

    Probabilities are integer-scaled ((cnt * 1e6) div row_total) so
    both engines agree exactly — float division would tie-break
    differently at the last decimal.

    Plan shape: one user_id-partitioned lag window (co-partitioned
    with every other per-user analytic in the battery), then a
    25-cell hash aggregation with map-side combine and a broadcast-
    sized per-prev total join. The raw stream shuffles once, on
    user_id."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = (
        events.select(
            "user_id",
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count("*").alias("cnt"))
    )
    return steps.select(
        "prev_type",
        "next_type",
        "cnt",
        F.expr("(cnt * 1000000L) div sum(cnt) over (partition by prev_type)")
        .alias("prob_ppm"),
    )


TRANSITION_SQL = """
WITH steps AS (
  SELECT user_id,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS prev_type,
         event_type AS next_type
  FROM events
),
cells AS (
  SELECT prev_type, next_type, count(*) AS cnt
  FROM steps WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT prev_type, next_type, cnt,
       CAST((cnt * 1000000) // sum(cnt) OVER (PARTITION BY prev_type) AS BIGINT) AS prob_ppm
FROM cells
"""


_EWMA_ALPHA = 0.2
_EWMA_SPAN = 20  # bounded frame: 20 most recent observations


def ts_ewma_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA of `value` over a bounded 20-row event-ordered
    frame (pandas `ewm(alpha=0.2, adjust=True)` semantics, truncated
    to the frame): y_t = sum((1-a)^k * x_{t-k}) / sum((1-a)^k).

    EWMA is a sequential recurrence, but over a BOUNDED frame it is a
    windowed weighted average, so it stays a pure expression: collect
    the frame (<= 20 values, oldest first) with a rows-frame window,
    then one fold `s <- s*(1-a)+x, w <- w*(1-a)+1` per row — no UDF,
    no second shuffle beyond the user_id window exchange. At 100 TB
    the frame bound is what keeps state O(1) per row; the unbounded
    variant is the streaming applyInPandasWithState job, not a batch
    window.

    The oracle computes the same weighted mean non-recursively via a
    distance-bounded self-join on row_number — an independent
    formulation whose agreement (to 6 decimals) pins the fold."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_EWMA_SPAN - 1), 0)
    )
    frame = F.collect_list("value").over(w)
    decay = F.lit(1.0 - _EWMA_ALPHA)
    ewma = F.aggregate(
        frame,
        F.struct(
            F.lit(0.0).alias("s"),
            F.lit(0.0).alias("w"),
        ),
        lambda acc, x: F.struct(
            (acc["s"] * decay + x).alias("s"),
            (acc["w"] * decay + F.lit(1.0)).alias("w"),
        ),
        lambda acc: F.round(acc["s"] / acc["w"], 6),
    )
    return events.select(
        "event_id",
        "user_id",
        F.round("value", 2).alias("value"),
        ewma.alias("ewma"),
    )


EWMA_SQL = f"""
WITH ordered AS (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT a.event_id, a.user_id, round(a.value, 2) AS value,
       round(sum(b.value * pow({1.0 - _EWMA_ALPHA}, a.rn - b.rn))
             / sum(pow({1.0 - _EWMA_ALPHA}, a.rn - b.rn)), 6) AS ewma
FROM ordered a
JOIN ordered b
  ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - {_EWMA_SPAN - 1} AND a.rn
GROUP BY a.event_id, a.user_id, a.value
"""


def sequence_match_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceMatch``/``sequenceCount`` analog: each
    user's event-type path collapses to a one-char-per-event string in
    (ts, event_id) order, and regexes classify the journey — funnel
    reached (view..click..purchase in order), CLEAN funnel (no error
    event between the steps), and purchase count.

    Deterministic ordering inside an aggregation: collect structs keyed
    by (ts, event_id), sort_array, then project the chars — the only
    portable way to order array_agg in Spark. Per-user path length is
    bounded by that user's event count, so the state is the same
    O(events-per-key) any sessionization already pays; one user_id
    shuffle total."""
    events = load_table(spark, sf_dir, "events")
    ch = (
        F.when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .when(F.col("event_type") == "signup", "s")
        .otherwise("e")
    )
    per_user = events.select(
        "user_id", F.struct("ts", "event_id", ch.alias("ch")).alias("step")
    ).groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("step")), lambda s: s["ch"]
            ),
            "",
        ).alias("path")
    )
    return per_user.select(
        "user_id",
        F.length("path").cast("bigint").alias("path_len"),
        F.col("path").rlike("v.*c.*p").cast("int").alias("has_funnel"),
        F.col("path").rlike("v[^e]*c[^e]*p").cast("int").alias("clean_funnel"),
        (F.length("path") - F.length(F.regexp_replace("path", "p", "")))
        .cast("bigint")
        .alias("n_purchases"),
    )


SEQUENCE_MATCH_SQL = """
WITH paths AS (
  SELECT user_id,
         string_agg(CASE event_type
                      WHEN 'view' THEN 'v'
                      WHEN 'click' THEN 'c'
                      WHEN 'purchase' THEN 'p'
                      WHEN 'signup' THEN 's'
                      ELSE 'e'
                    END, '' ORDER BY ts, event_id) AS path
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(length(path) AS BIGINT) AS path_len,
       CAST(regexp_matches(path, 'v.*c.*p') AS INT) AS has_funnel,
       CAST(regexp_matches(path, 'v[^e]*c[^e]*p') AS INT) AS clean_funnel,
       CAST(length(path) - length(replace(path, 'p', '')) AS BIGINT)
           AS n_purchases
FROM paths
"""


_QH_BIN_W = 8  # fixed bin width (a power of two: value/8 is exact in IEEE)


def quantile_histogram_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative p50/p90/p99 per day from MERGEABLE fixed-width
    histograms — the deterministic cousin of the HLL rollup
    (sketches.hll_user_rollup): the raw stream is scanned ONCE into
    (day, bin) counts; every as-of-day quantile is then bin arithmetic
    over the dense day x bin grid. Unlike t-digest/KLL the fixed-bin
    sketch is exactly mergeable with no ordering sensitivity, so the
    whole rollup is integer-deterministic and ORACLE-CHECKABLE — the
    returned quantile is the lower edge of the bin where the cumulative
    count crosses the rank (error <= bin width, pinned by pytest).

    Plan: one fact-stream aggregation with map-side combine; the grid
    (days x ~70 bins, built from two broadcast distinct lists) takes
    two window cumsums (over days per bin, then over bins per day) and
    a conditional-min aggregation. At 100 TB only the first
    aggregation touches data; everything after is dashboard-sized."""
    events = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").alias("day")
    binc = F.floor(F.col("value") / _QH_BIN_W).cast("long").alias("bin")
    daily = events.select(day, binc).groupBy("day", "bin").agg(
        F.count("*").alias("cnt")
    )
    days = daily.select("day").distinct()
    bins = daily.select("bin").distinct()
    grid = F.broadcast(days).crossJoin(F.broadcast(bins))
    dense = grid.join(daily, ["day", "bin"], "left").select(
        "day", "bin", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    w_day = (
        Window.partitionBy("bin")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = dense.select(
        "day", "bin", F.sum("cnt").over(w_day).alias("cum_cnt")
    )
    w_bin = (
        Window.partitionBy("day")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("day")
    ranked = cum.select(
        "day",
        "bin",
        F.sum("cum_cnt").over(w_bin).alias("running"),
        F.sum("cum_cnt").over(w_tot).alias("total"),
    )

    def q_bin(num: int, den: int):
        """Lower edge of the first bin whose running count reaches
        ceil(q * total) — integer rank arithmetic, no floats."""
        hit = F.when(
            F.col("running") * den >= F.col("total") * num, F.col("bin")
        )
        return F.min(hit) * _QH_BIN_W

    return (
        ranked.groupBy("day")
        .agg(
            F.max("total").alias("n_events_to_date"),
            q_bin(1, 2).alias("p50_lo"),
            q_bin(9, 10).alias("p90_lo"),
            q_bin(99, 100).alias("p99_lo"),
        )
        .orderBy("day")
    )


QUANTILE_ROLLUP_SQL = f"""
WITH daily AS (
  SELECT date_trunc('day', ts) AS day,
         CAST(floor(value / {_QH_BIN_W}) AS BIGINT) AS bin,
         count(*) AS cnt
  FROM events GROUP BY 1, 2
),
grid AS (
  SELECT d.day, b.bin
  FROM (SELECT DISTINCT day FROM daily) d
  CROSS JOIN (SELECT DISTINCT bin FROM daily) b
),
dense AS (
  SELECT g.day, g.bin, coalesce(daily.cnt, 0) AS cnt
  FROM grid g LEFT JOIN daily ON daily.day = g.day AND daily.bin = g.bin
),
cum AS (
  SELECT day, bin,
         sum(cnt) OVER (PARTITION BY bin ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS cum_cnt
  FROM dense
),
ranked AS (
  SELECT day, bin,
         sum(cum_cnt) OVER (PARTITION BY day ORDER BY bin
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS running,
         sum(cum_cnt) OVER (PARTITION BY day) AS total
  FROM cum
)
SELECT day,
       CAST(max(total) AS BIGINT) AS n_events_to_date,
       CAST(min(CASE WHEN running * 2 >= total THEN bin END)
            * {_QH_BIN_W} AS BIGINT) AS p50_lo,
       CAST(min(CASE WHEN running * 10 >= total * 9 THEN bin END)
            * {_QH_BIN_W} AS BIGINT) AS p90_lo,
       CAST(min(CASE WHEN running * 100 >= total * 99 THEN bin END)
            * {_QH_BIN_W} AS BIGINT) AS p99_lo
FROM ranked GROUP BY day ORDER BY day
"""


def ts_seasonal_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-baseline anomaly scoring: the expected value for each
    (event_type, day-of-week, hour-of-day) cell is its historical mean;
    every event is scored by its residual against that baseline, with a
    flag at |residual| >= 50.00. The seasonal-profile version of
    ts_anomaly_mad — dashboards use MAD's robustness, alerting uses the
    seasonal shape.

    Plan: the baseline is ONE aggregation into at most types x 7 x 24
    cells — a broadcast — so scoring the fact stream is a broadcast
    hash join at scan speed: the events never shuffle. Integer cents
    keep residuals exact across engines (`div` floor-division on the
    already-floored sums, not float averages)."""
    events = load_table(spark, sf_dir, "events")
    keyed = events.select(
        "event_id",
        "event_type",
        F.dayofweek("ts").alias("dow"),
        F.hour("ts").alias("hod"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    baseline = keyed.groupBy("event_type", "dow", "hod").agg(
        F.expr("sum(cents) div count(*)").alias("baseline_cents"),
        F.count("*").alias("n_cell"),
    )
    scored = keyed.join(F.broadcast(baseline), ["event_type", "dow", "hod"])
    resid = F.col("cents") - F.col("baseline_cents")
    return scored.select(
        "event_id",
        "event_type",
        "dow",
        "hod",
        "cents",
        "baseline_cents",
        resid.alias("residual_cents"),
        (F.abs(resid) >= 5000).cast("int").alias("is_anomalous"),
    )


SEASONAL_RESIDUAL_SQL = """
WITH keyed AS (
  SELECT event_id, event_type,
         dayofweek(ts) + 1 AS dow,  -- DuckDB 0=Sun; Spark 1=Sun
         hour(ts) AS hod,
         CAST(floor(value * 100) AS BIGINT) AS cents
  FROM events
),
baseline AS (
  SELECT event_type, dow, hod,
         CAST(sum(cents) // count(*) AS BIGINT) AS baseline_cents,
         count(*) AS n_cell
  FROM keyed GROUP BY 1, 2, 3
)
SELECT k.event_id, k.event_type, k.dow, k.hod, k.cents,
       b.baseline_cents, k.cents - b.baseline_cents AS residual_cents,
       CAST(abs(k.cents - b.baseline_cents) >= 5000 AS INT) AS is_anomalous
FROM keyed k JOIN baseline b USING (event_type, dow, hod)
"""


def asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join with tolerance: for every event, the user's
    NEXT purchase value at or after that event, but only if it lands
    within 3 days — the attribution lookup ("did this click convert?")
    that is the mirror of asof_last_purchase's state lookup.

    Same one-shuffle union+window plan as the backward direction
    (operators/asof.py): first(ignorenulls) over an unbounded-FOLLOWING
    frame, ties resolved left-first so an equal-timestamp purchase is
    matched. The tolerance nulls carried values by integer-microsecond
    gap — exact, because the carried row is the nearest candidate.
    DuckDB has no forward ASOF; the oracle negates epoch-microseconds
    so its backward ASOF scans the time axis mirrored."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("next_purchase_value")
    )
    joined = asof_join(
        events.select("event_id", "user_id", "ts", "event_type"),
        purchases,
        by=["user_id"],
        on="ts",
        value_cols=["next_purchase_value"],
        suffix="",
        direction="forward",
        tolerance_us=3 * 86_400 * 1_000_000,
    )
    return joined.select(
        "event_id",
        "user_id",
        F.round("next_purchase_value", 2).alias("next_purchase_value"),
    )


ASOF_FORWARD_SQL = """
WITH e AS (
  SELECT event_id, user_id, ts, -epoch_us(ts) AS nts FROM events
),
p AS (
  SELECT user_id, ts, -epoch_us(ts) AS nts, value FROM events
  WHERE event_type = 'purchase'
)
SELECT e.event_id, e.user_id,
       CASE WHEN epoch_us(p.ts) - epoch_us(e.ts) <= CAST(259200000000 AS BIGINT)
            THEN round(p.value, 2) END AS next_purchase_value
FROM e ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.nts >= p.nts
"""


def asof_purchase_recency_gated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of with a 24-hour tolerance: each event carries the
    user's last purchase only when it is FRESH — the feature-store
    staleness gate (a model must not see a week-old 'last purchase' as
    if it were current). Adds the integer-microsecond gap so the
    downstream can bucket staleness; NULL gap = no fresh purchase."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("pv"), F.col("ts").alias("pts")
    )
    joined = asof_join(
        events.select("event_id", "user_id", "ts"),
        purchases,
        by=["user_id"],
        on="ts",
        value_cols=["pv", "pts"],
        suffix="",
        direction="backward",
        tolerance_us=86_400 * 1_000_000,
    )
    return joined.select(
        "event_id",
        "user_id",
        F.round("pv", 2).alias("fresh_purchase_value"),
        (F.unix_micros("ts") - F.unix_micros("pts")).alias("staleness_us"),
    )


ASOF_GATED_SQL = """
SELECT e.event_id, e.user_id,
       CASE WHEN epoch_us(e.ts) - epoch_us(p.ts) <= CAST(86400000000 AS BIGINT)
            THEN round(p.value, 2) END AS fresh_purchase_value,
       CASE WHEN epoch_us(e.ts) - epoch_us(p.ts) <= CAST(86400000000 AS BIGINT)
            THEN epoch_us(e.ts) - epoch_us(p.ts) END AS staleness_us
FROM events e
ASOF LEFT JOIN (
  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
) p ON e.user_id = p.user_id AND e.ts >= p.ts
"""


_ATTR_WINDOW_US = 7 * 86_400 * 1_000_000  # 7-day lookback


def attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: each purchase's cents split
    evenly across the user's view/click touches in the prior 7 days,
    with the integer remainder credited to the LAST touch before
    conversion (deterministic — no fractional cents, credits sum
    exactly to the purchase). Output per touch event: conversions
    influenced and total credited cents; the marketing-attribution
    query every event replica serves.

    Plan: a keyed interval join (user_id equi-join + time-range
    residual — co-partitioned, never cartesian), one window per
    purchase for the touch count/recency rank, then a per-touch
    rollup. Two keyed exchanges total at any scale."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.unix_micros("ts").alias("p_us"),
        F.floor(F.col("value") * 100).cast("long").alias("p_cents"),
    )
    touches = events.filter(
        F.col("event_type").isin("view", "click")
    ).select(
        F.col("event_id").alias("t_id"),
        "user_id",
        F.unix_micros("ts").alias("t_us"),
    )
    joined = purchases.join(touches, "user_id").filter(
        (F.col("t_us") < F.col("p_us"))
        & (F.col("t_us") >= F.col("p_us") - _ATTR_WINDOW_US)
    )
    w = Window.partitionBy("p_id")
    wrank = Window.partitionBy("p_id").orderBy(
        F.col("t_us").desc(), F.col("t_id").desc()
    )
    credited = joined.select(
        "t_id",
        "user_id",
        "p_cents",
        F.count("*").over(w).alias("n_touch"),
        F.row_number().over(wrank).alias("recency"),
    ).select(
        "t_id",
        "user_id",
        (
            F.expr("p_cents div n_touch")
            + F.when(F.col("recency") == 1, F.expr("p_cents % n_touch"))
            .otherwise(F.lit(0))
        ).alias("credit_cents"),
    )
    return credited.groupBy(F.col("t_id").alias("event_id"), "user_id").agg(
        F.count("*").alias("n_conversions"),
        F.sum("credit_cents").alias("credit_cents"),
    )


ATTRIBUTION_SQL = f"""
WITH purchases AS (
  SELECT event_id AS p_id, user_id, epoch_us(ts) AS p_us,
         CAST(floor(value * 100) AS BIGINT) AS p_cents
  FROM events WHERE event_type = 'purchase'
),
touches AS (
  SELECT event_id AS t_id, user_id, epoch_us(ts) AS t_us
  FROM events WHERE event_type IN ('view', 'click')
),
joined AS (
  SELECT p.p_id, t.t_id, p.user_id, p.p_cents,
         count(*) OVER (PARTITION BY p.p_id) AS n_touch,
         row_number() OVER (
           PARTITION BY p.p_id ORDER BY t.t_us DESC, t.t_id DESC
         ) AS recency
  FROM purchases p JOIN touches t
    ON p.user_id = t.user_id
   AND t.t_us < p.p_us
   AND t.t_us >= p.p_us - {_ATTR_WINDOW_US}
)
SELECT t_id AS event_id, user_id,
       count(*) AS n_conversions,
       CAST(sum(p_cents // n_touch
                + CASE WHEN recency = 1 THEN p_cents % n_touch ELSE 0 END)
            AS BIGINT) AS credit_cents
FROM joined
GROUP BY t_id, user_id
"""


def dau_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active / new / cumulative users — the growth dashboard's
    first chart, computed the scalable way: DAU is one (day, user)
    dedup + count; "new" attributes each user to their FIRST day (a
    per-user min — never a growing-window COUNT DISTINCT, which
    rescans history); cumulative is a running sum over the tiny
    day-grained frame. Two keyed aggregations over the stream, then
    window math on ~30 rows."""
    events = load_table(spark, sf_dir, "events")
    day_user = events.select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    ).distinct()
    dau = day_user.groupBy("day").agg(F.count("*").alias("n_active"))
    first_day = day_user.groupBy("user_id").agg(F.min("day").alias("day"))
    new_users = first_day.groupBy("day").agg(F.count("*").alias("n_new"))
    wcum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        dau.join(new_users, "day", "left")
        .select(
            "day",
            "n_active",
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
        )
        .withColumn("cum_users", F.sum("n_new").over(wcum).cast("long"))
    )


DAU_SQL = """
WITH day_user AS (
  SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
),
dau AS (SELECT day, count(*) AS n_active FROM day_user GROUP BY day),
newu AS (
  SELECT day, count(*) AS n_new FROM (
    SELECT user_id, min(day) AS day FROM day_user GROUP BY user_id
  ) GROUP BY day
)
SELECT d.day, d.n_active,
       CAST(coalesce(n.n_new, 0) AS BIGINT) AS n_new,
       CAST(sum(coalesce(n.n_new, 0)) OVER (
         ORDER BY d.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS cum_users
FROM dau d LEFT JOIN newu n USING (day)
"""


_AB_KNUTH = 2654435761  # shared multiplicative-hash constant


def ab_test_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment-analysis summary: users deterministically split into
    two arms by multiplicative hash (the assignment every A/B platform
    computes — stable across reruns and engines, never rand()), then
    per arm: users, converters (>= 1 purchase), conversion rate in
    ppm, and purchase value mass in cents; plus each arm's lift vs the
    OTHER arm in ppm of the other's rate, from a 2-row self-join.
    Significance testing needs sqrt/normal tables — floats that
    diverge across libms — so the deterministic part ends at the
    rate/lift integers and the z-test belongs to the notebook layer.

    One (user) aggregation + a 2-row broadcast self-join; assignment
    is a pure projection, so the scan parallelizes untouched at any
    corpus size."""
    events = load_table(spark, sf_dir, "events")
    # expr strings throughout (r21, guide §1.2): the Column build issued
    # ~400 py4j round trips (~0.8 s profiled); identical trees parse
    # JVM-side in a handful of calls (plan_equiv-verified + oracle hash).
    # the repo's overflow-free 16-bit-halves Knuth hash (llmprep.
    # sample_hash_residue), reduced mod 2 for the arm
    arm_sql = (
        f"pmod(pmod(pmod(user_id, 4294967296) div 65536 * {_AB_KNUTH},"
        f" 65536) * 65536"
        f" + pmod(user_id, 4294967296) % 65536 * {_AB_KNUTH},"
        f" 4294967296) % 2"
    )
    per_user = events.groupBy("user_id").agg(
        F.expr("sum(CAST(event_type = 'purchase' AS BIGINT)) AS n_purch"),
        F.expr(
            "sum(CASE WHEN event_type = 'purchase'"
            " THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END)"
            " AS purch_cents"
        ),
    ).selectExpr(f"{arm_sql} AS arm", "n_purch", "purch_cents")
    arms = per_user.groupBy("arm").agg(
        F.expr("count(*) AS n_users"),
        F.expr("sum(CAST(n_purch > 0 AS BIGINT)) AS n_converters"),
        F.expr("sum(purch_cents) AS total_cents"),
    ).withColumn(
        "conv_ppm", F.expr("n_converters * 1000000L div n_users")
    )
    other = arms.selectExpr("(1 - arm) AS arm", "conv_ppm AS other_ppm")
    return arms.join(other, "arm").selectExpr(
        "arm",
        "n_users",
        "n_converters",
        "conv_ppm",
        "total_cents",
        "CASE WHEN other_ppm > 0"
        " THEN (conv_ppm - other_ppm) * 1000000L div other_ppm END"
        " AS lift_ppm",
    )


AB_TEST_SQL = f"""
WITH per_user AS (
  SELECT user_id,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_purch,
         sum(CASE WHEN event_type = 'purchase'
                  THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END)
             AS purch_cents
  FROM events GROUP BY user_id
),
halved AS (
  SELECT *, (user_id % 4294967296 + 4294967296) % 4294967296 AS u32
  FROM per_user
),
armed AS (
  SELECT ((u32 // 65536 * {_AB_KNUTH}) % 65536 * 65536
          + u32 % 65536 * {_AB_KNUTH}) % 4294967296 % 2 AS arm,
         n_purch, purch_cents
  FROM halved
),
arms AS (
  SELECT arm, count(*) AS n_users,
         sum(CASE WHEN n_purch > 0 THEN 1 ELSE 0 END) AS n_converters,
         CAST(sum(purch_cents) AS BIGINT) AS total_cents
  FROM armed GROUP BY arm
),
rated AS (
  SELECT arm, n_users,
         CAST(n_converters AS BIGINT) AS n_converters,
         n_converters * 1000000 // n_users AS conv_ppm, total_cents
  FROM arms
)
SELECT a.arm, a.n_users, a.n_converters,
       CAST(a.conv_ppm AS BIGINT) AS conv_ppm, a.total_cents,
       CAST(CASE WHEN b.conv_ppm > 0
                 THEN (a.conv_ppm - b.conv_ppm) * 1000000 // b.conv_ppm END
            AS BIGINT) AS lift_ppm
FROM rated a JOIN rated b ON b.arm = 1 - a.arm
"""


QUERIES = {
    "ts_resample_ohlc": ts_resample_ohlc,
    "asof_next_purchase": asof_next_purchase,
    "asof_purchase_recency_gated": asof_purchase_recency_gated,
    "attribution_linear": attribution_linear,
    "dau_cumulative": dau_cumulative,
    "ab_test_summary": ab_test_summary,
    "quantile_histogram_rollup": quantile_histogram_rollup,
    "ts_seasonal_residual": ts_seasonal_residual,
    "event_transition_matrix": event_transition_matrix,
    "ts_ewma_bounded": ts_ewma_bounded,
    "sequence_match_pattern": sequence_match_pattern,
}

ORACLES = {
    "ts_resample_ohlc": OHLC_SQL,
    "asof_next_purchase": ASOF_FORWARD_SQL,
    "asof_purchase_recency_gated": ASOF_GATED_SQL,
    "attribution_linear": ATTRIBUTION_SQL,
    "dau_cumulative": DAU_SQL,
    "ab_test_summary": AB_TEST_SQL,
    "quantile_histogram_rollup": QUANTILE_ROLLUP_SQL,
    "ts_seasonal_residual": SEASONAL_RESIDUAL_SQL,
    "event_transition_matrix": TRANSITION_SQL,
    "ts_ewma_bounded": EWMA_SQL,
    "sequence_match_pattern": SEQUENCE_MATCH_SQL,
}
