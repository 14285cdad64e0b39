"""Relational surface tier 5: the join/set-op/NULL/higher-order-function
corners that round out §2.9 — FULL OUTER reconciliation, bag-semantics
set operations (EXCEPT ALL / INTERSECT ALL), a NULL-semantics battery
(null-safe equality included), and an array higher-order-function
battery. All oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clockpipe_spark.catalog import load_table


def join_full_outer_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily signup-vs-purchase reconciliation: FULL OUTER join of the
    per-(day, user) signup counts against the per-(day, user) purchase
    aggregates — users who signed up but never bought and buyers who
    never signed up that day both survive, zero-filled. The canonical
    'two fact streams, neither side complete' report.

    Both sides pre-aggregate before the join, so the full-outer
    exchange carries (day, user) grains, not raw events, and both
    shuffles share the same key — co-partitioned at scale."""
    events = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts").alias("day")
    signups = (
        events.filter(F.col("event_type") == "signup")
        .groupBy(day, "user_id")
        .agg(F.count("*").alias("n_signups"))
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(day, "user_id")
        .agg(
            F.count("*").alias("n_purchases"),
            F.floor(F.sum("value") * 100).cast("long").alias("spend_cents"),
        )
    )
    return signups.join(purchases, ["day", "user_id"], "full_outer").select(
        "day",
        "user_id",
        F.coalesce("n_signups", F.lit(0)).alias("n_signups"),
        F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
        F.coalesce("spend_cents", F.lit(0)).alias("spend_cents"),
    )


FULL_OUTER_SQL = """
WITH s AS (
  SELECT date_trunc('day', ts) AS day, user_id, count(*) AS n_signups
  FROM events WHERE event_type = 'signup' GROUP BY 1, 2
),
p AS (
  SELECT date_trunc('day', ts) AS day, user_id, count(*) AS n_purchases,
         CAST(floor(sum(value) * 100) AS BIGINT) AS spend_cents
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
)
SELECT coalesce(s.day, p.day) AS day,
       coalesce(s.user_id, p.user_id) AS user_id,
       coalesce(s.n_signups, 0) AS n_signups,
       coalesce(p.n_purchases, 0) AS n_purchases,
       coalesce(p.spend_cents, 0) AS spend_cents
FROM s FULL OUTER JOIN p ON s.day = p.day AND s.user_id = p.user_id
"""


def setop_bag_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set operations: the (user, event_type) MULTISET of
    the first half-month EXCEPT ALL / INTERSECT ALL the second half —
    multiplicities matter (a user with 3 clicks early and 1 click late
    leaves 2 'except_all' click rows), which DISTINCT-flavored set ops
    cannot express. Spark's exceptAll/intersectAll compile to the same
    count-difference aggregation the SQL standard prescribes; the
    shuffle is on the full row key, once per operand."""
    events = load_table(spark, sf_dir, "events")
    half = F.dayofmonth("ts") <= 15
    a = events.filter(half).select("user_id", "event_type")
    b = events.filter(~half).select("user_id", "event_type")
    ex = a.exceptAll(b).withColumn("kind", F.lit("except_all"))
    inter = a.intersectAll(b).withColumn("kind", F.lit("intersect_all"))
    return (
        ex.unionByName(inter)
        .groupBy("kind", "user_id", "event_type")
        .agg(F.count("*").alias("multiplicity"))
    )


SETOP_BAG_SQL = """
WITH a AS (
  SELECT user_id, event_type FROM events WHERE date_part('day', ts) <= 15
),
b AS (
  SELECT user_id, event_type FROM events WHERE date_part('day', ts) > 15
),
ex AS (SELECT *, 'except_all' AS kind FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)),
inter AS (SELECT *, 'intersect_all' AS kind FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b))
SELECT kind, user_id, event_type, count(*) AS multiplicity
FROM (SELECT * FROM ex UNION ALL SELECT * FROM inter)
GROUP BY 1, 2, 3
"""


def scalar_null_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-semantics battery: NULLs are injected (every 7th event),
    then each NULL-handling primitive is pinned — coalesce chains,
    nullif, null-safe equality (Spark ``<=>`` vs SQL ``IS NOT DISTINCT
    FROM``), NULL propagation through arithmetic, and the
    count(col)-skips-NULLs rule via a conditional flag. Engines
    genuinely differ here (three-valued logic shortcuts), which is why
    the battery exists. Pure projection at scan speed."""
    events = load_table(spark, sf_dir, "events")
    # selectExpr strings (r21, guide §1.2): same trees, one parse call
    # (plan_equiv-verified + oracle hash)
    cents = "CAST(floor(value * 100) AS BIGINT)"
    nv = f"CASE WHEN event_id % 7 != 0 THEN {cents} END"
    return events.selectExpr(
        "event_id",
        f"CAST(({nv}) IS NULL AS INT) AS is_null",
        f"coalesce({nv}, -1) AS coalesced",
        f"nullif({cents} % 10, 0) AS nullif_zero_digit",
        f"CAST(({nv}) <=> {cents} AS INT) AS nullsafe_eq_orig",
        f"CAST(({nv}) <=> CAST(NULL AS BIGINT) AS INT) AS nullsafe_eq_null",
        f"({nv}) + 1 AS null_propagating_sum",
        f"CASE WHEN ({nv}) IS NOT NULL THEN 1 ELSE 0 END AS countable",
    )


NULL_BATTERY_SQL = """
WITH base AS (
  SELECT event_id,
         CAST(floor(value * 100) AS BIGINT) AS cents,
         CASE WHEN event_id % 7 <> 0
              THEN CAST(floor(value * 100) AS BIGINT) END AS nv
  FROM events
)
SELECT event_id,
       CAST(nv IS NULL AS INT) AS is_null,
       coalesce(nv, -1) AS coalesced,
       nullif(cents % 10, 0) AS nullif_zero_digit,
       CAST(nv IS NOT DISTINCT FROM cents AS INT) AS nullsafe_eq_orig,
       CAST(nv IS NOT DISTINCT FROM CAST(NULL AS BIGINT) AS INT)
           AS nullsafe_eq_null,
       nv + 1 AS null_propagating_sum,
       CASE WHEN nv IS NOT NULL THEN 1 ELSE 0 END AS countable
FROM base
"""


def array_hof_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order-function battery over a per-row integer array
    (sequence sized by the event id): transform, filter, aggregate
    (fold), exists, reverse, slice, and containment — the Spark HOF
    lambda surface against DuckDB's list_* lambda family. Arrays are
    materialized as a column BEFORE the lambdas (the repo-wide no-CSE-
    inside-lambdas rule). Pure projection, whole-stage codegen.

    Every array-valued output is rendered as a comma-joined string at
    the final projection: the driver's canonicalizer sorts result
    frames with pandas and raw list cells crash it (unhashable type —
    the r7 red row). The lambdas under test are untouched; only the
    rendering is scalar. The empty-array case joins to '' on both
    sides (DuckDB's array_to_string yields NULL for [], hence the
    oracle-side coalesce)."""
    events = load_table(spark, sf_dir, "events")
    with_arr = events.selectExpr(
        "event_id",
        "sequence(1, CAST(event_id % 8 + 1 AS INT)) AS arr",
    )
    # selectExpr strings (r21, guide §1.2): the Column+lambda build
    # issued ~590 py4j round trips (~0.9 s profiled); the identical
    # trees parse JVM-side in two calls. Results hash-pinned by the
    # DuckDB oracle (ARRAY_HOF_SQL).
    j = "array_join(CAST({} AS array<string>), ',')".format
    return with_arr.selectExpr(
        "event_id",
        f"{j('arr')} AS arr",
        f"{j('transform(arr, x -> x * x)')} AS squares",
        f"{j('filter(arr, x -> x % 2 = 0)')} AS evens",
        "aggregate(arr, CAST(0 AS BIGINT), (acc, x) -> acc + x * x)"
        " AS sum_squares",
        "CAST(exists(arr, x -> x > 6) AS INT) AS has_gt6",
        f"{j('reverse(arr)')} AS reversed",
        f"{j('slice(arr, 2, 3)')} AS middle",
        "CAST(array_contains(arr, 5) AS INT) AS contains_5",
        "size(arr) AS n",
    )


ARRAY_HOF_SQL = """
WITH base AS (
  SELECT event_id,
         list_transform(generate_series(1, CAST(event_id % 8 + 1 AS INT)),
                        x -> CAST(x AS INT)) AS arr
  FROM events
)
SELECT event_id,
       coalesce(array_to_string(arr, ','), '') AS arr,
       coalesce(array_to_string(list_transform(arr, x -> x * x), ','), '')
           AS squares,
       coalesce(array_to_string(list_filter(arr, x -> x % 2 = 0), ','), '')
           AS evens,
       list_reduce(list_prepend(CAST(0 AS BIGINT),
                                list_transform(arr, x -> CAST(x AS BIGINT))),
                   (acc, x) -> acc + x * x) AS sum_squares,
       CAST(len(list_filter(arr, x -> x > 6)) > 0 AS INT) AS has_gt6,
       coalesce(array_to_string(list_reverse(arr), ','), '') AS reversed,
       coalesce(array_to_string(list_slice(arr, 2, 4), ','), '') AS middle,
       CAST(list_contains(arr, 5) AS INT) AS contains_5,
       len(arr) AS n
FROM base
"""


_HIER_FANOUT = 10  # parent(doc) = doc_id div 10 — a synthetic 10-ary tree
_HIER_MAX_DEPTH = 12  # loud guard far above log10(any plausible doc count)


def hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-query surface (WITH RECURSIVE has no Spark native):
    ancestor-closure rollup over a synthetic 10-ary hierarchy
    (parent = doc_id div 10, root 0) — per ancestor, its depth-tagged
    descendant count and total character mass, the BOM-explosion /
    org-rollup shape.

    Spark-first: the closure builds by ITERATED JOIN of the frontier
    with the edge table — depth rounds (log_10 of the id space), each
    one co-partitioned equi-join on the frontier's parent, terminating
    when a round adds no rows, with a loud guard at 12 rounds (the
    components.py convergence discipline). The per-round frontier only
    shrinks (paths above the root drop out), so peak memory is the
    closure itself — the same O(n log n) paths a recursive CTE
    materializes. The DuckDB oracle IS `WITH RECURSIVE`, so the
    fixpoint semantics are checked against a real recursive engine."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    edges = docs.filter(F.col("doc_id") > 0).select(
        F.col("doc_id").alias("node"),
        F.expr(f"doc_id div {_HIER_FANOUT}").alias("parent"),
    )
    # closure seeds: every node is its own ancestor at depth 0
    closure = docs.select(
        F.col("doc_id").alias("node"),
        F.col("doc_id").alias("anc"),
        F.lit(0).alias("depth"),
    )
    # round count computed up front, not probed per round (r20, guide
    # §1.2/§5 — no driver loops of eager actions): the digit count of
    # max(doc_id) is an UPPER BOUND on the recursion depth (ADVICE r20:
    # on sparse id sets chains stop at missing intermediate nodes, so
    # actual chains can be shallower — extra rounds union empty frames,
    # row-identical output either way). The old per-round
    # stepped.isEmpty() ran one job per level, each re-executing the
    # whole un-checkpointed join lineage (O(depth²) joins driver-side);
    # one scalar max() replaces them all. NOTE the guard below is
    # therefore stricter than the old probe: it trips on the BOUND
    # (max(doc_id) >= 10^_HIER_MAX_DEPTH), even if real chains are
    # shallow — deliberate, since a 10^12-wide id space with this
    # derived parent rule is out of the operator's declared envelope.
    max_id = docs.agg(F.max("doc_id").alias("m")).first()["m"]
    depth = 0
    while max_id is not None and 10**depth <= max_id:
        depth += 1
    if depth > _HIER_MAX_DEPTH:
        raise RuntimeError(
            f"hierarchy deeper than {_HIER_MAX_DEPTH} — guard tripped"
        )
    frontier = closure
    for _ in range(depth):
        stepped = (
            frontier.join(
                edges.select(
                    F.col("node").alias("anc"),
                    F.col("parent").alias("next_anc"),
                ),
                "anc",
            )
            .select(
                "node",
                F.col("next_anc").alias("anc"),
                (F.col("depth") + 1).alias("depth"),
            )
        )
        closure = closure.unionByName(stepped)
        frontier = stepped
    rolled = (
        closure.join(docs, closure.node == docs.doc_id)
        .groupBy("anc")
        .agg(
            F.count("*").alias("n_subtree"),
            F.max("depth").alias("max_depth"),
            F.sum("n_chars").alias("total_chars"),
        )
    )
    return rolled.select(
        F.col("anc").alias("ancestor"),
        "n_subtree",
        "max_depth",
        "total_chars",
    )


# the recursion steps THROUGH the edge relation (join on e.node =
# c.anc), exactly like the Spark loop — on a sparse id set a chain
# stops at a missing intermediate node in BOTH engines, rather than
# the oracle silently stepping arithmetically past it
HIERARCHY_SQL = f"""
WITH RECURSIVE edges AS (
  SELECT doc_id AS node, doc_id // {_HIER_FANOUT} AS parent
  FROM documents WHERE doc_id > 0
),
closure(node, anc, depth) AS (
  SELECT doc_id, doc_id, 0 FROM documents
  UNION ALL
  SELECT c.node, e.parent, c.depth + 1
  FROM closure c JOIN edges e ON e.node = c.anc
)
SELECT c.anc AS ancestor,
       count(*) AS n_subtree,
       max(c.depth) AS max_depth,
       CAST(sum(d.n_chars) AS BIGINT) AS total_chars
FROM closure c JOIN documents d ON c.node = d.doc_id
GROUP BY c.anc
"""


def scalar_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT surface: parse the props JSON into a variant,
    extract typed fields with variant_get, and branch on is_variant_null
    — the semi-structured path modern Spark ships for JSON columns
    (parse once, extract many, no per-extract re-parse). The DuckDB
    oracle extracts from JSON directly; agreement pins the typed
    extraction including the int cast.

    k_is_null means PRESENT-AND-JSON-NULL, pinned on both sides
    (ADVICE r7): a missing key coalesces to 0 in Spark (where
    is_variant_null of an absent path is SQL NULL) and the oracle
    tests json_type = 'NULL' (which is SQL NULL for a missing path,
    also coalesced to 0) — so missing vs json-null cannot silently
    diverge when the data grows a sparse key.

    Scan-speed projection; at 100 TB the parse-once property is the
    point — a query touching 5 fields of a JSON column pays one parse,
    not five."""
    events = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return events.select(
        "event_id",
        F.try_variant_get(v, "$.k", "int").alias("k_int"),
        F.try_variant_get(v, "$.missing", "int").alias("missing_int"),
        F.coalesce(
            F.is_variant_null(F.try_variant_get(v, "$.k", "variant")).cast(
                "int"
            ),
            F.lit(0),
        ).alias("k_is_null"),
    )


VARIANT_SQL = """
SELECT event_id,
       CAST(json_extract(props, '$.k') AS INT) AS k_int,
       CAST(json_extract(props, '$.missing') AS INT) AS missing_int,
       CAST(coalesce(json_type(props, '$.k') = 'NULL', FALSE) AS INT)
           AS k_is_null
FROM events
"""


def map_function_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: build a per-user event_type -> count map with
    map_from_entries, then exercise map_keys / map_values /
    element_at / map_filter / transform_values in one projection.
    Maps have no cross-engine canonical order, so every output renders
    as a SORTED, comma-joined string of 'key:value' entries — fully
    scalar, so the driver's pandas canonicalizer can sort it (raw
    list cells crash it, the r7 array_hof lesson).

    The empty map_filter result is pinned explicitly: Spark yields []
    (joined to ''), DuckDB's list(...) FILTER yields NULL for zero
    matching rows — the oracle coalesces to '' so a user whose max
    per-type count sits below the threshold cannot diverge (ADVICE
    r7: at sf0.1 the minimum was 11, one notch from a gate failure).

    One keyed aggregation; the map column never leaves the executor
    un-canonicalized."""
    events = load_table(spark, sf_dir, "events")
    # selectExpr strings (r21, guide §1.2): same trees, one parse call
    # (plan_equiv-verified + oracle hash)
    per = events.groupBy("user_id", "event_type").agg(
        F.expr("count(*) AS n")
    )
    mapped = per.groupBy("user_id").agg(
        F.expr(
            "map_from_entries(sort_array(collect_list("
            "struct(event_type, n)))) AS m"
        )
    )
    render = (
        "array_join(sort_array(transform(map_entries({}),"
        " e -> concat_ws(':', e.key, CAST(e.value AS STRING)))), ',')"
    ).format
    return mapped.selectExpr(
        "user_id",
        "size(m) AS n_types",
        "element_at(m, 'purchase') AS purchases",
        "aggregate(map_values(m), CAST(0 AS BIGINT), (a, x) -> a + x)"
        " AS total_events",
        f"{render('map_filter(m, (k, v) -> v >= 10)')} AS frequent_types",
        f"{render('transform_values(m, (k, v) -> v * 2)')} AS doubled",
    )


MAP_BATTERY_SQL = """
WITH per AS (
  SELECT user_id, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT user_id,
       CAST(count(*) AS INT) AS n_types,
       CAST(max(CASE WHEN event_type = 'purchase' THEN n END) AS BIGINT)
           AS purchases,
       CAST(sum(n) AS BIGINT) AS total_events,
       coalesce(array_to_string(
         list_sort(list(event_type || ':' || CAST(n AS VARCHAR))
                   FILTER (n >= 10)), ','), '') AS frequent_types,
       coalesce(array_to_string(
         list_sort(list(event_type || ':' || CAST(n * 2 AS VARCHAR))), ','),
         '') AS doubled
FROM per GROUP BY user_id
"""


def unpivot_status_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot's inverse (`DataFrame.unpivot` / SQL UNPIVOT): order
    revenue pivoted wide by status (one column per o_orderstatus),
    then melted back to (month, status, revenue_cents) long form —
    the round-trip every BI export pipeline runs. The oracle computes
    the long form directly, so the wide->long melt must reconstruct
    the original grouping exactly, including the NULL-for-absent cells
    unpivot drops (include_nulls=False, the default match for the
    direct aggregation's absent rows).

    Pivot is one hash aggregation over (month x 3 statuses); unpivot
    is a zero-shuffle projection explode."""
    orders = load_table(spark, sf_dir, "orders")
    wide = (
        orders.groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
        )
    )
    return wide.unpivot(
        ["month"],
        ["O", "F", "P"],
        "status",
        "revenue_cents",
    ).filter(F.col("revenue_cents").isNotNull())


UNPIVOT_SQL = """
SELECT date_trunc('month', o_orderdate) AS month,
       o_orderstatus AS status,
       CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents
FROM orders
WHERE o_orderstatus IN ('O', 'F', 'P')
GROUP BY 1, 2
"""


QUERIES = {
    "hierarchy_rollup": hierarchy_rollup,
    "scalar_variant_extract": scalar_variant_extract,
    "map_function_battery": map_function_battery,
    "unpivot_status_revenue": unpivot_status_revenue,
    "join_full_outer_daily": join_full_outer_daily,
    "setop_bag_ops": setop_bag_ops,
    "scalar_null_battery": scalar_null_battery,
    "array_hof_battery": array_hof_battery,
}

ORACLES = {
    "hierarchy_rollup": HIERARCHY_SQL,
    "scalar_variant_extract": VARIANT_SQL,
    "map_function_battery": MAP_BATTERY_SQL,
    "unpivot_status_revenue": UNPIVOT_SQL,
    "join_full_outer_daily": FULL_OUTER_SQL,
    "setop_bag_ops": SETOP_BAG_SQL,
    "scalar_null_battery": NULL_BATTERY_SQL,
    "array_hof_battery": ARRAY_HOF_SQL,
}
