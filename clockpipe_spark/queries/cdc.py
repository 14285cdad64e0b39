"""Sync-layer operators (SURVEY.md §2.2-2.4) surfaced as oracle-checked
queries over the events-derived change log (FIXTURES.md §A convention).

Every query here is the batch embodiment of a reference dataflow operator;
the streaming embodiment (same code paths) lives in
clockpipe_spark.streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from clockpipe_spark.catalog import load_table
from clockpipe_spark.cdc.changelog import CHANGELOG_SQL, changelog_from_events
from clockpipe_spark.cdc.ops import (
    align_to_schema,
    apply_changelog_to_snapshot,
    apply_masks,
    keep_last_by_key,
    replica_state,
    route_counts,
)
from clockpipe_spark.functions.casts import (
    mongo_array_double,
    mongo_array_int,
    mongo_array_string,
    mongo_datetime_str,
    mongo_decimal128,
    mongo_epoch_seconds,
    mongo_string_array,
    mongo_timestamp_str,
    pg_bool_parse,
    _F64_RE,
    _RUST_WS,
    pg_datetime_trunc,
    pg_to_int,
    pg_to_real,
)

_CLOG_CTE = f"WITH changelog AS ({CHANGELOG_SQL})"


def _changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    return changelog_from_events(load_table(spark, sf_dir, "events"))


def cdc_keep_last_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — keep-last dedup per PK within a batch (adapter/mod.rs:258-269)."""
    return _changelog(spark, sf_dir).select("seq", "op", "user_id", "value")


CDC_KEEP_LAST_SQL = f"""
{_CLOG_CTE}
SELECT seq, op, user_id, value FROM changelog
"""


def cdc_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    clog = _changelog(spark, sf_dir)
    return keep_last_by_key(clog, ["user_id"]).select(
        "user_id", "seq", "op", F.round("value", 2).alias("value")
    )


CDC_KEEP_LAST_DEDUP_SQL = f"""
{_CLOG_CTE}
SELECT user_id, seq, op, round(value, 2) AS value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY seq DESC) AS rn
  FROM changelog
) WHERE rn = 1
"""


def cdc_replica_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup-on-read 'FINAL' view: ReplacingMergeTree keep-max-seq per
    key + delete filtering (SURVEY.md §2.9)."""
    clog = _changelog(spark, sf_dir)
    return replica_state(clog, ["user_id"]).select(
        "user_id",
        "seq",
        F.round("value", 2).alias("value"),
        pg_datetime_trunc(F.col("ts")).alias("ts"),
    )


CDC_REPLICA_SQL = f"""
{_CLOG_CTE}
SELECT user_id, seq, round(value, 2) AS value, date_trunc('second', ts) AS ts
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY seq DESC) AS rn
  FROM changelog
) WHERE rn = 1 AND op <> 'D'
"""


def cdc_replica_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time replica (time travel): the visible state AS OF a
    historical change-log position — here 60% of max seq — by filtering
    the log to seq <= asof before the same dedup-on-read view
    cdc_replica_state serves. The ClickHouse/Delta time-travel analog a
    replica user runs to audit what a query saw yesterday; on a kept
    change log it is a filter pushed into the scan, no new operator.

    The bound is a 1-row aggregate broadcast back over the log
    (crossJoin of a broadcast single row — no driver collect), so the
    plan stays fully distributed and the fact stream shuffles once, in
    the keep-last window."""
    clog = _changelog(spark, sf_dir)
    bound = clog.agg(
        F.floor(F.max("seq") * 0.6).cast("long").alias("asof_seq")
    )
    hist = clog.crossJoin(F.broadcast(bound)).filter(
        F.col("seq") <= F.col("asof_seq")
    )
    return replica_state(hist, ["user_id"]).select(
        "user_id",
        "seq",
        F.round("value", 2).alias("value"),
        pg_datetime_trunc(F.col("ts")).alias("ts"),
    )


CDC_REPLICA_ASOF_SQL = f"""
{_CLOG_CTE},
bound AS (
  SELECT CAST(floor(max(seq) * 0.6) AS BIGINT) AS asof_seq FROM changelog
)
SELECT user_id, seq, round(value, 2) AS value, date_trunc('second', ts) AS ts
FROM (
  SELECT c.*, row_number() OVER (PARTITION BY user_id ORDER BY seq DESC) AS rn
  FROM changelog c, bound b WHERE c.seq <= b.asof_seq
) WHERE rn = 1 AND op <> 'D'
"""


def cdc_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance (the ClickHouse
    AggregatingMergeTree / materialized-view pattern): a per-shard
    sum/count over the replica is MAINTAINED from the change log —
    base aggregate at seq <= S0 plus an algebraic delta from the
    changes after S0 — instead of recomputed from scratch. The delta
    joins only the touched keys against the base state (at 100 TB:
    delta-sized work per refresh, not corpus-sized), and the oracle
    recomputes the same aggregate directly from the final replica
    state, so a green hash proves the maintenance algebra exactly.

    Values are floor-scaled to integer cents so base + delta is exact
    int64 arithmetic — float sums would associate differently between
    the incremental and recomputed paths.

    Per touched key (keep-last incl. op, the corrected T4 semantics):
    remove its old value if it existed in the base, add its new value
    unless the last op is a delete; count moves by +/-1 only on true
    create/delete transitions."""
    # expr strings throughout (r21, guide §1.2): the Column build issued
    # ~1,200 py4j round trips (~0.5 s profiled on top of the inherent
    # base-state checkpoint job); identical trees, plan_equiv-verified +
    # oracle hash. The replica_state/keep_last_by_key operators keep
    # their Column form — they are the product surface under test.
    clog = _changelog(spark, sf_dir).withColumn(
        "cents", F.expr("CAST(floor(value * 100) AS BIGINT)")
    )
    # 0.6D: a bare 0.6 parses as DECIMAL in Spark SQL, while the Column
    # form multiplied by a python-float double — the D suffix keeps the
    # arithmetic (and the plan) identical
    bound = clog.agg(F.expr("CAST(floor(max(seq) * 0.6D) AS BIGINT) AS s0"))
    clog = clog.crossJoin(F.broadcast(bound))

    # a deployment READS the base state from the persisted view; the
    # self-contained query derives it once and materializes (it feeds
    # both the base aggregate and the touched-key old-value lookup —
    # without this the plan re-derives the full keep-last window twice)
    base_state = (
        replica_state(clog.filter("seq <= s0"), ["user_id"])
        .select("user_id", "cents")
        .localCheckpoint(eager=True)
    )
    base_agg = base_state.groupBy(
        F.expr("user_id % 16").alias("shard")
    ).agg(
        F.expr("sum(cents) AS sum_cents"), F.expr("count(*) AS n_keys")
    )

    delta = keep_last_by_key(
        clog.filter("seq > s0"), ["user_id"]
    ).select("user_id", "op", "cents")
    old = base_state.selectExpr("user_id", "cents AS old_cents")
    moves = delta.join(old, "user_id", "left").selectExpr(
        "user_id % 16 AS shard",
        "(CASE WHEN op != 'D' THEN cents ELSE 0 END"
        " - coalesce(old_cents, 0)) AS d_sum",
        "CASE WHEN op != 'D' AND old_cents IS NULL THEN 1"
        " WHEN op = 'D' AND old_cents IS NOT NULL THEN -1"
        " ELSE 0 END AS d_n",
    )
    delta_agg = moves.groupBy("shard").agg(
        F.expr("sum(d_sum) AS d_sum"), F.expr("sum(d_n) AS d_n")
    )
    return (
        base_agg.join(delta_agg, "shard", "outer")
        .selectExpr(
            "shard",
            "(coalesce(sum_cents, 0) + coalesce(d_sum, 0)) AS sum_cents",
            "(coalesce(n_keys, 0) + coalesce(d_n, 0)) AS n_keys",
        )
        .filter(F.col("n_keys") > 0)
        .orderBy("shard")
    )


# oracle = the RECOMPUTED aggregate over the final replica state: equal
# output proves the incremental algebra, which is the whole point
CDC_INCREMENTAL_AGG_SQL = f"""
{_CLOG_CTE}
SELECT user_id % 16 AS shard,
       CAST(sum(cents) AS BIGINT) AS sum_cents,
       count(*) AS n_keys
FROM (
  SELECT user_id, CAST(floor(value * 100) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY user_id ORDER BY seq DESC) AS rn, op
  FROM changelog
) WHERE rn = 1 AND op <> 'D'
GROUP BY shard ORDER BY shard
"""


def cdc_route_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2+A3 — per-table/per-op routing counters
    (pipes/postgres.rs:295-420, WriteCounter pipes/mod.rs:23-28)."""
    return route_counts(_changelog(spark, sf_dir))


CDC_ROUTE_SQL = f"""
{_CLOG_CTE}
SELECT tbl, op, count(*) AS n_changes FROM changelog GROUP BY tbl, op
"""


def cdc_mask_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 — mask_columns forced to NULL before write
    (adapter/mod.rs:183-185)."""
    clog = _changelog(spark, sf_dir).select("seq", "user_id", "value", "props")
    return apply_masks(clog, ["value", "props"])


CDC_MASK_SQL = f"""
{_CLOG_CTE}
SELECT seq, user_id,
       CAST(NULL AS DOUBLE)  AS value,
       CAST(NULL AS VARCHAR) AS props
FROM changelog
"""


def cdc_align_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 — column-alignment projection against a target schema that has
    one column the source lacks (missing -> typed NULL,
    adapter/postgres.rs:340-345) and drops one the target lacks."""
    clog = _changelog(spark, sf_dir)
    target = T.StructType(
        [
            T.StructField("seq", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("extra_col", T.StringType()),  # not in source
        ]
    )
    return align_to_schema(clog, target)


CDC_ALIGN_SQL = f"""
{_CLOG_CTE}
SELECT seq, user_id, value, CAST(NULL AS VARCHAR) AS extra_col FROM changelog
"""


def cdc_cast_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 — the per-value cast matrix with the reference's quirk semantics
    (§1.3): zero-defaults on failed int/real parses, 't|1|true' bool parse,
    sub-second timestamp truncation. Inputs are strings derived
    deterministically from events."""
    from clockpipe_spark.functions.casts import (
        pg_bool_parse_sql,
        pg_datetime_trunc_sql,
        pg_to_int_sql,
        pg_to_real_sql,
    )

    events = load_table(spark, sf_dir, "events")
    # SQL-twin cast builders (r21, guide §1.2): the Column helpers cost
    # ~620 py4j round trips here (~0.9 s profiled); same trees, one
    # parse call each (plan_equiv-verified + oracle hash)
    src = events.selectExpr(
        "event_id",
        "get_json_object(props, '$.k') AS k_str",  # numeric string
        "event_type AS word_str",  # non-numeric string
        "CASE WHEN value > 100 THEN 't' ELSE 'off' END AS bool_str",
        "ts",
    )
    return src.selectExpr(
        "event_id",
        f"{pg_to_int_sql('k_str')} AS k_int",
        f"{pg_to_int_sql('word_str')} AS word_int",  # -> 0 (quirk)
        f"{pg_to_real_sql('k_str')} AS k_real",
        f"{pg_to_real_sql('word_str')} AS word_real",  # -> 0.0 (quirk)
        f"{pg_bool_parse_sql('bool_str')} AS flag",
        f"{pg_datetime_trunc_sql('ts')} AS ts_sec",
    )


# The oracle encodes the SAME trim-then-parse semantics as the engine
# (r16 whitespace-fidelity fix): DuckDB's 1-arg trim strips only 0x20
# and its TRY_CAST trims ASCII \t..\r+space (a strict subset of Rust's
# White_Space) while accepting '_' digit grouping Rust rejects — so the
# 2-arg trim over the shared _RUST_WS set plus the shared grammar
# regexes, validated BEFORE the cast, mirror pgoutput.rs:82-98 exactly.
CDC_CAST_SQL = f"""
WITH src AS (
  SELECT event_id,
         trim(json_extract_string(props, '$.k'), '{_RUST_WS}') AS k_str,
         trim(event_type, '{_RUST_WS}') AS word_str,
         CASE WHEN value > 100 THEN 't' ELSE 'off' END AS bool_str,
         ts
  FROM events
)
SELECT event_id,
       CASE WHEN regexp_matches(k_str, '^[+-]?[0-9]+$')
            THEN coalesce(TRY_CAST(k_str AS BIGINT), 0) ELSE 0 END  AS k_int,
       CASE WHEN regexp_matches(word_str, '^[+-]?[0-9]+$')
            THEN coalesce(TRY_CAST(word_str AS BIGINT), 0) ELSE 0 END AS word_int,
       CASE WHEN regexp_matches(k_str, '{_F64_RE}')
            THEN coalesce(TRY_CAST(k_str AS DOUBLE), 0.0) ELSE 0.0 END AS k_real,
       CASE WHEN regexp_matches(word_str, '{_F64_RE}')
            THEN coalesce(TRY_CAST(word_str AS DOUBLE), 0.0) ELSE 0.0 END AS word_real,
       coalesce(lower(bool_str) IN ('t', '1', 'true'), FALSE) AS flag,
       date_trunc('second', ts) AS ts_sec
FROM src
"""


def cdc_apply_to_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1+K2 — upsert+delete merge of the change log into a snapshot.

    Snapshot = first event per user (as of its seq); changes = all later
    events. Result = final replica. Exercised end-to-end rather than via
    the helper so the oracle can express the identical semantics."""
    clog = _changelog(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("seq")
    numbered = clog.withColumn("rn", F.row_number().over(w))
    snapshot = numbered.filter(F.col("rn") == 1).select("user_id", "value")
    changes = numbered.filter(F.col("rn") > 1).select("seq", "op", "user_id", "value")
    return apply_changelog_to_snapshot(snapshot, changes, ["user_id"]).select(
        "user_id", F.round("value", 2).alias("value")
    )


CDC_APPLY_SQL = f"""
{_CLOG_CTE},
numbered AS (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY seq) AS rn
  FROM changelog
),
snapshot AS (
  SELECT user_id, value, CAST(-1 AS BIGINT) AS seq, 'I' AS op
  FROM numbered WHERE rn = 1
),
changes AS (
  SELECT user_id, value, seq, op FROM numbered WHERE rn > 1
),
merged AS (
  SELECT * FROM snapshot UNION ALL SELECT * FROM changes
)
SELECT user_id, round(value, 2) AS value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY seq DESC) AS rn2
  FROM merged
) WHERE rn2 = 1 AND op <> 'D'
"""


def cdc_mongo_infer_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mongo-style dynamic schema: infer field types from the first
    observed JSON value (first-type-wins, adapter/mongodb.rs:523-559)
    and project typed columns. The events.props JSON column plays the
    document collection."""
    from clockpipe_spark.cdc.mongo_schema import (
        infer_first_type_wins,
        project_collection,
    )

    events = load_table(spark, sf_dir, "events").select(
        F.col("event_id").alias("seq"), "props"
    )
    schema = infer_first_type_wins(events, "props", "seq")
    return project_collection(events, schema).drop("props")


CDC_MONGO_SQL = """
SELECT event_id AS seq,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
"""


def cdc_pgoutput_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 — pgoutput binary decode, end to end on the wire format: events
    are ENCODED into wire-conformant pgoutput frames (Insert/Update/
    Delete tuples, interleaved Begin/Commit noise, 'u' TOAST markers with
    old tuples), then DECODED by the mapInPandas byte parser
    (cdc/pgoutput.py, mirroring pgoutput.rs:237-554) and projected back
    to typed columns. The DuckDB oracle computes the same projection
    straight from events — any wire-format bug breaks the match.

    Delete frames carry a key-only 'K' tuple (P6 shape: deletes keep the
    PK, adapter/mongodb.rs:314-341), so their value decodes as NULL.
    """
    from clockpipe_spark.cdc.pgoutput import (
        decode_pgoutput,
        encode_begin,
        encode_commit,
        encode_delete,
        encode_insert,
        encode_update,
    )

    from clockpipe_spark.operators.fanout import fanout_repartition

    events = load_table(spark, sf_dir, "events")
    # the encode->decode chain is two Python stages; off a single-file
    # input they would both run as one task (VERDICT r4 fan-out class)
    src = fanout_repartition(events.select("event_id", "user_id", "value", "event_type"))

    def enc(batches):
        import pandas as pd

        for pdf in batches:
            lsn, xid, data = [], [], []
            for eid, uid, val, etype in zip(
                pdf["event_id"], pdf["user_id"], pdf["value"], pdf["event_type"]
            ):
                eid, uid = int(eid), int(uid)
                relid = 16384 + uid % 4
                cells = [
                    ("t", str(eid), None),
                    ("t", str(uid), None),
                    ("t", repr(float(val)), None),
                ]
                if eid % 100 == 0:  # transaction noise the decoder must skip
                    lsn.append(eid), xid.append(eid), data.append(encode_begin())
                if etype == "signup":
                    frame = encode_insert(relid, cells)
                elif etype == "error":
                    frame = encode_delete(relid, cells[:2])
                elif eid % 10 == 0:
                    # unchanged-TOAST value cell, resolved from old tuple
                    frame = encode_update(
                        relid,
                        cells[:2] + [("u", None, None)],
                        old_cells=[("n", None, None), ("n", None, None), cells[2]],
                    )
                else:
                    frame = encode_update(relid, cells)
                lsn.append(eid), xid.append(eid), data.append(frame)
                if eid % 100 == 0:
                    lsn.append(eid), xid.append(eid), data.append(encode_commit())
            yield pd.DataFrame({"lsn": lsn, "xid": xid, "data": data})

    frames = src.mapInPandas(enc, "lsn long, xid long, data binary")
    decoded = decode_pgoutput(frames)
    return decoded.select(
        F.col("lsn").alias("seq"),
        F.col("msg_type").alias("op"),
        F.concat(F.lit("t"), (F.col("relation_id") - 16384).cast("string")).alias("tbl"),
        # get() tolerates the key-only Delete tuples (2 cells) — ANSI mode
        # makes [] on a missing index an error, not NULL
        F.get(F.col("cell_texts"), 1).cast("bigint").alias("user_id"),
        F.get(F.col("cell_texts"), 2).cast("double").alias("value"),
    )


CDC_PGOUTPUT_SQL = """
SELECT event_id AS seq,
       CASE event_type WHEN 'signup' THEN 'I' WHEN 'error' THEN 'D'
            ELSE 'U' END AS op,
       concat('t', CAST(user_id % 4 AS VARCHAR)) AS tbl,
       user_id,
       CASE WHEN event_type = 'error' THEN NULL ELSE value END AS value
FROM events
"""


def cdc_mongo_bson_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BSON cast-table tail battery (adapter/mongodb.rs:355-514): the
    Decimal128 numeric arm, epoch-millis truncating division, DateTime/
    Timestamp '%Y-%m-%d %H:%M:%S' rendering, and the three typed-array
    arms (int/double zero-default, string ' '-placeholder vs filtering).

    Inputs are synthesized from integer columns so both engines build
    byte-identical strings (double->string rendering differs between
    engines — the round-1 hash lesson). Array outputs stringify via
    concat_ws (the driver's hasher can't take list columns), and the
    double arm emits x*10 as bigint for the same reason. All arms are
    pure column expressions — zero shuffle beyond the final sort."""
    ev = load_table(spark, sf_dir, "events")
    ms = ((F.col("event_id") % 1_000_000) * 3_600_123 + 999).cast("bigint")
    dec_in = F.concat(
        F.col("user_id").cast("string"),
        F.lit("."),
        F.lpad((F.col("event_id") % 10_000).cast("string"), 4, "0"),
    )
    arr = F.array(F.col("user_id").cast("string"), F.lit("2.5"), F.lit("x"))
    sarr = F.array(F.col("user_id").cast("string"), F.lit(None).cast("string"))
    return (
        ev.select(
            "event_id",
            F.round(mongo_decimal128(dec_in).cast("double"), 6).alias("dec_val"),
            mongo_epoch_seconds(ms).alias("epoch_s"),
            mongo_datetime_str(ms).alias("dt_str"),
            mongo_timestamp_str((F.col("event_id") % 2_000_000_000)).alias("ts_str"),
            F.concat_ws(
                ",", F.transform(mongo_array_int(arr), lambda x: x.cast("string"))
            ).alias("arr_int"),
            F.concat_ws(
                ",",
                F.transform(
                    mongo_array_double(arr),
                    lambda x: (x * 10).cast("bigint").cast("string"),
                ),
            ).alias("arr_dbl_x10"),
            F.concat_ws(",", mongo_array_string(sarr)).alias("arr_str"),
            F.concat_ws(",", mongo_string_array(sarr)).alias("arr_filtered"),
        )
        # no final orderBy (r15): the range-sampler re-ran every cast
        # arm a second time (the changestream lesson); the gate
        # hash-compares canonically row-sorted frames
    )


CDC_BSON_CASTS_SQL = """
SELECT event_id,
       ROUND(CAST(COALESCE(
           TRY_CAST(CAST(user_id AS VARCHAR) || '.' ||
                    lpad(CAST(event_id % 10000 AS VARCHAR), 4, '0')
                    AS DECIMAL(38,10)), 0) AS DOUBLE), 6) AS dec_val,
       CAST((ms - ms % 1000) / 1000 AS BIGINT) AS epoch_s,
       strftime(epoch_ms(ms), '%Y-%m-%d %H:%M:%S') AS dt_str,
       strftime(epoch_ms((event_id % 2000000000) * 1000),
                '%Y-%m-%d %H:%M:%S') AS ts_str,
       array_to_string(list_transform(arr,
           x -> CAST(CASE WHEN regexp_matches(x, '^[+-]?[0-9]+$')
                          THEN COALESCE(TRY_CAST(x AS BIGINT), 0)
                          ELSE 0 END AS VARCHAR)), ',')
         AS arr_int,
       array_to_string(list_transform(arr,
           x -> CAST(CAST(CASE WHEN regexp_matches(x,
                    '^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?$')
                    THEN CAST(x AS DOUBLE) ELSE 0.0 END * 10 AS BIGINT)
                     AS VARCHAR)), ',') AS arr_dbl_x10,
       array_to_string(list_transform(sarr, x -> COALESCE(x, ' ')), ',')
         AS arr_str,
       array_to_string(list_filter(sarr, x -> x IS NOT NULL), ',')
         AS arr_filtered
FROM (
  SELECT event_id, user_id,
         CAST((event_id % 1000000) * 3600123 + 999 AS BIGINT) AS ms,
         [CAST(user_id AS VARCHAR), '2.5', 'x'] AS arr,
         [CAST(user_id AS VARCHAR), NULL] AS sarr
  FROM events
)
"""


def cdc_changestream_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mongo change-stream event decode end-to-end: synthesize real
    change-stream envelopes (operationType / ns / documentKey /
    fullDocument JSON) from the events fixture, then decode them with
    cdc/mongo_changestream.decode_change_events. Exercises every decode
    rule: I/U keep the UpdateLookup post-image, D keeps the key only,
    'replace' events drop (the reference's `_ => {}` arm,
    pipes/mongodb.rs:412), and the unconfigured 'audit' collection is
    filtered (P5). The oracle is the pure-relational equivalent — the
    decode IS a filter+map, so no JSON on the DuckDB side.

    Event-type mapping here: signup->insert, error->delete,
    view->replace (dropped), click/purchase->update; user_id % 10 == 0
    routes to the unconfigured collection."""
    from clockpipe_spark.cdc.mongo_changestream import decode_change_events

    ev = load_table(spark, sf_dir, "events")
    # expr strings for the envelope synth + final projection (r21,
    # guide §1.2): the Column build issued ~900 py4j round trips
    # (~0.45 s profiled); identical trees parse JVM-side in two calls
    # (plan_equiv-verified + oracle hash). The decode operator itself
    # keeps its Column form — it is the product surface under test.
    op_raw_sql = (
        "CASE WHEN event_type = 'signup' THEN 'insert'"
        " WHEN event_type = 'error' THEN 'delete'"
        " WHEN event_type = 'view' THEN 'replace'"
        " ELSE 'update' END"
    )
    coll_sql = (
        "CASE WHEN user_id % 10 = 0 THEN 'audit'"
        " ELSE concat('t', CAST(user_id % 4 AS STRING)) END"
    )
    raw = ev.selectExpr(
        "event_id AS seq",
        "to_json(struct("
        "struct('8262' AS _data) AS _id,"
        f"{op_raw_sql} AS operationType,"
        f"struct('app' AS db, {coll_sql} AS coll) AS ns,"
        "to_json(struct(user_id)) AS documentKey,"
        "to_json(struct(user_id, value)) AS fullDocument,"
        "event_id AS clusterTime"
        ")) AS event_json",
    )
    decoded = decode_change_events(raw, ["t0", "t1", "t2", "t3"])
    return decoded.selectExpr(
        "seq",
        "op",
        "collection",
        "CAST(get_json_object(key_json, '$.user_id') AS BIGINT) AS key_id",
        "round(CAST(get_json_object(doc_json, '$.value') AS DOUBLE), 6)"
        " AS doc_value",
    )
    # no final orderBy (r14): the gate hash-compares canonically
    # row-sorted frames, and a global sort's range-partitioner SAMPLING
    # pass re-executes the whole synth+parse pipeline a second time
    # (measured: the sort doubled the query, 3.4 -> 6.5 s) — the same
    # waste on a real cluster, where the sample re-runs the scan.


CDC_CHANGESTREAM_SQL = """
SELECT event_id AS seq,
       CASE event_type WHEN 'signup' THEN 'I'
                       WHEN 'error' THEN 'D'
                       ELSE 'U' END AS op,
       concat('t', CAST(user_id % 4 AS VARCHAR)) AS collection,
       user_id AS key_id,
       CASE WHEN event_type <> 'error' THEN round(value, 6) END AS doc_value
FROM events
WHERE user_id % 10 <> 0
  AND event_type <> 'view'
"""


def cdc_lag_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replication-lag monitoring view: the reference logs per-table
    write counters each iteration (WriteCounter, pipes/mod.rs:23-28,
    pipes/postgres.rs:501-510); this turns the same accounting into a
    queryable report. With the applied-through checkpoint pinned at 80%
    of the max LSN (deterministic stand-in for the slot position), each
    table reports its pending change volume by op and the pending LSN
    range — exactly what an operator pages on when the sink falls
    behind.

    Shape: the 1-row max-seq aggregate broadcasts onto the log scan;
    one hash aggregation on tbl. Map-side everything else."""
    log = changelog_from_events(load_table(spark, sf_dir, "events"))
    chk = log.agg(F.floor(F.max("seq") * 0.8).cast("bigint").alias("applied_through"))
    pending = (
        log.crossJoin(F.broadcast(chk))
        .withColumn("is_pending", (F.col("seq") > F.col("applied_through")).cast("int"))
    )
    return (
        pending.groupBy("tbl", "applied_through")
        .agg(
            F.sum("is_pending").alias("n_pending"),
            F.sum(((F.col("op") == "I") & (F.col("is_pending") == 1)).cast("int")).alias("n_ins"),
            F.sum(((F.col("op") == "U") & (F.col("is_pending") == 1)).cast("int")).alias("n_upd"),
            F.sum(((F.col("op") == "D") & (F.col("is_pending") == 1)).cast("int")).alias("n_del"),
            F.min(F.when(F.col("is_pending") == 1, F.col("seq"))).alias("first_pending_seq"),
            F.max(F.when(F.col("is_pending") == 1, F.col("seq"))).alias("last_pending_seq"),
        )
        .orderBy("tbl")
    )


CDC_LAG_SQL = f"""
WITH log AS ({CHANGELOG_SQL}),
chk AS (SELECT CAST(floor(max(seq) * 0.8) AS BIGINT) AS applied_through FROM log),
p AS (
  SELECT log.*, chk.applied_through,
         CASE WHEN seq > applied_through THEN 1 ELSE 0 END AS is_pending
  FROM log CROSS JOIN chk
)
SELECT tbl, applied_through,
       CAST(sum(is_pending) AS BIGINT) AS n_pending,
       CAST(sum(CASE WHEN op = 'I' AND is_pending = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_ins,
       CAST(sum(CASE WHEN op = 'U' AND is_pending = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_upd,
       CAST(sum(CASE WHEN op = 'D' AND is_pending = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_del,
       min(CASE WHEN is_pending = 1 THEN seq END) AS first_pending_seq,
       max(CASE WHEN is_pending = 1 THEN seq END) AS last_pending_seq
FROM p GROUP BY tbl, applied_through ORDER BY tbl
"""


def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build from the change log: every
    surviving change becomes a versioned row with a [valid_from_seq,
    valid_to_seq) interval in LSN order; deletes emit no version but
    close the previous one; the open interval (valid_to NULL) marks the
    current row — the materialized twin of `cdc_replica_asof` time
    travel (any historical state is `valid_from <= S < valid_to`).

    ClickHouse users build this over the ReplacingMergeTree log with
    argMax chains; here it is ONE lead() window per key: the log
    shuffles once on user_id, lead() runs over ALL ops (so a delete
    still closes its predecessor), and the delete rows drop only after
    supplying their boundary. No join, no second shuffle; at 100 TB
    history build cost is the one keyed exchange it cannot avoid."""
    clog = _changelog(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("seq")
    versions = clog.select(
        "user_id",
        "op",
        F.col("seq").alias("valid_from_seq"),
        F.lead("seq").over(w).alias("valid_to_seq"),
        F.round("value", 2).alias("value"),
    )
    return versions.filter(F.col("op") != "D").select(
        "user_id",
        "valid_from_seq",
        "valid_to_seq",
        "value",
        F.col("valid_to_seq").isNull().cast("int").alias("is_current"),
    )


CDC_SCD2_SQL = f"""
{_CLOG_CTE}
SELECT user_id, valid_from_seq, valid_to_seq, value,
       CAST(valid_to_seq IS NULL AS INT) AS is_current
FROM (
  SELECT user_id, op, seq AS valid_from_seq,
         lead(seq) OVER (PARTITION BY user_id ORDER BY seq) AS valid_to_seq,
         round(value, 2) AS value
  FROM changelog
) WHERE op <> 'D'
"""


def cdc_conflict_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-order-arrival audit: per routed table, how many changes
    arrived (LSN order) with an EVENT TIME older than something already
    seen for the same key, and how stale the worst one was — the
    monitoring view that tells a replica operator whether max-seq
    conflict resolution (T4) is actually being exercised and whether
    event-time consumers need a watermark allowance.

    One keyed window (max ts over strictly-preceding seqs) + a
    table-grained rollup; integer-microsecond lateness (unix_micros)
    keeps the comparison engine-exact. The log shuffles once, on the
    key — co-partitioned with every other per-key CDC analytic."""
    clog = _changelog(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = clog.select(
        "tbl",
        "seq",
        F.unix_micros("ts").alias("us"),
        F.max(F.unix_micros("ts")).over(w).alias("prev_max_us"),
    ).select(
        "tbl",
        (F.col("prev_max_us") > F.col("us")).cast("int").alias("is_late"),
        F.when(
            F.col("prev_max_us") > F.col("us"),
            F.col("prev_max_us") - F.col("us"),
        ).otherwise(F.lit(0)).alias("late_us"),
    )
    return marked.groupBy("tbl").agg(
        F.count("*").alias("n_changes"),
        F.sum("is_late").cast("bigint").alias("n_late"),
        (F.max("late_us") / F.lit(1_000_000)).cast("long").alias("max_late_s"),
        F.expr("(sum(is_late) * 1000000L) div count(*)").alias("late_ppm"),
    )


CDC_CONFLICT_SQL = f"""
{_CLOG_CTE},
marked AS (
  SELECT tbl,
         CAST(max(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY seq
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) > epoch_us(ts) AS INT) AS is_late_raw,
         greatest(coalesce(max(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY seq
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) - epoch_us(ts), 0), 0) AS late_us
  FROM changelog
)
SELECT tbl,
       count(*) AS n_changes,
       CAST(sum(coalesce(is_late_raw, 0)) AS BIGINT) AS n_late,
       CAST(max(late_us) // 1000000 AS BIGINT) AS max_late_s,
       CAST((sum(coalesce(is_late_raw, 0)) * 1000000) // count(*) AS BIGINT) AS late_ppm
FROM marked GROUP BY tbl
"""


_DIFF_LO = 0.4  # S0: snapshot-diff lower bound (fraction of max seq)
_DIFF_HI = 0.8  # S1: upper bound


def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit diff between two historical replica states (AS OF 40% and
    80% of the log): which keys were added, removed, or changed in
    between — the "what happened to the replica since yesterday"
    question, answered from the kept change log alone with no stored
    snapshots (the time-travel view `cdc_replica_asof`, twice, plus a
    FULL OUTER join on the key).

    Values compare in integer cents. Both keep-last windows and the
    diff join shuffle on user_id — one co-partitioned exchange chain;
    the seq bounds are a broadcast 1-row aggregate, never a driver
    collect."""
    clog = _changelog(spark, sf_dir).withColumn(
        "cents", F.floor(F.col("value") * 100).cast("long")
    )
    bounds = clog.agg(
        F.floor(F.max("seq") * _DIFF_LO).cast("long").alias("s0"),
        F.floor(F.max("seq") * _DIFF_HI).cast("long").alias("s1"),
    )
    clog = clog.crossJoin(F.broadcast(bounds))

    def state_at(bound_col: str) -> DataFrame:
        return replica_state(
            clog.filter(F.col("seq") <= F.col(bound_col)), ["user_id"]
        ).select("user_id", F.col("cents"))

    old = state_at("s0").withColumnRenamed("cents", "old_cents")
    new = state_at("s1").withColumnRenamed("cents", "new_cents")
    diff = old.join(new, "user_id", "full_outer")
    status = (
        F.when(F.col("old_cents").isNull(), "added")
        .when(F.col("new_cents").isNull(), "removed")
        .when(F.col("old_cents") != F.col("new_cents"), "changed")
        .otherwise("unchanged")
    )
    return diff.select("user_id", status.alias("status"), "old_cents", "new_cents")


CDC_SNAPSHOT_DIFF_SQL = f"""
{_CLOG_CTE},
bounds AS (
  SELECT CAST(floor(max(seq) * {_DIFF_LO}) AS BIGINT) AS s0,
         CAST(floor(max(seq) * {_DIFF_HI}) AS BIGINT) AS s1
  FROM changelog
),
old AS (
  SELECT user_id, CAST(floor(value * 100) AS BIGINT) AS old_cents
  FROM (
    SELECT c.*, row_number() OVER (PARTITION BY user_id ORDER BY seq DESC) AS rn
    FROM changelog c, bounds b WHERE c.seq <= b.s0
  ) WHERE rn = 1 AND op <> 'D'
),
new AS (
  SELECT user_id, CAST(floor(value * 100) AS BIGINT) AS new_cents
  FROM (
    SELECT c.*, row_number() OVER (PARTITION BY user_id ORDER BY seq DESC) AS rn
    FROM changelog c, bounds b WHERE c.seq <= b.s1
  ) WHERE rn = 1 AND op <> 'D'
)
SELECT coalesce(old.user_id, new.user_id) AS user_id,
       CASE WHEN old_cents IS NULL THEN 'added'
            WHEN new_cents IS NULL THEN 'removed'
            WHEN old_cents <> new_cents THEN 'changed'
            ELSE 'unchanged' END AS status,
       old_cents, new_cents
FROM old FULL OUTER JOIN new ON old.user_id = new.user_id
"""


def cdc_scd2_asof_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 consumption: the dimension-state summary (live rows +
    value mass in integer cents) at 10 evenly spaced historical seq
    positions, answered by interval containment against the type-2
    history — the "join your facts to the dimension AS OF then" access
    pattern, and an independent cross-check of `cdc_replica_asof`
    (both must describe the same state at the same bound).

    The probes are a broadcast 10-row derived table (never a driver
    collect); containment is a broadcast range predicate fused into
    the history scan, so the lookup runs at scan speed on top of the
    one keyed exchange the history build already paid. At 100 TB a
    fact-table-sized probe side would bucket both sides on the key
    first — the probe-grid shape here is the dashboard variant."""
    clog = _changelog(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("seq")
    hist = clog.select(
        "user_id",
        "op",
        F.col("seq").alias("valid_from_seq"),
        F.lead("seq").over(w).alias("valid_to_seq"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    ).filter(F.col("op") != "D")
    probes = clog.agg(F.max("seq").alias("mx")).select(
        F.explode(
            F.expr("transform(sequence(1L, 10L), i -> mx * i div 10L)")
        ).alias("probe_seq")
    )
    live = hist.crossJoin(F.broadcast(probes)).filter(
        (F.col("valid_from_seq") <= F.col("probe_seq"))
        & (
            F.col("valid_to_seq").isNull()
            | (F.col("probe_seq") < F.col("valid_to_seq"))
        )
    )
    return live.groupBy("probe_seq").agg(
        F.count("*").alias("n_live"),
        F.sum("cents").alias("total_cents"),
    )


CDC_SCD2_ASOF_SQL = f"""
{_CLOG_CTE},
hist AS (
  SELECT user_id, op, seq AS valid_from_seq,
         lead(seq) OVER (PARTITION BY user_id ORDER BY seq) AS valid_to_seq,
         CAST(floor(value * 100) AS BIGINT) AS cents
  FROM changelog
),
probes AS (
  SELECT (SELECT max(seq) FROM changelog) * i // 10 AS probe_seq
  FROM unnest(generate_series(1, 10)) AS t(i)
)
SELECT p.probe_seq, count(*) AS n_live,
       CAST(sum(h.cents) AS BIGINT) AS total_cents
FROM probes p JOIN hist h
  ON h.op <> 'D'
 AND h.valid_from_seq <= p.probe_seq
 AND (h.valid_to_seq IS NULL OR p.probe_seq < h.valid_to_seq)
GROUP BY 1
"""


_CK_P = 2147483647  # 2^31 - 1, shared with the corpus hash battery


def cdc_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replica anti-entropy checksum (the pt-table-checksum /
    pg_comparator role): per routed table, an order-insensitive
    content checksum of the FINAL keyed state — run the same statement
    on source and replica and compare one row per table instead of
    moving data. The reference has no verification pass at all; this
    is the operational check its users run by hand after an incident.

    The row digest is a portable polynomial hash over (user_id,
    integer cents) mod 2^31-1 — pure int64 arithmetic both engines
    compute bit-for-bit (never engine hash functions, which differ) —
    and the table checksum is the SUM mod p of row digests: sum is
    commutative, so the checksum is partition-order-free and MERGEABLE
    (shard checksums add), which is what makes it a one-aggregation
    scan at any scale. Collision odds are 1/2^31 per comparison —
    the operational check, not a cryptographic one."""
    clog = _changelog(spark, sf_dir)
    w = Window.partitionBy("tbl", "user_id").orderBy(F.col("seq").desc())
    final = (
        clog.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select(
            "tbl",
            "user_id",
            F.floor(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    h = F.expr(
        f"(pmod(user_id, {_CK_P}) * 31 + pmod(cents, {_CK_P})) % {_CK_P}"
    )
    return final.select("tbl", h.alias("h")).groupBy("tbl").agg(
        F.count("*").alias("n_rows"),
        F.expr(f"sum(h) % {_CK_P}").cast("long").alias("checksum"),
    )


CDC_CHECKSUM_SQL = f"""
{_CLOG_CTE},
final AS (
  SELECT tbl, user_id, CAST(floor(value * 100) AS BIGINT) AS cents
  FROM (
    SELECT c.*, row_number() OVER (
      PARTITION BY tbl, user_id ORDER BY seq DESC
    ) AS rn
    FROM changelog c
  ) WHERE rn = 1 AND op <> 'D'
)
SELECT tbl, count(*) AS n_rows,
       CAST(sum((((user_id % {_CK_P} + {_CK_P}) % {_CK_P}) * 31
                 + (cents % {_CK_P} + {_CK_P}) % {_CK_P}) % {_CK_P})
            % {_CK_P} AS BIGINT) AS checksum
FROM final GROUP BY tbl
"""


QUERIES = {
    "cdc_changelog": cdc_keep_last_per_key,
    "cdc_scd2_asof_counts": cdc_scd2_asof_counts,
    "cdc_table_checksum": cdc_table_checksum,
    "cdc_scd2_history": cdc_scd2_history,
    "cdc_conflict_audit": cdc_conflict_audit,
    "cdc_snapshot_diff": cdc_snapshot_diff,
    "cdc_lag_report": cdc_lag_report,
    "cdc_mongo_bson_casts": cdc_mongo_bson_casts,
    "cdc_changestream_decode": cdc_changestream_decode,
    "cdc_pgoutput_roundtrip": cdc_pgoutput_roundtrip,
    "cdc_mongo_infer_project": cdc_mongo_infer_project,
    "cdc_keep_last": cdc_keep_last,
    "cdc_replica_state": cdc_replica_state,
    "cdc_replica_asof": cdc_replica_asof,
    "cdc_incremental_agg": cdc_incremental_agg,
    "cdc_route_counts": cdc_route_counts,
    "cdc_mask_columns": cdc_mask_columns,
    "cdc_align_projection": cdc_align_projection,
    "cdc_cast_matrix": cdc_cast_matrix,
    "cdc_apply_to_snapshot": cdc_apply_to_snapshot,
}

ORACLES = {
    "cdc_changelog": CDC_KEEP_LAST_SQL,
    "cdc_scd2_history": CDC_SCD2_SQL,
    "cdc_scd2_asof_counts": CDC_SCD2_ASOF_SQL,
    "cdc_table_checksum": CDC_CHECKSUM_SQL,
    "cdc_conflict_audit": CDC_CONFLICT_SQL,
    "cdc_snapshot_diff": CDC_SNAPSHOT_DIFF_SQL,
    "cdc_lag_report": CDC_LAG_SQL,
    "cdc_mongo_bson_casts": CDC_BSON_CASTS_SQL,
    "cdc_changestream_decode": CDC_CHANGESTREAM_SQL,
    "cdc_pgoutput_roundtrip": CDC_PGOUTPUT_SQL,
    "cdc_mongo_infer_project": CDC_MONGO_SQL,
    "cdc_keep_last": CDC_KEEP_LAST_DEDUP_SQL,
    "cdc_replica_state": CDC_REPLICA_SQL,
    "cdc_replica_asof": CDC_REPLICA_ASOF_SQL,
    "cdc_incremental_agg": CDC_INCREMENTAL_AGG_SQL,
    "cdc_route_counts": CDC_ROUTE_SQL,
    "cdc_mask_columns": CDC_MASK_SQL,
    "cdc_align_projection": CDC_ALIGN_SQL,
    "cdc_cast_matrix": CDC_CAST_SQL,
    "cdc_apply_to_snapshot": CDC_APPLY_SQL,
}
