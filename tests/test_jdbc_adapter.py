"""JdbcPostgresSource contract tests with mocked reader/sql_runner seams
(no JDBC driver in this container; the seams are the network boundary)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from clockpipe_spark.sources.jdbc_adapter import JdbcPostgresSource, PgColumn


_COLS_SCHEMA = (
    "column_index int, column_name string, data_type string, length int, "
    "nullable boolean, is_primary_key boolean, comment string"
)


class FakeDB:
    """reader/sql_runner pair backed by canned result sets, recording
    every SQL and option dict it sees."""

    def __init__(self, spark, results):
        self.spark = spark
        self.results = results  # list of (substring, rows, schema)
        self.queries: list[str] = []
        self.read_options: list[dict] = []
        self.ddl: list[str] = []

    def reader(self, options):
        self.read_options.append(options)
        sql = options.get("query", "")
        self.queries.append(sql)
        if "query" not in options:  # snapshot dbtable read
            return self.spark.createDataFrame([], "id long")
        for substr, rows, schema in self.results:
            if substr in sql:
                return self.spark.createDataFrame(rows, schema)
        return self.spark.createDataFrame([], "x string")

    def sql_runner(self, sql):
        self.ddl.append(sql)


_ORDERS_COLUMNS = [
    (1, "o_orderkey", "int8", 0, False, True, "pk"),
    (2, "o_custkey", "int4", 0, False, False, ""),
    (3, "o_comment", "varchar", 79, True, False, ""),
    (4, "o_totalprice", "numeric", 0, True, False, ""),
]


def _source(spark, results, **kw):
    db = FakeDB(spark, results)
    src = JdbcPostgresSource(
        spark,
        "jdbc:postgresql://db:5432/app",
        reader=db.reader,
        sql_runner=db.sql_runner,
        **kw,
    )
    return src, db


def test_list_columns_maps_types_and_renumbers(spark):
    # reference renumbers ordinals from 1 even with gaps
    # (adapter/postgres.rs:748-755) — feed gapped ordinals
    gapped = [(10, *r[1:]) for r in _ORDERS_COLUMNS]
    src, db = _source(spark, [("information_schema.columns", gapped, _COLS_SCHEMA)])
    cols = src.list_columns("orders")
    assert [c.column_index for c in cols] == [1, 2, 3, 4]
    assert cols[0] == PgColumn(1, "o_orderkey", "int8", 0, False, True, "pk")
    assert "table_schema = 'public'" in db.queries[0]
    schema = src.spark_schema("orders")
    assert schema["o_orderkey"].dataType == T.LongType()
    assert schema["o_custkey"].dataType == T.IntegerType()
    assert schema["o_comment"].dataType == T.StringType()  # varchar fallback
    assert schema["o_totalprice"].dataType == T.DecimalType(38, 10)
    assert src.primary_key("orders") == ["o_orderkey"]


def test_estimate_row_count_uses_reltuples(spark):
    src, db = _source(
        spark, [("reltuples", [(1_500_000,)], "estimate bigint")]
    )
    assert src.estimate_row_count("orders") == 1_500_000
    assert "pg_class" in db.queries[0] and "relname = 'orders'" in db.queries[0]


def test_snapshot_partitions_on_integral_pk(spark):
    src, db = _source(
        spark,
        [
            ("information_schema.columns", _ORDERS_COLUMNS, _COLS_SCHEMA),
            ("min(o_orderkey)", [(1, 6_000_000)], "lo long, hi long"),
        ],
        num_partitions=16,
    )
    src.snapshot("orders")
    opts = db.read_options[-1]
    assert opts["dbtable"] == "public.orders"
    assert opts["partitionColumn"] == "o_orderkey"
    assert (opts["lowerBound"], opts["upperBound"]) == ("1", "6000000")
    assert opts["numPartitions"] == "16"
    assert opts["fetchsize"] == "10000"


def test_snapshot_falls_back_serial_without_integral_pk(spark):
    # PK is varchar -> no partition options (single-stream read, like
    # the reference's one COPY)
    cols = [(1, "k", "varchar", 32, False, True, "")]
    src, db = _source(spark, [("information_schema.columns", cols, _COLS_SCHEMA)])
    src.snapshot("dim")
    opts = db.read_options[-1]
    assert opts["dbtable"] == "public.dim"
    assert "partitionColumn" not in opts
    # empty table with integral PK also falls back
    src2, db2 = _source(
        spark,
        [
            ("information_schema.columns", _ORDERS_COLUMNS, _COLS_SCHEMA),
            ("min(o_orderkey)", [(None, None)], "lo long, hi long"),
        ],
    )
    src2.snapshot("orders")
    assert "partitionColumn" not in db2.read_options[-1]


def test_setup_publication_from_scratch(spark):
    # nothing exists: create publication for all tables, then slot
    # (pipes/postgres.rs:521-612 step 1 + 3; step 2 no-ops because the
    # fresh publication query still returns the canned empty set -> the
    # adapter re-adds, matching the reference's idempotent ALTER loop)
    src, db = _source(spark, [])
    issued = src.setup_publication("pub", "slot1", ["orders", "customer"])
    assert issued[0] == (
        "CREATE PUBLICATION pub FOR TABLE public.orders, public.customer"
    )
    assert issued[-1] == (
        "SELECT pg_create_logical_replication_slot('slot1', 'pgoutput')"
    )
    assert db.ddl == issued


def test_setup_publication_adds_only_missing_tables(spark):
    results = [
        ("pg_publication WHERE", [("pub",)], "name string"),
        (
            "pg_publication_tables",
            [("public", "orders")],
            "schema_name string, table_name string",
        ),
        ("pg_replication_slots", [("slot1", "reserved")],
         "slot_name string, wal_status string"),
    ]
    src, db = _source(spark, results)
    issued = src.setup_publication("pub", "slot1", ["orders", "customer"])
    # publication + slot exist; only the missing table is added
    assert issued == ["ALTER PUBLICATION pub ADD TABLE public.customer"]


def test_identifier_validation_blocks_injection(spark):
    src, _ = _source(spark, [])
    with pytest.raises(ValueError):
        src.list_columns("orders; DROP TABLE x")
    with pytest.raises(ValueError):
        src.setup_publication("pub", "bad-slot", ["orders"])


def test_setup_publication_requires_tables(spark):
    src, _ = _source(spark, [])
    with pytest.raises(ValueError):
        src.setup_publication("pub", "slot1", [])


# -- live integration (auto-upgrades when an environment provides them) ----
#
# Gated twice: psycopg (or psycopg2) must be importable AND
# CLOCKPIPE_TEST_PG_URL must point at a reachable Postgres with a JDBC
# driver jar on the Spark classpath. No container here ships either, so
# these skip today — but if a future environment does, the mocked-seam
# contracts above upgrade to a real network round-trip with zero edits.


def _live_pg_url():
    import os

    return os.environ.get("CLOCKPIPE_TEST_PG_URL")


def test_live_introspection_roundtrip(spark):
    import pytest

    pg = pytest.importorskip("psycopg", reason="no postgres driver in container")
    url = _live_pg_url()
    if not url:
        pytest.skip("CLOCKPIPE_TEST_PG_URL not set")
    # seed a table directly, then introspect + snapshot through the adapter
    dsn = url.replace("jdbc:postgresql://", "postgresql://")
    with pg.connect(dsn) as conn:
        conn.execute("DROP TABLE IF EXISTS clockpipe_live_t")
        conn.execute(
            "CREATE TABLE clockpipe_live_t (id bigint PRIMARY KEY, v text)"
        )
        conn.execute(
            "INSERT INTO clockpipe_live_t SELECT g, 'v' || g FROM generate_series(1, 100) g"
        )
        conn.commit()
    src = JdbcPostgresSource(spark, url)
    cols = src.list_columns("clockpipe_live_t")
    assert [c.column_name for c in cols] == ["id", "v"]
    assert cols[0].is_primary_key
    assert src.primary_key("clockpipe_live_t") == ["id"]
    df = src.snapshot("clockpipe_live_t")
    assert df.count() == 100
    assert src.estimate_row_count("clockpipe_live_t") >= 0


def test_peek_changes_sql_and_frame_shape(spark):
    """peek_changes issues the reference's peek call (peek, not get;
    pgoutput proto 1; publication routed; NULL cap by default) and
    folds the portable (lsn_txt, xid_txt, data_hex) wire rendering
    into the (lsn long, xid long, data binary) PeekWalChangeResult
    shape — including the 64-bit X/Y pg_lsn split."""
    rows = [
        ("0/15ADB30", "748", "49000040024e0002740000000131740000000161"),
        ("1/A", "749", "43" + "00" * 25),
    ]
    db_results = [("pg_logical_slot_peek_binary_changes", rows,
                   "lsn_txt string, xid_txt string, data_hex string")]
    src, db = _source(spark, db_results)
    got = src.peek_changes("slot9", "pub9").collect()
    sql = db.queries[-1]
    assert "pg_logical_slot_peek_binary_changes('slot9', NULL, NULL" in sql
    assert "'proto_version', '1', 'publication_names', 'pub9'" in sql
    assert got[0]["lsn"] == 0x15ADB30 and got[0]["xid"] == 748
    assert bytes(got[0]["data"])[:1] == b"I"
    assert got[1]["lsn"] == (1 << 32) | 0xA  # X/Y halves weighted 2^32
    assert bytes(got[1]["data"])[:1] == b"C"


def test_peek_changes_cap_and_advance_contract(spark):
    src, db = _source(spark, [("peek_binary_changes", [],
                               "lsn_txt string, xid_txt string, data_hex string")])
    src.peek_changes("s", "p", limit=65_536).collect()
    assert "pg_logical_slot_peek_binary_changes('s', NULL, 65536" in db.queries[-1]
    issued = src.advance_slot("s", (1 << 32) | 0x15ADB30)
    assert issued == "1/15ADB30"
    assert db.ddl == [
        "SELECT pg_replication_slot_advance('s', '1/15ADB30')"
    ]
    with pytest.raises(ValueError):
        src.advance_slot("bad; DROP TABLE x", 0)


def test_peek_changes_is_materialized_and_stable(spark):
    """pg_logical_slot_peek_binary_changes is a VOLATILE server
    function: a lazy plan would re-peek on every action, so a caller
    applying frames in one action and computing the advance LSN in
    another could advance past transactions it never applied.
    peek_changes must therefore materialize ONE execution.  The fake
    reader returns a non-deterministic frame (rand-derived lsn); two
    actions over the result must agree."""
    from pyspark.sql import functions as F

    def volatile_reader(options):
        return spark.range(8).select(
            F.concat(
                F.lit("0/"),
                F.upper(F.hex((F.rand() * 1e9).cast("long"))),
            ).alias("lsn_txt"),
            F.lit("7").alias("xid_txt"),
            F.lit("42").alias("data_hex"),
        )

    src = JdbcPostgresSource(
        spark, "jdbc:postgresql://db:5432/app",
        reader=volatile_reader, sql_runner=lambda sql: None,
    )
    frames = src.peek_changes("s", "p")
    first = [r["lsn"] for r in frames.collect()]
    second = [r["lsn"] for r in frames.collect()]
    third = frames.agg(F.max("lsn")).first()[0]
    assert first == second
    assert third == max(first)


def test_lsn_codec_roundtrip():
    from clockpipe_spark.sources.jdbc_adapter import lsn_from_text, lsn_to_text

    for txt in ("0/15ADB30", "1/A", "FFFFFFFF/FFFFFFFF", "0/0"):
        assert lsn_to_text(lsn_from_text(txt)) == txt
    assert lsn_from_text("1/A") == (1 << 32) | 0xA
