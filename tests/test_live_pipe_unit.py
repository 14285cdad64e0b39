"""Seam-driven unit tests for the live-Postgres pipes — the protocol
corners a live PostgreSQL 15 cannot produce on demand (it already
skips empty transactions) or that are structural invariants:

- a skip-only peeked batch (B/C frames only) must ADVANCE the slot and
  report a non-drained pseudo-route, or the pipe stalls behind such
  traffic forever while claiming drained (PostgreSQL < 16 emits empty
  transactions for other tables' churn);
- write frames for a relation OID outside the configured tables must
  RAISE, never advance — the slot cannot rewind, so advancing past
  them is unrecoverable data loss;
- the first_sync WAL stamp is taken BEFORE the snapshot read (the
  after-read ordering has a permanent-staleness window: a change
  committed mid-read is invisible to the read's MVCC snapshot yet
  carries a lower LSN than a later stamp, so its replay loses the
  keep-last merge forever).
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from clockpipe_spark.cdc.pgoutput import encode_begin, encode_commit, encode_insert
from clockpipe_spark.sources.jdbc_adapter import JdbcPostgresSource
from clockpipe_spark.streaming.live_pipe import SKIP_ONLY, LivePostgresRoutedPipe

_COLS_SCHEMA = (
    "column_index int, column_name string, data_type string, length int, "
    "nullable boolean, is_primary_key boolean, comment string"
)
_T_COLS = [
    (1, "id", "int4", 0, False, True, ""),
    (2, "v", "text", 0, True, False, ""),
]
_FRAME_SCHEMA = "lsn_txt string, xid_txt string, data_hex string"


class SeamDB:
    """Canned reader/sql_runner: introspection + a scripted frame batch
    per peek call, recording every DDL statement."""

    def __init__(self, spark, frame_batches):
        self.spark = spark
        self.frame_batches = list(frame_batches)
        self.ddl: list[str] = []
        self.calls: list[str] = []

    def reader(self, options):
        q = options.get("query", "")
        if "information_schema.columns" in q:
            self.calls.append("introspect")
            return self.spark.createDataFrame(_T_COLS, _COLS_SCHEMA)
        if "peek_binary_changes" in q:
            batch = self.frame_batches.pop(0) if self.frame_batches else []
            return self.spark.createDataFrame(batch, _FRAME_SCHEMA)
        if "pg_class c JOIN pg_namespace" in q:
            return self.spark.createDataFrame(
                [("t1", 500)], "relname string, oid long"
            )
        if "pg_publication_tables" in q:
            return self.spark.createDataFrame(
                [("public", "t1")], "schema_name string, table_name string"
            )
        if "pg_publication " in q:
            return self.spark.createDataFrame([("pub",)], "name string")
        if "pg_replication_slots" in q:
            return self.spark.createDataFrame(
                [("slot", "reserved")], "slot_name string, wal_status string"
            )
        if "pg_current_wal_lsn" in q:
            self.calls.append("stamp")
            return self.spark.createDataFrame([("0/1000",)], "lsn string")
        if options.get("dbtable"):
            self.calls.append("snapshot_read")
            return self.spark.createDataFrame([(1, "a")], "id int, v string")
        return self.spark.createDataFrame([], "x string")

    def sql_runner(self, sql):
        self.ddl.append(sql)


def _hex(frame: bytes) -> str:
    return frame.hex()


def _pipe(spark, tmp_path, frame_batches):
    db = SeamDB(spark, frame_batches)
    src = JdbcPostgresSource(
        spark, "jdbc:postgresql://unused/db",
        reader=db.reader, sql_runner=db.sql_runner,
    )
    pipe = LivePostgresRoutedPipe(
        spark, src, ["t1"], str(tmp_path), publication="pub", slot="slot",
    )
    pipe.initialize()
    return pipe, db


def test_skip_only_batch_advances_and_is_not_drained(spark, tmp_path):
    skip_batch = [
        ("0/10", "7", _hex(encode_begin())),
        ("0/20", "7", _hex(encode_commit())),
        ("0/30", "8", _hex(encode_begin())),
        ("0/40", "8", _hex(encode_commit())),
    ]
    pipe, db = _pipe(spark, tmp_path, [skip_batch, []])
    out = pipe.sync_iteration()
    assert out == {SKIP_ONLY: {"frames": 4}}  # truthy: NOT drained
    advances = [d for d in db.ddl if "pg_replication_slot_advance" in d]
    assert advances == [
        "SELECT pg_replication_slot_advance('slot', '0/40')"
    ]
    assert pipe.sync_iteration() == {}  # now truly drained (zero frames)


def test_stray_relation_write_frames_raise_without_advancing(spark, tmp_path):
    stray_batch = [
        ("0/10", "7", _hex(encode_begin())),
        # relation oid 999 is NOT a configured table (t1 = 500)
        ("0/20", "7", _hex(encode_insert(999, [("t", "1", None)]))),
        ("0/30", "7", _hex(encode_commit())),
    ]
    pipe, db = _pipe(spark, tmp_path, [stray_batch])
    with pytest.raises(RuntimeError, match="unconfigured relation oids \\[999\\]"):
        pipe.sync_iteration()
    assert not any("pg_replication_slot_advance" in d for d in db.ddl)


def test_first_sync_stamps_before_snapshot_read(spark, tmp_path):
    pipe, db = _pipe(spark, tmp_path, [])
    copied = pipe.first_sync()
    assert copied == {"t1": 1}
    stamp_at = db.calls.index("stamp")
    read_at = db.calls.index("snapshot_read")
    assert stamp_at < read_at, (
        "WAL stamp must precede the snapshot read: stamping after has a "
        "permanent-staleness window for changes committed mid-read"
    )
