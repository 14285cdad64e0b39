"""LivePostgresCdcPipe — the IPipe lifecycle (initialize → first_sync →
sync_loop, pipes/mod.rs:11-16) against a REAL PostgreSQL server, end to
end: partitioned snapshot through ``JdbcPostgresSource``, changes
through the capped ``peek_changes`` → ``decode_pgoutput`` → typed
projection → keep-last → ``ReplicaStore.merge_changes`` chain, cursor =
the replication slot itself, advanced only AFTER the merge commits
(T2's peek-then-advance at-least-once protocol, pipes/postgres.rs:
487-499).  A crash between merge and advance replays the batch; the
versioned keyed merge absorbs the duplicates, exactly like the
parquet-changelog twin (`ParquetCdcPipe`).

Snapshot/replay idempotence anchor: the initial copy is stamped with
``pg_current_wal_lsn()`` taken AFTER the slot exists and AFTER the
snapshot read — any change the slot replays from during-snapshot
transactions carries a lower LSN and loses to the snapshot rows in the
keep-last merge, while post-snapshot changes win (pipes/postgres.rs:
136-160's skip-guard plus ReplacingMergeTree versioning, in one rule).

Documented parity limitation: a PRIMARY-KEY-changing UPDATE applies as
an upsert of the NEW key only (the old-key row survives until a later
delete), because the apply path keys on the new image — the same
behavior the reference's ReplacingMergeTree sink exhibits.  The wire
carries the old key ('K' tuple; pinned in test_live_postgres.py) so a
future tombstone-splitting apply is possible without decoder changes.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from clockpipe_spark.cdc.pgoutput import decode_pgoutput
from clockpipe_spark.config import PipeConfig
from clockpipe_spark.sources.jdbc_adapter import JdbcPostgresSource, PgColumn
from clockpipe_spark.streaming.replica import ReplicaStore


def _typed_cell(idx: int, col: PgColumn) -> Column:
    """Positional text cell -> the column's Spark type.  pgoutput text
    renderings cast cleanly for the scalar tail ('t'/'f' bools included
    — Spark's boolean cast accepts them); bytea's '\\x…' hex rendering
    folds through unhex.  NULL cells stay NULL through every branch.

    ``F.get`` (NULL on out-of-range, even under ANSI) instead of the
    ``[]`` accessor: after an ADD COLUMN, the same batch can carry
    pre-ALTER frames with FEWER cells than the refreshed column list —
    those rows never had the new column, so NULL is the correct value
    (a no-default ADD COLUMN leaves them NULL server-side too)."""
    c = F.get(F.col("cell_texts"), F.lit(idx))
    if col.data_type == "bytea":
        return F.unhex(F.substring(c, 3, 1 << 30)).alias(col.column_name)
    return c.cast(col.spark_type).alias(col.column_name)


class LivePostgresCdcPipe:
    """One table, one publication, one pgoutput slot — the reference's
    per-pipe unit — synced continuously into a local ``ReplicaStore``."""

    def __init__(
        self,
        spark: SparkSession,
        source: JdbcPostgresSource,
        table: str,
        target_root: str,
        publication: str,
        slot: str,
        config: PipeConfig | None = None,
        keys: Sequence[str] | None = None,
    ):
        self.spark = spark
        self.source = source
        self.table = table
        self.publication = publication
        self.slot = slot
        self.config = config or PipeConfig()
        self.store = ReplicaStore(os.path.join(target_root, "replica"))
        self.columns = source.list_columns(table)
        if not self.columns:
            raise ValueError(f"table {table!r} has no columns (missing?)")
        self.keys = list(keys) if keys else [
            c.column_name for c in self.columns if c.is_primary_key
        ]
        if not self.keys:
            raise ValueError(
                f"table {table!r} has no primary key and no explicit keys"
            )

    # -- lifecycle (pipes/mod.rs:11-16) -----------------------------------
    def initialize(self) -> list[str]:
        """Find-or-create the publication + slot (idempotent); the slot
        MUST exist before the snapshot so during/after-snapshot changes
        are retained for replay."""
        return self.source.setup_publication(
            self.publication, self.slot, [self.table]
        )

    def first_sync(self) -> int | None:
        """Initial copy, idempotent-guarded (K6): skipped when the
        target already has a version (pipes/postgres.rs:136-160).
        Snapshot rows are stamped with the post-read WAL position."""
        if self.store.current_version() >= 0:
            return None
        # cast to the introspected Spark types so snapshot state and
        # decoded changes merge under ONE schema (a JDBC relation
        # already delivers these types; the cast is a no-op there)
        snap = self.source.snapshot(self.table).select(
            *[
                F.col(c.column_name).cast(c.spark_type).alias(c.column_name)
                for c in self.columns
            ]
        )
        n = snap.count()  # materialize the read BEFORE taking the stamp
        stamp = self.source.current_wal_lsn()
        self.store.write(
            snap.withColumn("last_seq", F.lit(stamp).cast("long"))
            .withColumn("__deleted", F.lit(False))
        )
        return n

    def _typed_changes(self, decoded: DataFrame) -> DataFrame:
        return decoded.select(
            F.col("lsn").alias("seq"),
            F.col("msg_type").alias("op"),
            *[_typed_cell(i, c) for i, c in enumerate(self.columns)],
        )

    def sync_iteration(self) -> dict[str, int]:
        """One peek → decode → (truncate) → typed merge → advance turn
        (T1, pipes/postgres.rs:260-517).  Returns per-op counters (A3);
        empty dict = drained.  The advance target is the max LSN over
        ALL frames — the batch's trailing COMMIT — because advancing to
        any LSN before a commit record replays that whole transaction."""
        frames = self.source.peek_changes(
            self.slot, self.publication, self.config.peek_changes_limit
        )
        # frames are materialized (one volatile peek); decode once, reuse
        decoded = decode_pgoutput(frames).persist()
        try:
            stats = decoded.groupBy("msg_type").agg(
                F.count("*").alias("n"), F.max("lsn").alias("mx")
            ).collect()
            if not stats:
                return {}
            advance_to = frames.agg(F.max("lsn")).first()[0]
            counters = {r["msg_type"]: r["n"] for r in stats}

            # K5 (schema evolution, live form): a frame carrying MORE
            # cells than the known column list means the source table
            # grew a column mid-stream — re-introspect, and the store
            # merge's unionByName NULL-fills history.  Pre-ALTER frames
            # in the same batch read NULL for the tail via F.get —
            # correct for a no-default ADD COLUMN; a DEFAULT-backfilled
            # add converges on the next touch of each row (documented
            # at-least-once parity).  Narrowing DDL (DROP/reorder)
            # shifts positional cells and requires a pipe restart, the
            # same contract the reference's introspect-once client has.
            widest = decoded.agg(
                F.max(F.size("cell_texts")).alias("w")
            ).first()["w"]
            if widest and widest > len(self.columns):
                self.columns = self.source.list_columns(self.table)

            live = decoded
            if counters.get("T"):  # K3: truncate wipes state inline
                t_max = max(r["mx"] for r in stats if r["msg_type"] == "T")
                self.store.truncate(self.spark)
                live = decoded.filter(
                    (F.col("lsn") > t_max) & (F.col("msg_type") != "T")
                )
            writes = live.filter(F.col("msg_type").isin("I", "U", "D"))
            if counters.get("I") or counters.get("U") or counters.get("D"):
                self.store.merge_changes(
                    self.spark, self._typed_changes(writes), self.keys
                )
            # only after the merge committed (T2); a crash above replays
            self.source.advance_slot(self.slot, advance_to)
            return counters
        finally:
            decoded.unpersist()

    def sync_loop(self, max_iterations: int | None = None) -> int:
        it = 0
        while max_iterations is None or it < max_iterations:
            if not self.sync_iteration():
                break
            it += 1
        return it

    def replica(self) -> DataFrame | None:
        """Visible replica state (tombstones filtered)."""
        return self.store.read(self.spark)


class LivePostgresRoutedPipe:
    """N tables through ONE publication and ONE slot — the reference's
    deployment shape (a pipe config lists tables; frames route by
    relation OID, pipes/postgres.rs:355-426 + sync routing A2).

    Frames decode ONCE per iteration; each table filters its OID,
    applies its own truncate ordering and typed projection, and merges
    into its own ``ReplicaStore``.  The slot advances ONCE, after EVERY
    table's merge committed — a crash mid-routing replays the whole
    batch into all tables, and each versioned keyed merge absorbs its
    duplicates (the same at-least-once argument as the single-table
    pipe, applied per route).

    Reference-parity quirk, inherited from the decoder: a multi-table
    ``TRUNCATE a, b`` statement emits ONE frame and only its FIRST
    relation id survives decode (pgoutput.rs:427-448), so only that
    route truncates.  Single-relation truncates (the common case)
    behave exactly."""

    def __init__(
        self,
        spark: SparkSession,
        source: JdbcPostgresSource,
        tables: Sequence[str],
        target_root: str,
        publication: str,
        slot: str,
        config: PipeConfig | None = None,
    ):
        if not tables:
            raise ValueError("at least one table required")
        self.spark = spark
        self.source = source
        self.tables = list(tables)
        self.publication = publication
        self.slot = slot
        self.config = config or PipeConfig()
        self.columns = {t: source.list_columns(t) for t in self.tables}
        self.keys = {
            t: [c.column_name for c in cols if c.is_primary_key]
            for t, cols in self.columns.items()
        }
        for t, k in self.keys.items():
            if not k:
                raise ValueError(f"table {t!r} has no primary key")
        self.stores = {
            t: ReplicaStore(os.path.join(target_root, "replica", t))
            for t in self.tables
        }
        self.oids: dict[str, int] = {}

    def initialize(self) -> list[str]:
        issued = self.source.setup_publication(
            self.publication, self.slot, self.tables
        )
        self.oids = self.source.table_oids(self.tables)
        return issued

    def first_sync(self) -> dict[str, int]:
        """Per-table WAL-stamped snapshot, each idempotent-guarded (K6)."""
        copied: dict[str, int] = {}
        for t in self.tables:
            store = self.stores[t]
            if store.current_version() >= 0:
                continue
            snap = self.source.snapshot(t).select(
                *[
                    F.col(c.column_name).cast(c.spark_type).alias(c.column_name)
                    for c in self.columns[t]
                ]
            )
            n = snap.count()
            stamp = self.source.current_wal_lsn()
            store.write(
                snap.withColumn("last_seq", F.lit(stamp).cast("long"))
                .withColumn("__deleted", F.lit(False))
            )
            copied[t] = n
        return copied

    def sync_iteration(self) -> dict[str, dict[str, int]]:
        """One peek -> decode-once -> route -> merge-per-table ->
        advance-once turn.  Returns {table: {op: count}}; empty dict =
        drained."""
        if not self.oids:
            raise RuntimeError("initialize() must run before sync")
        frames = self.source.peek_changes(
            self.slot, self.publication, self.config.peek_changes_limit
        )
        decoded = decode_pgoutput(frames).persist()
        try:
            stats = decoded.groupBy("relation_id", "msg_type").agg(
                F.count("*").alias("n"), F.max("lsn").alias("mx")
            ).collect()
            if not stats:
                return {}
            advance_to = frames.agg(F.max("lsn")).first()[0]
            by_table: dict[str, dict[str, int]] = {}
            for t in self.tables:
                oid = self.oids[t]
                t_stats = [r for r in stats if r["relation_id"] == oid]
                if not t_stats:
                    continue
                counters = {r["msg_type"]: r["n"] for r in t_stats}
                by_table[t] = counters
                mine = decoded.filter(F.col("relation_id") == oid)
                # K5 live, per route (see the single-table pipe's note)
                widest = mine.agg(
                    F.max(F.size("cell_texts")).alias("w")
                ).first()["w"]
                if widest and widest > len(self.columns[t]):
                    self.columns[t] = self.source.list_columns(t)
                if counters.get("T"):
                    t_max = max(
                        r["mx"] for r in t_stats if r["msg_type"] == "T"
                    )
                    self.stores[t].truncate(self.spark)
                    mine = mine.filter(
                        (F.col("lsn") > t_max) & (F.col("msg_type") != "T")
                    )
                writes = mine.filter(F.col("msg_type").isin("I", "U", "D"))
                if counters.get("I") or counters.get("U") or counters.get("D"):
                    typed = writes.select(
                        F.col("lsn").alias("seq"),
                        F.col("msg_type").alias("op"),
                        *[
                            _typed_cell(i, c)
                            for i, c in enumerate(self.columns[t])
                        ],
                    )
                    self.stores[t].merge_changes(
                        self.spark, typed, self.keys[t]
                    )
            # one advance, after every route committed (T2)
            self.source.advance_slot(self.slot, advance_to)
            return by_table
        finally:
            decoded.unpersist()

    def sync_loop(self, max_iterations: int | None = None) -> int:
        it = 0
        while max_iterations is None or it < max_iterations:
            if not self.sync_iteration():
                break
            it += 1
        return it

    def replica(self, table: str) -> DataFrame | None:
        return self.stores[table].read(self.spark)
