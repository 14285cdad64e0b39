"""The continuous sync pipeline — the reference's IPipe lifecycle
(initialize -> first_sync -> sync_loop, pipes/mod.rs:11-16) rebuilt on
Structured Streaming.

Two embodiments share every operator:

- ``ParquetCdcPipe`` — batch-driven micro-iterations with an explicit
  persisted cursor. Faithful to the reference's peek-then-advance
  at-least-once protocol (T2, pipes/postgres.rs:487-499): the cursor
  file is written only AFTER the merge commits, so a crash between
  write and advance replays the batch; the keyed merge is idempotent,
  absorbing the duplicates exactly like ReplacingMergeTree does.

- ``run_cdc_stream`` — readStream + foreachBatch + checkpointLocation:
  Spark's checkpoint commit plays the cursor role with the same
  post-write ordering. This is the deployment shape for a real cluster.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clockpipe_spark.cdc.changelog import changelog_from_events
from clockpipe_spark.cdc.ops import keep_last_by_key
from clockpipe_spark.config import PipeConfig
from clockpipe_spark.streaming.replica import ReplicaStore


class ParquetCdcPipe:
    """Batch micro-iteration pipe over an events parquet acting as the
    WAL (FIXTURES.md CDC convention: seq = LSN)."""

    def __init__(
        self,
        spark: SparkSession,
        events_path: str,
        target_root: str,
        config: PipeConfig | None = None,
        keys: Sequence[str] = ("user_id",),
    ):
        self.spark = spark
        self.events_path = events_path
        self.config = config or PipeConfig()
        self.keys = list(keys)
        self.store = ReplicaStore(os.path.join(target_root, "replica"))
        self.cursor_file = os.path.join(target_root, "cursor.json")
        os.makedirs(target_root, exist_ok=True)

    # -- offset management (T2) ------------------------------------------
    def read_cursor(self) -> int:
        """Last applied seq; -1 = nothing applied (resume-token analog,
        pipes/mongodb.rs:484-496)."""
        try:
            with open(self.cursor_file) as f:
                return json.load(f)["last_seq"]
        except FileNotFoundError:
            return -1

    def advance_cursor(self, last_seq: int) -> None:
        """Persisted only after a successful merge — peek-then-advance."""
        tmp = self.cursor_file + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"last_seq": last_seq}, f)
        os.replace(tmp, self.cursor_file)

    # -- lifecycle (pipes/mod.rs:11-16) -----------------------------------
    def changelog(self) -> DataFrame:
        return changelog_from_events(self.spark.read.parquet(self.events_path))

    def initialize(self) -> None:
        """Ping-equivalent: validate source readable + target writable
        (pipes/postgres.rs:94-108)."""
        self.changelog().schema  # forces footer read
        os.makedirs(self.store.root, exist_ok=True)

    def first_sync(self, snapshot: DataFrame | None = None) -> None:
        """Initial copy (idempotent-guarded, K6): skipped when the target
        already has a version (pipes/postgres.rs:136-160)."""
        if self.store.current_version() >= 0:
            return
        if snapshot is not None:
            self.store.write(snapshot)

    def sync_iteration(self) -> dict[str, int]:
        """One peek->dedup->merge->advance iteration (T1,
        pipes/postgres.rs:260-517). Returns per-op write counters (A3).

        The peek is a cursor-range predicate (seq in (cursor, cursor+cap])
        pushed into the parquet scan — NOT a global orderBy(seq).limit(cap),
        which re-sorts the entire pending tail every iteration and becomes
        the bottleneck at 100x backlog. Sparse seq (LSN gaps wider than the
        cap) is handled by one min-seq probe that jumps the window forward;
        dense logs never pay it. All batch statistics (emptiness, per-op
        counters, last/truncate seq) come from ONE aggregation job."""
        cursor = self.read_cursor()
        cap = self.config.peek_changes_limit  # peek cap (S3)
        clog = self.changelog()
        start = cursor
        for _ in range(2):
            peeked = clog.filter(
                (F.col("seq") > start) & (F.col("seq") <= start + cap)
            ).cache()
            stats = (
                peeked.groupBy("op")
                .agg(F.count("*").alias("n"), F.max("seq").alias("mx"))
                .collect()
            )
            if stats:
                break
            peeked.unpersist()
            nxt = clog.filter(F.col("seq") > cursor).agg(F.min("seq")).first()[0]
            if nxt is None:
                return {}
            start = nxt - 1  # second window contains nxt -> non-empty
        counters = {r["op"]: r["n"] for r in stats}
        last_seq = max(r["mx"] for r in stats)

        # K3: a Truncate wipes state inline; only changes AFTER the last
        # truncate in this batch survive (pipes/postgres.rs:391-417)
        live = peeked
        if counters.get("T"):
            t_max = max(r["mx"] for r in stats if r["op"] == "T")
            self.store.truncate(self.spark)
            # rows after the last truncate can't themselves be truncates
            live = peeked.filter(F.col("seq") > t_max) if last_seq > t_max else None
        else:
            t_max = None
        if live is not None:
            deduped = keep_last_by_key(
                live.filter(F.col("op") != "T"), self.keys, "seq"
            )
            self.store.merge_changes(
                self.spark,
                deduped.select("seq", "op", *self.keys, "value", "ts"),
                self.keys,
            )
        # unpersist the ORIGINAL cached frame — unpersisting a derived
        # filter would leave the peeked batch pinned for the session
        peeked.unpersist()
        self.advance_cursor(last_seq)  # only after the write committed
        return counters

    def sync_loop(self, max_iterations: int | None = None, sleep: bool = False) -> int:
        """Drain the log in peek-capped iterations; returns iterations
        run. ``sleep`` applies the reference's 100 ms cadence."""
        it = 0
        while max_iterations is None or it < max_iterations:
            if not self.sync_iteration():
                break
            it += 1
            if sleep:
                time.sleep(self.config.sleep_millis_after_sync_iteration / 1000)
        return it

    def run_pipe(self, snapshot: DataFrame | None = None, max_iterations=None) -> int:
        self.initialize()
        self.first_sync(snapshot)
        return self.sync_loop(max_iterations)


def run_routed_cdc_stream(
    spark: SparkSession,
    events_dir: str,
    target_root: str,
    checkpoint_dir: str,
    keys: Sequence[str] = ("user_id",),
):
    """Streaming embodiment of the MULTI-TABLE sync: foreachBatch routes
    each micro-batch per table (A2) and merges into one store per table
    — the deployment shape of sync_job.SyncJob. Offsets commit to the
    checkpoint after the whole batch (all tables) succeeds, matching the
    batch pipe's advance-after-all-tables ordering."""
    from concurrent.futures import ThreadPoolExecutor

    stores: dict[str, ReplicaStore] = {}

    def store_for(tbl: str) -> ReplicaStore:
        if tbl not in stores:
            stores[tbl] = ReplicaStore(os.path.join(target_root, tbl))
        return stores[tbl]

    schema = spark.read.parquet(events_dir).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    clog = changelog_from_events(stream)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.cache()
        tables = [r["tbl"] for r in batch_df.select("tbl").distinct().collect()]

        def merge_one(tbl: str) -> None:
            part = batch_df.filter(F.col("tbl") == tbl)
            deduped = keep_last_by_key(part, list(keys), "seq")
            store_for(tbl).merge_changes(
                spark, deduped.select("seq", "op", *keys, "value", "ts"), list(keys)
            )

        with ThreadPoolExecutor(max_workers=min(8, max(1, len(tables)))) as pool:
            list(pool.map(merge_one, sorted(tables)))
        batch_df.unpersist()

    return (
        clog.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_cdc_stream(
    spark: SparkSession,
    events_dir: str,
    target_root: str,
    checkpoint_dir: str,
    keys: Sequence[str] = ("user_id",),
):
    """Structured Streaming embodiment: readStream over the events dir,
    foreachBatch does dedup+merge, the streaming checkpoint commits
    offsets after each batch (= peek-then-advance).

    Uses availableNow so tests drain the source and stop; a deployment
    would use trigger(processingTime='100 milliseconds') to match the
    reference cadence (T1).
    """
    store = ReplicaStore(os.path.join(target_root, "replica"))
    schema = spark.read.parquet(events_dir).schema

    stream = spark.readStream.schema(schema).parquet(events_dir)
    clog = changelog_from_events(stream)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        deduped = keep_last_by_key(batch_df, list(keys), "seq")
        store.merge_changes(
            spark, deduped.select("seq", "op", *keys, "value", "ts"), list(keys)
        )

    return (
        clog.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
