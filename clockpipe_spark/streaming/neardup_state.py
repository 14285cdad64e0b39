"""Cross-batch streaming near-duplicate filtering: MinHash signatures
persisted in an append-only state store, so a duplicate arriving in a
LATER micro-batch is caught against everything already admitted.

The reference has no near-dup operator at all (SURVEY.md §2.10 scope);
batch-mode MinHash-LSH (operators/neardup.py) finds pairs *within* one
corpus. A streaming corpus needs dedup against accumulated history —
this operator is that state layer.

100 TB design:
- State is three append-only parquet logs: ``bands`` (id, band_idx,
  band_hash — 3 narrow columns, the only thing the candidate join ever
  shuffles), ``sigs`` (id, minhash) consulted only for the surviving
  candidate pairs, and ``shorts`` (id, text_hash) for docs too short to
  shingle. Appending a batch is a blind write — no rewrite of history
  (contrast: the replica store's merge path).
- The sig log is id-bucketed LSM (r13), mirroring the band log: loose
  appends carry ``sig_bucket = pmod(id, n_sig_buckets)``, compaction
  folds into ``sig_bucket=K`` dirs, and the three per-batch sig reads
  (verify join on colliding old_ids, replay anti-join on batch ids,
  the corpus layer's redelivery filter) each prune to the dirs their
  KNOWN id set hashes into. Without this every batch re-scanned the
  corpus-sized sig log (measured: +1.3 s/batch per 1M history docs,
  the one O(corpus) per-batch term left after the r12 band rework).
- The band log is LSM-shaped (r12): each batch APPENDS loose top-level
  files (one plain parquet write — no hive-commit cost), and once the
  loose set exceeds ``compact_after_files`` a compaction folds it into
  the BUCKETED layout (hive ``band_bucket=K`` dirs keyed on
  ``pmod(band_hash, n_band_buckets)``). The per-batch probe reads the
  pruned bucket dirs (bulk history — file-level pruning before any row
  is scanned, the same economics as partition pruning on a 100 TB
  table) plus the bounded loose set (recent appends). Rationale: a
  64-dir dynamic-partition append costs ~1.4 s of commit protocol per
  batch at ANY batch size (measured sf0.1: 1.57 s hive vs 0.15 s plain
  for the same rows) — a fixed per-batch tax the compaction amortizes
  across ``compact_after_files`` batches. Crash between compaction
  write and loose-file delete leaves duplicate band rows, which the
  candidate join's dropDuplicates absorbs (at-least-once, like every
  other append here).
- The probe itself is an equi-join of the batch's band hashes against
  those buckets — linear in batch size + collisions, never all-pairs.
- Docs with < 3 tokens produce no shingles, hence no MinHash signature;
  they route through an EXACT dedup keyed on xxhash64(lower(trim(
  text))) against the ``shorts`` log (ADVICE r3: unconditional
  admission re-admitted exact copies of short docs forever).
- Admission ordering inside a batch follows the id order (lowest id of a
  colliding pair wins), matching the batch pair-miner's keep-lowest
  convention.
"""

from __future__ import annotations

import logging
import os

from py4j.protocol import Py4JJavaError
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clockpipe_spark.operators.neardup import (
    band_hashes,
    minhash_est_jaccard,
    minhash_signatures,
)

_BANDS_SCHEMA = "id long, band_idx int, band_hash long"
_SIGS_SCHEMA = "id long, minhash array<long>"
_SHORTS_SCHEMA = "id long, text_hash long"


def empty_df(spark: SparkSession, schema: str) -> DataFrame:
    """JVM-side empty frame. spark.createDataFrame([], schema) builds an
    RDD-backed relation whose EVERY job execution spins Python workers —
    measured 0.47-0.52 s per count() vs 0.13-0.16 s for this range(0)
    projection (r14). The shorts log is empty for any all-long-doc
    corpus, so the old form taxed every single micro-batch."""
    from pyspark.sql import types as T

    return spark.range(0).select(
        *[
            F.lit(None).cast(f.dataType).alias(f.name)
            for f in T._parse_datatype_string(schema).fields
        ]
    )


class StreamingNearDup:
    """foreachBatch-compatible cross-batch near-dup filter."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        n_hashes: int = 32,
        n_bands: int = 8,
        threshold: float = 0.5,
        n_band_buckets: int = 64,
        compact_after_files: int = 32,
        n_sig_buckets: int = 64,
        prune_verify_bytes: int = 256 << 20,
    ):
        self.spark = spark
        self.bands_dir = os.path.join(root, "bands")
        self.sigs_dir = os.path.join(root, "sigs")
        self.shorts_dir = os.path.join(root, "shorts")
        self.n_hashes = n_hashes
        self.n_bands = n_bands
        self.threshold = threshold
        self.n_band_buckets = n_band_buckets
        self.compact_after_files = compact_after_files
        self.n_sig_buckets = n_sig_buckets
        # sig-log size past which the verify join switches from the
        # lazy full-log plan to checkpoint-cand + bucket-pruned reads
        self.prune_verify_bytes = prune_verify_bytes
        os.makedirs(root, exist_ok=True)
        self._pin_layout(root)

    def _pin_layout(self, root: str) -> None:
        """Refuse to open an existing store with different bucket
        counts (r13): bucket ids are baked into the hive dir names, so
        a probe computed with a NEW n_band_buckets prunes to dirs an
        OLD layout never wrote — silently missing duplicates. Resizing
        requires a full recompaction, not a constructor argument; the
        layout file (dot/underscore-invisible to the data walkers) pins
        what the store was built with."""
        import json

        self._root = root
        layout_path = os.path.join(root, "_layout.json")
        if os.path.exists(layout_path + ".resizing"):
            raise ValueError(
                f"StreamingNearDup store at {root} has an interrupted "
                "resize_buckets() (found _layout.json.resizing). The "
                "log layouts may be mixed — re-run resize_buckets() to "
                "completion on a store opened with the OLD counts after "
                "removing the marker, or rebuild the store."
            )
        want = {
            "n_band_buckets": self.n_band_buckets,
            "n_sig_buckets": self.n_sig_buckets,
        }
        if os.path.exists(layout_path):
            with open(layout_path) as f:
                have = json.load(f)
            if have != want:
                raise ValueError(
                    f"StreamingNearDup layout mismatch at {root}: store "
                    f"was built with {have}, constructor asked for "
                    f"{want}. Bucket ids are baked into the hive dir "
                    "names — opening with different counts would "
                    "silently miss duplicates. Open with the old counts "
                    "and run resize_buckets(), or rebuild the store."
                )
        else:
            # No layout file. If the store ALREADY holds bucketed hive
            # dirs (pre-layout-pin state data), the counts those dirs
            # were built with are unknowable from here — pinning the
            # constructor's values would adopt a possibly-wrong layout
            # and silently miss duplicates, the exact failure the pin
            # exists to prevent (ADVICE r13 #2). Refuse; the operator
            # who knows the original counts writes the layout file by
            # hand (or rebuilds). Loose-only stores are safe to pin:
            # probes always read loose files unpruned, and compaction
            # recomputes buckets under the pinned counts.
            def _has_bucketed(d: str, key: str) -> bool:
                return os.path.isdir(d) and any(
                    name.startswith(key + "=") for name in os.listdir(d)
                )

            if _has_bucketed(self.bands_dir, "band_bucket") or _has_bucketed(
                self.sigs_dir, "sig_bucket"
            ):
                raise ValueError(
                    f"StreamingNearDup store at {root} contains bucketed "
                    "state dirs but no _layout.json — the bucket counts "
                    "it was built with cannot be inferred, and pinning "
                    "the constructor's values could silently miss "
                    "duplicates. Write _layout.json with the counts the "
                    "store was built with, or rebuild the store."
                )
            tmp = layout_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(want, f)
            os.replace(tmp, layout_path)

    def resize_buckets(
        self,
        n_band_buckets: int | None = None,
        n_sig_buckets: int | None = None,
    ) -> None:
        """OFFLINE full-layout migration to new bucket counts — the
        sanctioned way to grow n_band_buckets as the corpus grows (the
        10M-history A/B: probe 6.9-8.8 s at 64 buckets vs 1.1-1.9 s at
        4096). Rewrites each log under the new bucket dirs and swaps it
        in; must not run concurrently with process_batch.

        Crash protocol: a ``_layout.json.resizing`` marker is written
        first and removed last — any crash leaves the marker, and the
        constructor refuses to open the store until the resize is
        re-run or the store rebuilt. Loud and recoverable, never a
        silent miss."""
        import json
        import shutil

        nbb = n_band_buckets or self.n_band_buckets
        nsb = n_sig_buckets or self.n_sig_buckets
        layout_path = os.path.join(self._root, "_layout.json")
        marker = layout_path + ".resizing"
        with open(marker, "w") as f:
            json.dump({"n_band_buckets": nbb, "n_sig_buckets": nsb}, f)

        def rewrite(log_dir, schema, bucket_col, bucket_expr, sort_col):
            staged = log_dir + ".resize"
            old = log_dir + ".old"
            # Crash recovery BEFORE anything else (ADVICE r13 #1): a
            # prior resize that died between rename(log_dir, old) and
            # rename(staged, log_dir) leaves log_dir ABSENT with the
            # full history parked in .old (and a complete copy in
            # .resize). Without this restore, the empty-log early
            # return below would treat the log as empty, 'succeed', and
            # orphan all history — silent duplicate misses. Restoring
            # .old (the pre-resize original) is always correct; .resize
            # is only adopted when .old is gone too (not reachable by a
            # crash of this protocol, but defensively: it is a complete
            # rewrite of the log, so adopting it loses nothing).
            if not os.path.isdir(log_dir):
                if os.path.isdir(old):
                    os.rename(old, log_dir)
                elif os.path.isdir(staged):
                    os.rename(staged, log_dir)
            files = self._files(log_dir)
            if not files:
                return
            shutil.rmtree(staged, ignore_errors=True)
            (
                self.spark.read.schema(schema)
                .parquet(*files)
                .withColumn(bucket_col, bucket_expr)
                .repartition(F.col(bucket_col))
                .sortWithinPartitions(sort_col)
                .write.mode("overwrite")
                .partitionBy(bucket_col)
                .parquet(staged)
            )
            shutil.rmtree(old, ignore_errors=True)
            os.rename(log_dir, old)
            os.rename(staged, log_dir)
            # delete the original only once the swap is verifiably in
            # place (rename is atomic; this check makes the intent loud)
            if self._files(log_dir):
                shutil.rmtree(old)

        rewrite(
            self.bands_dir,
            _BANDS_SCHEMA,
            "band_bucket",
            F.pmod(F.col("band_hash"), F.lit(nbb)).cast("int"),
            "band_hash",
        )
        rewrite(
            self.sigs_dir,
            _SIGS_SCHEMA,
            "sig_bucket",
            F.pmod(F.col("id"), F.lit(nsb)).cast("int"),
            "id",
        )
        self.n_band_buckets = nbb
        self.n_sig_buckets = nsb
        tmp = layout_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"n_band_buckets": nbb, "n_sig_buckets": nsb}, f)
        os.replace(tmp, layout_path)
        os.remove(marker)

    def _files(self, path: str) -> list[str]:
        """Parquet data files under ``path``, EXCLUDING in-flight Spark
        task output: a crashed write leaves partial part files under
        ``_temporary/`` attempt dirs that Spark's own directory reader
        skips — an explicit file list must skip them too, or a replay
        after a mid-write crash reads torn/duplicate state rows (r13)."""
        files = []
        for dirpath, dirs, names in os.walk(path):
            # prune metadata/attempt dirs in place (os.walk contract)
            dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
            files.extend(
                os.path.join(dirpath, n)
                for n in names
                if n.endswith(".parquet") and not n.startswith(("_", "."))
            )
        return sorted(files)

    @staticmethod
    def _pruned(
        files: list[str], key: str, buckets: list[int] | None
    ) -> list[str]:
        """Keep files under ``key=<b>`` dirs for the given buckets (None
        = all); loose files (not yet compacted, or pre-bucketing state
        layouts) are always included for backward compatibility."""
        if buckets is None:
            return files
        allowed = {f"{key}={b}" + os.sep for b in buckets}
        return [
            f
            for f in files
            if f"{key}=" not in f or any(a in f for a in allowed)
        ]

    def _band_files(self, buckets: list[int] | None) -> list[str]:
        """Band-log files for the given band_hash-bucket ids."""
        return self._pruned(self._files(self.bands_dir), "band_bucket", buckets)

    def _sig_files(self, buckets: list[int] | None) -> list[str]:
        """Sig-log files for the given id-bucket (pmod(id, n_sig_buckets))
        ids. The sig log is LSM-shaped like the band log (r13): loose
        appends carry ``sig_bucket`` as a sorted column, compaction
        folds them into ``sig_bucket=K`` hive dirs, and every per-batch
        read that knows its id set prunes to the touched dirs — without
        this, the replay anti-join and the verify join re-scan the FULL
        corpus-sized sig log every batch (measured: +1.3 s/batch per 1M
        history docs — linear in history, the one O(corpus) term the
        r12 band-log rework left behind)."""
        return self._pruned(self._files(self.sigs_dir), "sig_bucket", buckets)

    def _id_buckets(self, df: DataFrame, col: str) -> list[int]:
        """Distinct pmod(col, n_sig_buckets) values — bounded by
        n_sig_buckets, collected from a cached/checkpointed frame.
        Only worthwhile for SMALL id sets (candidate old_ids): any
        realistic batch's own ids pmod-spread across every bucket."""
        return [
            r["b"]
            for r in df.select(
                F.pmod(F.col(col), F.lit(self.n_sig_buckets))
                .cast("int")
                .alias("b")
            )
            .distinct()
            .collect()
        ]

    def _sig_id_history(self, lo, hi) -> DataFrame:
        """Sig-log ids range-filtered to [lo, hi] — for membership
        checks against ids known to lie in that range. The filter
        pushes into the parquet scan; with compaction sorting each
        bucket by id, row-group min/max stats skip history wholesale
        when live ids run ahead of it (the streaming steady state)."""
        if lo is None:
            return empty_df(self.spark, "id long")
        return (
            self._history(self.sigs_dir, _SIGS_SCHEMA)
            .select("id")
            .filter((F.col("id") >= lo) & (F.col("id") <= hi))
        )

    def _history_df(self, files: list[str], schema: str) -> DataFrame:
        """Snapshot of a state log AS OF NOW: the parquet file list is
        resolved eagerly, so the (lazy) downstream plan cannot pick up
        rows this very batch appends later — otherwise a re-evaluation
        after the state write would match every doc against itself."""
        if not files:
            return empty_df(self.spark, schema)
        return self.spark.read.schema(schema).parquet(*files)

    def _history(self, path: str, schema: str) -> DataFrame:
        return self._history_df(self._files(path), schema)

    def process_batch(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
        pre_commit=None,
    ) -> DataFrame:
        """Admit the subset of ``docs`` that near-duplicates neither the
        admitted history nor an earlier (lower-id) doc of this batch;
        append the admitted docs' state. Returns the admitted rows.

        ``pre_commit`` (r13): optional callable(admitted_df) executed
        AFTER the band append but BEFORE the shorts and sigs appends —
        i.e. strictly before any part of the batch becomes visible to
        ``admitted_ids()``. Downstream writers (the corpus append) hook
        here so a crash can never leave a doc admitted-in-state but
        absent from their own store: every state row that could mark
        the doc as "already admitted" on replay commits after the
        downstream write. A pre_commit failure aborts the batch with
        only band rows written — duplicates the candidate join absorbs,
        exactly like the compaction crash window."""
        import time as _time

        _trace = os.environ.get("SPARK_GRAFT_TRACE") == "1"
        _t0 = _time.perf_counter()
        # per-phase walls of the LAST batch, always recorded (r14): the
        # bench hist blocks publish them so compute-vs-load attribution
        # (probe term vs fixed plan-compile/job walls) rides the record
        # instead of needing an off-record trace session
        self.last_phase_walls: dict[str, float] = {}

        def _mark(label: str) -> None:
            nonlocal _t0
            now = _time.perf_counter()
            self.last_phase_walls[label] = round(now - _t0, 3)
            if _trace:
                print(f"# nd-trace {label}: {now - _t0:.3f}s", flush=True)
            _t0 = now

        from pyspark.sql import Observation

        # The batch's doc count rides the stats job as an Observation
        # (r20): with the signature count derived from the same job's
        # band-row count (below), their difference is the short-doc
        # count — which previously cost a separate limit(1).count()
        # probe job on the cached shorts frame and, when zero (the
        # common case for a gated corpus), now lets the whole shorts
        # subplan (history read, window, unions) drop out of the
        # all_dup checkpoint. CAVEAT (measured): when the signature set
        # is EMPTY, AQE's empty-relation propagation prunes the
        # CollectMetrics node out of the re-optimized plan and the
        # metric never arrives — obs_docs.get then raises, and the
        # reader below falls back to the legacy probe path.
        obs_docs = Observation()
        docs = docs.observe(obs_docs, F.count(F.lit(1)).alias("n"))
        sig = minhash_signatures(docs, id_col, text_col, self.n_hashes).cache()
        bands = band_hashes(sig, self.n_hashes, self.n_bands).cache()

        # One driver round-trip for every batch statistic the pruning
        # needs (r13 — was two separate collects): the band buckets the
        # batch hashes into (file-level band-log pruning, ≤
        # n_band_buckets values) and the batch id range (row-group
        # pruning of the replay anti-join's history scan). Runs on the
        # cached bands frame, so this is also what materializes the
        # sig+bands caches.
        stats = bands.agg(
            F.collect_set(
                F.pmod(F.col("band_hash"), F.lit(self.n_band_buckets)).cast(
                    "int"
                )
            ).alias("bb"),
            F.min("id").alias("lo"),
            F.max("id").alias("hi"),
            # band rows are exactly n_bands per signature row, so the
            # signature count rides this same action (r20) — no extra
            # job, no observation fragility
            F.count(F.lit(1)).alias("nb"),
        ).first()
        probe_buckets, id_lo, id_hi = stats["bb"], stats["lo"], stats["hi"]
        n_sig = stats["nb"] // self.n_bands
        _mark("stats_collect")
        hist_bands = self._history_df(self._band_files(probe_buckets), _BANDS_SCHEMA)

        # candidates vs history: new id on the left, any admitted id right
        vs_hist = (
            bands.alias("n")
            .join(
                hist_bands.alias("h"),
                (F.col("n.band_idx") == F.col("h.band_idx"))
                & (F.col("n.band_hash") == F.col("h.band_hash"))
                # replay safety: a re-delivered batch (at-least-once) must
                # not match its own previously-admitted rows
                & (F.col("n.id") != F.col("h.id")),
            )
            .select(F.col("n.id").alias("new_id"), F.col("h.id").alias("old_id"))
        )
        # candidates within the batch: higher id is the duplicate
        intra = (
            bands.alias("a")
            .join(
                bands.alias("b"),
                (F.col("a.band_idx") == F.col("b.band_idx"))
                & (F.col("a.band_hash") == F.col("b.band_hash"))
                & (F.col("a.id") > F.col("b.id")),
            )
            .select(F.col("a.id").alias("new_id"), F.col("b.id").alias("old_id"))
        )
        cand = vs_hist.unionByName(intra).dropDuplicates(["new_id", "old_id"])

        # Verify-join history pruning is SIZE-GATED (r13): when the sig
        # log is large, cand is checkpointed eagerly (it is tiny —
        # bounded by collisions; the band-probe work it forces would
        # have run exactly once in the downstream job anyway) and its
        # old_id bucket set restricts the verify join to the sig-log
        # dirs holding the colliding history docs — without this the
        # join re-scans the corpus-sized sig log every batch. Below the
        # gate the lazy single-job plan is cheaper than the extra
        # checkpoint wall (bench-scale ingest is fixed-cost-bound).
        sig_log_files = self._files(self.sigs_dir)
        sig_log_bytes = sum(os.path.getsize(f) for f in sig_log_files)
        if sig_log_bytes > self.prune_verify_bytes:
            cand = cand.localCheckpoint(eager=True)
            old_buckets = self._id_buckets(cand, "old_id")
            hist_sigs_verify = self._history_df(
                self._sig_files(old_buckets), _SIGS_SCHEMA
            )
        else:
            hist_sigs_verify = self._history_df(sig_log_files, _SIGS_SCHEMA)
        _mark("cand_prune_gate")

        # verify by signature-estimated Jaccard (sig store consulted only
        # for surviving candidates; batch side is broadcast-sized)
        all_sigs = hist_sigs_verify.unionByName(sig)
        scored = (
            cand.join(
                F.broadcast(sig.select(F.col("id").alias("new_id"), F.col("minhash").alias("mn"))),
                "new_id",
            )
            .join(
                all_sigs.select(F.col("id").alias("old_id"), F.col("minhash").alias("mo")),
                "old_id",
            )
            .withColumn("est", minhash_est_jaccard(F.col("mn"), F.col("mo"), self.n_hashes))
            .filter(F.col("est") >= self.threshold)
        )
        dup_ids = scored.select(F.col("new_id").alias("id"))

        # Docs too short to shingle (< 3 tokens) have NO signature row —
        # they cannot near-duplicate anything, so they route through an
        # EXACT dedup on the normalized text hash instead (shorts log).
        # n_short = observed doc count minus the stats job's signature
        # count (r20) — zero extra jobs — and when the batch has no
        # short docs the whole shorts subplan is elided from this
        # batch's plans. n_short None = observation pruned (empty-sig
        # batch, see above): build the shorts subplan and fall back to
        # the legacy probe, which is exactly the pre-r20 behavior.
        try:
            n_short = obs_docs.get["n"] - n_sig
        except Py4JJavaError:
            # narrowed from bare Exception (VERDICT r20 #8): the pruned-
            # CollectMetrics failure surfaces as the JVM-side toPyRow
            # call raising; anything else (e.g. a renamed metric would
            # raise KeyError above) should propagate, not silently run
            # the slow legacy path forever
            logging.getLogger(__name__).warning(
                "neardup_state: doc-count observation pruned "
                "(empty-signature batch) — falling back to the legacy "
                "shorts probe for this batch"
            )
            n_short = None
        shorts = None
        admitted_shorts = None
        dup_short_parts = []
        if n_short is None or n_short > 0:
            shorts = (
                docs.select(
                    F.col(id_col).alias("id"),
                    F.xxhash64(F.lower(F.trim(F.col(text_col)))).alias(
                        "text_hash"
                    ),
                )
                .join(sig.select("id"), "id", "left_anti")
                .cache()
            )
            hist_shorts = self._history(self.shorts_dir, _SHORTS_SCHEMA)
            short_vs_hist = (
                shorts.alias("n")
                .join(
                    hist_shorts.alias("h"),
                    (F.col("n.text_hash") == F.col("h.text_hash"))
                    # replay safety, as for bands
                    & (F.col("n.id") != F.col("h.id")),
                )
                .select(F.col("n.id").alias("id"))
            )
            w = Window.partitionBy("text_hash").orderBy("id")
            short_intra = (
                shorts.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") > 1)
                .select("id")
            )
            dup_short_parts = [short_vs_hist, short_intra]

        # intra-batch chains (A~B, B~C): admission is transitive by id
        # order only at threshold collisions within the same band family;
        # keep semantics simple and deterministic — drop every id that
        # matched ANY earlier/admitted doc.
        #
        # all_dup is materialized ONCE (r12): it feeds three consumers
        # (sig append filter, shorts append filter, the returned
        # anti-join), and before the checkpoint the candidate joins
        # re-executed per consumer — the profile showed the band/est
        # joins running twice per batch. It is a tiny id set (bounded by
        # batch size), so the eager localCheckpoint is cheap. ONE
        # distinct over the unioned id parts (r20) — the three chained
        # distinct exchanges (dup_ids, dup_short_ids, the union) were
        # set-algebra no-ops over the final one.
        all_dup = dup_ids
        for part in dup_short_parts:
            all_dup = all_dup.unionByName(part)
        all_dup = all_dup.distinct().localCheckpoint(eager=True)
        _mark("all_dup_ckpt")
        # Replay safety (at-least-once foreachBatch): a re-delivered batch
        # must not re-append state rows for ids already admitted — the
        # anti-join against history makes the state append idempotent.
        # (all_dup replaces dup_ids / dup_short_ids in the filters below:
        # equivalent, because sig ids and shorts ids partition the batch.)
        # The history side is RANGE-FILTERED to [min, max] of this
        # batch's ids (r13): a membership check can never match outside
        # the probe set's own range, so the filter is always correct,
        # and it pushes into the parquet scan where row-group min/max
        # stats skip the bulk of a sorted/clustered log — streaming ids
        # arrive roughly monotonic, so history row groups fall outside
        # the live range. (Id-BUCKET pruning is useless here: pmod
        # spreads any realistic batch across every bucket.)
        hist_sig_ids = self._sig_id_history(id_lo, id_hi)
        admitted_sig = (
            sig.join(all_dup, "id", "left_anti")
            .join(hist_sig_ids, "id", "left_anti")
            .cache()
        )
        if shorts is not None:
            admitted_shorts = shorts.join(all_dup, "id", "left_anti").join(
                hist_shorts.select("id"), "id", "left_anti"
            )

        # State-append discipline (r12, LSM): every log appends as a
        # handful of PLAIN top-level files — the hive partitionBy append
        # the bands log used before cost ~1.4 s/batch of dynamic-
        # partition commit protocol regardless of batch size. Loose band
        # files carry band_bucket as a sorted COLUMN; compact_bands()
        # periodically folds them into the pruned band_bucket=K layout.
        #
        # Commit ORDERING (r13, ADVICE r12 #1): the sigs append is the
        # batch's COMMIT MARKER and must be the last state write.
        # w_bands derives its rows from admitted_sig, which anti-joins
        # hist_sigs — so if the driver died after sigs committed but
        # before bands did, a replay would compute an EMPTY admitted_sig
        # and never write the missing band rows (near-dup detection
        # against those docs permanently off). With sigs last, every
        # crash window replays cleanly: bands/shorts already written
        # but sigs absent → replay recomputes the same admitted set and
        # re-appends (duplicate band/short rows are absorbed by the
        # candidate joins' dropDuplicates/distinct, exactly like the
        # compaction crash window).
        #
        # Full order: [bands ∥ pre_commit(lazy out)] → shorts? → [sigs ∥
        # out-checkpoint].
        # - bands is independent of the downstream pre_commit write
        #   (corpus committed without bands heals: no marker → replay
        #   recomputes, _SUCCESS skips the corpus, bands rewritten), so
        #   they overlap on driver threads.
        # - pre_commit consumes the LAZY admitted frame: its anti-join
        #   folds into the downstream write's own job instead of paying
        #   a separate checkpoint wall first. Safe post-hoc too: the
        #   history snapshots are eager file lists and all_dup is
        #   checkpointed, so re-evaluation is deterministic.
        # - shorts runs AFTER pre_commit because admitted_ids() is sigs
        #   ∪ shorts — if shorts committed before a downstream
        #   pre_commit write and the driver crashed between them, the
        #   replay's "already admitted" snapshot would contain the
        #   batch's short docs and the downstream store would skip (and
        #   so permanently lose) them. SKIPPED outright when the batch
        #   has no short docs (cheap probe of the cached shorts frame —
        #   the common case for a gated corpus).
        # - the eager checkpoint of the RETURNED admitted frame is not
        #   a state write, so it overlaps the shorts/sigs commits.
        # Net serialized walls per batch: stats collect, all_dup,
        # max(bands, pre_commit), max(shorts?+sigs, out-checkpoint) —
        # the r12 count plus the one wall crash-consistency truly costs.
        out_holder: dict[str, DataFrame] = {}
        lazy_out = docs.join(
            all_dup.withColumnRenamed("id", id_col), id_col, "left_anti"
        )

        def w_sigs() -> None:
            (
                admitted_sig.withColumn(
                    "sig_bucket",
                    F.pmod(F.col("id"), F.lit(self.n_sig_buckets)).cast("int"),
                )
                .coalesce(4)
                .sortWithinPartitions("sig_bucket")
                .write.mode("append")
                .parquet(self.sigs_dir)
            )

        def w_bands() -> None:
            (
                band_hashes(admitted_sig, self.n_hashes, self.n_bands)
                .withColumn(
                    "band_bucket",
                    F.pmod(F.col("band_hash"), F.lit(self.n_band_buckets)).cast(
                        "int"
                    ),
                )
                .coalesce(4)
                .sortWithinPartitions("band_bucket")
                .write.mode("append")
                .parquet(self.bands_dir)
            )

        def w_shorts() -> None:
            admitted_shorts.coalesce(4).write.mode("append").parquet(
                self.shorts_dir
            )

        def w_out() -> None:
            out_holder["out"] = lazy_out.localCheckpoint(eager=True)

        def w_pre_commit() -> None:
            if pre_commit is not None:
                pre_commit(lazy_out)

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            futures = [pool.submit(f) for f in (w_bands, w_pre_commit)]
            for fut in futures:
                fut.result()  # re-raise the first failure
        _mark("bands_and_pre_commit")
        with ThreadPoolExecutor(max_workers=2) as pool:
            f_out = pool.submit(w_out)  # not a state write — overlaps commits
            # n_short from the stats job (r20) skips the empty append
            # job (~0.4 s of commit protocol) for all-long-doc batches
            # with no probe job at all (was a ~0.1 s limit(1).count()
            # on the cached shorts frame); the legacy probe remains the
            # fallback when the observation was pruned (empty-sig batch)
            if (
                n_short > 0
                if n_short is not None
                else shorts.limit(1).count()
            ):
                w_shorts()  # only after downstream stores are durable
            w_sigs()  # commit marker: only after every other write landed
            f_out.result()
        _mark("shorts_sigs_out")

        self.compact_bands()
        self.compact_sigs()
        _mark("compact_checks")
        admitted_sig.unpersist()
        if shorts is not None:
            shorts.unpersist()
        sig.unpersist()
        bands.unpersist()
        return out_holder["out"]

    def loose_band_files(self) -> list[str]:
        """Band-log files not yet folded into the bucketed layout."""
        return [
            f for f in self._files(self.bands_dir) if "band_bucket=" not in f
        ]

    def loose_sig_files(self) -> list[str]:
        """Sig-log files not yet folded into the bucketed layout."""
        return [
            f for f in self._files(self.sigs_dir) if "sig_bucket=" not in f
        ]

    def compact_bands(self, force: bool = False) -> int:
        """Fold loose band appends into the ``band_bucket=K`` hive layout
        once their count exceeds ``compact_after_files`` (or always,
        with ``force``); returns the number of loose files compacted.

        The write-then-delete order makes a crash window leave duplicate
        band rows (both copies readable), never missing ones — the
        candidate join dedups pairs, so duplicates cost only wasted
        probe reads until the next compaction."""
        loose = self.loose_band_files()
        if not loose or (not force and len(loose) <= self.compact_after_files):
            return 0
        # band_bucket is recomputed from band_hash (not read from the
        # loose files): correct even for legacy loose files without the
        # column, and tracks the CURRENT n_band_buckets.
        (
            self.spark.read.schema(_BANDS_SCHEMA)
            .parquet(*loose)
            .withColumn(
                "band_bucket",
                F.pmod(F.col("band_hash"), F.lit(self.n_band_buckets)).cast("int"),
            )
            .repartition(F.col("band_bucket"))
            .write.mode("append")
            .partitionBy("band_bucket")
            .parquet(self.bands_dir)
        )
        for f in loose:
            os.remove(f)
        return len(loose)

    def compact_sigs(self, force: bool = False) -> int:
        """Fold loose sig appends into the ``sig_bucket=K`` hive layout
        once their count exceeds ``compact_after_files`` (or always,
        with ``force``); returns the number of loose files compacted.
        Same crash contract as compact_bands: write-then-delete leaves
        duplicate rows at worst, and admitted_ids()'s distinct() (plus
        the anti-joins' semantics) absorb duplicates."""
        loose = self.loose_sig_files()
        if not loose or (not force and len(loose) <= self.compact_after_files):
            return 0
        # sig_bucket is recomputed from id (not read from the loose
        # files): correct even for legacy loose files without the
        # column, and tracks the CURRENT n_sig_buckets.
        (
            self.spark.read.schema(_SIGS_SCHEMA)
            .parquet(*loose)
            .withColumn(
                "sig_bucket",
                F.pmod(F.col("id"), F.lit(self.n_sig_buckets)).cast("int"),
            )
            .repartition(F.col("sig_bucket"))
            # sorted by id so every row group carries tight min/max id
            # stats — what makes _sig_id_history's range filter skip
            # compacted history at the scan
            .sortWithinPartitions("id")
            .write.mode("append")
            .partitionBy("sig_bucket")
            .parquet(self.sigs_dir)
        )
        for f in loose:
            os.remove(f)
        return len(loose)

    def admitted_ids(
        self, id_range: tuple | None = None, distinct: bool = True
    ) -> DataFrame:
        """Ids admitted so far. ``id_range=(lo, hi)`` (r13) restricts
        the listing to that id interval — correct ONLY for membership
        checks against ids known to lie inside it (the corpus append's
        redelivery filter); pass None for a complete listing. The range
        predicate pushes into both log scans, where row-group id stats
        skip clustered history.

        ``distinct=False`` (r20) skips the dedup exchange for consumers
        whose semantics are duplicate-insensitive — an anti-join's
        result is identical against a multiset right side, so the
        corpus append's redelivery filter saves one aggregate exchange
        per batch. Listing consumers keep the default."""
        # distinct() guards against duplicate state rows from any history
        # written before the replay-idempotence anti-join existed
        sig_ids = self._history(self.sigs_dir, _SIGS_SCHEMA).select("id")
        short_ids = self._history(self.shorts_dir, _SHORTS_SCHEMA).select("id")
        ids = sig_ids.unionByName(short_ids)
        if id_range is not None and id_range[0] is not None:
            ids = ids.filter(
                (F.col("id") >= id_range[0]) & (F.col("id") <= id_range[1])
            )
        return ids.distinct() if distinct else ids
