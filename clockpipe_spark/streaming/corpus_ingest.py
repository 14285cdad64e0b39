"""Streaming corpus ingestion: the LLM-data hygiene pipeline composed
into a foreachBatch-compatible operator — quality gate, then cross-batch
near-dup + exact dedup against persisted state, then an append-only
admitted corpus plus a per-batch metrics log.

The reference's sync loop is the shape (peek -> transform -> write ->
advance, pipes/postgres.rs:260-517); this applies the same lifecycle to
corpus construction: every micro-batch is gated and deduplicated against
EVERYTHING already admitted, and the state appends are idempotent under
at-least-once replay (the same property the reference gets from
ReplacingMergeTree, SURVEY.md §2.7 T2).

100 TB design:
- the quality gate is a map-side projection (scan speed, no shuffle);
- dedup state/probing is StreamingNearDup's bucketed band log — the
  per-batch probe reads only the state buckets the batch hashes into;
- the admitted corpus and metrics logs are blind appends — no rewrite
  of history on any path;
- per-batch metrics (arrived / gated / deduped / admitted) are the
  observability a production ingest needs to detect drift: a quality
  crash or dup storm shows up as a metrics step-change, not a silent
  corpus skew.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clockpipe_spark.streaming.neardup_state import StreamingNearDup, empty_df

_METRICS_SCHEMA = (
    "batch_id long, n_arrived long, n_gated long, n_admitted long"
)


def c4_quality_gate(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The combined C4/Gopher keep bit as a streaming gate: word count in
    [50, 100k], mean word length in [3, 10], >=80% alphabetic tokens, no
    curly braces, no 'lorem ipsum'. Thresholds and floor-scaled ratio
    arithmetic mirror queries/textops2.text_c4_filters exactly
    (tests/test_corpus_ingest.py pins gate == query keep-set, so the two
    cannot drift apart silently)."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    with_toks = docs.withColumn("__toks", toks)
    n_words = F.size(F.col("__toks"))
    sum_len = F.aggregate(
        F.col("__toks"), F.lit(0).cast("bigint"), lambda a, x: a + F.length(x)
    )
    alpha = F.size(F.filter(F.col("__toks"), lambda x: x.rlike("[a-z]")))
    mean_x100 = F.when(n_words > 0, F.floor(sum_len * 100 / n_words)).otherwise(F.lit(0))
    alpha_x100 = F.when(n_words > 0, F.floor(alpha * 100 / n_words)).otherwise(F.lit(0))
    keep = (
        (n_words >= 50)
        & (n_words <= 100_000)
        & (mean_x100 >= 300)
        & (mean_x100 <= 1000)
        & (alpha_x100 >= 80)
        & ~F.col(text_col).contains("{")
        & ~F.lower(F.col(text_col)).contains("lorem ipsum")
    )
    return with_toks.filter(keep).drop("__toks")


class CorpusIngestPipeline:
    """foreachBatch-compatible end-to-end corpus ingest.

    ``gate`` is any DataFrame -> DataFrame filter (default: the C4
    battery); dedup is StreamingNearDup (near-dup via persisted MinHash
    bands; exact dedup for short docs). Admitted rows append to
    ``<root>/corpus``; per-batch counts append to ``<root>/metrics``.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        gate=c4_quality_gate,
        **neardup_kwargs,
    ):
        self.spark = spark
        self.gate = gate
        self.corpus_dir = os.path.join(root, "corpus")
        self.metrics_dir = os.path.join(root, "metrics")
        self.neardup = StreamingNearDup(
            spark, os.path.join(root, "neardup_state"), **neardup_kwargs
        )
        os.makedirs(root, exist_ok=True)

    def process_batch(
        self,
        docs: DataFrame,
        batch_id: int = -1,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> DataFrame:
        """Gate + dedup one micro-batch; append survivors and metrics.
        Idempotent under replay: a re-delivered batch admits 0 rows (its
        ids are already in the dedup state), so the corpus and state
        appends add nothing.

        Per-batch job accounting (r12): the arrived/gated/admitted
        counters ride existing jobs as ``observe()`` metrics instead of
        running three count() jobs, and the 1-row metrics record is
        written driver-side with pyarrow (its Spark write job cost
        ~0.6 s — pure job-launch overhead for 4 integers).

        Corpus commit protocol (r13): with a real ``batch_id`` the
        corpus write goes to a deterministic ``batch=<id>`` directory
        via the dedup layer's ``pre_commit`` hook — i.e. BEFORE the
        state's shorts/sigs commit marker — guarded by the directory's
        ``_SUCCESS`` file. The old order (state fully committed, THEN
        a blind corpus append filtered by pre-batch admitted_ids) had
        an unhealable window: a crash between the two left the docs
        admitted-in-state, so the replay's anti-join wrote nothing and
        their text never reached the corpus. Now every window heals:
        crash before the corpus write → replay sees no state marker,
        recomputes the same admitted set, rewrites the same directory
        (mode=overwrite, deterministic content); crash after it →
        ``_SUCCESS`` exists, the write is skipped, and the state
        re-commits idempotently. Callers without a batch_id (< 0) keep
        the legacy blind append (no replay contract to honor).
        ``already`` still filters cross-batch redelivery: a doc id
        admitted under an EARLIER batch_id must not enter this batch's
        directory too."""
        from pyspark.sql import Observation

        obs_arrived, obs_gated, obs_admitted = (
            Observation(),
            Observation(),
            Observation(),
        )
        # min/max ride the arrived-count observation (r13): they bound
        # the redelivery filter's id range with ZERO extra jobs — the
        # observation fires during the dedup layer's first docs scan,
        # strictly before pre_commit needs the range
        docs = docs.observe(
            obs_arrived,
            F.count(F.lit(1)).alias("n"),
            F.min(id_col).alias("lo"),
            F.max(id_col).alias("hi"),
        )
        gated = self.gate(docs, text_col) if self.gate else docs
        gated = gated.observe(obs_gated, F.count(F.lit(1)).alias("n"))
        batch_dir = os.path.join(self.corpus_dir, f"batch={batch_id}")
        corpus_done = batch_id >= 0 and os.path.exists(
            os.path.join(batch_dir, "_SUCCESS")
        )

        def write_corpus(admitted_df: DataFrame) -> None:
            if corpus_done:
                return
            # Cross-batch redelivery filter: ids admitted by EARLIER
            # batches must not re-enter the corpus. Resolved HERE —
            # inside pre_commit, i.e. before this batch's sigs/shorts
            # commit — so the file-list snapshot can never contain this
            # batch's own rows, and range-restricted (r13) to the
            # arrived ids' [min, max] (from the observation — no extra
            # job): a redelivered id lies inside by construction, and
            # the pushed-down range lets row-group id stats skip
            # history instead of scanning a corpus-sized id column per
            # batch.
            rng = obs_arrived.get
            # distinct=False (r20): a left_anti join is duplicate-
            # insensitive on its right side, so the redelivery filter
            # skips admitted_ids' dedup exchange inside this write job
            already = self.neardup.admitted_ids(
                id_range=(rng["lo"], rng["hi"]), distinct=False
            ).withColumnRenamed("id", id_col)
            new_rows = admitted_df.join(already, id_col, "left_anti").observe(
                obs_admitted, F.count(F.lit(1)).alias("n")
            )
            if batch_id >= 0:
                new_rows.write.mode("overwrite").parquet(batch_dir)
            else:
                new_rows.write.mode("append").parquet(self.corpus_dir)

        admitted = self.neardup.process_batch(
            gated, id_col, text_col, pre_commit=write_corpus
        )
        if corpus_done:
            # replay after the corpus committed but (possibly) before
            # the state marker: the admitted count is what the batch
            # directory already holds (rare path — one cheap scan; an
            # all-duplicates batch may hold _SUCCESS and no data files)
            part_files = [
                f for f in os.listdir(batch_dir) if f.endswith(".parquet")
            ]
            n_admitted = (
                self.spark.read.parquet(batch_dir).count() if part_files else 0
            )
        else:
            n_admitted = obs_admitted.get["n"]
        self._write_metrics(
            batch_id,
            obs_arrived.get["n"],
            obs_gated.get["n"],
            n_admitted,
        )
        return admitted

    def _write_metrics(
        self, batch_id: int, n_arrived: int, n_gated: int, n_admitted: int
    ) -> None:
        """One metrics row, written driver-side (pyarrow): Spark reads it
        back like any other parquet append, without paying a Spark job
        for a 4-integer record.

        Write-temp-then-rename (ADVICE r12 #2): pyarrow writes in place,
        so a crash mid-write would leave a torn half-file that breaks
        every subsequent metrics() read. Writing under a dot-prefixed
        ``.inprogress`` name (skipped by ``_read_or_empty``'s
        ``.parquet`` suffix filter) and ``os.rename``-ing — atomic on
        POSIX within one directory — means readers only ever see
        complete files."""
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        os.makedirs(self.metrics_dir, exist_ok=True)
        table = pa.table(
            {
                "batch_id": pa.array([batch_id], pa.int64()),
                "n_arrived": pa.array([n_arrived], pa.int64()),
                "n_gated": pa.array([n_gated], pa.int64()),
                "n_admitted": pa.array([n_admitted], pa.int64()),
            }
        )
        name = f"metrics-{batch_id}-{uuid.uuid4().hex}.parquet"
        tmp = os.path.join(self.metrics_dir, f".{name}.inprogress")
        pq.write_table(table, tmp)
        os.rename(tmp, os.path.join(self.metrics_dir, name))

    def foreach_batch(self, id_col: str = "doc_id", text_col: str = "text"):
        """Adapter for ``writeStream.foreachBatch``."""

        def fn(batch_df: DataFrame, batch_id: int):
            self.process_batch(batch_df, batch_id, id_col, text_col)

        return fn

    def _read_or_empty(self, path: str, schema: str | None = None) -> DataFrame:
        # skip Spark's in-flight task output (_temporary attempt dirs)
        # and dot/underscore metadata — a crashed write must never leak
        # torn part files into a reader's explicit file list (r13)
        files = []
        if os.path.isdir(path):
            for dirpath, dirs, names in os.walk(path):
                dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
                files.extend(
                    os.path.join(dirpath, n)
                    for n in names
                    if n.endswith(".parquet") and not n.startswith(("_", "."))
                )
        if not files:
            return empty_df(self.spark, schema or _METRICS_SCHEMA)
        return self.spark.read.parquet(*sorted(files))

    def corpus(self, schema: str | None = None) -> DataFrame:
        """The admitted corpus as of now."""
        return self._read_or_empty(self.corpus_dir, schema)

    def metrics(self) -> DataFrame:
        """Per-batch observability counters."""
        return self._read_or_empty(self.metrics_dir, _METRICS_SCHEMA)
