"""Cross-batch streaming near-duplicate filtering: MinHash signatures
persisted in an append-only state store, so a duplicate arriving in a
LATER micro-batch is caught against everything already admitted.

The reference has no near-dup operator at all (SURVEY.md §2.10 scope);
batch-mode MinHash-LSH (operators/neardup.py) finds pairs *within* one
corpus. A streaming corpus needs dedup against accumulated history —
this operator is that state layer.

100 TB design:
- State is two append-only parquet logs: ``bands`` (id, band_idx,
  band_hash — 3 narrow columns, the only thing the candidate join ever
  shuffles) and ``sigs`` (id, minhash) consulted only for the surviving
  candidate pairs. Appending a batch is a blind write — no rewrite of
  history (contrast: the replica store's merge path).
- The per-batch probe is an equi-join of the batch's band hashes against
  the band log — linear in batch size + collisions, never all-pairs.
  At scale the band log would be bucketed by band_hash so the probe
  co-locates without a full shuffle of history; the append-only layout
  is what makes that bucketing possible.
- Admission ordering inside a batch follows the id order (lowest id of a
  colliding pair wins), matching the batch pair-miner's keep-lowest
  convention.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clockpipe_spark.operators.neardup import (
    band_hashes,
    minhash_est_jaccard,
    minhash_signatures,
)

_BANDS_SCHEMA = "id long, band_idx int, band_hash long"
_SIGS_SCHEMA = "id long, minhash array<long>"


class StreamingNearDup:
    """foreachBatch-compatible cross-batch near-dup filter."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        n_hashes: int = 32,
        n_bands: int = 8,
        threshold: float = 0.5,
    ):
        self.spark = spark
        self.bands_dir = os.path.join(root, "bands")
        self.sigs_dir = os.path.join(root, "sigs")
        self.n_hashes = n_hashes
        self.n_bands = n_bands
        self.threshold = threshold
        os.makedirs(root, exist_ok=True)

    def _history(self, path: str, schema: str) -> DataFrame:
        """Snapshot of the state log AS OF NOW: the parquet file list is
        resolved eagerly, so the (lazy) downstream plan cannot pick up
        rows this very batch appends later — otherwise a re-evaluation
        after the state write would match every doc against itself."""
        files = []
        for dirpath, _dirs, names in os.walk(path):
            files.extend(
                os.path.join(dirpath, n) for n in names if n.endswith(".parquet")
            )
        if not files:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(*sorted(files))

    def process_batch(
        self, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ) -> DataFrame:
        """Admit the subset of ``docs`` that near-duplicates neither the
        admitted history nor an earlier (lower-id) doc of this batch;
        append the admitted docs' state. Returns the admitted rows."""
        sig = minhash_signatures(docs, id_col, text_col, self.n_hashes).cache()
        bands = band_hashes(sig, self.n_hashes, self.n_bands).cache()

        hist_bands = self._history(self.bands_dir, _BANDS_SCHEMA)
        hist_sigs = self._history(self.sigs_dir, _SIGS_SCHEMA)

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

        # verify by signature-estimated Jaccard (sig store consulted only
        # for surviving candidates; batch side is broadcast-sized)
        all_sigs = hist_sigs.unionByName(sig)
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
        dup_ids = scored.select(F.col("new_id").alias("id")).distinct()

        # intra-batch chains (A~B, B~C): admission is transitive by id
        # order only at threshold collisions within the same band family;
        # keep semantics simple and deterministic — drop every id that
        # matched ANY earlier/admitted doc.
        # Replay safety (at-least-once foreachBatch): a re-delivered batch
        # must not re-append state rows for ids already admitted — the
        # anti-join against history makes the state append idempotent.
        admitted_sig = (
            sig.join(dup_ids, "id", "left_anti")
            .join(hist_sigs.select("id"), "id", "left_anti")
            .cache()
        )
        admitted_sig.write.mode("append").parquet(self.sigs_dir)
        band_hashes(admitted_sig, self.n_hashes, self.n_bands).write.mode(
            "append"
        ).parquet(self.bands_dir)

        # Admitted output = everything that matched nothing. Docs too short
        # to shingle (< 3 tokens) have NO signature row — they cannot
        # near-duplicate anything, so they are admitted unconditionally
        # (anti-join on dup_ids keeps them; the old semi-join on
        # admitted_sig silently dropped them). They carry no state.
        out = docs.join(
            dup_ids.withColumnRenamed("id", id_col), id_col, "left_anti"
        ).localCheckpoint(eager=True)
        admitted_sig.unpersist()
        sig.unpersist()
        bands.unpersist()
        return out

    def admitted_ids(self) -> DataFrame:
        # distinct() guards against duplicate state rows from any history
        # written before the replay-idempotence anti-join existed
        return self._history(self.sigs_dir, _SIGS_SCHEMA).select("id").distinct()
