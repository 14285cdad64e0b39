"""Training-data preparation, part 3 (SURVEY.md §2.10 extension):
data-mixture weighting, model-based quality scoring, and training-export
sharding — the stages that turn a cleaned corpus into an actual training
mix.

All three are pure built-in column expressions with exact DuckDB twins
(hash-gate discipline: portable integer hashes, round(x, 6) doubles).

Scale notes (100 TB):
- mixture weights: ONE hash aggregation over (lang, source) with
  map-side partial combine; the per-domain result is tiny (|domains|
  rows) so the totals join is a broadcast of a 1-row aggregate. The
  corpus is scanned once, never shuffled row-wise.
- classifier score: per-token hashed-feature lookup folded map-side —
  zero shuffle, runs at scan speed. The weight table here is a closed
  arithmetic form; a real trained model would broadcast its weight
  array and the plan shape would not change.
- shard manifest: one hash aggregation on the shard id. The companion
  write path is ``df.repartition(N, shard).write.partitionBy(shard)``
  — the manifest IS the skew check for that write (pytest exercises
  the actual partitioned write at small scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clockpipe_spark.catalog import load_table
from clockpipe_spark.queries.llmprep import _KNUTH

_TOKENS_RE = r"\s+"


def _tokens(col):
    return F.split(F.trim(F.lower(col)), _TOKENS_RE)


# ---------------------------------------------------------------------------
# data mixture: temperature-scaled domain weights
# ---------------------------------------------------------------------------

_MIX_ALPHA = 0.5  # temperature alpha: w_d ∝ tokens_d^alpha (sqrt)
_MIX_BUDGET = 1_000_000  # token budget the mix is sampled into


def mixture_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based data mixing (the multilingual-corpus standard:
    sample domain d with probability ∝ tokens_d^alpha, alpha<1 upweights
    small domains): per (lang, source) domain — document/token counts,
    raw token share, the alpha=0.5 mixture weight, and the expected
    epochs over each domain when the mix is sampled to a fixed token
    budget (epochs > 1 ⇒ the domain repeats).

    One aggregation over the corpus; the totals are a 1-row aggregate
    cross-joined back (broadcast) — the |domains|-row result never
    shuffles the corpus itself.
    """
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(_tokens(F.col("text")))).alias("n_tokens"),
    )
    tot = per.select(
        F.sum("n_tokens").alias("tot_tokens"),
        F.sum(F.sqrt(F.col("n_tokens"))).alias("tot_pow"),
    )
    mixw = F.sqrt(F.col("n_tokens")) / F.col("tot_pow")
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "source",
            "n_docs",
            "n_tokens",
            F.round(F.col("n_tokens") / F.col("tot_tokens"), 6).alias("raw_share"),
            F.round(mixw, 6).alias("mix_weight"),
            F.round(mixw * _MIX_BUDGET / F.col("n_tokens"), 6).alias("epochs"),
        )
        .orderBy("lang", "source")
    )


MIXTURE_SQL = rf"""
WITH per AS (
  SELECT lang, source, count(*) AS n_docs,
         CAST(SUM(len(regexp_split_to_array(trim(lower(text)), '{_TOKENS_RE}')))
              AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang, source
),
tot AS (
  SELECT SUM(n_tokens) AS tot_tokens, SUM(sqrt(n_tokens)) AS tot_pow FROM per
)
SELECT lang, source, n_docs, n_tokens,
       round(n_tokens / tot_tokens, 6) AS raw_share,
       round(sqrt(n_tokens) / tot_pow, 6) AS mix_weight,
       round(sqrt(n_tokens) / tot_pow * {_MIX_BUDGET} / n_tokens, 6) AS epochs
FROM per CROSS JOIN tot
ORDER BY lang, source
"""


# ---------------------------------------------------------------------------
# model-based quality scoring: hashed linear classifier (fastText shape)
# ---------------------------------------------------------------------------

_QC_VOCAB = 4096  # hashed feature buckets
_QC_WMOD = 1_000_003  # prime spreading bucket -> pseudo-weight
_QC_BASE = 31
_QC_HMOD = 2_147_483_647  # 2^31-1, products stay < 2^36
_QC_BIAS = 0.05


def quality_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering with the fastText serving shape: each
    token hashes into one of ``_QC_VOCAB`` buckets (portable polynomial
    hash — same char-code fold both engines compute identically), the
    bucket indexes a weight, and the document score is the mean token
    weight plus a bias; ``keep`` is the sign. This is the third standard
    filter class next to the heuristic battery (text_c4_filters) and
    surprisal (text_unigram_surprisal) — the plumbing (hash → lookup →
    mean) is exactly what serving a trained linear quality model costs.

    The weight table is a closed form here (bucket * K mod p, scaled to
    [-0.5, 0.5]) so the oracle can recompute it; a trained model swaps
    in a broadcast array lookup with the same plan: zero shuffle,
    map-side fold, scan speed.
    """
    docs = load_table(spark, sf_dir, "documents")
    with_toks = docs.select(
        "doc_id", _tokens(F.col("text")).alias("toks")
    )

    def tok_bucket(t):
        codes = F.transform(F.split(t, ""), lambda ch: F.ascii(ch).cast("bigint"))
        h = F.aggregate(
            codes,
            F.lit(0).cast("bigint"),
            lambda acc, x: (acc * _QC_BASE + x) % _QC_HMOD,
        )
        return h % _QC_VOCAB

    def weight(t):
        return (
            (tok_bucket(t) * _KNUTH % _QC_WMOD).cast("double") / _QC_WMOD - 0.5
        )

    score = (
        F.aggregate(
            F.transform(F.col("toks"), weight),
            F.lit(0.0),
            lambda acc, w: acc + w,
        )
        / F.size("toks")
        + _QC_BIAS
    )
    return with_toks.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.round(score, 6).alias("score"),
        (score > 0).alias("keep"),
    )


QUALITY_CLASSIFIER_SQL = rf"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '{_TOKENS_RE}') AS toks
  FROM documents
),
scored AS (
  SELECT doc_id, len(toks) AS n_tokens,
         list_reduce(
           list_prepend(CAST(0 AS DOUBLE),
             list_transform(toks, t ->
               CAST(list_reduce(
                      list_prepend(CAST(0 AS BIGINT),
                        list_transform(generate_series(1, length(t)),
                          i -> CAST(ascii(substring(t, i, 1)) AS BIGINT))),
                      (acc, x) -> (acc * {_QC_BASE} + x) % {_QC_HMOD})
                    % {_QC_VOCAB} * {_KNUTH} % {_QC_WMOD} AS DOUBLE)
               / {_QC_WMOD} - 0.5)),
           (acc, w) -> acc + w) / len(toks) + {_QC_BIAS} AS raw_score
  FROM toks
)
SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
       round(raw_score, 6) AS score,
       raw_score > 0 AS keep
FROM scored
"""


# ---------------------------------------------------------------------------
# training export: deterministic shard assignment + manifest
# ---------------------------------------------------------------------------

_N_SHARDS = 16


def _shard_id(id_col: str = "doc_id"):
    """Knuth-multiplicative shard hash, overflow-free for any int64 id
    (same 16-bit-halves trick as llmprep.sample_hash_residue)."""
    return F.expr(
        f"pmod(pmod(pmod({id_col}, 4294967296) div 65536 * {_KNUTH}, 65536) * 65536"
        f" + pmod({id_col}, 4294967296) % 65536 * {_KNUTH}, 4294967296)"
        f" % {_N_SHARDS}"
    )


def export_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-export sharding: every document lands in one of
    ``_N_SHARDS`` shards by a deterministic multiplicative hash of its
    id (reproducible lineage — re-running the export writes byte-
    identical shards), and the manifest reports per-shard document/
    token/char volumes plus the id range. The hash balances shards to
    ~1/N each, and the manifest is exactly the skew check a 100 TB
    export runs before committing: the companion write is
    ``repartition(N, shard) .write.partitionBy("shard")`` (exercised in
    tests/test_llmprep3.py at small scale)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            _shard_id("doc_id").alias("shard_id"),
            F.col("doc_id"),
            F.size(_tokens(F.col("text"))).alias("toks"),
            F.col("n_chars"),
        )
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("toks").alias("n_tokens"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("shard_id")
    )


SHARD_MANIFEST_SQL = rf"""
WITH d AS (
  SELECT *, (doc_id % 4294967296 + 4294967296) % 4294967296 AS d32
  FROM documents
),
sharded AS (
  SELECT ((d32 // 65536 * {_KNUTH} % 65536) * 65536
          + d32 % 65536 * {_KNUTH}) % 4294967296 % {_N_SHARDS} AS shard_id,
         doc_id,
         len(regexp_split_to_array(trim(lower(text)), '{_TOKENS_RE}')) AS toks,
         n_chars
  FROM d
)
SELECT shard_id, count(*) AS n_docs,
       CAST(SUM(toks) AS BIGINT) AS n_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
FROM sharded GROUP BY shard_id ORDER BY shard_id
"""


def sample_by_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The data-mixing loop closed: documents sampled at their domain's
    temperature rate. The per-domain acceptance rate is the alpha=0.5
    mixture weight rescaled so the largest domain samples at 100%
    (relative epoch multiplicity, integer basis points); each doc then
    keeps or drops by its Knuth-hash residue against the domain's
    threshold — deterministic lineage, exactly reproducible across
    engines and reruns.

    Shape: the mixture aggregation (tiny result) broadcasts back onto
    the corpus scan; sampling is a per-row hash compare — map-side, no
    corpus shuffle anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("lang", "source").agg(
        F.sum(F.size(_tokens(F.col("text")))).alias("n_tokens")
    )
    # rate_bp: basis points of acceptance, sqrt-weight relative to the
    # token-richest domain (which keeps everything); the max is a 1-row
    # aggregate broadcast back (same pattern as the mixture totals)
    mx = per.agg(F.max(F.sqrt(F.col("n_tokens"))).alias("mx"))
    rates = per.crossJoin(F.broadcast(mx)).select(
        "lang",
        "source",
        F.floor(F.sqrt(F.col("n_tokens")) / F.col("mx") * 10000)
        .cast("bigint")
        .alias("rate_bp"),
    )
    # hash residue 0..9999 (same overflow-free Knuth form as stratified
    # sampling, widened from %100 to %10000 for basis-point thresholds)
    residue = F.expr(
        f"pmod(pmod(pmod(doc_id, 4294967296) div 65536 * {_KNUTH}, 65536) * 65536"
        f" + pmod(doc_id, 4294967296) % 65536 * {_KNUTH}, 4294967296) % 10000"
    )
    return (
        docs.join(F.broadcast(rates), ["lang", "source"])
        .filter(residue < F.col("rate_bp"))
        .select("doc_id", "lang", "source", F.col("rate_bp"))
        # no final orderBy (r15): pipeline sampler output, see
        # text_c4_filters
    )


SAMPLE_BY_MIXTURE_SQL = rf"""
WITH per AS (
  SELECT lang, source,
         CAST(SUM(len(regexp_split_to_array(trim(lower(text)), '{_TOKENS_RE}')))
              AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang, source
),
rates AS (
  SELECT lang, source,
         CAST(floor(sqrt(n_tokens) / max(sqrt(n_tokens)) OVER () * 10000)
              AS BIGINT) AS rate_bp
  FROM per
),
d AS (
  SELECT *, (doc_id % 4294967296 + 4294967296) % 4294967296 AS d32
  FROM documents
)
SELECT doc_id, d.lang, d.source, rate_bp
FROM d JOIN rates ON d.lang = rates.lang AND d.source = rates.source
WHERE ((d32 // 65536 * {_KNUTH}) % 65536 * 65536
       + d32 % 65536 * {_KNUTH}) % 4294967296 % 10000 < rate_bp
"""


QUERIES = {
    "mixture_temperature_weights": mixture_temperature_weights,
    "quality_classifier_score": quality_classifier_score,
    "export_shard_manifest": export_shard_manifest,
    "sample_by_mixture": sample_by_mixture,
}

ORACLES = {
    "mixture_temperature_weights": MIXTURE_SQL,
    "quality_classifier_score": QUALITY_CLASSIFIER_SQL,
    "export_shard_manifest": SHARD_MANIFEST_SQL,
    "sample_by_mixture": SAMPLE_BY_MIXTURE_SQL,
}
