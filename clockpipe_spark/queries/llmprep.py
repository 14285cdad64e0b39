"""Training-data preparation operators (SURVEY.md §2.10 extension):
sequence packing, tf-idf term ranking, deterministic stratified
sampling, and int8 embedding quantization — the standard corpus-prep
stages between a synced replica and an LLM training run.

All four stay in whole-stage codegen (window cumsum, explode+agg joins,
pure hash arithmetic, array folds) and each carries an exact DuckDB
twin. Hash-gate discipline: every derived value is integer (floor-scaled
where a ratio is involved) — no engine-divergent round() ties.

Scale notes (100 TB):
- pack_sequences: one window cumsum per (lang) partition — a single
  shuffle on lang, then map-side arithmetic. Pack assignment by
  cumulative-token quotient is the standard streaming approximation of
  greedy bin packing (deterministic, no driver state).
- tfidf: two hash aggregations (term-frequency, document-frequency) and
  a broadcast join of the df side (vocabulary-sized) — never a shuffle
  of the full posting list against itself.
- stratified sample: pure per-row hash arithmetic (Knuth multiplicative
  in 64-bit), zero shuffle before the verifying aggregation.
- int8 quantize: per-row array fold, map-side only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clockpipe_spark.catalog import load_table

_CTX_TOKENS = 2048  # pack budget (a typical short-context packing run)


def pack_sequences_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign docs (in doc_id order, per lang) to
    fixed-token-budget packs by cumulative-token quotient; report pack
    occupancy. The classic pre-training batch-packing stage."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = toks.withColumn(
        "pack_id",
        F.floor(F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / _CTX_TOKENS),
    )
    return packed.groupBy("lang", "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


PACK_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang,
         len(regexp_split_to_array(trim(lower(text)), '\\s+')) AS n_tokens
  FROM documents
),
assigned AS (
  SELECT *,
         CAST(floor(CAST(coalesce(sum(n_tokens) OVER (
                 PARTITION BY lang ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
              / {_CTX_TOKENS}) AS BIGINT) AS pack_id
  FROM toks
)
SELECT lang, pack_id, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM assigned GROUP BY lang, pack_id
"""


_TOP_TERMS = 5


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 characteristic terms per language by an integer tf-idf
    score: tf(lang, term) * 1e6 // df(term) — the rational form of
    tf/df, kept in exact 64-bit arithmetic so ranking ties are
    engine-stable (ln-based idf differs by ulps between libms).

    The earlier tf * n_docs * 1e6 form overflowed int64 once
    tf * n_docs exceeded ~9.2e12 — a ceiling a 100 TB corpus clears
    easily. n_docs is constant per dataset and floor(C*x) is monotone
    in x, so dropping it preserves an engine-stable deterministic
    ranking while decoupling the overflow bound from corpus size (the
    coarser 1e6 floor can merge near-tie scores the old n_docs*1e6
    scale separated, letting the term-asc tiebreak reorder those — not
    exact equivalence with the old formula, but both engines agree). Remaining documented bound:
    per-(lang, term) token count must stay below 9.2e12 (int64 max /
    1e6) — ~600× the total token count of a 100 TB English web corpus's
    most common term per shard-language, checked by the ANSI-mode
    overflow error rather than silently wrapping."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(
        "doc_id", "lang", F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("term")
    )
    tf = tokens.groupBy("lang", "term").agg(F.count("*").alias("tf"))
    df_ = tokens.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    # pure int64 arithmetic end to end: double division + cast would
    # truncate in Spark but ROUND in DuckDB; `div` sidesteps the cast
    # no broadcast hint on df_: per-term document frequency is
    # vocab-sized (see text_unigram_surprisal's note) — AQE broadcasts
    # it at bench scale, shuffle-joins on term at cluster scale
    scored = tf.join(df_, "term").withColumn(
        "score", F.expr("tf * 1000000L div df")
    )
    w = Window.partitionBy("lang").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TOP_TERMS)
        .select("lang", "term", "tf", "df", "score", "rnk")
    )


TFIDF_SQL = f"""
WITH tokens AS (
  SELECT doc_id, lang,
         unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS term
  FROM documents
),
tf AS (SELECT lang, term, count(*) AS tf FROM tokens GROUP BY 1, 2),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tokens GROUP BY 1),
scored AS (
  SELECT lang, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
         CAST(CAST(tf AS BIGINT) * 1000000 // CAST(df AS BIGINT) AS BIGINT) AS score
  FROM tf JOIN df USING (term)
)
SELECT lang, term, tf, df, score, rnk
FROM (
  SELECT *, row_number() OVER (PARTITION BY lang
                               ORDER BY score DESC, term) AS rnk
  FROM scored
) WHERE rnk <= {_TOP_TERMS}
"""


_SAMPLE_PCT = 20
_KNUTH = 2654435761  # Knuth multiplicative hash constant


def sample_hash_residue(id_col: str = "doc_id"):
    """(id * KNUTH) mod 2^32 mod 100, computed overflow-free for ANY
    int64 id, negative included.

    The naive ``doc_id * 2654435761`` wraps int64 once doc_id exceeds
    ~3.5e9 (ANSI mode aborts the job; DuckDB promotes to HUGEINT — the
    engines diverge exactly when ids get big). Split the reduced 32-bit
    id into 16-bit halves: (d_hi*K mod 2^16)*2^16 + d_lo*K ≡ d*K
    (mod 2^32), and every intermediate stays below 2^48. pmod handles
    negative ids identically in both engines (SQL % keeps the dividend's
    sign; Python-style pmod does not)."""
    return F.expr(
        f"pmod(pmod(pmod({id_col}, 4294967296) div 65536 * {_KNUTH}, 65536) * 65536"
        f" + pmod({id_col}, 4294967296) % 65536 * {_KNUTH}, 4294967296) % 100"
    )


def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: keep ~20% of docs per language
    via a multiplicative-hash residue on doc_id. Unlike rand()-based
    sampling this is reproducible across engines and reruns (the
    property a training-data pipeline actually needs for lineage), and
    unlike limit() it samples every partition. Returns the sampled rows;
    per-lang proportions are the pytest assertion."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(sample_hash_residue("doc_id") < _SAMPLE_PCT).select(
        "doc_id", "lang", "source"
    )


SAMPLE_SQL = f"""
WITH d AS (
  SELECT *, (doc_id % 4294967296 + 4294967296) % 4294967296 AS d32
  FROM documents
)
SELECT doc_id, lang, source
FROM d
WHERE ((d32 // 65536 * {_KNUTH}) % 65536 * 65536
       + d32 % 65536 * {_KNUTH}) % 4294967296 % 100 < {_SAMPLE_PCT}
"""


def embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 embedding quantization (the standard ANN-index compression):
    per-vector min/max affine scale to [0, 255], emit the scale params
    (floor-scaled) and the first 4 codes plus the code-sum checksum —
    enough for the oracle to verify every lane without 2000 columns."""
    # Staged COLUMNS, not inline exprs (r14): written inline, `lo`/`hi`
    # (array_min/max) re-evaluated per LAMBDA ELEMENT (no CSE inside
    # HOF lambdas) and `codes` re-evaluated per downstream reference —
    # O(d^2) per row x 5 references, measured 2.86 s vs 0.15 s at
    # sf0.1. As columns, CollapseProject keeps each non-cheap alias
    # single-evaluation.
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "vec_id",
            F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
                "vec"
            ),
        )
        .select(
            "vec_id",
            "vec",
            F.array_min("vec").alias("lo"),
            F.array_max("vec").alias("hi"),
        )
        .select(
            "vec_id",
            "lo",
            "hi",
            F.transform(
                F.col("vec"),
                lambda x: F.when(F.col("hi") == F.col("lo"), F.lit(0))
                .otherwise(
                    F.least(
                        F.floor(
                            (x - F.col("lo"))
                            / (F.col("hi") - F.col("lo"))
                            * 256
                        ),
                        F.lit(255),
                    )
                )
                .cast("int"),
            ).alias("codes"),
        )
        .select(
            "vec_id",
            F.floor(F.col("lo") * 1e6).alias("qmin"),
            F.floor(F.col("hi") * 1e6).alias("qmax"),
            F.get("codes", 0).alias("c0"),
            F.get("codes", 1).alias("c1"),
            F.get("codes", 2).alias("c2"),
            F.get("codes", 3).alias("c3"),
            F.aggregate(
                "codes", F.lit(0).cast("bigint"), lambda acc, c: acc + c
            ).alias("code_sum"),
        )
    )


QUANTIZE_SQL = """
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         list_min(CAST(embedding AS DOUBLE[])) AS lo,
         list_max(CAST(embedding AS DOUBLE[])) AS hi
  FROM embeddings
),
q AS (
  SELECT vec_id, lo, hi,
         list_transform(e, x -> CAST(
             CASE WHEN hi = lo THEN 0
                  ELSE least(floor((x - lo) / (hi - lo) * 256), 255)
             END AS INT)) AS codes
  FROM v
)
SELECT vec_id,
       CAST(floor(lo * 1000000) AS BIGINT) AS qmin,
       CAST(floor(hi * 1000000) AS BIGINT) AS qmax,
       codes[1] AS c0, codes[2] AS c1, codes[3] AS c2, codes[4] AS c3,
       CAST(list_aggregate(codes, 'sum') AS BIGINT) AS code_sum
FROM q
"""


_BOTTOMK = 100


def sample_bottomk_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic uniform sample via the bottom-k hash sketch: keep
    the k documents with the smallest md5(doc_id) — a coordination-free
    uniform sample that is MERGEABLE (the bottom-k of a union is the
    bottom-k of the per-partition bottom-ks), reproducible across runs
    and engines, and composable with any downstream stage. The
    distributed plan is Spark's TakeOrderedAndProject: each partition
    keeps its own k, only k x partitions rows reach the driver-side
    merge — no full sort, no shuffle of the corpus.

    This complements sample_stratified_hash (rate-based residue
    filtering) with exact-size sampling: residues give a fraction,
    bottom-k gives exactly k."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    return (
        docs.select("doc_id", "lang", h.alias("sample_key"))
        .orderBy("sample_key")
        .limit(_BOTTOMK)
    )


SAMPLE_BOTTOMK_SQL = f"""
SELECT doc_id, lang, md5(CAST(doc_id AS VARCHAR)) AS sample_key
FROM documents
ORDER BY sample_key
LIMIT {_BOTTOMK}
"""


def sample_weighted_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-biased deterministic bottom-k: keep the 50 documents with
    the smallest hash-priority divided by weight (weight = n_chars, so
    longer documents are proportionally likelier) — the deterministic
    integer analog of bottom-k priority sampling (exact PPS draws
    u^(1/w); rank = h div w preserves the same monotone weight bias
    with pure int64 arithmetic, which is what keeps it engine-portable
    and replayable).

    Same merge property and TakeOrderedAndProject plan as the uniform
    bottom-k: per-partition bottom-ks merge to the global bottom-k,
    only k x partitions rows leave the executors. The Knuth
    multiplicative hash over doc_id is the shared residue generator
    (sample_stratified_hash), computed overflow-free for any int64."""
    docs = load_table(spark, sf_dir, "documents")
    # the 32-bit Knuth hash from sample_hash_residue, without the % 100
    # residue: same 16-bit-halves form so no int64 overflow at any id
    h = F.expr(
        f"pmod(pmod(pmod(doc_id, 4294967296) div 65536 * {_KNUTH}, 65536)"
        f" * 65536 + pmod(doc_id, 4294967296) % 65536 * {_KNUTH},"
        f" 4294967296)"
    )
    return (
        docs.select("doc_id", "lang", "n_chars", h.alias("h"))
        .select(
            "doc_id",
            "lang",
            "n_chars",
            F.expr("h * 1000000L div n_chars").alias("weighted_rank"),
        )
        .orderBy("weighted_rank", "doc_id")
        .limit(_BOTTOMK)
    )


SAMPLE_WEIGHTED_SQL = f"""
SELECT doc_id, lang, n_chars,
       (((doc_id * {_KNUTH}) % 4294967296 + 4294967296) % 4294967296)
         * 1000000 // n_chars AS weighted_rank
FROM documents
ORDER BY weighted_rank, doc_id
LIMIT {_BOTTOMK}
"""


QUERIES = {
    "sample_bottomk_hash": sample_bottomk_hash,
    "sample_weighted_bottomk": sample_weighted_bottomk,
    "pack_sequences_greedy": pack_sequences_greedy,
    "tfidf_top_terms": tfidf_top_terms,
    "sample_stratified_hash": sample_stratified_hash,
    "embedding_int8_quantize": embedding_int8_quantize,
}

ORACLES = {
    "sample_bottomk_hash": SAMPLE_BOTTOMK_SQL,
    "sample_weighted_bottomk": SAMPLE_WEIGHTED_SQL,
    "pack_sequences_greedy": PACK_SQL,
    "tfidf_top_terms": TFIDF_SQL,
    "sample_stratified_hash": SAMPLE_SQL,
    "embedding_int8_quantize": QUANTIZE_SQL,
}
