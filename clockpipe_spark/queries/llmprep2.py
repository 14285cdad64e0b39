"""Training-data preparation, part 2 (SURVEY.md §2.10 extension):
Gopher/C4-style repetition quality filters, PII redaction, document
chunking, and benchmark-contamination checks — the corpus-hygiene
stages of an LLM data pipeline.

All stay in whole-stage codegen (explode + conditional aggregates,
regexp_replace, sequence/slice arrays) with exact DuckDB twins.
Hash-gate discipline per PLANS.md: integer outputs, floor-scaled
ratios, no engine-divergent round() ties.

Scale notes (100 TB):
- repetition stats: ONE exploded gram stream (1/2/3-grams union-tagged)
  -> two hash aggregations with map-side partial combine. Never three
  separate explode passes; never a per-doc collect.
- PII redaction: pure regexp_replace, map-side only, zero shuffle.
- chunking: per-row sequence arithmetic + explode, map-side only —
  output partitioning inherits the input's, no shuffle until a
  downstream op asks for one.
- contamination: the benchmark side is tiny by construction -> its gram
  set broadcasts; the corpus side streams through one explode + one
  broadcast semi-ish join + one aggregation. The corpus never
  self-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clockpipe_spark.catalog import load_table


def _tokens(col):
    return F.split(F.trim(F.lower(col)), r"\s+")


def _grams(toks, k: int):
    """Non-distinct k-gram array (repetition metrics need multiplicity;
    contrast operators.neardup.shingles_from_tokens, which dedups).
    Guarded: sequence(1, n-k+1) with n < k would generate a DESCENDING
    sequence in Spark (auto step -1) — the empty-array branch is load-
    bearing, not defensive."""
    n = F.size(toks)
    sh = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(k)]),
    )
    return F.when(n >= k, sh).otherwise(F.array().cast("array<string>"))


# Gopher-style thresholds (Rae et al. 2021 table A1 family), adapted to
# the fixture's word-soup text: top-unigram fraction and duplicated-
# trigram fraction are the discriminating metrics when there is no
# punctuation or line structure to measure.
_TOP_UNI_MAX = 0.20
_DUP_TRI_MAX = 0.30


def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality battery per document: most-common-unigram
    fraction, most-common-bigram fraction, duplicated-trigram fraction,
    distinct-token (type/token) ratio, plus the pass/fail gate — the
    Gopher repetition filters re-expressed for a flat token stream.

    Plan shape: the 1/2/3-gram streams are exploded ONCE into a single
    union-tagged stream, then two hash aggregations (gram counts ->
    per-doc conditional stats). Both aggregations combine map-side; the
    alternative (three explode+agg passes + three joins) triples the
    shuffle volume for identical output."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", _tokens(F.col("text")).alias("toks"))

    def tagged(k):
        return toks.select(
            "doc_id",
            F.lit(k).alias("n"),
            F.explode(_grams(F.col("toks"), k)).alias("gram"),
        )

    stream = tagged(1).unionByName(tagged(2)).unionByName(tagged(3))
    cnt = stream.groupBy("doc_id", "n", "gram").agg(F.count("*").alias("c"))
    c, n = F.col("c"), F.col("n")
    per_doc = cnt.groupBy("doc_id").agg(
        F.max(F.when(n == 1, c)).alias("top_uni"),
        F.sum(F.when(n == 1, c)).alias("n_tokens"),
        F.count(F.when(n == 1, True)).alias("distinct_tokens"),
        F.max(F.when(n == 2, c)).alias("top_bi"),
        F.sum(F.when(n == 2, c)).alias("n_bigrams"),
        F.coalesce(F.sum(F.when((n == 3) & (c > 1), c)), F.lit(0)).alias("dup_tri"),
        F.sum(F.when(n == 3, c)).alias("n_trigrams"),
    )

    def frac(num, den):
        # floor-scaled int/int ratio (round() ties diverge across
        # engines — PLANS.md canonicalization rules)
        return F.when(den > 0, F.floor(num / den * 1e4)).otherwise(F.lit(0))

    top_uni_f = frac(F.col("top_uni"), F.col("n_tokens"))
    dup_tri_f = frac(F.col("dup_tri"), F.col("n_trigrams"))
    return per_doc.select(
        "doc_id",
        F.col("n_tokens"),
        top_uni_f.alias("top_unigram_frac"),
        frac(F.col("top_bi"), F.col("n_bigrams")).alias("top_bigram_frac"),
        dup_tri_f.alias("dup_trigram_frac"),
        frac(F.col("distinct_tokens"), F.col("n_tokens")).alias("type_token_ratio"),
        (
            (top_uni_f <= int(_TOP_UNI_MAX * 1e4))
            & (dup_tri_f <= int(_DUP_TRI_MAX * 1e4))
        ).alias("passes_repetition"),
    )


REPETITION_SQL = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
  FROM documents
),
stream AS (
  SELECT doc_id, 1 AS n, unnest(toks) AS gram FROM toks
  UNION ALL
  SELECT doc_id, 2 AS n,
         unnest(list_transform(generate_series(1, len(toks) - 1),
                               i -> toks[i] || ' ' || toks[i+1])) AS gram
  FROM toks
  UNION ALL
  SELECT doc_id, 3 AS n,
         unnest(list_transform(generate_series(1, len(toks) - 2),
                               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS gram
  FROM toks
),
cnt AS (
  SELECT doc_id, n, gram, count(*) AS c FROM stream GROUP BY 1, 2, 3
),
per_doc AS (
  SELECT doc_id,
         max(c) FILTER (WHERE n = 1) AS top_uni,
         CAST(sum(c) FILTER (WHERE n = 1) AS BIGINT) AS n_tokens,
         count(*) FILTER (WHERE n = 1) AS distinct_tokens,
         max(c) FILTER (WHERE n = 2) AS top_bi,
         CAST(sum(c) FILTER (WHERE n = 2) AS BIGINT) AS n_bigrams,
         CAST(coalesce(sum(c) FILTER (WHERE n = 3 AND c > 1), 0) AS BIGINT) AS dup_tri,
         CAST(sum(c) FILTER (WHERE n = 3) AS BIGINT) AS n_trigrams
  FROM cnt GROUP BY doc_id
)
SELECT doc_id, n_tokens,
       CAST(CASE WHEN n_tokens > 0
                 THEN floor(top_uni / n_tokens * 10000) ELSE 0 END AS BIGINT)
           AS top_unigram_frac,
       CAST(CASE WHEN n_bigrams > 0
                 THEN floor(top_bi / n_bigrams * 10000) ELSE 0 END AS BIGINT)
           AS top_bigram_frac,
       CAST(CASE WHEN n_trigrams > 0
                 THEN floor(dup_tri / n_trigrams * 10000) ELSE 0 END AS BIGINT)
           AS dup_trigram_frac,
       CAST(CASE WHEN n_tokens > 0
                 THEN floor(distinct_tokens / n_tokens * 10000) ELSE 0 END AS BIGINT)
           AS type_token_ratio,
       (CASE WHEN n_tokens > 0
             THEN floor(top_uni / n_tokens * 10000) ELSE 0 END
            <= {int(_TOP_UNI_MAX * 1e4)}
        AND CASE WHEN n_trigrams > 0
                 THEN floor(dup_tri / n_trigrams * 10000) ELSE 0 END
            <= {int(_DUP_TRI_MAX * 1e4)}) AS passes_repetition
FROM per_doc
"""


# --------------------------------------------------------------------------
# PII redaction
# --------------------------------------------------------------------------
# Shared regexes — kept inside the Java-regex ∩ RE2 dialect intersection
# (character classes, bounded repeats, \b, non-capturing groups) so Spark
# and DuckDB behave identically.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IP = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
_PII_PHONE = r"\b555-[0-9]{4}\b"


def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction battery: emails, phone numbers, IPv4 addresses ->
    <EMAIL>/<PHONE>/<IP> placeholders, plus per-doc hit counts.

    The fixture corpus is PII-free word soup, so the query first injects
    deterministic doc_id-derived PII spans (identically in the oracle) —
    the redaction regexes then provably fire on every row.

    Plan shape: pure regexp_replace / regexp_extract_all projections —
    map-side only, zero shuffle, whole-stage codegen. At 100 TB this is
    embarrassingly parallel; the only cost is the regex engine itself.
    """
    docs = load_table(spark, sf_dir, "documents")
    d = F.col("doc_id")
    aug = F.concat(
        F.substring(F.col("text"), 1, 80),
        F.lit(" contact user"), d.cast("string"),
        F.lit("@mail.example.com or 555-"),
        F.lpad((d % 10000).cast("string"), 4, "0"),
        F.lit(" from 10.0."), (d % 256).cast("string"), F.lit(".7"),
    )
    def hits(pat):
        return F.size(F.regexp_extract_all(aug, F.lit(pat), F.lit(0)))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(aug, _PII_EMAIL, "<EMAIL>"),
            _PII_IP, "<IP>"),
        _PII_PHONE, "<PHONE>")
    return docs.select(
        "doc_id",
        hits(_PII_EMAIL).alias("n_emails"),
        hits(_PII_PHONE).alias("n_phones"),
        hits(_PII_IP).alias("n_ips"),
        F.length(redacted).alias("redacted_len"),
        redacted.alias("redacted_text"),
    )


PII_SQL = """
WITH aug AS (
  SELECT doc_id,
         substr(text, 1, 80)
           || ' contact user' || CAST(doc_id AS VARCHAR)
           || '@mail.example.com or 555-'
           || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
           || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' AS t
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(t, '\\b555-[0-9]{4}\\b')) AS INT) AS n_phones,
       CAST(len(regexp_extract_all(t, '\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b')) AS INT) AS n_ips,
       CAST(length(
         regexp_replace(regexp_replace(regexp_replace(t,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b', '<IP>', 'g'),
           '\\b555-[0-9]{4}\\b', '<PHONE>', 'g')) AS INT) AS redacted_len,
       regexp_replace(regexp_replace(regexp_replace(t,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
         '\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b', '<IP>', 'g'),
         '\\b555-[0-9]{4}\\b', '<PHONE>', 'g') AS redacted_text
FROM aug
"""


# --------------------------------------------------------------------------
# Document chunking with overlap
# --------------------------------------------------------------------------
_CHUNK_W = 50   # tokens per chunk
_CHUNK_S = 40   # stride (overlap = W - S = 10)


def doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking: fixed W-token chunks every S
    tokens (W=50, S=40 -> 10-token overlap); tail chunks may be short.
    One row per (doc, chunk).

    Plan shape: per-row sequence(1, n, S) + transform + explode — all
    map-side array arithmetic, zero shuffle; output partitioning
    inherits the scan's. At 100 TB the fanout is bounded (~n_tokens/S
    rows per doc) and never concentrates on a key."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", _tokens(F.col("text")).alias("toks"))
    n = F.size(F.col("toks"))
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(_CHUNK_S))
    chunked = toks.select(
        "doc_id",
        F.posexplode(starts).alias("chunk_idx", "chunk_start"),
        F.col("toks"),
    )
    piece = F.slice(F.col("toks"), F.col("chunk_start"), _CHUNK_W)
    return chunked.select(
        "doc_id",
        "chunk_idx",
        "chunk_start",
        F.size(piece).alias("chunk_len"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


CHUNK_SQL = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
  FROM documents
),
starts AS (
  SELECT doc_id, toks,
         unnest(generate_series(1, greatest(len(toks), 1), {_CHUNK_S})) AS chunk_start,
         generate_subscripts(generate_series(1, greatest(len(toks), 1), {_CHUNK_S}), 1) - 1
           AS chunk_idx
  FROM toks
)
SELECT doc_id,
       CAST(chunk_idx AS INT) AS chunk_idx,
       CAST(chunk_start AS INT) AS chunk_start,
       CAST(len(list_slice(toks, chunk_start, chunk_start + {_CHUNK_W - 1})) AS INT)
         AS chunk_len,
       array_to_string(list_slice(toks, chunk_start, chunk_start + {_CHUNK_W - 1}), ' ')
         AS chunk_text
FROM starts
"""


# --------------------------------------------------------------------------
# Benchmark-contamination check
# --------------------------------------------------------------------------
_CONTAM_K = 5  # gram width


def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: flag corpus documents sharing any
    5-gram with a held-out 'benchmark' set (doc_id % 50 == 0 — a
    deterministic stand-in for a real eval suite).

    Plan shape: the benchmark side is tiny by construction, so its
    distinct-gram set BROADCASTS; the corpus streams through one explode
    + broadcast inner join + hash agg, then a broadcast-joinable left
    join restores zero-hit docs. The corpus never self-joins and never
    shuffles on gram — only the final per-doc count aggregates.

    Broadcastability rests on the benchmark being a genuinely small
    EXTERNAL table (real eval suites are ~1e6 grams << the 8 GB
    broadcast limit). The doc_id % 50 stand-in used here selects 2% of
    the corpus — that only models a small benchmark at fixture scale;
    at 100 TB the stand-in's gram set would be terabytes, so a real
    deployment swaps in the external suite, not the modulo filter."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", _tokens(F.col("text")).alias("toks"), (F.col("doc_id") % 50 == 0).alias("is_bench")
    )
    grams = toks.select(
        "doc_id", "is_bench",
        F.explode(_grams(F.col("toks"), _CONTAM_K)).alias("gram"),
    )
    bench_grams = grams.filter("is_bench").select("gram").distinct()
    corpus = toks.filter(~F.col("is_bench"))
    hit_counts = (
        grams.filter(~F.col("is_bench"))
        .join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated_grams"))
    )
    return (
        corpus.select("doc_id", F.size("toks").alias("n_tokens"))
        .join(hit_counts, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_contaminated_grams", F.lit(0)).alias("n_contaminated_grams"),
            (F.coalesce("n_contaminated_grams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


CONTAM_SQL = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks,
         doc_id % 50 = 0 AS is_bench
  FROM documents
),
grams AS (
  SELECT doc_id, is_bench,
         unnest(list_transform(generate_series(1, len(toks) - {_CONTAM_K - 1}),
                i -> array_to_string(list_slice(toks, i, i + {_CONTAM_K - 1}), ' ')))
           AS gram
  FROM toks
  WHERE len(toks) >= {_CONTAM_K}
),
bench AS (SELECT DISTINCT gram FROM grams WHERE is_bench),
hits AS (
  SELECT g.doc_id, count(*) AS n_contaminated_grams
  FROM grams g JOIN bench b USING (gram)
  WHERE NOT g.is_bench
  GROUP BY g.doc_id
)
SELECT t.doc_id,
       CAST(len(t.toks) AS INT) AS n_tokens,
       CAST(coalesce(h.n_contaminated_grams, 0) AS BIGINT) AS n_contaminated_grams,
       coalesce(h.n_contaminated_grams, 0) > 0 AS contaminated
FROM toks t LEFT JOIN hits h USING (doc_id)
WHERE NOT t.is_bench
"""


QUERIES = {
    "text_repetition_stats": text_repetition_stats,
    "text_pii_redact": text_pii_redact,
    "doc_chunk_overlap": doc_chunk_overlap,
    "benchmark_contamination": benchmark_contamination,
}

ORACLES = {
    "text_repetition_stats": REPETITION_SQL,
    "text_pii_redact": PII_SQL,
    "doc_chunk_overlap": CHUNK_SQL,
    "benchmark_contamination": CONTAM_SQL,
}
