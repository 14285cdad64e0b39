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


QUERIES = {
    "text_repetition_stats": text_repetition_stats,
}

ORACLES = {
    "text_repetition_stats": REPETITION_SQL,
}
