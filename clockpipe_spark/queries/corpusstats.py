"""Corpus-statistics and membership-sketch tier: document-length
histogram and a Bloom-filter benchmark-contamination scan.

The Bloom variant complements llmprep2.benchmark_contamination (exact
broadcast join on gram STRINGS): here the benchmark compresses to a
bit-position SET (3 positions per gram in a 2^20-bit space) so the
broadcast payload is integers, not text — the shape that still fits in
a broadcast when the benchmark suite's raw grams would not. Every hash
is portable integer arithmetic (Karp-Rabin char fold -> token-level
gram fold -> Kirsch-Mitzenmacher double hashing), so the whole filter
is deterministic and the DuckDB oracle reproduces it bit-for-bit:
false positives are not noise but a pinned, reproducible property of
the filter both engines must agree on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from clockpipe_spark.catalog import load_table

_B1 = 31  # char-fold base (shared with textops2.text_rolling_hash)
_B2 = 37  # independent second base for double hashing
_P = 2147483647  # 2^31 - 1; keeps every product below 2^36
_BLOOM_M = 1 << 20  # bits in the filter
_BLOOM_K = 3  # probes per gram
_GRAM_N = 5  # benchmark-contamination gram width (matches llmprep2)


def corpus_doclen_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed document-length histogram with per-bucket token
    mass — the first dashboard every corpus pipeline ships. The bucket
    is floor(log2(n_chars + 0.5)): the +0.5 keeps the argument off
    exact powers of two, so a 1-ulp libm difference between engines
    can never flip the floor. Shares are ppm-scaled integer division.

    One hash aggregation with map-side combine over a pure projection;
    at 100 TB this runs at scan speed and shuffles ~30 bucket rows."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.floor(F.log2(F.col("n_chars") + 0.5)).alias("bucket")
    ws_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    hist = (
        docs.select(bucket, ws_tokens.alias("ws_tokens"), "n_chars")
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ws_tokens").alias("total_tokens"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )
    return hist.select(
        "bucket",
        F.expr("shiftleft(1L, cast(bucket as int))").alias("bucket_lo_chars"),
        "n_docs",
        "total_tokens",
        "min_chars",
        "max_chars",
        F.expr(
            "(n_docs * 1000000L) div sum(n_docs) over ()"
        ).alias("share_ppm"),
    )


DOCLEN_HIST_SQL = r"""
WITH h AS (
  SELECT CAST(floor(log2(n_chars + 0.5)) AS BIGINT) AS bucket,
         len(regexp_split_to_array(trim(text), '\s+')) AS ws_tokens,
         n_chars
  FROM documents
),
g AS (
  SELECT bucket, count(*) AS n_docs, sum(ws_tokens) AS total_tokens,
         min(n_chars) AS min_chars, max(n_chars) AS max_chars
  FROM h GROUP BY bucket
)
SELECT bucket, CAST(pow(2, bucket) AS BIGINT) AS bucket_lo_chars,
       n_docs, CAST(total_tokens AS BIGINT) AS total_tokens,
       min_chars, max_chars,
       CAST((n_docs * 1000000) // sum(n_docs) OVER () AS BIGINT) AS share_ppm
FROM g
"""


def _token_hashes_sql(toks_sql: str) -> str:
    """Karp-Rabin char fold per token (base B1 mod P), as an expr
    string over the token-array expression (r21, guide §1.2: the
    Column+lambda form issued hundreds of py4j round trips; the string
    parses the identical tree JVM-side — plan_equiv-verified)."""
    return (
        f"transform({toks_sql},"
        " t -> aggregate(transform(split(t, ''),"
        " ch -> CAST(ascii(ch) AS BIGINT)),"
        " CAST(0 AS BIGINT),"
        f" (acc, c) -> (acc * {_B1} + c) % {_P}))"
    )


def _gram_hash_pairs_sql(th_sql: str) -> str:
    """(h1, h2) per 5-gram by folding the 5 TOKEN hashes with two
    independent bases — each char is hashed once per token, not once
    per containing gram (a 5x saving over hashing gram strings).
    Expr-string twin of the r20 Column form (plan_equiv-verified)."""
    idx = (
        f"CASE WHEN size({th_sql}) >= {_GRAM_N}"
        f" THEN sequence(1, size({th_sql}) - {_GRAM_N - 1})"
        " ELSE CAST(array() AS array<int>) END"
    )

    def fold(base: int) -> str:
        acc = "CAST(0 AS BIGINT)"
        for j in range(_GRAM_N):
            acc = f"(({acc} * {base} + element_at({th_sql}, i + {j})) % {_P})"
        return acc

    return (
        f"transform({idx},"
        f" i -> struct({fold(_B1)} AS h1, {fold(_B2)} AS h2))"
    )


def contamination_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan through a Bloom filter: benchmark
    5-grams (doc_id % 50 == 0, the stand-in suite) set K=3 positions
    each in a 2^20-bit space via double hashing h1 + i*(2*h2+1); a
    corpus gram is flagged when all 3 of its positions are set. Output
    per corpus doc: flagged-gram count and the contaminated bit.

    Plan shape: the benchmark side collapses to <= 3 x |bench grams|
    DISTINCT bit positions — a broadcast of bigints whose size is
    independent of gram text length. The corpus streams through one
    explode + broadcast join + two hash aggregations keyed on
    (doc_id[, gram]); nothing ever shuffles on gram text and the raw
    corpus shuffles nothing at all. At a real 100 TB deployment the
    eval suite is external and tiny; the filter's false-positive rate
    (k=3, m=2^20) is sized for it, and because the hashing is
    deterministic the oracle reproduces even the false positives."""
    docs = load_table(spark, sf_dir, "documents")
    # materialize the token-hash array as a COLUMN before the per-gram
    # transform: Catalyst does no common-subexpression elimination
    # inside HOF lambdas, so inlining _token_hashes into
    # _gram_hash_pairs re-evaluates the whole char-fold pipeline for
    # every element_at — measured 522 s at sf0.1 vs 3.5 s with the
    # array staged (the O(grams x tokens x chars) trap this repo's
    # other n-gram paths already avoid)
    toks_sql = "split(trim(lower(text)), '\\\\s+')"
    hashed = docs.selectExpr(
        "doc_id",
        "(doc_id % 50 = 0) AS is_bench",
        f"{_token_hashes_sql(toks_sql)} AS th",
    ).selectExpr(
        "doc_id",
        "is_bench",
        f"array_distinct({_gram_hash_pairs_sql('th')}) AS hp",
    )
    # explode_OUTER, not explode: for plain explode the optimizer
    # infers `size(hp) > 0` (InferFiltersFromGenerate) and pushes that
    # filter below the staging projection, inlining the whole
    # token-hash pipeline into every element_at reference — measured
    # 522 s at sf0.1 vs ~4 s without the inferred filter. The outer
    # variant admits no such inference; the null row from an empty
    # array drops right after, against the cheap generated column.
    probes = hashed.selectExpr(
        "doc_id",
        "is_bench",
        "explode_outer(hp) AS g",
    ).filter(F.col("g").isNotNull()).selectExpr(
        "doc_id",
        "is_bench",
        "g.h1 AS h1",
        "(g.h2 * 2 + 1) AS h2o",
    )
    ks = spark.range(_BLOOM_K).select(F.col("id").alias("i"))
    bits = (
        probes.filter("is_bench")
        .crossJoin(F.broadcast(ks))
        .selectExpr(f"((h1 + i * h2o) % {_BLOOM_M}) AS pos")
        .distinct()
    )
    corpus_pos = (
        probes.filter(~F.col("is_bench"))
        .crossJoin(F.broadcast(ks))
        .selectExpr(
            "doc_id",
            "h1",
            "h2o",
            f"((h1 + i * h2o) % {_BLOOM_M}) AS pos",
        )
    )
    gram_hits = (
        corpus_pos.join(F.broadcast(bits), "pos")
        .groupBy("doc_id", "h1", "h2o")
        .agg(F.expr("count(*) AS k_hit"))
        .filter(F.col("k_hit") == _BLOOM_K)
        .groupBy("doc_id")
        .agg(F.expr("count(*) AS n_flagged_grams"))
    )
    corpus_docs = hashed.filter(~F.col("is_bench")).select("doc_id")
    return corpus_docs.join(gram_hits, "doc_id", "left").selectExpr(
        "doc_id",
        "coalesce(n_flagged_grams, 0) AS n_flagged_grams",
        "CAST(coalesce(n_flagged_grams, 0) > 0 AS INT) AS contaminated",
    )


CONTAM_BLOOM_SQL = rf"""
WITH toks AS (
  SELECT doc_id, doc_id % 50 = 0 AS is_bench,
         regexp_split_to_array(trim(lower(text)), '\s+') AS t
  FROM documents
),
th AS (
  SELECT doc_id, is_bench,
         list_transform(t, tok -> list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(generate_series(1, length(tok)),
                            i -> CAST(ascii(substring(tok, i, 1)) AS BIGINT))),
           (acc, c) -> (acc * {_B1} + c) % {_P})) AS hs
  FROM toks
),
grams AS (
  SELECT DISTINCT doc_id, is_bench,
         list_reduce(list_prepend(CAST(0 AS BIGINT), list_slice(hs, i, i + {_GRAM_N - 1})),
                     (acc, x) -> (acc * {_B1} + x) % {_P}) AS h1,
         list_reduce(list_prepend(CAST(0 AS BIGINT), list_slice(hs, i, i + {_GRAM_N - 1})),
                     (acc, x) -> (acc * {_B2} + x) % {_P}) * 2 + 1 AS h2o
  FROM th, unnest(generate_series(1, len(hs) - {_GRAM_N - 1})) AS u(i)
  WHERE len(hs) >= {_GRAM_N}
),
ks AS (SELECT unnest(range({_BLOOM_K})) AS i),
bits AS (
  SELECT DISTINCT (h1 + i * h2o) % {_BLOOM_M} AS pos
  FROM grams, ks WHERE is_bench
),
gram_hits AS (
  SELECT doc_id, h1, h2o
  FROM (
    SELECT g.doc_id, g.h1, g.h2o, count(*) AS k_hit
    FROM grams g CROSS JOIN ks
    JOIN bits b ON (g.h1 + ks.i * g.h2o) % {_BLOOM_M} = b.pos
    WHERE NOT g.is_bench
    GROUP BY g.doc_id, g.h1, g.h2o
  ) WHERE k_hit = {_BLOOM_K}
),
per_doc AS (
  SELECT doc_id, count(*) AS n_flagged_grams FROM gram_hits GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(coalesce(p.n_flagged_grams, 0) AS BIGINT) AS n_flagged_grams,
       CAST(coalesce(p.n_flagged_grams, 0) > 0 AS INT) AS contaminated
FROM toks t LEFT JOIN per_doc p ON t.doc_id = p.doc_id
WHERE NOT t.is_bench
"""


def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the fraction of a doc's distinct 5-grams
    that FIRST appear in that doc (scanning the corpus in doc_id
    order) — the 'how much new content does each document contribute'
    curve that drives crawl-dedup and data-curation decisions (a doc
    whose grams all appeared earlier is pure repetition).

    First-occurrence attribution is one hash aggregation: gram ->
    min(doc_id) (map-side partial min), joined back to the per-doc
    distinct gram stream on gram. At 100 TB the gram table is the same
    exchange every n-gram statistic already pays; nothing is pairwise.
    Short docs (< 5 tokens) surface with zero grams, not dropped."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.trim(F.lower("text")), r"\s+").alias("t")
    )
    n = F.size("t")
    gram_idx = F.when(
        n >= _GRAM_N, F.sequence(F.lit(1), n - (_GRAM_N - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = toks.select(
        "doc_id",
        F.explode_outer(
            F.array_distinct(
                F.transform(
                    gram_idx,
                    lambda i: F.concat_ws(
                        " ", *[F.element_at("t", i + j) for j in range(_GRAM_N)]
                    ),
                )
            )
        ).alias("gram"),
    # r15 (the bigram lesson): checkpoint the gram stream once — the
    # 5-gram concat runs INTERPRETED per element inside the HOF
    # transform, and without the checkpoint it re-ran in both the
    # first-seen branch and the scoring join branch. (doc_id, gram) is
    # already distinct via array_distinct, so no pre-count is needed.
    ).localCheckpoint(eager=True)
    first_seen = (
        grams.filter(F.col("gram").isNotNull())
        .groupBy("gram")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    scored = grams.join(first_seen, "gram", "left").groupBy("doc_id").agg(
        F.count("gram").alias("n_grams"),
        F.sum(
            (F.col("first_doc") == F.col("doc_id")).cast("int")
        ).cast("bigint").alias("n_novel"),
    )
    return scored.select(
        "doc_id",
        "n_grams",
        F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
        F.when(
            F.col("n_grams") > 0,
            F.expr("(coalesce(n_novel, 0) * 1000000L) div n_grams"),
        ).otherwise(F.lit(0)).alias("novelty_ppm"),
    )


NGRAM_NOVELTY_SQL = rf"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(t, i, i + {_GRAM_N - 1}), ' ') AS gram
  FROM toks, unnest(generate_series(1, len(t) - {_GRAM_N - 1})) AS u(i)
  WHERE len(t) >= {_GRAM_N}
),
first_seen AS (
  SELECT gram, min(doc_id) AS first_doc FROM grams GROUP BY gram
),
scored AS (
  SELECT g.doc_id, count(*) AS n_grams,
         sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS n_novel
  FROM grams g JOIN first_seen f USING (gram)
  GROUP BY g.doc_id
)
SELECT t.doc_id,
       coalesce(s.n_grams, 0) AS n_grams,
       CAST(coalesce(s.n_novel, 0) AS BIGINT) AS n_novel,
       CAST(CASE WHEN coalesce(s.n_grams, 0) > 0
            THEN (coalesce(s.n_novel, 0) * 1000000) // s.n_grams
            ELSE 0 END AS BIGINT) AS novelty_ppm
FROM toks t LEFT JOIN scored s USING (doc_id)
"""


_TREND_TOP = 15


def trending_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rising-terms report: the 15 terms whose share of the corpus's
    second doc-id half most exceeds their first-half share (delta in
    ppm of each half's token mass) — the vocabulary-drift twin of
    dist_drift_l1, at term granularity; on a crawl pipeline this is
    the "what is the new crawl slice full of" dashboard. The halves
    split on the median-free midpoint of [min, max] doc_id (broadcast
    1-row aggregate, integer `div`).

    One (term, half) aggregation with map-side combine + a 1-row
    totals broadcast + a top-k window over the term table — the corpus
    shuffles once, on term."""
    docs = load_table(spark, sf_dir, "documents")
    bounds = docs.agg(
        F.expr("(min(doc_id) + max(doc_id)) div 2L").alias("mid")
    )
    toks = docs.crossJoin(F.broadcast(bounds)).select(
        (F.col("doc_id") > F.col("mid")).cast("int").alias("half"),
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("term"),
    )
    cells = toks.groupBy("term").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("c0"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("c1"),
    )
    tots = cells.agg(
        F.sum("c0").alias("n0"), F.sum("c1").alias("n1")
    )
    scored = cells.crossJoin(F.broadcast(tots)).select(
        "term",
        F.expr("c0 * 1000000L div n0").alias("share0_ppm"),
        F.expr("c1 * 1000000L div n1").alias("share1_ppm"),
        F.expr("c1 * 1000000L div n1 - c0 * 1000000L div n0").alias(
            "delta_ppm"
        ),
    )
    # top-k via orderBy().limit(k) (TakeOrderedAndProject: per-partition
    # k-row heaps, k-row exchange) instead of row_number over a global
    # window, which would single-partition the vocab-sized scored frame;
    # the rank window then sees k rows only (same output — the term
    # tiebreak makes the order total)
    top = scored.orderBy(F.col("delta_ppm").desc(), "term").limit(_TREND_TOP)
    w = Window.orderBy(F.col("delta_ppm").desc(), "term")
    return top.withColumn("rnk", F.row_number().over(w))


TRENDING_SQL = rf"""
WITH bounds AS (
  SELECT (min(doc_id) + max(doc_id)) // 2 AS mid FROM documents
),
toks AS (
  SELECT CAST(doc_id > b.mid AS INT) AS half,
         unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
  FROM documents, bounds b
),
cells AS (
  SELECT term,
         sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS c0,
         sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS c1
  FROM toks GROUP BY term
),
tots AS (SELECT sum(c0) AS n0, sum(c1) AS n1 FROM cells),
scored AS (
  SELECT term,
         CAST(c0 * 1000000 // n0 AS BIGINT) AS share0_ppm,
         CAST(c1 * 1000000 // n1 AS BIGINT) AS share1_ppm,
         CAST(c1 * 1000000 // n1 - c0 * 1000000 // n0 AS BIGINT)
             AS delta_ppm
  FROM cells, tots
)
SELECT term, share0_ppm, share1_ppm, delta_ppm, rnk
FROM (
  SELECT *, row_number() OVER (ORDER BY delta_ppm DESC, term) AS rnk
  FROM scored
) WHERE rnk <= {_TREND_TOP}
"""


QUERIES = {
    "corpus_doclen_histogram": corpus_doclen_histogram,
    "contamination_bloom": contamination_bloom,
    "text_ngram_novelty": text_ngram_novelty,
    "trending_terms": trending_terms,
}

ORACLES = {
    "corpus_doclen_histogram": DOCLEN_HIST_SQL,
    "contamination_bloom": CONTAM_BLOOM_SQL,
    "text_ngram_novelty": NGRAM_NOVELTY_SQL,
    "trending_terms": TRENDING_SQL,
}
