"""Text analysis, part 2: BPE-ish regex tokenization and rolling-hash
document fingerprinting — completing the token-counting / fingerprinting
mandate (SURVEY.md §2.10).

Both stay in whole-stage codegen (regexp_extract_all / aggregate fold);
the DuckDB oracles run the byte-identical computation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clockpipe_spark.catalog import load_table

# simplified BPE-style pre-tokenizer: word pieces, number runs, single
# punctuation — the GPT-2 pattern family reduced to an RE2/Java-common
# subset so both engines split identically
_BPE_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def text_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex token counts per doc: whitespace tokens vs BPE-ish pieces
    (the 'token budget' double-count every corpus pipeline reports)."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), 0))
    # pieces_per_word is an int/int ratio — floor-scaled to dodge
    # engine-divergent round() ties (see textops.text_quality_scores).
    return docs.select(
        "doc_id",
        "lang",
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        F.floor(bpe / ws * 1e4).alias("pieces_per_word"),
    )


BPE_TOKEN_SQL = rf"""
SELECT doc_id, lang,
       len(regexp_split_to_array(trim(text), '\s+')) AS ws_tokens,
       len(regexp_extract_all(text, '{_BPE_RE}')) AS bpe_tokens,
       CAST(floor(len(regexp_extract_all(text, '{_BPE_RE}'))
             / len(regexp_split_to_array(trim(text), '\s+')) * 10000) AS BIGINT)
           AS pieces_per_word
FROM documents
"""

_RH_BASE = 31
_RH_MOD = 2147483647  # 2^31 - 1: products stay < 2^36, no long overflow


def text_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling hash (Karp-Rabin) over the normalized text —
    the classic streaming fingerprint. fold(0, acc*B + code mod P) as a
    pure expression: one pass, no UDF."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.col("text")))
    codes = F.transform(F.split(norm, ""), lambda ch: F.ascii(ch).cast("bigint"))
    rh = F.aggregate(
        codes,
        F.lit(0).cast("bigint"),
        lambda acc, x: (acc * _RH_BASE + x) % _RH_MOD,
    )
    return docs.select(
        "doc_id",
        rh.alias("rolling_hash"),
        F.length(norm).alias("n_chars"),
    )


ROLLING_HASH_SQL = f"""
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(generate_series(1, length(lower(trim(text)))),
                          i -> CAST(ascii(substring(lower(trim(text)), i, 1)) AS BIGINT))),
         (acc, x) -> (acc * {_RH_BASE} + x) % {_RH_MOD}) AS rolling_hash,
       length(lower(trim(text))) AS n_chars
FROM documents
"""


def text_c4_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/Gopher-style per-doc quality-filter verdicts: word count in
    [50, 100k], mean word length in [3, 10], >=80% alphabetic words, no
    curly braces, no 'lorem ipsum', terminal punctuation — plus the
    combined keep bit (C4: Raffel et al. 2020 §2.2; Gopher: Rae et al.
    2021 A1.1). Tokens materialize as a column BEFORE the HOF lambdas
    (no CSE inside lambdas — the repo-wide pitfall), ratios floor-scale
    to ints so both engines agree on ties, and thresholds compare the
    already-floored ints. One projection, zero shuffle — at 100 TB this
    runs map-side at scan speed."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.col("text"),
        F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("toks"),
    )
    n_words = F.size(F.col("toks"))
    sum_len = F.aggregate(
        F.col("toks"), F.lit(0).cast("bigint"), lambda a, x: a + F.length(x)
    )
    alpha = F.size(F.filter(F.col("toks"), lambda x: x.rlike("[a-z]")))
    mean_x100 = F.when(n_words > 0, F.floor(sum_len * 100 / n_words)).otherwise(
        F.lit(0)
    )
    alpha_x100 = F.when(n_words > 0, F.floor(alpha * 100 / n_words)).otherwise(
        F.lit(0)
    )
    ends_terminal = F.col("text").rlike(r'[.!?"]\s*$')
    has_curly = F.col("text").contains("{")
    has_lorem = F.lower(F.col("text")).contains("lorem ipsum")
    out = toks.select(
        "doc_id",
        n_words.cast("bigint").alias("n_words"),
        mean_x100.cast("bigint").alias("mean_word_len_x100"),
        alpha_x100.cast("bigint").alias("frac_alpha_x100"),
        ends_terminal.alias("ends_terminal"),
        has_curly.alias("has_curly"),
        has_lorem.alias("has_lorem"),
    )
    # ends_terminal is reported but NOT in the combined bit: the
    # synthetic fixture texts never end in terminal punctuation, which
    # would pin keep to a constant false and destroy its evidence value;
    # a real C4 deployment adds it back as one more AND term.
    keep = (
        (F.col("n_words") >= 50)
        & (F.col("n_words") <= 100_000)
        & (F.col("mean_word_len_x100") >= 300)
        & (F.col("mean_word_len_x100") <= 1000)
        & (F.col("frac_alpha_x100") >= 80)
        & ~F.col("has_curly")
        & ~F.col("has_lorem")
    )
    return out.withColumn("keep", keep).orderBy("doc_id")


C4_FILTERS_SQL = """
WITH t AS (
  SELECT doc_id, text,
         regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
  FROM documents
),
m AS (
  SELECT doc_id, text,
         CAST(len(toks) AS BIGINT) AS n_words,
         CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS sum_len,
         CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS BIGINT)
           AS n_alpha
  FROM t
),
v AS (
  SELECT doc_id, n_words,
         CASE WHEN n_words > 0
              THEN CAST(floor(sum_len * 100 / n_words) AS BIGINT)
              ELSE 0 END AS mean_word_len_x100,
         CASE WHEN n_words > 0
              THEN CAST(floor(n_alpha * 100 / n_words) AS BIGINT)
              ELSE 0 END AS frac_alpha_x100,
         regexp_matches(text, '[.!?"]\\s*$') AS ends_terminal,
         contains(text, '{') AS has_curly,
         contains(lower(text), 'lorem ipsum') AS has_lorem
  FROM m
)
SELECT doc_id, n_words, mean_word_len_x100, frac_alpha_x100,
       ends_terminal, has_curly, has_lorem,
       (n_words >= 50 AND n_words <= 100000
        AND mean_word_len_x100 >= 300 AND mean_word_len_x100 <= 1000
        AND frac_alpha_x100 >= 80
        AND NOT has_curly AND NOT has_lorem) AS keep
FROM v
ORDER BY doc_id
"""


QUERIES = {
    "text_bpe_token_stats": text_bpe_token_stats,
    "text_rolling_hash": text_rolling_hash,
    "text_c4_filters": text_c4_filters,
}

ORACLES = {
    "text_bpe_token_stats": BPE_TOKEN_SQL,
    "text_rolling_hash": ROLLING_HASH_SQL,
    "text_c4_filters": C4_FILTERS_SQL,
}
