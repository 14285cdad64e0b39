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


QUERIES = {
    "text_bpe_token_stats": text_bpe_token_stats,
    "text_rolling_hash": text_rolling_hash,
}

ORACLES = {
    "text_bpe_token_stats": BPE_TOKEN_SQL,
    "text_rolling_hash": ROLLING_HASH_SQL,
}
