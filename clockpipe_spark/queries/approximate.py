"""Approximate / UDF-backed operators surfaced as queries: MinHash-LSH,
SimHash, LSH-blocked embedding dedup, multimodal plumbing.

``mm_bytes_meta`` has a genuine DuckDB oracle (octet_length / ascii /
sha256 over the same utf-8 payload), proving the mapInPandas plumbing
end-to-end. The hash-family operators are rows-only checked by the
driver; pytest asserts their recall against the exact operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clockpipe_spark.catalog import load_table
from clockpipe_spark.operators.multimodal import (
    blob_table,
    extract_bytes_meta,
    fake_decode_features,
)
from clockpipe_spark.operators.neardup import (
    minhash_lsh_pairs,
    simhash_neardup_pairs,
)
from clockpipe_spark.queries.textops import _doubled_corpus


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs over the doubled corpus (32 hashes,
    8 bands, est-Jaccard >= 0.5). The linear-cost twin of
    neardup_jaccard_pairs."""
    return minhash_lsh_pairs(_doubled_corpus(spark, sf_dir), threshold=0.5)


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming <= 2 of 64 bits) over the doubled
    corpus; signature via mapInPandas. The tight radius keeps output
    meaningful on this corpus — small-vocab word-salad docs are all
    bag-of-words-similar, so wider radii match nearly everything."""
    return simhash_neardup_pairs(_doubled_corpus(spark, sf_dir))


def mm_bytes_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing, oracle-checked: binary payload column ->
    mapInPandas byte features. DuckDB computes the identical features
    natively on the same utf-8 payload."""
    blobs = blob_table(load_table(spark, sf_dir, "documents"))
    return extract_bytes_meta(blobs)


MM_BYTES_META_SQL = """
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       ascii(substring(text, 1, 1)) AS first_byte,
       substring(sha256(text), 1, 16) AS sha256_prefix
FROM documents
"""


def mm_fake_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake decode over the blob table (real Arrow
    plumbing, stubbed codec — see operators.multimodal docstring)."""
    blobs = blob_table(load_table(spark, sf_dir, "documents"))
    return fake_decode_features(blobs)


MM_FAKE_DECODE_SQL = """
SELECT doc_id,
       octet_length(encode(text)) % 640 + 1 AS width,
       octet_length(encode(text)) % 480 + 1 AS height,
       CAST(floor(list_aggregate(
           list_transform(range(1, octet_length(encode(text)) + 1),
                          i -> ascii(substring(text, i, 1))),
           'avg') * 10000) AS BIGINT) AS mean_byte
FROM documents
"""


def mm_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image codec path: deterministic 24-bpp BMPs are synthesized
    per document (dimensions from byte length, a constant fill color from
    doc_id), then decoded by the stdlib-struct BMP parser
    (operators.multimodal.decode_bmp_features) — headers, row padding and
    the pixel array are the genuine on-disk format. The oracle computes
    the same features straight from doc_id/length, so a decoder that
    misreads the header or miscounts row padding fails the match."""
    import pandas as pd

    from clockpipe_spark.operators.multimodal import decode_bmp_features, encode_bmp

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def enc(batches):
        for pdf in batches:
            n = pdf["text"].map(lambda t: len(t.encode("utf-8")))
            payload = [
                encode_bmp(
                    int(nb) % 16 + 1,
                    int(nb) % 8 + 1,
                    (int(d) % 256, int(d) * 7 % 256, int(d) * 13 % 256),
                )
                for d, nb in zip(pdf["doc_id"], n)
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "payload": payload})

    blobs = docs.mapInPandas(enc, "doc_id long, payload binary")
    return decode_bmp_features(blobs)


MM_BMP_SQL = """
SELECT doc_id,
       octet_length(encode(text)) % 16 + 1 AS width,
       octet_length(encode(text)) % 8 + 1 AS height,
       24 AS bpp,
       CAST(floor((doc_id % 256 + (doc_id * 7) % 256 + (doc_id * 13) % 256)
                  / 3.0 * 10000) AS BIGINT) AS mean_px
FROM documents
"""


def mm_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio codec path: PCM WAVs synthesized per document (sample
    count from byte length, constant amplitude from doc_id), decoded by
    the stdlib RIFF-chunk walker (decode_wav_features). Oracle as above."""
    import pandas as pd

    from clockpipe_spark.operators.multimodal import decode_wav_features, encode_wav

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def enc(batches):
        for pdf in batches:
            n = pdf["text"].map(lambda t: len(t.encode("utf-8")))
            payload = [
                encode_wav(int(nb) % 500 + 10, int(d) % 128)
                for d, nb in zip(pdf["doc_id"], n)
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "payload": payload})

    blobs = docs.mapInPandas(enc, "doc_id long, payload binary")
    return decode_wav_features(blobs)


MM_WAV_SQL = """
SELECT doc_id,
       8000 AS sample_rate,
       CAST(octet_length(encode(text)) % 500 + 10 AS BIGINT) AS n_samples,
       CAST((octet_length(encode(text)) % 500 + 10) * 1000 // 8000 AS BIGINT)
           AS duration_ms,
       CAST((doc_id % 128) * 10000 AS BIGINT) AS mean_amp
FROM documents
"""


def udf_zscore_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map surface with an exact SQL twin: per-user
    z-score of event values (sample stddev)."""
    from clockpipe_spark.operators.grouped import zscore_per_group

    events = load_table(spark, sf_dir, "events").withColumn(
        "user_str", F.col("user_id").cast("string")
    )
    return zscore_per_group(events, "user_str", "value", "event_id").select(
        "event_id", F.col("user_str").cast("bigint").alias("user_id"), "z"
    )


UDF_ZSCORE_SQL = """
SELECT event_id, user_id,
       round((value - avg(value) OVER w) / stddev_samp(value) OVER w, 6) AS z
FROM events
WINDOW w AS (PARTITION BY user_id)
"""


QUERIES = {
    "udf_zscore_per_user": udf_zscore_per_user,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_simhash": dedup_simhash,
    "mm_bytes_meta": mm_bytes_meta,
    "mm_fake_image_features": mm_fake_image_features,
    "mm_bmp_decode": mm_bmp_decode,
    "mm_wav_decode": mm_wav_decode,
}

ORACLES = {
    "udf_zscore_per_user": UDF_ZSCORE_SQL,
    "mm_bytes_meta": MM_BYTES_META_SQL,
    "mm_fake_image_features": MM_FAKE_DECODE_SQL,
    "mm_bmp_decode": MM_BMP_SQL,
    "mm_wav_decode": MM_WAV_SQL,
    # dedup_minhash_lsh / dedup_simhash: rows-only (engine-specific hash
    # families); recall vs exact Jaccard asserted in pytest.
    # mm_fake_image_features oracle is valid because the documents corpus
    # is pure ASCII (verified at every sf) so per-char ascii() == bytes.
}
