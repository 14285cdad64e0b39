"""Training-data prep operators: packing, tf-idf, sampling, quantization."""

from __future__ import annotations

from clockpipe_spark.queries.llmprep import (
    _CTX_TOKENS,
    _SAMPLE_PCT,
    embedding_int8_quantize,
    pack_sequences_greedy,
    sample_stratified_hash,
    tfidf_top_terms,
)


def test_pack_occupancy_bounds(spark, sf_dir):
    packs = pack_sequences_greedy(spark, sf_dir).collect()
    assert packs
    by_lang: dict[str, list] = {}
    for r in packs:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in by_lang.items():
        rows.sort(key=lambda r: r["pack_id"])
        # contiguous pack ids from 0
        assert [r["pack_id"] for r in rows] == list(range(len(rows)))
        # quotient assignment: every pack but the last spills by at most
        # one doc's tokens past the budget and is never under-filled by
        # more than one doc's tokens
        for r in rows[:-1]:
            assert r["pack_tokens"] > 0
            assert r["pack_tokens"] < 2 * _CTX_TOKENS
        # doc ranges don't overlap across consecutive packs
        for a, b in zip(rows, rows[1:]):
            assert a["last_doc"] < b["first_doc"]


def test_tfidf_ranks_are_dense_per_lang(spark, sf_dir):
    rows = tfidf_top_terms(spark, sf_dir).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for rows_ in by_lang.values():
        ranks = sorted(r["rnk"] for r in rows_)
        assert ranks == list(range(1, len(ranks) + 1))
        scores = [r["score"] for r in sorted(rows_, key=lambda r: r["rnk"])]
        assert scores == sorted(scores, reverse=True)


def test_stratified_sample_proportion_and_determinism(spark, sf_dir):
    from clockpipe_spark.catalog import load_table

    total = load_table(spark, sf_dir, "documents").count()
    s1 = {r["doc_id"] for r in sample_stratified_hash(spark, sf_dir).collect()}
    s2 = {r["doc_id"] for r in sample_stratified_hash(spark, sf_dir).collect()}
    assert s1 == s2  # reproducible, unlike rand()
    frac = len(s1) / total
    assert 0.5 * _SAMPLE_PCT / 100 < frac < 1.5 * _SAMPLE_PCT / 100


def test_quantize_codes_in_range_and_extremes(spark, sf_dir):
    rows = embedding_int8_quantize(spark, sf_dir).collect()
    assert rows
    for r in rows[:50]:
        assert r["qmin"] <= r["qmax"]
        for c in ("c0", "c1", "c2", "c3"):
            assert 0 <= r[c] <= 255
        # dim-count x 255 is the hard ceiling of the checksum
        assert 0 <= r["code_sum"] <= 255 * 4096


def test_sample_hash_residue_negative_and_huge_ids(spark):
    """The 16-bit-split Knuth hash must equal (id mod 2^32)*K mod 2^32
    mod 100 for ANY int64 id — negative and > 3.5e9 ids overflowed the
    naive doc_id * K form (ADVICE r2)."""
    import duckdb

    from clockpipe_spark.queries.llmprep import _KNUTH, sample_hash_residue

    ids = [-1, -3, -(2**33) - 7, -(2**62) + 99, 0, 1, 42,
           2**31, 2**32 - 1, 2**33 + 12345, 2**62]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: r["res"]
        for r in df.select(
            "doc_id", sample_hash_residue("doc_id").alias("res")
        ).collect()
    }
    for i in ids:
        assert got[i] == ((i % 2**32) * _KNUTH) % 2**32 % 100, i

    # DuckDB twin (the oracle's expression) agrees on the same ids
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(i,) for i in ids])
    rows = con.execute(f"""
        WITH d AS (SELECT doc_id,
                   (doc_id % 4294967296 + 4294967296) % 4294967296 AS d32
                   FROM t)
        SELECT doc_id, ((d32 // 65536 * {_KNUTH}) % 65536 * 65536
               + d32 % 65536 * {_KNUTH}) % 4294967296 % 100 FROM d
    """).fetchall()
    for i, res in rows:
        assert res == got[i], i
