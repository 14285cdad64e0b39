"""Approximate dedup correctness: MinHash-LSH and SimHash recall against
ground truth on handcrafted + fixture corpora."""

from __future__ import annotations

from pyspark.sql import functions as F

from clockpipe_spark.operators.neardup import (
    minhash_lsh_pairs,
    minhash_signatures,
    simhash_neardup_pairs,
    simhash_signatures,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm windowsill in the late afternoon sun"
)


def test_minhash_identical_docs_always_pair(spark):
    docs = _docs(spark, [(1, BASE), (2, BASE), (3, "completely different words here entirely")])
    pairs = {(r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(docs).collect()}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_minhash_estimate_tracks_true_jaccard(spark):
    # doc 2 = doc 1 with a small edit -> high (not 1.0) estimated jaccard
    # (est_jaccard is floor(est * 1e4) — the engine-portable rendering)
    edited = BASE.replace("lazy dog", "sleepy wolf")
    docs = _docs(spark, [(1, BASE), (2, edited)])
    rows = minhash_lsh_pairs(docs, threshold=0.3).collect()
    assert len(rows) == 1
    assert 4000 <= rows[0]["est_jaccard"] <= 10000


def test_minhash_signature_deterministic(spark):
    docs = _docs(spark, [(1, BASE)])
    s1 = minhash_signatures(docs).first()["minhash"]
    s2 = minhash_signatures(docs).first()["minhash"]
    assert s1 == s2 and len(s1) == 32


def test_simhash_identical_zero_hamming(spark):
    docs = _docs(spark, [(1, BASE), (2, BASE)])
    rows = simhash_neardup_pairs(docs).collect()
    assert len(rows) == 1 and rows[0]["hamming"] == 0


def test_simhash_signature_deterministic_and_bitstable(spark):
    docs = _docs(spark, [(1, BASE)])
    a = simhash_signatures(docs).first()["simhash"]
    b = simhash_signatures(docs).first()["simhash"]
    assert a == b


def test_minhash_recall_vs_exact_on_fixture(spark, sf_dir):
    """On the doubled documents corpus, LSH must find every exact-Jaccard
    >= 0.5 pair (clones collide in all bands; near-pairs in >=1 band)."""
    from clockpipe_spark.queries.approximate import dedup_minhash_lsh
    from clockpipe_spark.queries.textops import neardup_jaccard_pairs

    exact = {
        (r["doc_a"], r["doc_b"])
        for r in neardup_jaccard_pairs(spark, sf_dir).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"]) for r in dedup_minhash_lsh(spark, sf_dir).collect()
    }
    assert exact, "fixture must produce ground-truth pairs"
    recall = len(exact & lsh) / len(exact)
    assert recall >= 0.95, f"recall {recall:.3f}"
