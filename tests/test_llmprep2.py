"""Corpus-hygiene operators: PII redaction, chunking, contamination."""

from __future__ import annotations

from clockpipe_spark.queries.llmprep2 import (
    _CHUNK_S,
    _CHUNK_W,
    _CONTAM_K,
    benchmark_contamination,
    doc_chunk_overlap,
    text_pii_redact,
)


def test_pii_redact_fires_on_every_row(spark, sf_dir):
    rows = text_pii_redact(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # every doc gets exactly one injected email / phone / ip
        assert r["n_emails"] == 1
        assert r["n_phones"] == 1
        assert r["n_ips"] == 1
        t = r["redacted_text"]
        assert "<EMAIL>" in t and "<PHONE>" in t and "<IP>" in t
        assert "@mail.example.com" not in t
        assert "555-" not in t
        assert "10.0." not in t


def test_chunk_overlap_covers_and_overlaps(spark, sf_dir):
    rows = doc_chunk_overlap(spark, sf_dir).collect()
    assert rows
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_rows in by_doc.values():
        doc_rows.sort(key=lambda r: r["chunk_idx"])
        assert [r["chunk_idx"] for r in doc_rows] == list(range(len(doc_rows)))
        for r in doc_rows:
            assert r["chunk_start"] == 1 + r["chunk_idx"] * _CHUNK_S
            assert 1 <= r["chunk_len"] <= _CHUNK_W
            assert len(r["chunk_text"].split(" ")) == r["chunk_len"]
        # full chunks overlap the next chunk by W - S tokens
        for a, b in zip(doc_rows, doc_rows[1:]):
            assert b["chunk_start"] - a["chunk_start"] == _CHUNK_S
            if a["chunk_len"] == _CHUNK_W:
                assert a["chunk_start"] + _CHUNK_W - 1 >= b["chunk_start"]


def test_contamination_excludes_benchmark_and_counts(spark, sf_dir):
    rows = benchmark_contamination(spark, sf_dir).collect()
    assert rows
    ids = {r["doc_id"] for r in rows}
    assert all(i % 50 != 0 for i in ids)  # benchmark docs excluded
    for r in rows:
        max_grams = max(r["n_tokens"] - (_CONTAM_K - 1), 0)
        assert 0 <= r["n_contaminated_grams"] <= max_grams
        assert r["contaminated"] == (r["n_contaminated_grams"] > 0)
    # word-soup corpus over a tiny vocabulary: contamination must hit
    assert any(r["contaminated"] for r in rows)
