"""Multimodal plumbing: binary payload columns + mapInPandas stages."""

from __future__ import annotations

import hashlib

import pytest

from clockpipe_spark.catalog import load_table
from clockpipe_spark.operators.multimodal import (
    blob_table,
    decode_image,
    extract_bytes_meta,
    fake_decode_features,
)


def test_blob_table_schema(spark, sf_dir):
    blobs = blob_table(load_table(spark, sf_dir, "documents"))
    kinds = dict(blobs.dtypes)
    assert kinds["payload"] == "binary"
    assert kinds["meta"].startswith("struct<mime:string,n_bytes:int")


def test_extract_bytes_meta_matches_python(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    expected = {
        r["doc_id"]: r["text"].encode() for r in docs.collect()
    }
    got = extract_bytes_meta(blob_table(docs)).collect()
    assert len(got) == len(expected)
    for r in got:
        raw = expected[r["doc_id"]]
        assert r["n_bytes"] == len(raw)
        assert r["first_byte"] == raw[0]
        assert r["sha256_prefix"] == hashlib.sha256(raw).hexdigest()[:16]


def test_fake_decode_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(10)
    a = {r["doc_id"]: (r["width"], r["height"], r["mean_byte"])
         for r in fake_decode_features(blob_table(docs)).collect()}
    b = {r["doc_id"]: (r["width"], r["height"], r["mean_byte"])
         for r in fake_decode_features(blob_table(docs)).collect()}
    assert a == b
    assert all(1 <= wh[0] <= 640 and 1 <= wh[1] <= 480 for wh in a.values())


def test_real_decode_is_gated(spark, sf_dir):
    # the codec libs are absent in this container: the real decode hook
    # must fail loudly, not silently fake
    blobs = blob_table(load_table(spark, sf_dir, "documents"))
    with pytest.raises(NotImplementedError):
        decode_image(blobs)
