"""Data mixing, model-based quality scoring, export sharding."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from clockpipe_spark.queries.llmprep3 import (
    _MIX_BUDGET,
    _N_SHARDS,
    _QC_BIAS,
    _QC_HMOD,
    _QC_VOCAB,
    _QC_WMOD,
    export_shard_manifest,
    mixture_temperature_weights,
    quality_classifier_score,
)
from clockpipe_spark.queries.llmprep import _KNUTH


def test_mixture_weights_normalize_and_upweight_small(spark, sf_dir):
    rows = mixture_temperature_weights(spark, sf_dir).collect()
    assert rows
    assert abs(sum(r["mix_weight"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["raw_share"] for r in rows) - 1.0) < 1e-4
    # temperature alpha < 1 moves weight from large domains to small ones
    big = max(rows, key=lambda r: r["n_tokens"])
    small = min(rows, key=lambda r: r["n_tokens"])
    if big["n_tokens"] > small["n_tokens"]:
        assert big["mix_weight"] < big["raw_share"]
        assert small["mix_weight"] > small["raw_share"]
    # epochs = weight * budget / tokens (weight re-rounds at 6 dp, so
    # allow the rounding to propagate through budget / tokens)
    for r in rows:
        tol = 5e-7 * _MIX_BUDGET / r["n_tokens"] + 1e-3
        assert abs(r["epochs"] - r["mix_weight"] * _MIX_BUDGET / r["n_tokens"]) < tol


def _py_score(text: str) -> float:
    toks = text.strip().lower().split()
    if not toks:
        toks = [""]
    acc = 0.0
    for t in toks:
        h = 0
        for ch in t:
            h = (h * 31 + ord(ch)) % _QC_HMOD
        b = h % _QC_VOCAB
        acc += (b * _KNUTH % _QC_WMOD) / _QC_WMOD - 0.5
    return acc / len(toks) + _QC_BIAS


def test_quality_classifier_matches_pure_python(spark, sf_dir):
    from clockpipe_spark.catalog import load_table

    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    rows = quality_classifier_score(spark, sf_dir).collect()
    assert len(rows) == len(texts)
    n_keep = 0
    for r in rows:
        expect = _py_score(texts[r["doc_id"]])
        assert math.isclose(r["score"], round(expect, 6), abs_tol=2e-6), r["doc_id"]
        assert r["keep"] == (expect > 0)
        n_keep += int(r["keep"])
    # pseudo-weights are centered: both verdicts must occur
    assert 0 < n_keep < len(rows)


def test_shard_manifest_is_balanced_and_complete(spark, sf_dir):
    from clockpipe_spark.catalog import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    rows = export_shard_manifest(spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert {r["shard_id"] for r in rows} <= set(range(_N_SHARDS))
    # multiplicative hash balances shards: no shard more than 3x the mean
    mean = n_docs / _N_SHARDS
    assert max(r["n_docs"] for r in rows) <= 3 * mean


def test_shard_write_path_round_trips(spark, sf_dir, tmp_path):
    """The manifest's companion write: repartition(N, shard) +
    partitionBy(shard) produces one directory per shard whose row counts
    equal the manifest — the actual 100 TB export layout at toy scale."""
    from clockpipe_spark.catalog import load_table
    from clockpipe_spark.queries.llmprep3 import _shard_id

    out = str(tmp_path / "shards")
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "shard", _shard_id("doc_id")
    )
    docs.repartition(_N_SHARDS, "shard").write.partitionBy("shard").parquet(out)
    back = spark.read.parquet(out)
    got = {
        r["shard"]: r["n"]
        for r in back.groupBy("shard").agg(F.count("*").alias("n")).collect()
    }
    manifest = {
        r["shard_id"]: r["n_docs"]
        for r in export_shard_manifest(spark, sf_dir).collect()
    }
    assert got == manifest


def test_sample_by_mixture_rates_and_determinism(spark, sf_dir):
    from collections import Counter

    from clockpipe_spark.catalog import load_table
    from clockpipe_spark.queries.llmprep3 import sample_by_mixture

    docs = load_table(spark, sf_dir, "documents")
    totals = Counter(
        (r["lang"], r["source"]) for r in docs.select("lang", "source").collect()
    )
    rows = sample_by_mixture(spark, sf_dir).collect()
    kept = Counter((r["lang"], r["source"]) for r in rows)
    rate_bp = {(r["lang"], r["source"]): r["rate_bp"] for r in rows}
    # the token-richest domain samples at (or within floor-rounding of) 100%
    assert max(rate_bp.values()) >= 9999
    for dom, bp in rate_bp.items():
        # kept fraction tracks the basis-point rate (hash residue is
        # uniform; loose bound for small strata)
        n, k = totals[dom], kept[dom]
        assert k <= n
        if n >= 30:
            assert abs(k / n - bp / 10000) < 0.35
    # deterministic: a second run returns the identical id set
    again = {r["doc_id"] for r in sample_by_mixture(spark, sf_dir).collect()}
    assert again == {r["doc_id"] for r in rows}
