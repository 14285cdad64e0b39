"""Pin the df-adaptive exact-Jaccard plan switch (VERDICT r9 directive
#5 / r10 #4): gram_df_profile + choose_jaccard_plan must route a benign
corpus to the baseline inverted-index join and a hot-template corpus to
the PPJoin prefix arm — and BOTH arms must produce identical pairs, so
the dispatch can never change semantics, only cost."""

from __future__ import annotations

from pyspark.sql import functions as F

from clockpipe_spark.queries.textops import (
    _PREFIX_MAX_AMPLIFICATION,
    _jaccard_baseline_from_toks,
    _jaccard_prefix_from_toks,
    _tokens,
    choose_jaccard_plan,
    gram_df_profile,
)


def _toks(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return docs.select("doc_id", _tokens(F.col("text")).alias("toks"))


def _benign(spark, n=40):
    # every doc unique words -> each gram df=1 -> amplification 0
    rows = [
        (i, " ".join(f"w{i}x{j}" for j in range(12))) for i in range(n)
    ]
    return _toks(spark, rows)


def _hot_template(spark, n=128):
    # one shared boilerplate sentence (the web-crawl template class):
    # its 8 pure-template grams have df=n, so the baseline join would
    # build 8*n*(n-1)/2 candidate rows against a gram mass of ~11n ->
    # amplification ~4(n-1)/11 (n=128 -> ~46, past the 32 threshold)
    template = "click here to accept all cookies and continue to site"
    rows = [(i, f"{template} unique{i}a unique{i}b unique{i}c") for i in range(n)]
    return _toks(spark, rows)


def test_benign_corpus_selects_baseline(spark):
    prof = gram_df_profile(_benign(spark))
    assert prof["max_df"] == 1
    assert prof["amplification"] == 0.0
    assert choose_jaccard_plan(prof) == "baseline"


def test_hot_template_corpus_selects_prefix(spark):
    prof = gram_df_profile(_hot_template(spark))
    assert prof["max_df"] == 128
    assert prof["amplification"] > _PREFIX_MAX_AMPLIFICATION
    assert choose_jaccard_plan(prof) == "prefix"


def test_sf01_scale_profile_stays_baseline():
    """Pin the sf0.1 calibration point: amplification 10.2 measured on
    the shipped corpus must keep routing to baseline (1.86 s) rather
    than prefix (11.7 s). Pure-dict check so the pin survives even when
    the suite runs at a smaller sf fixture."""
    prof = {"gram_mass": 520776, "cand_rows": 5323504.0, "max_df": 50,
            "amplification": 10.222}
    assert choose_jaccard_plan(prof) == "baseline"


def test_testdata_corpus_stays_baseline(spark, sf_dir):
    """The registry query must take the 2 s arm on the shipped corpus —
    the whole point of the switch (r9: prefix ran 10.3 s in-suite)."""
    from clockpipe_spark.queries.textops import _doubled_corpus

    corpus = _doubled_corpus(spark, sf_dir)
    toks = corpus.select("doc_id", _tokens(F.col("text")).alias("toks"))
    assert choose_jaccard_plan(gram_df_profile(toks)) == "baseline"


def test_both_arms_agree_on_hot_template(spark):
    """Semantics invariance where it matters: on the corpus shape that
    flips the switch, both arms emit the same exact-Jaccard pairs."""
    toks = _hot_template(spark, n=16).cache()
    base = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in _jaccard_baseline_from_toks(toks).collect()
    }
    pref = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in _jaccard_prefix_from_toks(toks).collect()
    }
    assert base, "hot-template fixture must produce near-dup pairs"
    assert base == pref
