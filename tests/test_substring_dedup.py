"""Substring-window dedup + n-gram report: planted-duplicate semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from clockpipe_spark.queries.textops2 import _token_windows


def _wins(spark, rows, w):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return _token_windows(df, w)


def test_token_windows_count_and_content(spark):
    out = _wins(spark, [(1, "a b c d"), (2, "x y")], 3).collect()
    got = sorted((r["doc_id"], r["win"]) for r in out)
    # doc 2 is shorter than the window and must vanish, not error
    assert got == [(1, "a b c"), (1, "b c d")]


def test_planted_cross_doc_span_detected(spark):
    # docs 1 and 2 share an exact 8-token span; doc 3 shares nothing
    span = "one two three four five six seven eight"
    rows = [
        (1, f"alpha {span} beta"),
        (2, f"gamma delta {span}"),
        (3, "nine ten eleven twelve thirteen fourteen fifteen sixteen seventeen"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    wins = _token_windows(df, 8)
    dup = (
        wins.groupBy("win")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
    )
    dup_wins = {r["win"] for r in dup.collect()}
    assert span in dup_wins
    # no window of doc 3 can be a cross-doc duplicate
    doc3 = {r["win"] for r in wins.filter(F.col("doc_id") == 3).collect()}
    assert not (doc3 & dup_wins)


def test_windows_are_case_and_padding_normalized(spark):
    a = _wins(spark, [(1, "  The QUICK brown  ")], 2).collect()
    assert sorted(r["win"] for r in a) == ["quick brown", "the quick"]
