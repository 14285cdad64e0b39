"""Pin the bench's fresh-admission slicing (bench.disjoint_doc_slices,
ADVICE r14 #1): the warm batch and each trial batch must be pairwise
TEXT-disjoint row ranges — a batch whose texts already sit in the
dedup store is rejected wholesale and times the cheap at-least-once
path instead of genuine admission, silently corrupting the
flat-history contract's headline number."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from bench import disjoint_doc_slices  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_slices_are_row_disjoint_and_sized(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    warm, trials = disjoint_doc_slices(docs, warm_n=20, batch_docs=15)
    assert warm.count() == 20
    assert [t.count() for t in trials] == [15, 15]

    # the carved ROW RANGES are pairwise disjoint: recover the original
    # ids by undoing the documented offsets and intersect
    w_ids = {r["doc_id"] - 5_000_000 for r in warm.select("doc_id").collect()}
    t_ids = [
        {r["doc_id"] - off for r in t.select("doc_id").collect()}
        for t, off in zip(trials, (6_000_000, 7_000_000))
    ]
    assert not (w_ids & t_ids[0]) and not (w_ids & t_ids[1])
    assert not (t_ids[0] & t_ids[1])

    # and the post-offset id spaces stay clear of each other and of the
    # >=10M seeded-history range
    all_out = [warm, *trials]
    for df in all_out:
        lo, hi = df.agg({"doc_id": "min"}).first()[0], df.agg(
            {"doc_id": "max"}
        ).first()[0]
        assert lo >= 5_000_000 and hi < 10_000_000


def test_trial_texts_not_subset_of_warm(spark):
    """The r14 failure mode verbatim: every trial doc's text sat in the
    warm batch, so zero docs were freshly admitted. With disjoint row
    ranges the only cross-batch text overlap left is the corpus's own
    clone families — assert the overlap is not TOTAL for either trial."""
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    warm, trials = disjoint_doc_slices(docs, warm_n=20, batch_docs=15)
    warm_texts = {r["text"] for r in warm.select("text").collect()}
    for t in trials:
        texts = {r["text"] for r in t.select("text").collect()}
        assert not texts <= warm_texts, (
            "trial batch texts are a subset of the warm batch — the "
            "probe would time zero fresh admissions (the r14 artifact)"
        )
