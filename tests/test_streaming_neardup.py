"""Cross-batch streaming near-dup: duplicates arriving in LATER
micro-batches are caught against the persisted signature state."""

from __future__ import annotations

import pytest


DOC_A = "the quick brown fox jumps over the lazy dog again and again today"
DOC_B = "completely different content about database replication pipelines and spark"
DOC_C = "a third document discussing minhash signatures and locality sensitive hashing"
DOC_A_NEAR = "the quick brown fox jumps over the lazy dog again and again tonight"


@pytest.fixture
def dedup(spark, tmp_path):
    from clockpipe_spark.streaming.neardup_state import StreamingNearDup

    return StreamingNearDup(spark, str(tmp_path / "nd_state"), threshold=0.5)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_duplicate_in_later_batch_is_caught(spark, dedup):
    b1 = dedup.process_batch(_df(spark, [(1, DOC_A), (2, DOC_B)]))
    assert {r["doc_id"] for r in b1.collect()} == {1, 2}

    # batch 2: near-copy of doc 1 (one token differs) + genuinely new doc
    b2 = dedup.process_batch(_df(spark, [(3, DOC_A_NEAR), (4, DOC_C)]))
    assert {r["doc_id"] for r in b2.collect()} == {4}

    assert {r["id"] for r in dedup.admitted_ids().collect()} == {1, 2, 4}


def test_intra_batch_duplicate_keeps_lowest_id(spark, dedup):
    out = dedup.process_batch(
        _df(spark, [(10, DOC_A), (11, DOC_A_NEAR), (12, DOC_B)])
    )
    assert {r["doc_id"] for r in out.collect()} == {10, 12}


def test_exact_duplicate_across_three_batches(spark, dedup):
    assert dedup.process_batch(_df(spark, [(1, DOC_A)])).count() == 1
    assert dedup.process_batch(_df(spark, [(2, DOC_B)])).count() == 1
    # exact copy of batch-1 content, two batches later
    assert dedup.process_batch(_df(spark, [(3, DOC_A)])).count() == 0


def test_streaming_foreachbatch_integration(spark, tmp_path):
    """The same filter under a real readStream: one file per micro-batch
    (maxFilesPerTrigger=1), duplicate in the second file is dropped."""
    from clockpipe_spark.streaming.neardup_state import StreamingNearDup

    src = tmp_path / "docs_stream"
    _df(spark, [(1, DOC_A), (2, DOC_B)]).coalesce(1).write.parquet(
        str(src / "f1.parquet")
    )
    _df(spark, [(3, DOC_A_NEAR), (4, DOC_C)]).coalesce(1).write.parquet(
        str(src / "f2.parquet")
    )

    dedup = StreamingNearDup(spark, str(tmp_path / "nd_state2"), threshold=0.5)
    schema = "doc_id long, text string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*.parquet"))
    )

    q = (
        stream.writeStream.foreachBatch(
            lambda batch_df, _id: dedup.process_batch(batch_df).count()
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    admitted = {r["id"] for r in dedup.admitted_ids().collect()}
    assert 3 not in admitted  # near-copy of doc 1, later batch -> dropped
    assert {1, 2, 4} <= admitted


def test_short_docs_are_admitted_not_dropped(spark, dedup):
    """Docs with < 3 tokens produce no shingles hence no signature row;
    the filter's contract is to admit non-duplicates, so they must pass
    through (ADVICE r2: the old semi-join silently dropped them)."""
    out = dedup.process_batch(
        _df(spark, [(1, DOC_A), (2, "hi"), (3, "ok then"), (4, "")])
    )
    assert {r["doc_id"] for r in out.collect()} == {1, 2, 3, 4}
    # unsignable docs carry no state (nothing to match later batches on)
    assert {r["id"] for r in dedup.admitted_ids().collect()} == {1}
    # and they are admitted again on a later delivery (no sig -> no dup)
    out2 = dedup.process_batch(_df(spark, [(5, "hi")]))
    assert {r["doc_id"] for r in out2.collect()} == {5}


def test_replay_does_not_duplicate_state(spark, dedup):
    """At-least-once replay: re-processing the same batch must neither
    re-append state rows nor self-match previously admitted docs."""
    batch = _df(spark, [(1, DOC_A), (2, DOC_B)])
    assert dedup.process_batch(batch).count() == 2
    n_state = dedup._history(dedup.sigs_dir, "id long, minhash array<long>").count()
    # replay the identical batch: rows re-admitted (downstream dedups by
    # id), but state row count is unchanged
    assert dedup.process_batch(batch).count() == 2
    n_state2 = dedup._history(dedup.sigs_dir, "id long, minhash array<long>").count()
    assert n_state2 == n_state == 2
    assert sorted(r["id"] for r in dedup.admitted_ids().collect()) == [1, 2]
