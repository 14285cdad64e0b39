"""Persisted-index lifecycle: array/table round-trips, and the IVF
build/probe split producing exactly the self-training query's output."""

from __future__ import annotations

import numpy as np

from clockpipe_spark.operators.model_store import (
    ModelStore,
    ann_ivf_topk_prebuilt,
    build_ivf_index,
)


def test_array_round_trip(spark, tmp_path):
    store = ModelStore(spark, str(tmp_path / "ms"))
    arr = np.arange(24, dtype=np.float64).reshape(2, 3, 4) / 7.0
    store.save_array("books", arr)
    assert store.exists("books")
    back = store.load_array("books")
    assert back.shape == arr.shape
    np.testing.assert_array_equal(back, arr)


def test_table_partitioned_by_cell_prunes_layout(spark, tmp_path):
    import os

    store = ModelStore(spark, str(tmp_path / "ms"))
    df = spark.createDataFrame(
        [(i, i % 3) for i in range(30)], "id long, cell int"
    )
    store.save_table("cells", df, partition_by="cell")
    dirs = {
        d for d in os.listdir(str(tmp_path / "ms" / "cells")) if d.startswith("cell=")
    }
    assert dirs == {"cell=0", "cell=1", "cell=2"}
    assert store.load_table("cells").count() == 30


def test_prebuilt_probe_equals_self_training_query(spark, sf_dir, tmp_path):
    from clockpipe_spark.queries.similarity import ann_ivf_topk

    idx = str(tmp_path / "ivf_index")
    build_ivf_index(spark, sf_dir, idx)
    expect = {
        (r["query_id"], r["rnk"]): (r["neighbor_id"], r["cosine"])
        for r in ann_ivf_topk(spark, sf_dir).collect()
    }
    got = {
        (r["query_id"], r["rnk"]): (r["neighbor_id"], r["cosine"])
        for r in ann_ivf_topk_prebuilt(spark, sf_dir, idx).collect()
    }
    assert got == expect
    assert got  # non-empty


def test_persisted_bigram_lm_equals_self_training_query(spark, sf_dir, tmp_path):
    from clockpipe_spark.operators.model_store import (
        build_bigram_lm,
        score_with_bigram_lm,
    )
    from clockpipe_spark.queries.textops2 import text_bigram_logprob

    root = str(tmp_path / "bigram_lm")
    store = build_bigram_lm(spark, sf_dir, root)
    assert store.exists("bg_freq") and store.exists("ctx_freq")
    expect = {
        r["doc_id"]: (r["n_bigrams"], r["mean_nll_x100"])
        for r in text_bigram_logprob(spark, sf_dir).collect()
    }
    got = {
        r["doc_id"]: (r["n_bigrams"], r["mean_nll_x100"])
        for r in score_with_bigram_lm(spark, sf_dir, root).collect()
    }
    assert got == expect
    assert got


def test_prebuilt_registry_wrapper_builds_once(spark, sf_dir, monkeypatch, tmp_path):
    """The registry entry must build the index on first call, REUSE it on
    the second (train-once/score-many), and keep the self-training
    query's output contract."""
    import clockpipe_spark.queries.similarity as sim

    monkeypatch.setattr(sim, "_MODEL_ROOT", str(tmp_path))
    first = sorted(map(tuple, sim.ann_ivf_topk_prebuilt_query(spark, sf_dir).collect()))
    calls = []
    monkeypatch.setattr(
        "clockpipe_spark.operators.model_store.build_ivf_index",
        lambda *a, **k: calls.append(a),
    )
    second = sorted(map(tuple, sim.ann_ivf_topk_prebuilt_query(spark, sf_dir).collect()))
    assert first == second
    assert not calls, "second call must not retrain the index"
    expect = sorted(map(tuple, sim.ann_ivf_topk(spark, sf_dir).collect()))
    assert first == expect
