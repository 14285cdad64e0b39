"""Query registry: every implemented operator surfaces here as a
(name -> callable(spark, sf_dir) -> DataFrame) plus, where ANSI-SQL can
express the same semantics, a DuckDB oracle string.

Modules contribute QUERIES / ORACLES dicts; this package aggregates them
for ``__spark_entry__.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from clockpipe_spark.queries import approximate as _approximate
from clockpipe_spark.queries import cdc as _cdc
from clockpipe_spark.queries import llmprep as _llmprep
from clockpipe_spark.queries import llmprep2 as _llmprep2
from clockpipe_spark.queries import llmprep3 as _llmprep3
from clockpipe_spark.queries import relational as _relational
from clockpipe_spark.queries import relational2 as _relational2
from clockpipe_spark.queries import relational3 as _relational3
from clockpipe_spark.queries import relational4 as _relational4
from clockpipe_spark.queries import similarity as _similarity
from clockpipe_spark.queries import streamlike as _streamlike
from clockpipe_spark.queries import textops as _textops
from clockpipe_spark.queries import timeseries as _timeseries
from clockpipe_spark.queries import textops2 as _textops2

_MODULES = (
    _relational,
    _relational2,
    _relational3,
    _relational4,
    _timeseries,
    _cdc,
    _textops,
    _textops2,
    _similarity,
    _streamlike,
    _approximate,
    _llmprep,
    _llmprep2,
    _llmprep3,
)

# The driver's CORRECTNESS gate checks the FIRST 50 registry entries in
# order.  This list pins that window so it carries maximal evidence.
#
# Round-5 rotation closed the registry evidence story: after r5 every
# registry query has a green driver row in some round's
# CORRECTNESS_r*.json.  Round 6 swaps in the NEW operators — the
# embedding toolset (kmeans/pca/split/cluster-cap), the training-mix
# layer (mixture weights, hashed classifier, bigram LM, export shards),
# the analytics tier (gap-fill, funnel, retention, sessionization) and
# the audio-resample multimodal canary — for already-green slots
# (embedding_neardup_pairs green r2/r4/r5; text_unigram_surprisal,
# corpus_top_ngrams, mm_frame_sample, mm_bytes_meta, q4/q7/q8/q9/q11/
# q15/q17/q20 each green r5), every §2 family still carrying an
# in-window canary.  tests/test_registry_window.py guards composition.
_GATE_WINDOW = 50

_PRIORITY = (
    # §2.9 relational / scalar — one canary per family
    "q1_pricing_summary",          # hash agg + CASE agg
    "q3_shipping_priority",        # multi-join + topk (q13: green r4, rotated out)
    "agg_rollup_lineitem",         # rollup/cube/grouping-sets canary
    "pivot_status_by_priority",    # pivot
    "window_frame_moving_avg",     # window funcs + frames canary
    "topk_orders_by_price",        # sort / top-k / limit
    "setop_union_segments",        # set ops
    "scalar_math_battery",         # scalar battery canary (math)
    "array_agg_per_nation",        # array functions
    "asof_last_purchase",          # subquery/as-of/range/skew canary
    # round-5 rotation: the TPC-H completions (q7/q8/q9 green r5 —
    # rotated out in r6 for the new llmprep3 operators; q1/q3 + the
    # remaining completions keep the relational family covered)
    "stats_regression_battery",    # r6-NEW: corr/covar/regr aggregates (q2 out, green r5)
    "sessionize_lag_gap",          # r6-NEW: gaps-and-islands (q4 out, green r5)
    "funnel_conversion",           # r6-NEW: windowFunnel analog (q11 out, green r5)
    "retention_cohorts",           # r6-NEW: retention() analog (q15 out, green r5)
    "ts_gapfill_locf",             # r6-NEW: gap-fill + LOCF (q17 green r5, out)
    "text_bigram_logprob",         # r6-NEW: bigram-LM quality scoring
    "q21_waiting_suppliers",
    # §2 CDC operator queries (canaries: S4, P1/P3, A1, K1/K2, FINAL;
    # P4 is inside the pgoutput roundtrip; changelog + array-literal
    # rotated out double-green)
    "cdc_pgoutput_roundtrip",      # S4 pgoutput decode + TOAST (+P4)
    "cdc_changestream_decode",     # S6b Mongo change-stream decode (r5 in)
    "cdc_keep_last",               # A1 keep-last dedup
    "cdc_replica_state",           # FINAL dedup-on-read view
    "cdc_align_projection",        # P1 alignment
    "cdc_cast_matrix",             # P3 cast matrix (+§2.8 quirk canary)
    "cdc_apply_to_snapshot",       # K1/K2 upsert+delete
                                   # (cdc_mongo_bson_casts: green r4,
                                   # rotated out; P3 canary covers casts)
    # §2.10 LLM-pipeline families — one representative each
    "dedup_exact",
    "dedup_minhash_lsh",           # near-dup canary (jaccard/simhash rotated out)
    "dedup_cluster_assign",        # r5 in: pairs -> components -> canonical
    "dedup_cluster_assign_lsh",    # r5 in: the 100 TB dedup pipeline shape
    "ann_lsh_topk",                # similarity canary (brute rotated out)
    "ann_ivf_topk",
    "embedding_kmeans_clusters",   # r6-NEW: distributed spherical k-means
    "embedding_pca_project",       # r6-NEW: one-pass distributed PCA
    "embedding_int8_quantize",
    "split_leakage_safe",          # r6-NEW: cluster-hash train/val/test split
    "sample_cluster_cap",          # r6-NEW: budgeted per-cluster dedup
    "text_quality_scores",
    "quality_classifier_score",    # r6-NEW: hashed linear quality model
    "mixture_temperature_weights", # r6-NEW: temperature data mixing
    "export_shard_manifest",       # r6-NEW: deterministic export shards
    "text_c4_filters",
    "text_substring_dup_spans",    # r5-NEW: exact substring-window dedup
    "mm_audio_resample",           # r6-NEW multimodal canary (bytes_meta green
                                   # r4/r5 out; bmp/resize r4, frame_sample r5)
    "pack_sequences_greedy",
    "tfidf_top_terms",
    "sample_stratified_hash",
    "udf_zscore_per_user",
    # corpus hygiene (llmprep2)
    "text_pii_redact",
    "doc_chunk_overlap",
    "benchmark_contamination",
    # watermark windows canary (T6; sliding/tumbling rotated out)
    "stream_session_windows",
)

if len(_PRIORITY) != _GATE_WINDOW:  # drift fails loudly (ADVICE r3)
    raise AssertionError(
        f"_PRIORITY must pin exactly {_GATE_WINDOW} entries, got {len(_PRIORITY)}"
    )


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = merged.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(m.QUERIES)
    missing = [n for n in _PRIORITY if n not in merged]
    if missing:
        raise ValueError(f"_PRIORITY names not registered: {missing}")
    out = {n: merged[n] for n in _PRIORITY}
    out.update((n, q) for n, q in merged.items() if n not in out)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    unknown = out.keys() - all_queries().keys()
    if unknown:
        raise ValueError(f"oracles without queries: {unknown}")
    return out
