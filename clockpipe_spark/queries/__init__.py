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
)

# The driver's CORRECTNESS gate checks the FIRST 50 registry entries in
# order.  This list pins that window so it carries maximal evidence.
#
# Round-4 rotation: 15 slots whose queries are double-green in
# CORRECTNESS_r02+r03 (evidence persists in git) are swapped for the 15
# queries that have never had a driver row in any round (ANN, dedup-LSH/
# SimHash, embedding stats, multimodal meta, streaming session/sliding
# windows, the text battery).  At least one canary per SURVEY §2 family
# stays in-window; tests/test_registry_window.py guards the composition.
_GATE_WINDOW = 50

_PRIORITY = (
    # §2.9 relational / scalar — one canary per family
    "q1_pricing_summary",          # hash agg + CASE agg
    "q3_shipping_priority",        # multi-join + topk
    "q13_customer_distribution",   # r4-new: left-join double agg (q6 is
                                   # double-green AND smoke-checked by entry())
    "agg_rollup_lineitem",         # rollup/cube/grouping-sets canary
    "pivot_status_by_priority",    # pivot
    "window_frame_moving_avg",     # window funcs + frames canary
    "topk_orders_by_price",        # sort / top-k / limit
    "setop_union_segments",        # set ops
    "scalar_math_battery",         # scalar battery canary (math)
    "pg_array_literal_parse",      # §2.8 pg quirk functions
    "array_agg_per_nation",        # array functions
    "asof_last_purchase",          # subquery/as-of/range/skew canary
    # §2 CDC operator queries (canaries: S4, P1-P4, A1, K1/K2, FINAL)
    "cdc_changelog",               # P4 message-type filter
    "cdc_pgoutput_roundtrip",      # S4 pgoutput decode + TOAST
    "cdc_keep_last",               # A1 keep-last dedup
    "cdc_replica_state",           # FINAL dedup-on-read view
    "cdc_align_projection",        # P1 alignment (P2 masking: double-green r2+r3, rotated out)
    "cdc_cast_matrix",             # P3 cast matrix
    "cdc_apply_to_snapshot",       # K1/K2 upsert+delete
    # §2.10 LLM-pipeline families — one representative each
    "dedup_exact",
    "neardup_jaccard_pairs",
    "cosine_topk_brute",
    "text_quality_scores",
    "text_c4_filters",             # r4-new (repetition_stats: double-green)
    "mm_bmp_decode",
    "mm_image_resize",             # r4-new (wav_decode: double-green)
    "pack_sequences_greedy",
    "tfidf_top_terms",
    "sample_stratified_hash",
    "embedding_int8_quantize",
    "cdc_mongo_bson_casts",        # r4-new (tumbling: double-green; the
                                   # watermark family keeps session+sliding)
    "udf_zscore_per_user",
    # corpus hygiene (llmprep2)
    "text_pii_redact",
    "doc_chunk_overlap",
    "benchmark_contamination",
    # never-driver-checked until round 4 — rotated in
    "ann_lsh_topk",
    "ann_ivf_topk",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "embedding_neardup_pairs",
    "embedding_norm_stats",
    "mm_bytes_meta",
    "mm_fake_image_features",
    "stream_session_windows",
    "stream_sliding_30m",
    "text_bpe_token_stats",
    "text_fingerprint",
    "text_lang_id",
    "text_rolling_hash",
    "text_token_stats",
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
