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
from clockpipe_spark.queries import corpusstats as _corpusstats
from clockpipe_spark.queries import layout_stats as _layout_stats
from clockpipe_spark.queries import llmprep as _llmprep
from clockpipe_spark.queries import llmprep2 as _llmprep2
from clockpipe_spark.queries import llmprep3 as _llmprep3
from clockpipe_spark.queries import profiling as _profiling
from clockpipe_spark.queries import relational as _relational
from clockpipe_spark.queries import retrieval as _retrieval
from clockpipe_spark.queries import relational2 as _relational2
from clockpipe_spark.queries import relational3 as _relational3
from clockpipe_spark.queries import relational4 as _relational4
from clockpipe_spark.queries import relational5 as _relational5
from clockpipe_spark.queries import similarity as _similarity
from clockpipe_spark.queries import sketches as _sketches
from clockpipe_spark.queries import streamlike as _streamlike
from clockpipe_spark.queries import textops as _textops
from clockpipe_spark.queries import timeseries as _timeseries
from clockpipe_spark.queries import timeseries2 as _timeseries2
from clockpipe_spark.queries import textops2 as _textops2

_MODULES = (
    _relational,
    _relational2,
    _relational3,
    _relational4,
    _relational5,
    _timeseries,
    _timeseries2,
    _cdc,
    _corpusstats,
    _textops,
    _textops2,
    _similarity,
    _sketches,
    _streamlike,
    _approximate,
    _llmprep,
    _llmprep2,
    _llmprep3,
    _retrieval,
    _profiling,
    _layout_stats,
)

# The driver's CORRECTNESS gate checks the FIRST 50 registry entries in
# order.  This list pins that window so it carries maximal evidence.
#
# Round-12 rotation (VERDICT r11 directive #1): the window turns onto
# the staleness queue's head — ALL 15 remaining r6 rows plus the 30
# stalest r7 rows (tools/window_staleness.py --propose emitted this
# list verbatim; the directive's composition matches it exactly).
# Composition:
# (a) the 5 standing canaries (q1_pricing_summary,
#     cdc_pgoutput_roundtrip, cdc_apply_to_snapshot, cdc_replica_state,
#     dedup_exact);
# (b) the 15 r6 rows — including ann_lsh_topk, whose oracle landed in
#     r11 (384a436) and which gets its FIRST driver hash row here
#     (directive #1's named "Done" criterion); ann_ivf_topk and
#     embedding_pca_project are rows-only by documented nature
#     (data-dependent codebooks/eigenvectors) and refresh their
#     rows-only evidence;
# (c) the 30 stalest r7 rows in (round, name) order — after this
#     rotation nothing older than r7 remains, and r13 retires the
#     backlog entirely (remaining 7 r7 rows + the 34 r8 rows,
#     directive #3).
# Family coverage stays guarded on a ROLLING basis (current window
# UNION last-3-round driver rows — tests/test_registry_window.py).
# Registry freeze holds (directive #7: 180 entries, 0 added this
# rotation; any new oracle must pass the dtype-strict twin at sf0.001 +
# sf0.01 pre-registration, tests/test_oracle_dtype_guard.py).
_GATE_WINDOW = 50

_PRIORITY = (
    # ---- standing canaries (5) ----------------------------------
    "q1_pricing_summary",          # hash/CASE aggregation flagship
    "cdc_pgoutput_roundtrip",      # S4+P4 decode
    "cdc_apply_to_snapshot",       # K1/K2 merge semantics
    "cdc_replica_state",           # FINAL dedup-on-read
    "dedup_exact",                 # exact-dedup family
    # ---- r6 rows, all 15 (directive #1) -------------------------
    "ann_ivf_topk",                # rows-only (trained codebook)
    "ann_lsh_topk",                # FIRST driver hash row (r11 oracle)
    "benchmark_contamination",
    "embedding_pca_project",       # rows-only (data-dependent PCA)
    "funnel_conversion",
    "mm_audio_resample",
    "q21_waiting_suppliers",
    "q3_shipping_priority",
    "retention_cohorts",
    "sample_cluster_cap",
    "scalar_math_battery",
    "setop_union_segments",
    "stats_regression_battery",
    "text_substring_dup_spans",
    "window_frame_moving_avg",
    # ---- r7 rows, stalest 30 of 37 (directive #1) ---------------
    "agg_rollup_lineitem",
    "ann_ivfpq_topk",              # rows-only (trained codebook)
    "asof_last_purchase",
    "cdc_align_projection",
    "cdc_changestream_decode",
    "cdc_incremental_agg",
    "cdc_keep_last",
    "cdc_lag_report",
    "cdc_scd2_history",
    "dedup_components_chain",
    "doc_chunk_overlap",
    "embedding_int8_quantize",
    "embedding_kmeans_clusters",   # rows-only (k-means state)
    "embedding_pq_codes",          # rows-only (trained codebook)
    "export_shard_manifest",
    "frequent_items_mg",
    "join_full_outer_daily",
    "mixture_temperature_weights",
    "mm_image_phash_neardup",
    "pack_sequences_greedy",
    "pivot_status_by_priority",
    "quality_classifier_score",
    "quantile_histogram_rollup",
    "sample_bottomk_hash",
    "sample_by_mixture",
    "scalar_url_parse",
    "sequence_match_pattern",
    "sessionize_lag_gap",
    "setop_bag_ops",
    "split_leakage_safe",
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
