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
# The window is DEPOSIT-INVARIANT (since r17, VERDICT r16 directive
# #1): every SURVEY-§2 family has a member IN the window itself, so
# the strict family guard (tests/test_registry_window.py) asserts on
# _PRIORITY alone with NO union over past CORRECTNESS rounds.  The
# composition is tool-proposed (tools/window_staleness.py --propose):
# 5 standing canaries + a greedy family hitting set (multi-family
# queries free slots; stalest members preferred, so family canaries
# rotate within their family) + the stalest remaining rows.
#
# Round-18 rotation (VERDICT r17 directive #2): clears the r13 trio
# (udf_zscore_per_user — also re-exercises the FlatMapGroupsInPandas
# lint rule end-to-end —, unpivot_status_revenue,
# window_range_time_frame) and 33 of the 41 r14 rows; after the r18
# deposit the staleness floor is r14 with 8 queries
# (q6_revenue_forecast, setop_active_both_statuses,
# setop_only_open_customers, stats_percentiles, text_ngram_novelty,
# window_lag_event_delta, window_running_revenue,
# window_top3_orders_per_customer — they rotate first at r19),
# meeting the directive's "floor ≥ r14 at close".
# Registry freeze holds (180 entries, 0 added this rotation; any new
# oracle must pass the dtype-strict twin at sf0.001 + sf0.01
# pre-registration, tests/test_oracle_dtype_guard.py).
_GATE_WINDOW = 50

_PRIORITY = (
    # ---- standing canaries (5) ----------------------------------
    "q1_pricing_summary",          # hash/CASE aggregation flagship
    "cdc_pgoutput_roundtrip",      # S4+P4 decode
    "cdc_apply_to_snapshot",       # K1/K2 merge semantics
    "cdc_replica_state",           # FINAL dedup-on-read
    "dedup_exact",                 # exact-dedup family
    # ---- family hitting set + stalest queue, tool-proposed ------
    # ---- last driver row r13 ----
    "udf_zscore_per_user",
    "unpivot_status_revenue",
    "window_range_time_frame",
    # ---- last driver row r14 ----
    "cdc_changelog",
    "cdc_conflict_audit",
    "cdc_mask_columns",
    "cdc_mongo_bson_casts",
    "cdc_mongo_infer_project",
    "cdc_replica_asof",
    "cdc_route_counts",
    "corpus_doclen_histogram",
    "corpus_top_ngrams",
    "correlated_above_avg_orders",
    "cosine_topk_brute",
    "dedup_cluster_assign",
    "dedup_minhash_lsh",
    "embedding_norm_stats",
    "event_transition_matrix",
    "grouping_sets_lineitem",
    "join_anti_customers_without_orders",
    "join_broadcast_brand_volume",
    "join_semi_customers_with_orders",
    "lateral_explode_tokens",
    "mm_wav_decode",
    "ntile_customer_quartiles",
    "pg_array_literal_parse",
    "profile_table_stats",
    "q10_returned_items",
    "q14_promo_revenue_pct",
    "q18_large_orders",
    "q5_local_supplier_volume",
    "range_join_ship_latency",
    "sample_stratified_hash",
    "scalar_string_funcs",
    "stream_tumbling_hourly",
    "ts_gapfill_locf",
    # ---- last driver row r16 ----
    "array_agg_per_nation",
    "benchmark_contamination",
    "bm25_retrieval",
    "frequent_items_mg",
    "ts_anomaly_mad",
    # ---- last driver row r17 ----
    "cdc_cast_matrix",
    "cdc_snapshot_diff",
    "hierarchy_rollup",
    "zorder_tile_stats",
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
