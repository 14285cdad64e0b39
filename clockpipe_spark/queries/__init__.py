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
# Round-19 rotation (VERDICT r18 directive #3): clears the ENTIRE r14
# staleness floor — the 8 queries that had rotated last at r14
# (q6_revenue_forecast, setop_active_both_statuses,
# setop_only_open_customers, stats_percentiles, text_ngram_novelty,
# window_lag_event_delta, window_running_revenue,
# window_top3_orders_per_customer) lead the queue — then bites into
# the 45-row r15 backlog (20 of its members in-window this round,
# stalest-first where the family hitting set allows; 25 r15 rows
# remain for r20). After the r19 deposit the staleness floor is r15.
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
    # ---- last driver row r14 (the whole r14 floor rotates) ------
    "q6_revenue_forecast",
    "setop_active_both_statuses",
    "setop_only_open_customers",
    "stats_percentiles",
    "text_ngram_novelty",
    "window_lag_event_delta",
    "window_running_revenue",
    "window_top3_orders_per_customer",
    # ---- last driver row r15 ----
    "agg_rollup_lineitem",
    "ann_ivf_topk",
    "ann_ivfpq_topk",
    "ann_lsh_topk",
    "asof_last_purchase",
    "dedup_cluster_assign_lsh",
    "dedup_simhash",
    "distinct_users_per_event_type",
    "embedding_neardup_pairs",
    "mm_bmp_decode",
    "mm_bytes_meta",
    "mm_fake_image_features",
    "mm_frame_sample",
    "mm_image_resize",
    "neardup_jaccard_pairs",
    "q11_important_stock",
    "q12_shipmode_priority",
    "scalar_date_parts",
    "stream_session_windows",
    "window_function_battery",
    # ---- last driver row r16 ----
    "cdc_scd2_history",
    "chi_square_lang_source",
    "embedding_int8_quantize",
    "funnel_conversion",
    "join_full_outer_daily",
    "mixture_temperature_weights",
    "quantile_histogram_rollup",
    "ts_resample_ohlc",
    # ---- last driver row r17 ----
    "ann_hard_negatives",
    "array_hof_battery",
    "contamination_bloom",
    "inverted_index_stats",
    "ts_seasonal_residual",
    # ---- last driver row r18 (family-canary slots) ----
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
