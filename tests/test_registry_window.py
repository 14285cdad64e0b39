"""Guard the CORRECTNESS-gate window composition.

The driver checks the FIRST 50 registry entries; queries/__init__.py pins
that window via ``_PRIORITY``.  Round 2 lost three CDC queries from the
gate because a registry edit silently shifted the window — these tests make
that failure mode loud (VERDICT r3 "Next round" #6, ADVICE r3 #4).

Round 8 adds the no-non-scalar-output guard (VERDICT r7 #1, ADVICE r7):
the driver's canonicalizer sorts result frames with pandas, and a raw
ARRAY/MAP/STRUCT cell crashes it (``TypeError: unhashable type: 'list'``
— the r7 ``array_hof_battery`` red row).  Every registry query must
render non-scalar values to strings at its final projection; the guard
runs over ALL queries, not just the window, so a rotation can never
reintroduce the crash class.

Round 8 also coarsens the family-canary granularity to SURVEY §2 section
level: the 39-query never-driver-checked backlog rotates in at once
(VERDICT r7 directive #2), and fitting 39 rotations + canaries into 50
slots leaves no room for one canary per SQL feature.  Each family set
below lists every registry query that honestly represents the family.

Round 11 moves the family guard from per-window to ROLLING coverage:
the r9-r11 directive to rotate the 50 stalest rows in (45 of 59 from
the r2-r6 queue) is arithmetically incompatible with one in-window
canary per family — 15 families have no member in the stale queue, and
parking 15 fresh rows in the window would leave the queue unclearable.
What the guard actually protects is that no family silently stops
being driver-checked; with a rotating window that property lives in
the UNION of the current window and the recent driver record.  The
test now asserts every family has a member either in ``_PRIORITY`` or
in one of the last ``_ROLLING_ROUNDS`` CORRECTNESS files — so a family
can never go more than ``_ROLLING_ROUNDS`` rounds without a row, and a
rotation that orphans a family still fails loudly.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from clockpipe_spark.queries import _GATE_WINDOW, _PRIORITY, all_oracles, all_queries

# At least one in-window canary per SURVEY §2 family.  Sets list the
# registry names that can represent the family; the test asserts the
# window intersects every set.
_FAMILY_CANARIES = {
    # --- §2 CDC operator families -----------------------------------
    "CDC decode (S4/S6b)": {"cdc_pgoutput_roundtrip", "cdc_changestream_decode"},
    "CDC row ops (P1/P2/P3/P6)": {"cdc_align_projection", "cdc_cast_matrix",
                                  "cdc_keep_last", "cdc_mask_columns"},
    "CDC apply (K1/K2)": {"cdc_apply_to_snapshot"},
    "FINAL dedup-on-read": {"cdc_replica_state"},
    "replica time travel / SCD2": {"cdc_replica_asof", "cdc_scd2_asof_counts",
                                   "cdc_scd2_history"},
    "derived-state maintenance": {"cdc_incremental_agg", "cdc_conflict_audit",
                                  "cdc_snapshot_diff", "cdc_table_checksum",
                                  "cdc_lag_report"},
    # --- §2.9 relational surface ------------------------------------
    "hash/CASE aggregation": {"q1_pricing_summary"},
    "joins": {"q3_shipping_priority", "join_broadcast_brand_volume",
              "join_full_outer_daily", "fk_fanout_histogram"},
    "multi-grain agg (rollup/cube/grouping-sets/pivot/unpivot)": {
        "agg_rollup_lineitem", "agg_cube_orders", "grouping_sets_lineitem",
        "pivot_status_by_priority", "unpivot_status_revenue",
        "hierarchy_rollup"},
    "window functions": {"window_frame_moving_avg", "window_function_battery",
                         "ntile_customer_quartiles", "window_range_time_frame",
                         "dau_cumulative", "ts_ewma_bounded"},
    "sort/top-k": {"topk_orders_by_price", "bm25_retrieval",
                   "ann_hard_negatives"},
    "set ops / relation diff": {"setop_union_segments", "setop_bag_ops",
                                "cdc_snapshot_diff",
                                "setop_active_both_statuses",
                                "setop_only_open_customers"},
    "scalar batteries": {"scalar_math_battery", "scalar_string_funcs",
                         "scalar_date_parts", "scalar_json_extract",
                         "scalar_url_parse", "scalar_bitops_battery",
                         "scalar_null_battery", "scalar_variant_extract"},
    "pg quirk functions (§2.8)": {"pg_array_literal_parse", "cdc_cast_matrix"},
    "array/map functions": {"array_agg_per_nation", "array_hof_battery",
                            "map_function_battery"},
    "as-of/range/subquery/skew joins": {"asof_last_purchase",
                                        "asof_next_purchase",
                                        "asof_purchase_recency_gated",
                                        "range_join_ship_latency",
                                        "subquery_in_filter",
                                        "skew_salted_user_revenue"},
    "recursive surface": {"hierarchy_rollup"},
    "watermark windows (T6)": {"stream_tumbling_hourly",
                               "stream_session_windows",
                               "stream_sliding_30m",
                               "stream_interval_join"},
    # --- profiling / retrieval / layout tiers -----------------------
    "profiling / data quality": {"profile_table_stats",
                                 "chi_square_lang_source", "dist_drift_l1",
                                 "dq_constraint_violations"},
    "ranked retrieval": {"bm25_retrieval", "inverted_index_stats"},
    "data layout": {"zorder_tile_stats"},
    # --- §2.10 LLM-pipeline families --------------------------------
    "exact dedup": {"dedup_exact"},
    "near-dup (LSH/SimHash/Jaccard/edit)": {"dedup_minhash_lsh",
                                            "dedup_simhash",
                                            "neardup_jaccard_pairs",
                                            "neardup_jaccard_prefix",
                                            "neardup_edit_distance"},
    "dedup clustering": {"dedup_cluster_assign", "dedup_cluster_assign_lsh",
                         "dedup_components_chain", "neardup_triangle_stats"},
    "similarity search": {"cosine_topk_brute", "ann_lsh_topk", "ann_ivf_topk",
                          "ann_ivf_topk_prebuilt", "ann_ivfpq_topk",
                          "ann_hard_negatives"},
    "embedding toolset": {"embedding_kmeans_clusters", "embedding_pq_codes",
                          "embedding_int8_quantize", "embedding_pca_project",
                          "embedding_centroid_report",
                          "embedding_norm_stats"},
    "text quality / corpus stats": {"text_quality_scores",
                                    "text_repetition_stats",
                                    "text_ngram_novelty",
                                    "corpus_doclen_histogram"},
    "multimodal": {"mm_bmp_decode", "mm_wav_decode", "mm_bytes_meta",
                   "mm_audio_resample", "mm_image_phash_neardup",
                   "mm_video_scene_cuts"},
    "sketches (MG/HLL/quantile)": {"frequent_items_mg", "hll_user_rollup",
                                   "quantile_histogram_rollup",
                                   "approx_distinct_users"},
    "anomaly / robust stats": {"ts_anomaly_mad", "ts_seasonal_residual"},
    "time-series resample/gap-fill": {"ts_gapfill_locf", "ts_resample_ohlc",
                                      "ts_time_weighted_avg"},
    "product analytics": {"funnel_conversion", "retention_cohorts",
                          "sequence_match_pattern", "sessionize_lag_gap",
                          "attribution_linear", "ab_test_summary",
                          "event_transition_matrix", "trending_terms"},
    "sampling / mixing / split": {"sample_stratified_hash",
                                  "sample_bottomk_hash",
                                  "sample_weighted_bottomk",
                                  "sample_by_mixture",
                                  "mixture_temperature_weights",
                                  "split_leakage_safe"},
    "contamination": {"benchmark_contamination", "contamination_bloom"},
}


def test_window_is_exactly_priority():
    assert list(all_queries())[:_GATE_WINDOW] == list(_PRIORITY)


def test_window_size_pinned():
    assert _GATE_WINDOW == 50
    assert len(_PRIORITY) == _GATE_WINDOW
    assert len(set(_PRIORITY)) == _GATE_WINDOW, "duplicate names in _PRIORITY"


_ROLLING_ROUNDS = 3


def _recent_driver_rows() -> set[str]:
    """Query names with a row in the last _ROLLING_ROUNDS CORRECTNESS
    files (any status — a red row still proves the family is being
    checked; going red is its own loud signal)."""
    import glob
    import json
    import os
    import re

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    files = sorted(
        glob.glob(os.path.join(here, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )[-_ROLLING_ROUNDS:]
    names: set[str] = set()
    for p in files:
        names |= set(json.load(open(p)))
    return names


def test_every_family_covered_rolling():
    covered = set(_PRIORITY) | _recent_driver_rows()
    missing = [fam for fam, names in _FAMILY_CANARIES.items()
               if not (names & covered)]
    assert not missing, (
        f"families with no member in the current window or the last "
        f"{_ROLLING_ROUNDS} driver rounds: {missing}"
    )


def test_family_canary_names_exist():
    registered = set(all_queries())
    ghosts = {fam: names - registered
              for fam, names in _FAMILY_CANARIES.items()
              if names - registered}
    assert not ghosts, f"canary sets name unregistered queries: {ghosts}"


def test_priority_names_all_registered():
    registered = set(all_queries())
    assert set(_PRIORITY) <= registered


def test_oracles_subset_of_queries():
    assert set(all_oracles()) <= set(all_queries())


def _load_staleness_tool():
    import importlib.util
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "_window_staleness_tool", os.path.join(here, "tools", "window_staleness.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_propose_force_includes_orphaned_family():
    """The r13 rotation mechanically orphaned 'recursive surface' and
    'data layout' from the rolling window (the one red pytest at r13
    judge time).  propose_window must force-include the stalest member
    of any family with no row in the last 2 rounds, even when the pure
    stalest-first queue would not reach it."""
    tool = _load_staleness_tool()
    canaries = ("c1",)
    # q_fam is FRESHER (r9) than the fillers (r5), so a pure
    # stalest-first fill of size 3 would pick fillers and orphan fam.
    rows = [(5, "fill_a", "green", "oracle"),
            (5, "fill_b", "green", "oracle"),
            (5, "fill_c", "green", "oracle"),
            (9, "q_fam", "green", "oracle"),
            (0, "c1", "green", "oracle")]
    rows.sort()
    proposal, forced = tool.propose_window(
        rows, recent2=set(), families={"fam": {"q_fam"}}, size=3,
        canaries=canaries)
    assert forced == ["q_fam"]
    assert "q_fam" in proposal and len(proposal) == 3
    # A family already covered by the recent record is NOT forced.
    proposal2, forced2 = tool.propose_window(
        rows, recent2={"q_fam"}, families={"fam": {"q_fam"}}, size=3,
        canaries=canaries)
    assert forced2 == [] and "q_fam" not in proposal2


def test_current_window_plus_recent2_covers_all_families():
    """The property the proposer enforces, asserted on the REAL window:
    every family has a member in _PRIORITY or the NEWEST CORRECTNESS
    file — newest-1, not newest-2 (r16): when the driver deposits the
    next file post-wrap, the strict coverage set becomes (_PRIORITY as
    the new round UNION the round that is newest now), so a family
    riding the second-newest round would orphan at judge time — the
    exact structural red of both r13 and r15. Under newest-1 this test
    stays green across the deposit by construction."""
    tool = _load_staleness_tool()
    recent1 = tool.last_n_round_rows(tool.history(), 1)
    covered = set(_PRIORITY) | recent1
    missing = [fam for fam, names in _FAMILY_CANARIES.items()
               if not (names & covered)]
    assert not missing, f"next driver round would orphan: {missing}"


def test_no_nonscalar_output_columns(spark, sf_dir):
    """No registry query may emit an ARRAY/MAP/STRUCT column: the
    driver's canonicalizer crashes sorting raw list cells (the r7
    ``array_hof_battery`` red row).  Non-scalar values must render as
    strings (array_join / to_json) at the final projection.  Runs over
    the WHOLE registry so a future rotation can't reintroduce it.

    Cost disclosure: schema derivation itself is plan-only, but
    CONSTRUCTING some queries runs real bounded driver-side jobs —
    ``hierarchy_rollup``'s convergence probes and the ANN/k-means/PQ
    constructors' sample-collect training (similarity.py) — so this
    guard costs ~1 min at sf0.001, not milliseconds.  Accepted: it is
    the only place every registry output schema is checked."""
    from pyspark.sql import types as T

    offenders = {}
    for name, fn in all_queries().items():
        df = fn(spark, sf_dir)
        bad = [f"{f.name}:{f.dataType.simpleString()}"
               for f in df.schema.fields
               if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "queries emitting non-scalar output columns (stringify at the "
        f"final projection): {offenders}"
    )
