"""Per-round benchmark: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Execution is measured with a noop sink (full plan runs, nothing
collected to the driver) — the same discipline as a cluster benchmark.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from clockpipe_spark.queries import all_queries
from clockpipe_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_revenue_forecast",
    "q10_returned_items",
    "join_broadcast_brand_volume",
    "window_top3_orders_per_customer",
    "topk_orders_by_price",
    "scalar_json_extract",
    "cdc_replica_state",
    "cdc_apply_to_snapshot",
    "stream_tumbling_hourly",
    "stream_session_windows",
    "text_quality_scores",
    "text_fingerprint",
    "asof_last_purchase",
    "range_join_ship_latency",
    "stats_percentiles",
    "udf_zscore_per_user",
    "grouping_sets_lineitem",
    "text_bpe_token_stats",
    "text_rolling_hash",
    "dedup_exact",
    "dedup_minhash_lsh",
    "neardup_jaccard_pairs",
    "cosine_topk_brute",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "embedding_neardup_pairs",
]


def bench_cdc(spark, sf_dir: str) -> dict[str, float]:
    """BASELINE.md derived targets, measured: snapshot ingest rate and
    sustained CDC merge throughput at the reference's 65,536-change peek
    cap (config.rs:146-149, 181-184)."""
    import shutil
    import tempfile

    from clockpipe_spark.config import PipeConfig, SourceTable
    from clockpipe_spark.sync_job import SyncJob

    target = tempfile.mkdtemp(prefix="clockpipe_bench_")
    try:
        cfg = PipeConfig(
            tables=[SourceTable("customer"), SourceTable("orders")],
            peek_changes_limit=65_536,
        )
        job = SyncJob(spark, cfg, sf_dir, target)
        job.initialize()
        t0 = time.perf_counter()
        copied = job.first_sync()
        snap_sec = time.perf_counter() - t0
        snap_rows = sum(copied.values())

        t0 = time.perf_counter()
        iterations = job.sync_loop()
        cdc_sec = time.perf_counter() - t0
        n_events = spark.read.parquet(
            os.path.join(sf_dir, "events.parquet")
        ).count()
        return {
            "snapshot_rows_per_sec": round(snap_rows / snap_sec, 1),
            "cdc_events_per_sec": round(n_events / cdc_sec, 1),
            "cdc_iterations": iterations,
            "cdc_batch_cap": 65_536,
        }
    finally:
        shutil.rmtree(target, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("clockpipe-bench")
    queries = all_queries()

    # warm the JVM + parquet footers with one cheap action
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        df = queries[name](spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cdc": bench_cdc(spark, sf_dir),
            }
        )
    )


if __name__ == "__main__":
    main()
