"""Phase trace for dedup_cluster_assign_lsh (VERDICT r14 directive #6).

The suite's largest headline block (3.0 s at r14) composes the MinHash
pair miner with star-contraction components. The minhash iso
decomposition already attributed ~1.2 s of its twin to PLAN-COMPILE on
the shared signature tree; this probe decomposes the cluster query the
same way so the 3.0 s is either attributed (close the thread like
minhash) or yields a compile-reuse win.

Phases measured per trial, replicating the operator's exact composition
(queries/approximate.py:50 + operators/components.py):
  compile_pairs  - analysis+optimization of the pair-miner plan only
                   (executedPlan forced, no job)
  edges_ckpt     - distinct + localCheckpoint(eager) of the edge set:
                   executes the mining (sig cache cold on trial 1,
                   warm after)
  round_N_ckpt   - each contraction round's checkpoint job
  round_N_sig    - each round's convergence-signature agg (first())
  final_write    - labels join + projection + noop write, WITH and
                   WITHOUT the trailing orderBy (the changestream
                   lesson: a global sort's range-partitioner sampling
                   re-executes the un-checkpointed tail)

Usage: python tools/trace_cluster_lsh.py  [writes nothing; prints JSON]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def trace_once(spark, sf_dir: str, label: str) -> dict:
    from clockpipe_spark.operators.components import _large_star, _small_star
    from clockpipe_spark.queries.approximate import dedup_minhash_lsh
    from clockpipe_spark.queries.textops import _doubled_corpus

    t: dict[str, float] = {}
    t0 = time.perf_counter()
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    # force full analysis + optimization + physical planning, no job
    pairs._jdf.queryExecution().executedPlan()
    t["compile_pairs"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    e = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    t["edges_ckpt"] = round(time.perf_counter() - t0, 3)

    prev_sig, rounds = None, 0
    for i in range(20):
        t0 = time.perf_counter()
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        t[f"round{i}_ckpt"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        sig = e.agg(
            F.count("*").alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
        ).first()
        t[f"round{i}_sig"] = round(time.perf_counter() - t0, 3)
        sig = (sig["n"], sig["h"])
        rounds = i + 1
        if sig == prev_sig:
            break
        prev_sig = sig

    corpus = _doubled_corpus(spark, sf_dir).select("doc_id")
    lbls = e.select(F.col("u").alias("id"), F.col("v").alias("lbl"))
    out = (
        corpus.withColumnRenamed("doc_id", "id")
        .join(lbls, "id", "left")
        .select(
            F.col("id").alias("doc_id"),
            F.coalesce("lbl", "id").alias("cluster_id"),
        )
    )
    t0 = time.perf_counter()
    out.write.format("noop").mode("overwrite").save()
    t["final_write_nosort"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    out.orderBy("doc_id").write.format("noop").mode("overwrite").save()
    t["final_write_sorted"] = round(time.perf_counter() - t0, 3)

    t["rounds"] = rounds
    t["total"] = round(sum(v for k, v in t.items() if k != "rounds"), 3)
    return {"trial": label, **t}


def main() -> int:
    from clockpipe_spark.queries import all_queries
    from clockpipe_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("trace_cluster_lsh")
    out = []
    # trial 1: cold sig cache; trial 2-3: warm (the bench's min-of-N
    # regime) — separates cache-build from the steady-state the
    # headline reports
    for lbl in ("cold", "warm1", "warm2"):
        out.append(trace_once(spark, sf_dir, lbl))
        print(json.dumps(out[-1]), flush=True)
    # reference point: the registry query end-to-end, same session
    fn = all_queries()["dedup_cluster_assign_lsh"]
    for i in range(2):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        print(json.dumps({"registry_e2e": round(time.perf_counter() - t0, 3)}),
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
