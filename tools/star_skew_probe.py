"""Hot-key distribution of the star-contraction window partitions
(VERDICT r20 #3 / guide §2.5).

The r20 window-min rewrite ships every edge of the symmetric pair graph
to its `u` partition and buffers the group in WindowExec — so the
question at scale is how skewed the neighborhood sizes are. This probe
builds the SAME scaled corpus the bench's dedup30x harness uses, mines
the real LSH pair graph, and then, for each contraction round, reports
the window-group-size distribution (max, p50, p99, max/median ratio)
of both stars' partition keys.

Decision rule (VERDICT r20 #3): max/median > 10x ⇒ salt the window
(two-level min); otherwise document the measurement and leave the
single-window shape.

Usage: python tools/star_skew_probe.py [sf_dir] [factor]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from clockpipe_spark.operators.components import (  # noqa: E402
    _large_star,
    _small_star,
    _symmetrize,
)
from clockpipe_spark.operators.neardup import (  # noqa: E402
    minhash_lsh_pairs,
    release_signature_caches,
)
from clockpipe_spark.session import get_spark  # noqa: E402

REP_OFF, CLONE_OFF = 10_000_000, 5_000_000


def group_stats(df, key: str) -> dict:
    sizes = df.groupBy(key).count()
    row = sizes.agg(
        F.max("count").alias("max"),
        F.expr("percentile_approx(count, 0.5, 10000)").alias("p50"),
        F.expr("percentile_approx(count, 0.99, 10000)").alias("p99"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum("count").alias("n_rows"),
    ).first()
    return {
        "n_groups": row["n_groups"],
        "n_rows": row["n_rows"],
        "max": row["max"],
        "p50": row["p50"],
        "p99": row["p99"],
        "max_over_p50": round(row["max"] / max(row["p50"], 1), 2),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    spark = get_spark("star-skew-probe")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    reps = spark.range(factor).select(F.col("id").alias("rep"))
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    scaled = (
        docs.crossJoin(reps)
        .select(
            "doc_id",
            "rep",
            F.array_join(
                F.transform(
                    toks,
                    lambda t: F.concat_ws(
                        "_", F.concat(F.lit("r"), F.col("rep")), t
                    ),
                ),
                " ",
            ).alias("text"),
        )
        .withColumn("clone", F.explode(F.array(F.lit(0), F.lit(1))))
        .select(
            (
                F.col("doc_id")
                + F.col("rep") * REP_OFF
                + F.col("clone") * CLONE_OFF
            ).alias("doc_id"),
            "text",
        )
    )
    tmp = tempfile.mkdtemp(prefix="star_skew_probe_")
    path = os.path.join(tmp, f"docs_{factor}x")
    scaled.write.mode("overwrite").parquet(path)
    corpus = spark.read.parquet(path)

    pairs = (
        minhash_lsh_pairs(corpus, threshold=0.5)
        .select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .localCheckpoint(eager=True)
    )
    release_signature_caches()
    print(f"pair graph at {factor}x: {pairs.count()} edges")

    e = pairs.filter(F.col("u") != F.col("v")).distinct().localCheckpoint(
        eager=True
    )
    for rnd in range(1, 6):
        # large-star window key: u over the SYMMETRIC edge set
        sym = _symmetrize(e)
        print(f"round {rnd} large-star groups: {group_stats(sym, 'u')}")
        after_large = _large_star(e).localCheckpoint(eager=True)
        # small-star window key: u over the large->small oriented set
        oriented = after_large.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        print(f"round {rnd} small-star groups: {group_stats(oriented, 'u')}")
        new_e = _small_star(after_large).localCheckpoint(eager=True)
        n_prev, n_new = e.count(), new_e.count()
        print(f"round {rnd}: edges {n_prev} -> {n_new}")
        e = new_e
        if n_new == n_prev:
            break


if __name__ == "__main__":
    main()
