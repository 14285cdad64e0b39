"""Mergeable frequency sketches: distributed Misra-Gries heavy hitters.

100 TB design (Agarwal et al., "Mergeable Summaries", PODS'12): each
input partition maintains at most k counters — memory bounded by k
regardless of vocabulary size, where an exact per-partition group-by
would hold the partition's full distinct set. The per-partition
summaries union into a candidate set of <= k x partitions rows, and ONE
exact counting pass over the stream (semi-joined to the broadcast
candidates) verifies. The MG guarantee — any item with global count
> n/k exceeds n_p/k in at least one partition (pigeonhole) and a
partition's cumulative decrement is <= n_p/(k+1), so it survives that
partition's summary — makes the verified output EXACTLY the true heavy
hitters: the sketch bounds memory, the verify pass restores exactness,
and the whole operator stays oracle-checkable against a plain GROUP BY.

The reference has no sketch operators (its one aggregate is keep-last
dedup, adapter/mod.rs:258-269); this extends the §2.10 analytics tier
the way approx_count_distinct already does for cardinality.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def mg_partition_summaries(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries: (item, lower_bound) rows,
    at most k per input partition. Arrow-batched: each batch folds into
    the counter dict via one vectorized value_counts, then the standard
    compress step (subtract the (k+1)-th largest, drop non-positive)
    restores the k-counter bound. Weighted updates keep the classic MG
    guarantee: every compress removes >= (k+1) x its decrement of total
    mass, so cumulative decrement <= n_p/(k+1)."""

    def summarize(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            for item, c in pdf[col].value_counts().items():
                counters[item] = counters.get(item, 0) + int(c)
            if len(counters) > k:
                kth = sorted(counters.values(), reverse=True)[k]
                counters = {t: c - kth for t, c in counters.items() if c > kth}
        yield pd.DataFrame(
            {col: list(counters.keys()), "lb": list(counters.values())}
        )

    return df.select(col).mapInPandas(summarize, f"{col} string, lb long")


def heavy_hitters_exact(df: DataFrame, col: str, k: int) -> DataFrame:
    """Items with count * k > total, found with bounded memory: MG
    candidate generation + one exact verification pass. Output is
    provably identical to the quadratic-memory exact GROUP BY."""
    from pyspark.sql import functions as F

    cand = mg_partition_summaries(df, col, k).select(col).distinct()
    total = df.agg(F.count("*").alias("total"))
    return (
        df.join(F.broadcast(cand), col)
        .groupBy(col)
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * k > F.col("total"))
        .orderBy(F.col("cnt").desc(), col)
    )
