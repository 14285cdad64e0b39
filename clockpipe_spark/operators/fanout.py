"""Operator-owned fan-out parallelism.

The round-4 lesson: a pair-mining / ANN scoring stage whose input is one
small parquet file inherits ONE input partition, and when the pair join is
broadcast-only there is no exchange anywhere on the probe side — so a
~400×-fan-out stage (join output rows ≫ input rows) executes as a single
task on one core no matter how many the host has. File count is the wrong
parallelism lever at any scale; an operator that fans out must set its own.

``fanout_repartition`` is that guarantee: call it on the probe side
immediately before a fan-out join/explode. It costs one round-robin
shuffle of the *input* (small by definition — the fan-out happens after),
and buys parallelism proportional to cores instead of input files.
Measured on ``embedding_neardup_pairs`` at sf0.1: 4.0 s → 0.83 s warm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fanout_repartition(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a DataFrame to at least the cluster's
    default parallelism ahead of a fan-out stage.

    Unconditional by design: probing the current partition count
    (``df.rdd.getNumPartitions()``) forces an RDD conversion per call, and
    the shuffle this inserts moves only the pre-fan-out rows — noise next
    to the fan-out itself. Catalyst keeps the exchange because round-robin
    repartition is a user-requested distribution.
    """
    n = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n)


def grid_pair_join(
    a: DataFrame,
    b: DataFrame,
    key: str,
    left_id: str,
    right_id: str,
    grid: int = 4,
):
    """All ordered pairs (x, y) sharing ``key`` with ``x.left_id <
    y.right_id``, joined on a ``(key, block(x), block(y))`` grid instead
    of ``key`` alone.

    Why: a blocking key with low cardinality (e.g. 10 labels) caps a
    shuffle join at 10 tasks no matter the cluster size. Sub-blocking each
    side by ``pmod(id, grid)`` and replicating rows across the other
    side's block axis multiplies join-key cardinality by ``grid²`` while
    matching every within-key pair exactly once (x meets y only at the
    cell ``(key, block(x), block(y))``). Cost: each input row is shuffled
    ``grid`` times — pre-fan-out rows, cheap relative to the pair stage.
    Raise ``grid`` with cluster size; ``grid=4`` gives 16× key fan-out.
    """
    from pyspark.sql import functions as F

    cells = F.array(*[F.lit(i) for i in range(grid)])
    ga = a.withColumn("_blk_a", F.pmod(F.col(left_id), F.lit(grid))).withColumn(
        "_blk_b", F.explode(cells)
    )
    gb = b.withColumn("_blk_b", F.pmod(F.col(right_id), F.lit(grid))).withColumn(
        "_blk_a", F.explode(cells)
    )
    return (
        ga.join(gb, [key, "_blk_a", "_blk_b"])
        .filter(F.col(left_id) < F.col(right_id))
        .drop("_blk_a", "_blk_b")
    )
