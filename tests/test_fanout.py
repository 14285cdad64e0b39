"""Fan-out parallelism is operator-owned, not a file-count accident.

Round-4 regression class: a single-file input gives 1 partition, a
broadcast-only pair join adds no exchange, and the whole pair fan-out
runs as one task. These tests pin the floor so the defect can't return.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clockpipe_spark.catalog import load_table
from clockpipe_spark.operators.fanout import fanout_repartition, grid_pair_join
from clockpipe_spark.queries.similarity import (
    ann_ivf_topk,
    ann_lsh_topk,
    embedding_neardup_pairs,
)


def test_single_file_input_is_one_partition(spark, sf_dir):
    # the premise of the whole module: sf parquet tables are single files
    emb = load_table(spark, sf_dir, "embeddings")
    assert emb.rdd.getNumPartitions() == 1


def test_fanout_repartition_sets_floor(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    floor = spark.sparkContext.defaultParallelism
    assert fanout_repartition(emb).rdd.getNumPartitions() == floor
    assert fanout_repartition(emb, 16).rdd.getNumPartitions() == 16


def test_pair_stage_partition_floor(spark, sf_dir):
    # embedding_neardup_pairs ends in narrow ops over the pair join, so
    # its partition count IS the pair stage's — it must be >= the
    # parallelism floor even though the input is a single file.
    #
    # r11 nuance: the pair join is no longer hint-broadcast (the b side
    # is corpus-sized — see the query's docstring), so at test scale
    # Catalyst/AQE freely broadcasts whichever side is smaller and the
    # final partition count is a SIZING decision, not a parallelism
    # ceiling. The claim that must hold at 100 TB — and that the r4
    # defect class would break — is that when NO side is broadcastable
    # the plan degrades to a distributed join on the grid key at full
    # parallelism. Pin exactly that: disable broadcast (simulating a
    # corpus-sized build side) and AQE's small-data coalescing, and the
    # pair stage must hit the floor through a real shuffle join.
    floor = spark.sparkContext.defaultParallelism
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = embedding_neardup_pairs(spark, sf_dir)
        assert df.rdd.getNumPartitions() >= floor
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_fanout_plans_contain_roundrobin_exchange(spark, sf_dir):
    # the repartition must survive optimization into the physical plan
    for q in (embedding_neardup_pairs, ann_lsh_topk, ann_ivf_topk):
        plan = q(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        assert "RoundRobinPartitioning" in plan, q.__name__


def test_grid_pair_join_matches_plain_blocked_join(spark):
    rows = [(i, i % 3, float(i)) for i in range(40)]
    df = spark.createDataFrame(rows, "id bigint, lbl int, v double")
    a = df.select("lbl", F.col("id").alias("id_a"), F.col("v").alias("va"))
    b = df.select("lbl", F.col("id").alias("id_b"), F.col("v").alias("vb"))
    expected = sorted(
        (r.id_a, r.id_b)
        for r in a.join(b, "lbl").filter(F.col("id_a") < F.col("id_b")).collect()
    )
    for grid in (1, 2, 4, 7):
        got = sorted(
            (r.id_a, r.id_b)
            for r in grid_pair_join(a, b, "lbl", "id_a", "id_b", grid=grid).collect()
        )
        assert got == expected, f"grid={grid}"


def test_grid_pair_join_multiplies_key_cardinality(spark):
    # one label: a plain shuffle join has exactly 1 non-empty task; the
    # grid join spreads pairs over grid**2 cells
    rows = [(i, 0) for i in range(64)]
    df = spark.createDataFrame(rows, "id bigint, lbl int")
    a = df.select("lbl", F.col("id").alias("id_a"))
    b = df.select("lbl", F.col("id").alias("id_b"))
    pairs = grid_pair_join(a, b, "lbl", "id_a", "id_b", grid=4)
    cells = (
        pairs.select(
            F.pmod(F.col("id_a"), F.lit(4)).alias("ba"),
            F.pmod(F.col("id_b"), F.lit(4)).alias("bb"),
        )
        .distinct()
        .count()
    )
    assert cells == 16
