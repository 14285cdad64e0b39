"""Persisted model/index artifacts: the train-once / score-many split
the similarity and LM operators reference.

Query-shaped operators (ann_ivf_topk, text_bigram_logprob, ...) train
their model state inside the call so the driver gate can verify them
end-to-end. A deployment amortizes that: centroids / codebooks / count
tables are built once, PERSISTED, and every probe or scoring job loads
them. This module is that persistence layer — numpy arrays and
DataFrames as plain parquet (portable, no pickle), plus the IVF index
build/probe pair that demonstrates the split (probe output is pinned
byte-equal to the self-training query in tests/test_model_store.py).

100 TB notes: an index table persisted by ``save_table`` is a normal
parquet table — partition/bucket it like any fact table (the IVF cell
table below is written partitioned by cell so a probe prunes to its
nprobe cells at file level, the same economics as the streaming band
log)."""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession


class ModelStore:
    """Parquet-backed store for model artifacts under one root."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def exists(self, name: str) -> bool:
        return os.path.isdir(self._path(name))

    def save_array(self, name: str, arr: np.ndarray) -> None:
        """ndarray -> one-row parquet (shape + flat float64 payload)."""
        flat = [float(x) for x in np.asarray(arr, dtype=np.float64).ravel()]
        shape = [int(s) for s in arr.shape]
        self.spark.createDataFrame(
            [(shape, flat)], "shape array<int>, payload array<double>"
        ).coalesce(1).write.mode("overwrite").parquet(self._path(name))

    def load_array(self, name: str) -> np.ndarray:
        [row] = self.spark.read.parquet(self._path(name)).collect()
        return np.asarray(row["payload"], dtype=np.float64).reshape(row["shape"])

    def save_table(
        self, name: str, df: DataFrame, partition_by: str | None = None
    ) -> None:
        w = df.write.mode("overwrite")
        if partition_by:
            # one file per partition value: repartition on the key first
            # (the state-append file discipline — see neardup_state.py)
            from pyspark.sql import functions as F

            df = df.repartition(F.col(partition_by))
            w = df.write.mode("overwrite").partitionBy(partition_by)
        w.parquet(self._path(name))

    def load_table(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self._path(name))


def build_ivf_index(spark: SparkSession, sf_dir: str, index_root: str) -> ModelStore:
    """Train the IVF coarse quantizer exactly as ann_ivf_topk does and
    persist centroids + the cell-assigned corpus (partitioned by cell,
    so a probe reads only its nprobe cells)."""
    from pyspark.sql import functions as F

    from clockpipe_spark.catalog import load_table
    from clockpipe_spark.operators.fanout import fanout_repartition
    from clockpipe_spark.operators.vectors import ivf_assigner, l2_norm_sq
    from clockpipe_spark.queries.similarity import _train_centroids, as_double_array

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = _train_centroids(emb, sf_dir)
    store = ModelStore(spark, index_root)
    store.save_array("centroids", centroids)

    assign1 = ivf_assigner(centroids, nprobe=1)
    corpus = fanout_repartition(emb).select(
        "vec_id",
        as_double_array(F.col("embedding")).alias("e"),
        F.element_at(assign1(F.col("embedding")), 1).alias("cell"),
    ).withColumn("n2", l2_norm_sq(F.col("e")))
    store.save_table("cells", corpus, partition_by="cell")
    return store


def build_bigram_lm(spark: SparkSession, sf_dir: str, model_root: str) -> ModelStore:
    """Train the add-k bigram LM once and persist its count tables —
    the train side of the split text_bigram_logprob documents (its
    one-shot plan re-derives the gram stream per branch; persisted,
    each table is built from one stream and written)."""
    from pyspark.sql import functions as F

    from clockpipe_spark.catalog import load_table
    from clockpipe_spark.queries.textops2 import bigram_gram_stream

    docs = load_table(spark, sf_dir, "documents")
    flat = bigram_gram_stream(docs).localCheckpoint(eager=True)
    store = ModelStore(spark, model_root)
    bg_freq = flat.groupBy("bg").agg(F.count("*").alias("cbg"))
    store.save_table("bg_freq", bg_freq.coalesce(4))
    ctx_freq = (
        store.load_table("bg_freq")
        .groupBy(F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("w1"))
        .agg(F.sum("cbg").alias("cctx"))
    )
    store.save_table("ctx_freq", ctx_freq.coalesce(4))
    vocab = store.load_table("ctx_freq").agg(F.count("*").alias("v"))
    store.save_table("vocab", vocab)
    return store


def score_with_bigram_lm(
    spark: SparkSession, sf_dir: str, model_root: str
) -> DataFrame:
    """Scoring half against the persisted LM: one corpus gram stream,
    equi-joins against the loaded count tables, per-doc aggregation —
    byte-identical output to the self-training text_bigram_logprob
    (pinned in tests/test_model_store.py)."""
    from pyspark.sql import functions as F

    from clockpipe_spark.catalog import load_table
    from clockpipe_spark.queries.textops2 import _BG_K, bigram_gram_stream

    store = ModelStore(spark, model_root)
    bg_freq = store.load_table("bg_freq")
    ctx_freq = store.load_table("ctx_freq")
    vocab = store.load_table("vocab")
    flat = bigram_gram_stream(load_table(spark, sf_dir, "documents"))
    # no broadcast hints on the loaded count tables (same rationale as
    # text_bigram_logprob): a persisted bigram model is only
    # broadcastable after a top-M prune; unpruned, the join must be
    # free to shuffle. AQE broadcasts from the store tables' real file
    # sizes at this scale.
    scored = (
        flat.join(bg_freq, "bg")
        .join(ctx_freq, "w1")
        .crossJoin(F.broadcast(vocab))
    )
    nll = -F.log2((F.col("cbg") + _BG_K) / (F.col("cctx") + _BG_K * F.col("v")))
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.floor(F.avg(nll) * 100).cast("bigint").alias("mean_nll_x100"),
    )


def ann_ivf_topk_prebuilt(
    spark: SparkSession, sf_dir: str, index_root: str
) -> DataFrame:
    """ann_ivf_topk's probe half against a persisted index: load the
    centroid matrix, quantize only the QUERY vectors (nprobe=2), and
    score against the pre-assigned cell table. Same output contract as
    the self-training query (pinned equal in tests)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from clockpipe_spark.catalog import load_table
    from clockpipe_spark.operators.vectors import ivf_assigner, l2_norm_sq
    from clockpipe_spark.queries.similarity import _N_QUERIES, _TOP_K, as_double_array

    store = ModelStore(spark, index_root)
    centroids = store.load_array("centroids")
    corpus = store.load_table("cells")

    assign2 = ivf_assigner(centroids, nprobe=2)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = (
        emb.filter(F.col("vec_id") < _N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            as_double_array(F.col("embedding")).alias("qe"),
            F.explode(assign2(F.col("embedding"))).alias("cell"),
        )
        .withColumn("qn2", l2_norm_sq(F.col("qe")))
    )
    from clockpipe_spark.operators.vectors import cosine_prenormed

    cand = corpus.join(F.broadcast(queries), "cell").filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine_prenormed(F.col("qe"), F.col("e"), F.col("qn2"), F.col("n2")).alias("cos"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TOP_K)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cosine"), "rnk")
    )
