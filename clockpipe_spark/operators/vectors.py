"""Vector/embedding primitives: cosine similarity as a pure Catalyst
expression, plus a random-hyperplane LSH bucketizer (Arrow-vectorized).

The exact path (zip_with + aggregate fold) stays JVM-side in whole-stage
codegen; LSH bucket assignment uses one pandas UDF doing a single numpy
matmul per Arrow batch — the canonical vectorized-UDF shape (never
row-at-a-time Python).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def as_double_array(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Elementwise product + left-fold sum — same evaluation order as a
    plain loop, so it agrees bit-for-bit with other engines' accumulation."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm_sq(a: Column) -> Column:
    return dot(a, a)


def cosine(a: Column, b: Column) -> Column:
    """cos(a, b) = a·b / sqrt(|a|² · |b|²), computed in double.

    NOTE: evaluates three array folds per call — inside a pair join,
    precompute each side's norm² once (see cosine_prenormed) so only the
    dot product runs per pair.
    """
    return dot(a, b) / F.sqrt(l2_norm_sq(a) * l2_norm_sq(b))


def cosine_prenormed(a: Column, b: Column, a_norm_sq: Column, b_norm_sq: Column) -> Column:
    """Pair-join cosine with per-side norms precomputed before the join —
    the join output evaluates one fold (the dot) instead of three."""
    return dot(a, b) / F.sqrt(a_norm_sq * b_norm_sq)


def hyperplane_lsh_bucketizer(dim: int, n_planes: int = 16, seed: int = 42):
    """Returns a pandas UDF mapping array<float/double> -> int64 bucket of
    sign bits against `n_planes` fixed random hyperplanes.

    Deterministic: planes come from a seeded RandomState. Vectorized: one
    (batch × dim) @ (dim × n_planes) matmul per Arrow batch.
    """
    planes = np.random.RandomState(seed).randn(dim, n_planes)
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    @pandas_udf("long")
    def bucket(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy())  # (batch, dim)
        bits = (mat @ planes) >= 0  # (batch, n_planes)
        return pd.Series(bits @ weights)

    return bucket


def ivf_assigner(centroids: np.ndarray, nprobe: int = 1, deterministic: bool = True):
    """IVF coarse quantizer: pandas UDF mapping a vector to its `nprobe`
    nearest centroid ids (by cosine). One matmul per Arrow batch.

    `centroids` is a (K, dim) matrix — at scale it comes from a k-means
    sample pass; the caller owns that choice (the operator is agnostic).

    ``deterministic=False`` (r20, guide §4.4): the function is in fact
    deterministic, but when its output feeds an equi-join key the
    optimizer infers ``isnotnull(element_at(assign(...), 1))`` from the
    join and pushes it below the fan-out exchange — duplicating the
    whole K-centroid matmul over every corpus row (a second
    ArrowEvalPython node whose output is projected away immediately).
    Marking the UDF non-deterministic forbids that copy; results are
    unchanged. Only opt in for Project-context calls — a
    non-deterministic expression under ``explode`` (the nprobe>1 query
    side) is rejected at analysis."""
    norms = np.linalg.norm(centroids, axis=1)
    normed = centroids / np.maximum(norms[:, None], 1e-12)

    @pandas_udf("array<int>")
    def assign(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy())  # (batch, dim)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1)[:, None], 1e-12)
        sims = mat @ normed.T  # (batch, K)
        idx = np.argsort(-sims, axis=1)[:, :nprobe].astype(np.int32)
        return pd.Series(list(idx))

    return assign if deterministic else assign.asNondeterministic()


def kmeans_lite(sample: np.ndarray, k: int, n_iter: int = 5, seed: int = 42) -> np.ndarray:
    """Tiny deterministic k-means for IVF centroid training on a driver-
    side sample (spherical: cosine assignment, mean re-centering). At
    100 TB the sample is a few 100k rows — this exact routine still
    applies; only the sampling is distributed."""
    rng = np.random.RandomState(seed)
    X = sample / np.maximum(np.linalg.norm(sample, axis=1)[:, None], 1e-12)
    centroids = X[rng.choice(len(X), size=k, replace=False)]
    for _ in range(n_iter):
        sims = X @ centroids.T
        assign = np.argmax(sims, axis=1)
        for j in range(k):
            members = X[assign == j]
            if len(members):
                c = members.mean(axis=0)
                centroids[j] = c / max(np.linalg.norm(c), 1e-12)
    return centroids


def kmeans_refine_distributed(
    df,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    n_iter: int = 2,
) -> np.ndarray:
    """Distributed Lloyd refinement rounds for spherical k-means.

    Per round: one Arrow-matmul assignment pass (ivf_assigner) and a
    posexplode re-centering — ``(cell, pos) -> avg`` runs with map-side
    partial aggregation, so the shuffle carries K x dim partial sums per
    map task, not n x dim rows. Only the K x dim centroid matrix is
    collected to the driver (bounded regardless of corpus size) — the
    same budget IVF index training has at any scale.
    """
    from pyspark.sql import functions as F

    k, dim = centroids.shape
    for _ in range(n_iter):
        assign = ivf_assigner(centroids, nprobe=1)
        # spherical: average the UNIT vectors (kmeans_lite normalizes its
        # sample the same way), then re-normalize the mean
        e = F.col(vec_col).cast("array<double>")
        prepared = df.select(
            F.element_at(assign(F.col(vec_col)), 1).alias("cell"),
            e.alias("e"),
        ).withColumn(
            "nrm", F.greatest(F.sqrt(l2_norm_sq(F.col("e"))), F.lit(1e-12))
        )
        # per-position avg aggregates instead of posexplode (r20, guide
        # §2.3 aggregate-before-shuffle taken to its limit): the old
        # shape exploded dim× rows per vector just to group them back by
        # (cell, pos) — measured ~1.4 s/round at sf0.1 on top of the
        # 0.58 s assignment pass. One hash agg keyed by cell with dim
        # avg buffers computes the same per-position means with no row
        # amplification (same addends; only fp merge order can differ,
        # which the 98%-agreement pin and rows-only gate already
        # tolerate). F.expr strings keep the dim-wide build to one py4j
        # call per position.
        sums = prepared.groupBy("cell").agg(
            *[
                F.expr(f"avg(element_at(e, {i + 1}) / nrm) AS m{i}")
                for i in range(dim)
            ]
        )
        new_c = centroids.copy()
        seen = set()
        for r in sums.collect():  # K rows x dim cols, bounded
            new_c[r["cell"]] = [r[f"m{i}"] for i in range(dim)]
            seen.add(r["cell"])
        # empty cells keep their previous centroid; others re-normalize
        for j in seen:
            new_c[j] = new_c[j] / max(np.linalg.norm(new_c[j]), 1e-12)
        centroids = new_c
    return centroids


def gram_matrix_distributed(df, vec_col: str = "embedding") -> np.ndarray:
    """(dim x dim) Gram matrix X^T X plus the column-sum vector and row
    count, computed as ONE pass: each partition emits its partial numpy
    accumulators (mapInPandas -> a single flattened row per batch), the
    driver sums them. The shuffle-free distributed-covariance shape —
    data volume to the driver is partitions x dim², independent of n.

    Returns (gram, colsum, n)."""
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401

    def partial(batches):
        for pdf in batches:
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            g = mat.T @ mat
            s = mat.sum(axis=0)
            yield pd.DataFrame(
                {
                    "n": [float(len(mat))],
                    "payload": [np.concatenate([g.ravel(), s]).tolist()],
                }
            )

    rows = (
        df.select(vec_col)
        .mapInPandas(partial, "n double, payload array<double>")
        .collect()
    )
    if not rows:
        raise ValueError("empty input")
    dim = int((np.sqrt(4 * len(rows[0]["payload"]) + 1) - 1) // 2)  # d²+d
    gram = np.zeros((dim, dim))
    colsum = np.zeros(dim)
    n = 0
    for r in rows:
        p = np.asarray(r["payload"])
        gram += p[: dim * dim].reshape(dim, dim)
        colsum += p[dim * dim :]
        n += int(r["n"])
    return gram, colsum, n


def pca_projector(components: np.ndarray, mean: np.ndarray):
    """pandas UDF projecting each vector onto the fitted principal
    components (one centered matmul per Arrow batch)."""
    import pandas as pd

    comp = components.astype(np.float64)
    mu = mean.astype(np.float64)

    @pandas_udf("array<double>")
    def project(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy()).astype(np.float64) - mu
        return pd.Series(list(mat @ comp.T))

    return project


def pq_codebooks(
    sample: np.ndarray, n_subspaces: int = 4, n_centroids: int = 16, seed: int = 42
) -> np.ndarray:
    """Product-quantization codebooks: the dim axis splits into
    ``n_subspaces`` contiguous sub-vectors, each clustered independently
    with a deterministic k-means on the (driver-side) training sample.
    Returns (n_subspaces, n_centroids, sub_dim). Euclidean k-means per
    subspace — the PQ standard (Jégou et al. 2011), unlike the spherical
    variant used for IVF coarse quantization."""
    n, dim = sample.shape
    if dim % n_subspaces:
        raise ValueError(f"dim {dim} not divisible by {n_subspaces} subspaces")
    sub = dim // n_subspaces
    rng = np.random.RandomState(seed)
    books = np.empty((n_subspaces, n_centroids, sub))
    for m in range(n_subspaces):
        X = sample[:, m * sub : (m + 1) * sub]
        c = X[rng.choice(n, size=n_centroids, replace=False)].copy()
        for _ in range(8):
            d2 = ((X[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for j in range(n_centroids):
                members = X[assign == j]
                if len(members):
                    c[j] = members.mean(axis=0)
        books[m] = c
    return books


def pq_encoder(books: np.ndarray):
    """pandas UDF mapping a vector to its PQ code (array<int>, one
    centroid id per subspace) plus nothing else — one distance matmul
    per subspace per Arrow batch. At 100 TB the codes are the stored
    index: dim×4 bytes/vector compresses to n_subspaces bytes."""
    import pandas as pd

    n_sub, k, sub = books.shape

    @pandas_udf("array<int>")
    def encode(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy()).astype(np.float64)  # (b, dim)
        codes = np.empty((len(mat), n_sub), dtype=np.int32)
        for m in range(n_sub):
            X = mat[:, m * sub : (m + 1) * sub]
            # ||x-c||² = ||x||² - 2x·c + ||c||²; argmin drops ||x||²
            d = -2.0 * (X @ books[m].T) + (books[m] ** 2).sum(axis=1)[None, :]
            codes[:, m] = np.argmin(d, axis=1)
        return pd.Series(list(codes))

    return encode


def pq_decoder(books: np.ndarray):
    """pandas UDF reconstructing the quantized vector from its code —
    used to measure reconstruction error and for asymmetric distance
    scoring at query time."""
    import pandas as pd

    n_sub, k, sub = books.shape

    @pandas_udf("array<double>")
    def decode(codes: pd.Series) -> pd.Series:
        arr = np.vstack(codes.to_numpy())  # (b, n_sub)
        out = np.concatenate(
            [books[m][arr[:, m]] for m in range(n_sub)], axis=1
        )
        return pd.Series(list(out))

    return decode


def multitable_lsh_bucketizer(
    dim: int, n_tables: int = 8, n_bits: int = 4, seed: int = 42
):
    """Multi-table hyperplane LSH: array<long> of `n_tables` bucket ids
    (table index baked into the id). A single wide bucket has vanishing
    collision probability for moderate-similarity vectors (p^bits); the
    union over L narrow tables restores recall: 1-(1-p^bits)^L.

    One (batch × dim) @ (dim × tables*bits) matmul per Arrow batch.
    """
    planes = np.random.RandomState(seed).randn(dim, n_tables * n_bits)
    bit_w = (1 << np.arange(n_bits)).astype(np.int64)

    @pandas_udf("array<long>")
    def buckets(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy())  # (batch, dim)
        bits = ((mat @ planes) >= 0).reshape(len(mat), n_tables, n_bits)
        codes = bits @ bit_w  # (batch, n_tables)
        table_base = (np.arange(n_tables, dtype=np.int64) + 1) << 32
        ids = codes + table_base
        return pd.Series(list(ids))

    return buckets
