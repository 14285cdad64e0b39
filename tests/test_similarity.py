"""Similarity-search correctness: ANN recall vs brute force, approx
count-distinct error bound."""

from __future__ import annotations

from pyspark.sql import functions as F

from clockpipe_spark.queries.relational import (
    approx_distinct_users,
    distinct_users_per_event_type,
)
from clockpipe_spark.queries.similarity import (
    ann_ivf_topk,
    ann_lsh_topk,
    cosine_topk_brute,
)


def test_ann_recall_vs_brute(spark, sf_dir):
    brute = cosine_topk_brute(spark, sf_dir).collect()
    ann = ann_lsh_topk(spark, sf_dir).collect()
    top1 = {r["query_id"]: r["neighbor_id"] for r in brute if r["rnk"] == 1}
    ann_by_q: dict[int, set[int]] = {}
    for r in ann:
        ann_by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    # LSH with 8 planes on random data: expect the true top-1 to be found
    # for a reasonable share of queries (same-bucket probability rises
    # with cosine similarity)
    hits = sum(1 for q, n in top1.items() if n in ann_by_q.get(q, set()))
    assert hits / len(top1) >= 0.3, f"top-1 recall {hits}/{len(top1)}"


def test_ivf_recall_vs_brute(spark, sf_dir):
    brute = cosine_topk_brute(spark, sf_dir).collect()
    ivf = ann_ivf_topk(spark, sf_dir).collect()
    top1 = {r["query_id"]: r["neighbor_id"] for r in brute if r["rnk"] == 1}
    by_q: dict[int, set[int]] = {}
    for r in ivf:
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(1 for q, n in top1.items() if n in by_q.get(q, set()))
    # nprobe=2 of ~8-16 cells: the true top-1 should usually be probed
    assert hits / len(top1) >= 0.3, f"IVF top-1 recall {hits}/{len(top1)}"
    assert all(r["neighbor_id"] != r["query_id"] for r in ivf)


def test_ann_excludes_self(spark, sf_dir):
    ann = ann_lsh_topk(spark, sf_dir).collect()
    assert all(r["neighbor_id"] != r["query_id"] for r in ann)


def test_approx_count_distinct_error_bound(spark, sf_dir):
    exact = {
        r["event_type"]: r["n_users"]
        for r in distinct_users_per_event_type(spark, sf_dir).collect()
    }
    approx = {
        r["event_type"]: r["approx_users"]
        for r in approx_distinct_users(spark, sf_dir).collect()
    }
    for et, n in exact.items():
        assert abs(approx[et] - n) / n <= 0.1, (et, n, approx[et])


def test_kmeans_clusters_match_numpy_reference(spark, sf_dir):
    """Distributed spherical k-means must agree with a pure-numpy run of
    the same algorithm (same init, same rounds) — the distributed part
    only changes summation order, so assignments may flip for boundary
    points but the clustering must be essentially identical."""
    import numpy as np

    from clockpipe_spark.catalog import load_table
    from clockpipe_spark.operators.vectors import kmeans_lite
    from clockpipe_spark.queries.similarity import (
        _train_centroids,
        embedding_kmeans_clusters,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1)[:, None], 1e-12)

    # numpy reference: identical init, then 2 full-corpus Lloyd rounds
    centroids = _train_centroids(emb, sf_dir)
    for _ in range(2):
        assign = np.argmax(Xn @ centroids.T, axis=1)
        new_c = centroids.copy()
        for j in range(len(centroids)):
            members = Xn[assign == j]
            if len(members):
                m = members.mean(axis=0)
                new_c[j] = m / max(np.linalg.norm(m), 1e-12)
        centroids = new_c
    ref = dict(zip(ids, np.argmax(Xn @ centroids.T, axis=1)))

    got = {
        r["vec_id"]: r["cluster_id"]
        for r in embedding_kmeans_clusters(spark, sf_dir).collect()
    }
    assert set(got) == set(ref)
    agree = sum(1 for i in got if got[i] == ref[i])
    assert agree / len(got) >= 0.98, f"assignment agreement {agree}/{len(got)}"
    # clusters are non-trivial: more than one, none empty-dominant
    assert len(set(got.values())) >= 2


def test_split_leakage_safe_properties(spark, sf_dir):
    """Near-duplicates never straddle splits, and the hash rule matches
    the documented 90/5/5 intent."""
    from clockpipe_spark.queries.textops import (
        neardup_jaccard_pairs,
        split_leakage_safe,
    )

    out = split_leakage_safe(spark, sf_dir).collect()
    split_of = {r["doc_id"]: r["split"] for r in out}
    by_cluster: dict[int, set[str]] = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_cluster.values()), "cluster split leak"

    # every near-dup pair lands in one split
    pairs = neardup_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b").collect()
    assert pairs, "fixture should contain near-dup pairs"
    for p in pairs:
        assert split_of[p["doc_a"]] == split_of[p["doc_b"]]

    # rough 90/5/5 (binomial slack on a small corpus)
    n = len(out)
    frac_train = sum(1 for r in out if r["split"] == "train") / n
    assert 0.8 <= frac_train <= 0.97, frac_train
    assert {r["split"] for r in out} <= {"train", "val", "test"}


def test_pca_matches_numpy_reference(spark, sf_dir):
    """One-pass distributed PCA must agree with numpy's full-matrix PCA:
    same covariance (to float tolerance), projected coordinates equal up
    to per-component sign."""
    import numpy as np

    from clockpipe_spark.catalog import load_table
    from clockpipe_spark.queries.similarity import embedding_pca_project

    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    mu = X.mean(axis=0)
    cov = (X - mu).T @ (X - mu) / len(X)
    eigval, eigvec = np.linalg.eigh(cov)
    order = np.argsort(eigval)[::-1][:2]
    comp = eigvec[:, order].T
    ref = (X - mu) @ comp.T  # (n, 2)

    got = {
        r["vec_id"]: (r["pc1"], r["pc2"])
        for r in embedding_pca_project(spark, sf_dir).collect()
    }
    assert set(got) == set(ids)
    for axis in range(2):
        g = np.array([got[i][axis] for i in ids])
        r = ref[:, axis]
        # sign of an eigenvector is arbitrary: accept either orientation
        err = min(np.abs(g - r).max(), np.abs(g + r).max())
        assert err < 1e-4, f"pc{axis+1} max err {err}"


def test_sample_cluster_cap_bounds(spark, sf_dir):
    from clockpipe_spark.queries.textops import (
        _CLUSTER_CAP,
        dedup_cluster_assign,
        sample_cluster_cap,
    )

    out = sample_cluster_cap(spark, sf_dir).collect()
    per_cluster: dict[int, int] = {}
    for r in out:
        per_cluster[r["cluster_id"]] = per_cluster.get(r["cluster_id"], 0) + 1
    assert max(per_cluster.values()) <= _CLUSTER_CAP
    # singletons survive; capped clusters keep the smallest doc_ids
    labels = dedup_cluster_assign(spark, sf_dir).collect()
    sizes: dict[int, int] = {}
    for r in labels:
        sizes[r["cluster_id"]] = sizes.get(r["cluster_id"], 0) + 1
    kept = {r["doc_id"] for r in out}
    for r in labels:
        if sizes[r["cluster_id"]] == 1:
            assert r["doc_id"] in kept
    assert any(v > _CLUSTER_CAP for v in sizes.values()), "fixture too easy"


def test_gram_matrix_partial_sums_across_partitions(spark, sf_dir):
    """The per-partition Gram partials must merge exactly regardless of
    partitioning (the distributed-covariance correctness core)."""
    import numpy as np

    from clockpipe_spark.catalog import load_table
    from clockpipe_spark.operators.vectors import gram_matrix_distributed

    emb = load_table(spark, sf_dir, "embeddings").select("embedding")
    X = np.array(
        [r["embedding"] for r in emb.collect()], dtype=np.float64
    )
    for parts in (1, 7):
        gram, colsum, n = gram_matrix_distributed(emb.repartition(parts))
        assert n == len(X)
        np.testing.assert_allclose(gram, X.T @ X, rtol=1e-9)
        np.testing.assert_allclose(colsum, X.sum(axis=0), rtol=1e-9)


def test_pq_codes_match_pure_numpy_and_reconstruct(spark, sf_dir):
    """embedding_pq_codes vs a pure-numpy run of the same algorithm:
    identical codes and floor-scaled reconstruction errors, plus a
    sanity bound on mean relative error."""
    import numpy as np

    from clockpipe_spark.catalog import load_table
    from clockpipe_spark.operators.vectors import pq_codebooks
    from clockpipe_spark.queries.similarity import (
        _corpus_meta,
        embedding_pq_codes,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    n_corpus, _ = _corpus_meta(sf_dir)
    frac = min(1.0, 2048.0 / max(n_corpus, 1))
    sample = np.array(
        [
            r["embedding"]
            for r in emb.select("embedding")
            .sample(fraction=frac, seed=42)
            .limit(2048)
            .collect()
        ],
        dtype=np.float64,
    )
    books = pq_codebooks(sample, n_subspaces=4, n_centroids=16)

    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.select("vec_id", "embedding").collect()
    }
    n_sub, k, sub = books.shape
    expect = {}
    for vid, v in vecs.items():
        code, rec = [], []
        for m in range(n_sub):
            x = v[m * sub : (m + 1) * sub]
            j = int(np.argmin(((books[m] - x) ** 2).sum(axis=1)))
            code.append(j)
            rec.append(books[m][j])
        rec = np.concatenate(rec)
        rel = float(np.linalg.norm(v - rec) / np.linalg.norm(v))
        expect[vid] = ("-".join(map(str, code)), int(np.floor(rel * 1e6)))

    rows = {r["vec_id"]: r for r in embedding_pq_codes(spark, sf_dir).collect()}
    assert set(rows) == set(expect)
    errs = []
    for vid, (code, err) in expect.items():
        assert rows[vid]["pq_code"] == code, vid
        assert abs(rows[vid]["rel_err_x1e6"] - err) <= 1, vid
        errs.append(err / 1e6)
    # 16 centroids per 4-dim-ish subspace must beat "no information":
    # random-unit-vector baseline error is ~sqrt(2); require well below
    assert 0 < sum(errs) / len(errs) < 0.9


def test_ivfpq_matches_ivf_recall(spark, sf_dir):
    """IVF-PQ's shortlist + exact re-rank must recover (essentially all
    of) plain IVF's recall: same cell pruning, and the top-k true
    neighbors inside the probed cells survive the PQ shortlist cut."""
    from clockpipe_spark.queries.similarity import (
        ann_ivf_topk,
        ann_ivfpq_topk,
        cosine_topk_brute,
    )

    def topk_sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    brute = topk_sets(cosine_topk_brute(spark, sf_dir))
    ivf = topk_sets(ann_ivf_topk(spark, sf_dir))
    pq = topk_sets(ann_ivfpq_topk(spark, sf_dir))
    total = sum(len(v) for v in brute.values())
    ivf_recall = sum(len(brute[q] & ivf.get(q, set())) for q in brute) / total
    pq_recall = sum(len(brute[q] & pq.get(q, set())) for q in brute) / total
    # allow at most one shortlist-cut miss across all queries
    assert pq_recall >= ivf_recall - 1.0 / total
    assert pq_recall >= 0.3


def test_kmeans_refine_distributed_matches_numpy(spark):
    """r21 internals pin: the mapInPandas partial-sum refine rounds must
    agree with a pure-numpy run of the same spherical Lloyd rounds on a
    synthetic corpus (same init, same assignment rule) to fp tolerance."""
    import numpy as np

    from clockpipe_spark.operators.vectors import kmeans_refine_distributed

    rng = np.random.RandomState(7)
    n, dim, k = 240, 8, 4
    X = rng.randn(n, dim).astype(np.float32)
    init = rng.randn(k, dim)
    init = init / np.linalg.norm(init, axis=1)[:, None]

    df = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(n)],
        "vec_id long, embedding array<float>",
    ).repartition(5)

    got = kmeans_refine_distributed(df, init.copy(), n_iter=2)

    # numpy reference of the same algorithm
    c = init.copy()
    for _ in range(2):
        Xn32 = X / np.maximum(np.linalg.norm(X, axis=1)[:, None], 1e-12)
        sims = Xn32 @ (c / np.maximum(np.linalg.norm(c, axis=1)[:, None], 1e-12)).T
        cells = np.argsort(-sims, axis=1)[:, 0]
        Xd = X.astype(np.float64)
        unit = Xd / np.maximum(np.sqrt((Xd * Xd).sum(axis=1)), 1e-12)[:, None]
        new_c = c.copy()
        for j in range(k):
            members = unit[cells == j]
            if len(members):
                m = members.mean(axis=0)
                new_c[j] = m / max(np.linalg.norm(m), 1e-12)
        c = new_c
    assert np.allclose(got, c, atol=1e-9), np.abs(got - c).max()
