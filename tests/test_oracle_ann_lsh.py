"""Parity + precondition pins for the r11 ANN-LSH oracle
(similarity.ANN_LSH_SQL, built by _ann_lsh_sql).

The oracle's only cross-engine freedom is summation order inside the
hyperplane dot products (numpy SIMD/blocked vs DuckDB sequential),
which can flip a bucket bit only when |dot| is within accumulation
error of zero. These tests pin, on the REAL shipped embeddings:

- bucket-assignment agreement: the bucket ids DuckDB computes from the
  embedded plane literals equal the ones numpy computes with the
  operator's own planes, for every vector and table;
- the margin precondition: the smallest |dot| across corpus x planes is
  orders of magnitude above double-accumulation error, so the
  sign-agreement above is robust, not lucky.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = [d for d in ("sf0.001", "sf0.01")
       if os.path.isdir(f"/root/testdata/{d}")]

_N_TABLES, _N_BITS, _DIM, _SEED = 8, 4, 64, 42


def _numpy_buckets(emb: np.ndarray) -> np.ndarray:
    """(n, tables) bucket ids via the operator's exact expression
    (operators/vectors.multitable_lsh_bucketizer)."""
    planes = np.random.RandomState(_SEED).randn(_DIM, _N_TABLES * _N_BITS)
    bit_w = (1 << np.arange(_N_BITS)).astype(np.int64)
    bits = ((emb @ planes) >= 0).reshape(len(emb), _N_TABLES, _N_BITS)
    codes = bits @ bit_w
    return codes + ((np.arange(_N_TABLES, dtype=np.int64) + 1) << 32)


def _duckdb_buckets(sf: str) -> dict[tuple[int, int], int]:
    from clockpipe_spark.queries.similarity import _ann_lsh_sql

    sql = _ann_lsh_sql()
    # reuse the oracle's own CTE chain up to `buckets`
    prefix = sql.split("q AS")[0].rstrip().rstrip(",")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS "
        f"SELECT * FROM '/root/testdata/{sf}/embeddings.parquet'"
    )
    # the buckets CTE only projects (vec_id, bucket); the table index is
    # encoded in the id's high half — recover it as (bucket >> 32) - 1
    rows = con.execute(
        prefix + "\nSELECT vec_id, (bucket >> 32) - 1, bucket FROM buckets"
    ).fetchall()
    return {(vid, tb): b for vid, tb, b in rows}


@pytest.mark.parametrize("sf", SFS)
def test_bucket_assignment_cross_engine_equal(sf):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM "
        f"'/root/testdata/{sf}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    emb = np.array([r[1] for r in rows], dtype=np.float64)
    want = _numpy_buckets(emb)
    got = _duckdb_buckets(sf)
    for i, vid in enumerate(ids):
        for t in range(_N_TABLES):
            assert got[(vid, t)] == want[i, t], (vid, t)


@pytest.mark.parametrize("sf", SFS)
def test_dot_product_margin_precondition(sf):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT embedding FROM '/root/testdata/{sf}/embeddings.parquet'"
    ).fetchall()
    emb = np.array([r[0] for r in rows], dtype=np.float64)
    planes = np.random.RandomState(_SEED).randn(_DIM, _N_TABLES * _N_BITS)
    min_abs = np.abs(emb @ planes).min()
    # double accumulation error over 64 terms is ~1e-13 relative; demand
    # 6+ orders of margin so a sign flip would need the generator to
    # change, not the summation order
    assert min_abs > 1e-6, min_abs


def test_oracle_dim_matches_every_shipped_corpus():
    """ADVICE r11: _ann_lsh_sql hardcodes dim=64 in its plane literals
    while the Spark operator derives dim from the corpus parquet — a
    corpus with a different embedding dimension would silently break
    oracle parity. Pin the precondition on EVERY shipped sf dir (not
    just the two the parity tests sample), so a testdata regeneration
    with a new dim fails here loudly instead of hash-mismatching at the
    driver gate."""
    import glob

    from clockpipe_spark.queries.similarity import _corpus_meta

    sf_dirs = sorted(glob.glob("/root/testdata/sf*"))
    assert sf_dirs, "no shipped testdata found"
    for d in sf_dirs:
        _, dim = _corpus_meta(d)
        assert dim == _DIM, (
            f"{d}: embedding dim {dim} != oracle literal dim {_DIM}; "
            f"regenerate ANN_LSH_SQL via _ann_lsh_sql(dim={dim})"
        )
