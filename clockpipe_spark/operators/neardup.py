"""Approximate near-duplicate detection: MinHash-LSH and SimHash.

Two deliberately different execution styles:

- **MinHash** stays entirely JVM-side: shingle -> portable 32-bit hash
  (md5 prefix, see ``portable_hash32``) -> 32 universal hash functions
  ((a*h+b) mod p in 32-bit space so nothing overflows int64) -> per-doc
  min per function (one groupBy with 32 partial-agg mins) -> band hashes
  -> equi-join on (band, hash). At 100 TB this is the designed dedup
  path: cost is linear in corpus + candidate pairs, never all-pairs.

- **SimHash** runs in mapInPandas (Arrow batches): per-doc 64-bit
  signature from md5-derived token hashes (deterministic across runs,
  unlike Python's builtin hash). Bucketing on 16-bit signature chunks
  gives candidates; exact Hamming distance via bit_count(xor) filters.

Reference parity note: the reference has no near-dup operator — this is
SURVEY.md §2.10 north-star scope.
"""

from __future__ import annotations

import hashlib
import logging
import random
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_P32 = 4294967311  # smallest prime > 2^32
_MASK32 = (1 << 32) - 1

# Signature frames cached by banded_hamming_pairs, kept so long-lived
# sessions can release them: the cache manager dedupes by logical plan,
# so each DISTINCT caller/input accumulates one entry that otherwise
# lives until session end (ADVICE r11). Batch drivers and bench either
# call release_signature_caches() between workloads or use
# spark.catalog.clearCache() (which also drops these).
#
# Keyed by DataFrame.semanticHash() (ADVICE r12 #3): repeat executions
# of the SAME workload re-register a semantically identical frame that
# the JVM cache manager already dedupes — tracking it again would grow
# the list without bound AND, worse, any eviction-by-count scheme would
# unpersist the shared cache entry out from under the retained twin
# (measured: a plain FIFO cap made embedding_neardup_pairs 2.7x slower
# in-suite, because iso-block caches were evicted by OTHER queries'
# registrations before the headline trials re-used them). Size is
# therefore bounded by the number of DISTINCT signature workloads in
# the process, with _SIG_CACHE_CAP as a backstop for pathological
# callers. (df.is_cached is NOT usable as a liveness probe: in Spark 4
# it keeps reporting True after catalog.clearCache().)
_SIG_CACHES: dict[int, DataFrame] = {}

# Backstop bound on tracked DISTINCT signature frames; past it the
# oldest is dropped from the REGISTRY ONLY — not unpersisted (ADVICE
# r13 #4): semantically identical frames share one JVM cache entry, so
# an unpersist at the cap could yank a cache entry another live
# workload is still reusing mid-suite — the same hazard the measured
# FIFO-eviction rejection above describes, just deferred to the cap.
# The cost of skipping the unpersist: a process with > cap distinct
# workloads leaks those JVM cache entries until
# release_signature_caches() / spark.catalog.clearCache() / session
# end — the documented reclaim paths. Generous on purpose: the full
# bench suite holds ~a dozen distinct banded workloads.
_SIG_CACHE_CAP = 64


def release_signature_caches() -> int:
    """Unpersist every signature frame banded_hamming_pairs has cached
    in this process; returns how many were released."""
    n = len(_SIG_CACHES)
    for df in _SIG_CACHES.values():
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped
    _SIG_CACHES.clear()
    return n


def _register_sig_cache(df: DataFrame) -> None:
    """Track a cached signature frame so release_signature_caches() can
    drop it; dedupe by semantic hash (repeat workloads share one JVM
    cache entry — and one registry slot), FIFO-evict past the backstop
    cap so the registry cannot itself leak in long-lived processes."""
    try:
        key = df.semanticHash()
    except Exception:
        key = id(df)  # session quirk — still tracked, still releasable
    if key in _SIG_CACHES:
        return
    _SIG_CACHES[key] = df
    while len(_SIG_CACHES) > _SIG_CACHE_CAP:
        # registry-only eviction — deliberately NO unpersist (see the
        # _SIG_CACHE_CAP note: the shared JVM entry may still be hot).
        # The evicted entry's JVM cache memory is now reclaimable only
        # via release_signature_caches()/clearCache()/session end —
        # warn so the leak is visible (ADVICE r14 #3).
        _SIG_CACHES.pop(next(iter(_SIG_CACHES)))
        logging.getLogger(__name__).warning(
            "signature-cache registry cap (%d) hit: evicted an entry "
            "WITHOUT unpersisting; its JVM cache memory persists until "
            "release_signature_caches()/clearCache()/session end",
            _SIG_CACHE_CAP,
        )


def portable_hash32(col):
    """First 4 md5 bytes as a big-endian int in [0, 2^32).

    Chosen over ``xxhash64`` (the r1-r9 seed hash) because BOTH engines
    compute it natively — Spark ``conv(substring(md5(x),1,8),16,10)``,
    DuckDB ``CAST('0x'||substring(md5(x),1,8) AS BIGINT)`` — which is
    what makes the whole MinHash family oracle-pinnable at the driver
    gate (VERDICT r9 directive #3). md5 is a JVM codegen builtin like
    xxhash64; the swap trades a few ns/shingle map-side for a hash the
    oracle can replay bit-for-bit, and recall tests are seed-agnostic.
    """
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def portable_hash60(col):
    """First 15 md5 hex chars (60 bits) as a non-negative bigint — the
    band-key hash. 60 bits keeps the decimal rendering inside int64 for
    both engines (16 chars could exceed 2^63 and null out under ANSI
    casts); collision odds at 2^-60 per band pair are irrelevant next to
    the est-Jaccard verification that follows the band join."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _perm_params(n_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    # a, b < 2^31 so a*h32 + b < 2^63 — Spark runs ANSI mode and a long
    # overflow inside the agg would abort the job
    rng = random.Random(seed)
    return [
        (rng.randrange(1, 1 << 31), rng.randrange(0, 1 << 31))
        for _ in range(n_hashes)
    ]


def shingles_from_tokens(toks, k: int = 3):
    """Distinct k-word shingles from an already-materialized token array
    column. IMPORTANT: pass a real column reference, not the split()
    expression — Catalyst does not eliminate common subexpressions inside
    higher-order-function lambdas, so an inline split() re-tokenizes the
    document per element (O(tokens²) per doc, measured 10× slowdown)."""
    n = F.size(toks)
    sh = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(k)]),
    )
    return F.when(n >= k, F.array_distinct(sh)).otherwise(
        F.array().cast("array<string>")
    )


def shingle_tokens(text_col, k: int = 3):
    """Distinct k-word shingles (same tokenization as textops). Prefer
    tokenizing into a column first + shingles_from_tokens in hot paths."""
    return shingles_from_tokens(F.split(F.trim(F.lower(text_col)), r"\s+"), k)


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n_hashes: int = 32
) -> DataFrame:
    """(id, minhash array<long>[n_hashes]) — one shuffle (groupBy id).

    h32 = portable_hash32(shingle) < 2^32 keeps every (a*h+b) product
    under 2^63, so the universal-hash family runs in plain long
    arithmetic (and DuckDB replays it exactly — see DEDUP_MINHASH_SQL).
    """
    params = _perm_params(n_hashes)
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("toks"),
    )
    sh = toks.select("id", F.explode(shingles_from_tokens(F.col("toks"))).alias("shingle"))
    # h32 is projected as a COLUMN before the groupBy (VERDICT r11
    # directive #6): the 32 universal-hash mins then reference a long,
    # so single evaluation of the md5/conv chain per shingle is
    # structural — not dependent on codegen subexpression elimination
    # inside the aggregate. A/B at sf0.1 showed CSE was already doing
    # this (0.96 s vs 0.93 s sig-only, within noise); the projection
    # form also drops the shingle string before the partial agg.
    sh = sh.select("id", portable_hash32(F.col("shingle")).alias("h32"))
    # F.expr strings, not Column composition (r20): each Column operator
    # is a py4j round trip, and building these 32 aggregates
    # operator-by-operator measured 1.2 s of socket wait per plan build
    # (the bench times build+execute, and the streaming ingest rebuilds
    # this plan every micro-batch). One parse call per aggregate yields
    # the bit-identical expression tree (verified: optimizedPlan strings
    # match modulo expr ids).
    mins = [
        F.expr(f"min((h32 * {a}L + {b}L) % {_P32}L) AS m{i}")
        for i, (a, b) in enumerate(params)
    ]
    sig = sh.groupBy("id").agg(*mins)
    return sig.select(
        "id", F.array(*[f"m{i}" for i in range(n_hashes)]).alias("minhash")
    )


def band_hashes(sig: DataFrame, n_hashes: int = 32, n_bands: int = 8) -> DataFrame:
    """(id, band_idx, band_hash) rows from a minhash-signature frame —
    the LSH banding step, shared by the batch pair-miner and the
    cross-batch streaming filter. Payload-free: only the 3 columns
    travel through the candidate join."""
    rows_per_band = n_hashes // n_bands
    # one F.expr parse instead of ~n_hashes*4 py4j round trips (r20, same
    # rationale as the minhash_signatures aggregates — this builder also
    # runs per micro-batch in the streaming ingest). The string renders
    # exactly the old Column tree: struct(band_idx, portable_hash60(
    # concat_ws(',', CAST(element_at(minhash, i) AS STRING)...))).
    bands_sql = ", ".join(
        "struct({b} AS band_idx, CAST(conv(substring(md5(concat_ws(',', {cols})), 1, 15), 16, 10) AS BIGINT) AS band_hash)".format(
            b=band,
            cols=", ".join(
                f"CAST(element_at(minhash, {band * rows_per_band + r + 1}) AS STRING)"
                for r in range(rows_per_band)
            ),
        )
        for band in range(n_bands)
    )
    return sig.select(
        "id", F.expr(f"explode(array({bands_sql}))").alias("b")
    ).select("id", "b.band_idx", "b.band_hash")


def minhash_est_jaccard(ma, mb, n_hashes: int):
    """Signature-estimated Jaccard: matching-component fraction."""
    return (
        F.size(
            F.filter(
                F.zip_with(ma, mb, lambda x, y: (x == y).cast("int")),
                lambda eq: eq == 1,
            )
        )
        / F.lit(n_hashes)
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 32,
    n_bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Candidate pairs via banding + signature-estimated Jaccard filter.

    rows_per_band = n_hashes/n_bands; two docs collide if any band of
    their signatures matches exactly. est_jaccard = matching-component
    fraction of the full signatures (an unbiased Jaccard estimator).
    """
    rows_per_band = n_hashes // n_bands
    sig = minhash_signatures(docs, id_col, text_col, n_hashes).cache()
    _register_sig_cache(sig)  # same lifecycle as banded_hamming_pairs
    # bands carry only (id, band_idx, band_hash) — signatures are joined
    # back AFTER the candidate pairs are deduped, so the band self-join
    # never shuffles the 32-long arrays per duplicate candidate
    bands = band_hashes(sig, n_hashes, n_bands)

    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sa = sig.select(F.col("id").alias("doc_a"), F.col("minhash").alias("ma"))
    sb = sig.select(F.col("id").alias("doc_b"), F.col("minhash").alias("mb"))
    # No broadcast hint on the signature re-join: the signature table is
    # CORPUS-sized (one row per doc, ~n_hashes*8 bytes each), so a forced
    # broadcast is exactly the thing that stops working at 100 TB —
    # ~300 GB of signatures cannot ship to every executor. Left to AQE,
    # the cached sig frame's accurate runtime size still converts this to
    # a broadcast join at bench scale (verified in the dumped plan), and
    # at cluster scale it degrades gracefully to a shuffle join keyed on
    # doc id — the plan a 1B-doc corpus actually needs.
    scored = cand.join(sa, "doc_a").join(sb, "doc_b")
    est = minhash_est_jaccard(F.col("ma"), F.col("mb"), n_hashes)
    return (
        scored.withColumn("est", est)
        .filter(F.col("est") >= threshold)
        # floor-scaled like neardup_jaccard_pairs: est is k/n_hashes and
        # k*1e4/n_hashes lands exactly on .5 for odd k at n=32 — round()
        # ties flip between engines, floor never does (oracle precedent:
        # textops.NEARDUP_JACCARD_SQL).
        .select("doc_a", "doc_b", F.floor(F.col("est") * 1e4).alias("est_jaccard"))
    )


def simhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, simhash int64) via mapInPandas — Arrow batches, numpy bit math,
    md5-based token hashing for run-to-run determinism."""
    out_schema = f"{id_col} long, simhash long"

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bit_weights = 1 << np.arange(64, dtype=np.uint64)
        # token-hash memo: md5 cost is paid once per DISTINCT token per
        # worker, not once per (doc, token) occurrence
        memo: dict[str, np.ndarray] = {}

        def token_bits(t: str) -> np.ndarray:
            cached = memo.get(t)
            if cached is None:
                h = int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
                cached = np.where((h & bit_weights) != 0, 1, -1).astype(np.int64)
                memo[t] = cached
            return cached

        for pdf in batches:
            sigs = np.zeros(len(pdf), dtype=np.int64)
            for row_i, text in enumerate(pdf[text_col].astype(str)):
                toks = set(text.strip().lower().split())
                if not toks:
                    continue
                acc = np.zeros(64, dtype=np.int64)
                for t in toks:
                    acc += token_bits(t)
                sig = (bit_weights[acc > 0]).sum(dtype=np.uint64)
                sigs[row_i] = np.int64(sig)
            yield pd.DataFrame({id_col: pdf[id_col].values, "simhash": sigs})

    return docs.select(id_col, text_col).mapInPandas(compute, out_schema)


def banded_hamming_pairs(
    sig: DataFrame,
    id_col: str,
    sig_col: str,
    max_hamming: int = 2,
) -> DataFrame:
    """Generic 64-bit-signature near-dup pair join: candidates share any
    16-bit chunk (pigeonhole-complete for max_hamming <= 3: 4 bits of
    difference cannot dirty all 4 chunks), verified by exact Hamming
    distance (bit_count of xor). The shuffle key is the (chunk_idx,
    chunk) pair — payload-free banding, same economics as the MinHash
    band join. Shared by text SimHash and image dHash callers."""
    if max_hamming > 3:
        raise ValueError(
            f"4x16-bit banding only guarantees recall for max_hamming <= 3, "
            f"got {max_hamming}"
        )
    # cache the signature frame before the self-join: the plan
    # references it twice and (when the join broadcasts) neither side
    # carries an exchange to reuse, so an unprotected sig runs its
    # producer twice — for the image-dHash caller that producer is the
    # whole mapInPandas decode chain (its plan held two full
    # MapInPandas stacks). cache() over localCheckpoint deliberately:
    # the cache manager dedupes by logical plan, so the one
    # materialization also serves repeat executions of the same query
    # (the r1-r10 simhash behavior, now uniform for every caller). The
    # frame is (id, 64-bit sig) — corpus-row-count narrow rows, the
    # cheap thing to persist at any scale next to re-decoding payloads.
    # Lifecycle: registered in _SIG_CACHES so release_signature_caches()
    # can drop it; otherwise it lives until clearCache()/session end.
    sig = sig.select(id_col, sig_col).cache()
    _register_sig_cache(sig)
    chunks = sig.select(
        F.col(id_col).alias("id"),
        F.col(sig_col).alias("sig"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk_idx"),
                        F.shiftright(sig_col, c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("c"),
    ).select("id", "sig", "c.chunk_idx", "c.chunk")
    a, b = chunks.alias("a"), chunks.alias("b")
    hamming = F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig")))
    return (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("doc_a"),
            F.col("b.id").alias("doc_b"),
            # long, not int: the driver's dtype-strict compare hashes
            # against DuckDB bit_count output cast to BIGINT
            hamming.cast("long").alias("hamming"),
        )
        # verify BEFORE dedup: the Hamming filter is a codegen'd popcount
        # over columns already in hand, while dropDuplicates is a shuffle
        # — filtering first shrinks that exchange by the candidate
        # false-positive factor (multi-chunk matches re-enter it anyway,
        # but never non-matches)
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["doc_a", "doc_b"])
    )


def simhash_neardup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 2,
) -> DataFrame:
    """Candidate pairs: docs sharing any 16-bit signature chunk; verified
    by exact Hamming distance (bit_count of xor) <= max_hamming.

    No .cache() here since r11: banded_hamming_pairs caches the
    signature frame itself (uniform protection for every caller)."""
    sig = simhash_signatures(docs, id_col, text_col)
    return banded_hamming_pairs(sig, id_col, "simhash", max_hamming)
