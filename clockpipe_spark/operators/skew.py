"""Skew-mitigation: salted broadcast-style join.

AQE's skew-join splitting (enabled in session.py) handles most cases at
runtime; explicit salting remains the tool when one key dominates so
heavily that even split partitions hot-spot, or when AQE is unavailable
(streaming foreachBatch plans). The salt must be deterministic (replay
safety) — derived by hashing a high-cardinality column, never random.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    salt_source: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join with the big side's hot keys spread over `n_salts` shards.

    big rows get salt = xxhash64(salt_source) mod n_salts (any roughly
    uniform, deterministic column); small rows are replicated once per
    salt value. The (key, salt) equi-join then spreads each hot key over
    n_salts reducers. Output rows are identical to a plain join.
    """
    src = salt_source or big.columns[0]
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(src)), F.lit(n_salts)).cast("int")
    )
    replicated_small = small.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)])),
    )
    joined = salted_big.join(replicated_small, [*on, "__salt"], how)
    return joined.drop("__salt")
