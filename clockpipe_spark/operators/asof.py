"""As-of join: for each left row, the most recent right row at-or-before
(backward) or the earliest right row at-or-after (forward) its
timestamp, per key — the canonical time-series lookup Spark lacks as a
built-in, with an optional match tolerance.

Spark-first implementation: instead of a non-equi join (which Catalyst
would execute as a broadcast-nested-loop), union the two sides and run
one window pass — ``last(right_value, ignorenulls)`` over an
unbounded-preceding frame (backward) or ``first(...)`` over an
unbounded-following frame (forward), ordered by event time with right
rows sorting toward the left row on ties (>= / <= semantics, matching
DuckDB/QuestDB ASOF JOIN). Cost: one shuffle on the key, O(n log n)
per key — scales linearly with the union size instead of |L|×|R| per
key.

Tolerance is exact: the nearest matching right row IS the carried one
(any other candidate is strictly farther), so nulling carried values
when the carried gap exceeds the tolerance equals re-running the join
with the tolerance folded into the predicate — no second pass needed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    on: str,
    value_cols: Sequence[str],
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> DataFrame:
    """Left as-of join: every left row gains ``<value_col><suffix>`` =
    that column from the latest right row with right.on <= left.on
    (direction="backward") or the earliest right row with
    right.on >= left.on (direction="forward") and equal `by` keys
    (NULL if none).

    Both inputs must share the `by` and `on` column names; `value_cols`
    are right-side payload columns (absent from left or ignored there).
    With ``tolerance_us`` set (requires a timestamp `on`), matches
    farther than that many microseconds from the left row are nulled.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by = list(by)
    lcols = left.columns
    # ties: the right row must fall inside the left row's window frame,
    # so right sorts FIRST for backward (preceding frame) and LAST-but-
    # adjacent for forward (following frame) — i.e. left first.
    l_side, r_side = (1, 0) if direction == "backward" else (0, 1)
    on_type = right.schema[on].dataType
    l_tagged = left.select(
        *by,
        F.col(on),
        F.lit(l_side).alias("__side"),
        F.lit(None).cast(on_type).alias("__r_on"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
        F.struct(*[F.col(c) for c in lcols]).alias("__l"),
    )
    r_tagged = right.select(
        *by,
        F.col(on),
        F.lit(r_side).alias("__side"),
        F.col(on).alias("__r_on"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.lit(None).cast(
            l_tagged.schema["__l"].dataType
        ).alias("__l"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    base = Window.partitionBy(*by).orderBy(F.col(on).asc(), F.col("__side").asc())
    if direction == "backward":
        w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        carry = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        carry = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731
    carried = unioned.select(
        "__side",
        "__l",
        carry("__r_on").alias("__r_on"),
        *[carry(f"__r_{c}").alias(f"__r_{c}") for c in value_cols],
    )
    picked = carried.filter(F.col("__side") == F.lit(l_side))
    if tolerance_us is not None:
        l_on = F.unix_micros(F.col("__l").getField(on))
        r_on = F.unix_micros(F.col("__r_on"))
        gap = (l_on - r_on) if direction == "backward" else (r_on - l_on)
        in_tol = F.col("__r_on").isNotNull() & (gap <= F.lit(int(tolerance_us)))
        picked = picked.select(
            "__l",
            *[
                F.when(in_tol, F.col(f"__r_{c}")).alias(f"__r_{c}")
                for c in value_cols
            ],
        )
    return picked.select(
        *[F.col("__l").getField(c).alias(c) for c in lcols],
        *[F.col(f"__r_{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
