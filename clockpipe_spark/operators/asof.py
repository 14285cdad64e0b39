"""As-of join: for each left row, the most recent right row at-or-before
its timestamp, per key — the canonical time-series lookup Spark lacks as
a built-in.

Spark-first implementation: instead of a non-equi join (which Catalyst
would execute as a broadcast-nested-loop), union the two sides and run
one window pass — ``last(right_value, ignorenulls)`` over an
unbounded-preceding frame ordered by event time with right rows sorting
FIRST on ties (>= semantics, matching DuckDB/QuestDB ASOF JOIN). Cost:
one shuffle on the key, O(n log n) per key — scales linearly with the
union size instead of |L|×|R| per key.
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
) -> DataFrame:
    """Left as-of join: every left row gains ``<value_col><suffix>`` =
    that column from the latest right row with right.on <= left.on and
    equal `by` keys (NULL if none).

    Both inputs must share the `by` and `on` column names; `value_cols`
    are right-side payload columns (absent from left or ignored there).
    """
    by = list(by)
    lcols = left.columns
    l_tagged = left.select(
        *by,
        F.col(on),
        F.lit(1).alias("__side"),  # left rows sort AFTER right rows on ties
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
        F.struct(*[F.col(c) for c in lcols]).alias("__l"),
    )
    r_tagged = right.select(
        *by,
        F.col(on),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.lit(None).cast(
            l_tagged.schema["__l"].dataType
        ).alias("__l"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "__side",
        "__l",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__r_{c}")
            for c in value_cols
        ],
    )
    out = carried.filter(F.col("__side") == 1).select(
        *[F.col("__l").getField(c).alias(c) for c in lcols],
        *[F.col(f"__r_{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
    return out
