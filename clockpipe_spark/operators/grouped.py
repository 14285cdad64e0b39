"""Grouped-map (applyInPandas) and custom stateful streaming
(applyInPandasWithState) operators — the remaining pandas-UDF surfaces
(SURVEY.md §2.10 'UDF surface').

Both are deliberately verifiable: the grouped-map z-score has an exact
SQL-window twin (the DuckDB oracle), and the stateful counter is
compared against a batch groupBy — so the surfaces are exercised with
checked semantics, not just demonstrated.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def zscore_per_group(
    df: DataFrame, group_col: str, value_col: str, id_col: str
) -> DataFrame:
    """Per-group z-score via applyInPandas (grouped map): each group's
    Arrow batch is normalized in pandas. ddof=1 (sample stddev) to match
    SQL stddev_samp. Single-value groups -> NULL (stddev undefined).

    The explicit-count repartition on the group key is load-bearing
    (r16): AQE's BYTE-based partition coalescing collapsed the grouped
    exchange to ONE post-shuffle partition at bench scale — bytes are
    tiny but the stage's cost is one Python call PER GROUP, so every
    group ran serially in a single worker (measured 3.5 s; 0.95 s
    32-way). REPARTITION_BY_NUM is exempt from AQE coalescing and
    already satisfies the grouping distribution, so no second exchange
    is added. The same rule as operators/fanout.py: when per-ROW (or
    per-GROUP) Python cost dominates bytes, pin the parallelism."""
    schema = f"{id_col} long, {group_col} string, z double"

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf[value_col].std(ddof=1)
        mean = pdf[value_col].mean()
        z = (pdf[value_col] - mean) / std if std and std > 0 else pd.Series(
            [None] * len(pdf), dtype="float64"
        )
        return pd.DataFrame(
            {id_col: pdf[id_col], group_col: pdf[group_col], "z": z.round(6)}
        )

    n_part = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    return (
        df.select(id_col, group_col, value_col)
        .repartition(n_part, group_col)
        .groupBy(group_col)
        .applyInPandas(normalize, schema)
    )


# output: one row per (user) per batch with the running totals so far
_STATE_SCHEMA = "n long, total double"
_OUT_SCHEMA = "user_id long, n long, total double"


def running_totals_stateful(events_stream: DataFrame) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user
    running event count + value sum carried in GroupState across
    micro-batches. Processing-time timeout is off — state lives for the
    query (bounded key space: users)."""

    def update(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [user_id], "n": [n], "total": [round(total, 6)]}
        )

    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
