"""Query registry: every implemented operator surfaces here as a
(name -> callable(spark, sf_dir) -> DataFrame) plus, where ANSI-SQL can
express the same semantics, a DuckDB oracle string.

Modules contribute QUERIES / ORACLES dicts; this package aggregates them
for ``__spark_entry__.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from clockpipe_spark.queries import approximate as _approximate
from clockpipe_spark.queries import cdc as _cdc
from clockpipe_spark.queries import llmprep as _llmprep
from clockpipe_spark.queries import llmprep2 as _llmprep2
from clockpipe_spark.queries import relational as _relational
from clockpipe_spark.queries import relational2 as _relational2
from clockpipe_spark.queries import relational3 as _relational3
from clockpipe_spark.queries import similarity as _similarity
from clockpipe_spark.queries import streamlike as _streamlike
from clockpipe_spark.queries import textops as _textops
from clockpipe_spark.queries import timeseries as _timeseries
from clockpipe_spark.queries import textops2 as _textops2

_MODULES = (
    _relational,
    _relational2,
    _relational3,
    _timeseries,
    _cdc,
    _textops,
    _textops2,
    _similarity,
    _streamlike,
    _approximate,
    _llmprep,
    _llmprep2,
)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    unknown = out.keys() - all_queries().keys()
    if unknown:
        raise ValueError(f"oracles without queries: {unknown}")
    return out
