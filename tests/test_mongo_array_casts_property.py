"""Property-based checks for the BSON typed-ARRAY cast arms
(mongo_array_int / mongo_array_double / mongo_array_string /
mongo_string_array, mongodb.rs:449-494) — the r17 extension of the
r16 scalar-cast fuzz discipline (tests/test_casts_property.py) to the
array arms, which until now carried only fixed vectors plus the
fixture-input oracle row (cdc_mongo_bson_casts, driver-r14).

The audit that motivated this found a LATENT oracle divergence the
fixture inputs could never reach: CDC_BSON_CASTS_SQL's arr_int arm
used a plain ``CAST(x AS BIGINT)`` under the integral regex, which
ABORTS DuckDB on a 19+-digit overflow string where the engine (and the
reference's as_i64().map_or("0", ..)) zero-defaults.  The arm now uses
``COALESCE(TRY_CAST(x AS BIGINT), 0)`` and this fuzz pins
engine == model == oracle-arm over adversarial elements, including the
corners probed live: DuckDB TRY_CAST BIGINT overflow -> NULL, huge
double literals saturate to inf in BOTH engines ('1e999' -> Infinity),
and sub-denormal exponents underflow to 0.0 in both.

Batched like the scalar fuzz: each hypothesis example carries a LIST
of elements through one DataFrame (one Spark job per example would be
prohibitive).
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from clockpipe_spark.functions.casts import (
    _DBL_RE as _DBL_PAT,
    mongo_array_double,
    mongo_array_int,
    mongo_array_string,
    mongo_string_array,
)

_INT_RE = re.compile(r"^[+-]?[0-9]+$")
_DBL_RE = re.compile(_DBL_PAT)

# adversarial elements: junk text, padded numerics, i64-boundary and
# overflow digit strings, huge/tiny double literals, NULLs, and the
# NaN/inf spellings the scalar fix cared about (the array double
# grammar REJECTS them -> 0.0; the fuzz proves all three sides agree)
_element = st.one_of(
    st.none(),
    st.text(max_size=10),
    st.from_regex(r"[+-]?[0-9]{1,24}", fullmatch=True),
    st.sampled_from(
        [
            "9223372036854775807",
            "9223372036854775808",            # i64 max + 1
            "-9223372036854775808",
            "-9223372036854775809",           # i64 min - 1
            "99999999999999999999",           # 20-digit overflow
            "2.5",
            " 2.5",                            # padded -> rejected
            "1e999",                           # saturates to inf
            "-1e999",
            ".5e-999",                         # underflows to 0.0
            "nan",
            "-nan",
            "inf",                             # no inf in _DBL_RE -> 0.0
            "",
            "x",
        ]
    ),
)


def _model_int(el: str | None) -> int:
    if el is None or not _INT_RE.match(el):
        return 0
    v = int(el)
    # i64 overflow is a parse Err in Rust -> the zero default
    return v if -(2**63) <= v < 2**63 else 0


def _model_double(el: str | None) -> float:
    if el is None or not _DBL_RE.match(el):
        return 0.0
    # Python float() on a plain decimal literal matches Rust
    # f64::from_str on the same grammar, incl. inf saturation
    return float(el)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.lists(_element, max_size=8), min_size=1, max_size=20))
def test_array_cast_arms_match_reference_models(spark, arrays):
    df = spark.createDataFrame(
        [(i, a) for i, a in enumerate(arrays)], "i long, arr array<string>"
    )
    rows = {
        r["i"]: r
        for r in df.select(
            "i",
            mongo_array_int(F.col("arr")).alias("ints"),
            mongo_array_double(F.col("arr")).alias("dbls"),
            mongo_array_string(F.col("arr")).alias("strs"),
            mongo_string_array(F.col("arr")).alias("filtered"),
        ).collect()
    }
    for i, a in enumerate(arrays):
        r = rows[i]
        assert r["ints"] == [_model_int(e) for e in a], a
        want_d = [_model_double(e) for e in a]
        for got, want in zip(r["dbls"], want_d, strict=True):
            if want != want:  # NaN (unreachable: grammar rejects) — guard
                assert got != got
            elif want in (float("inf"), float("-inf")) or want == 0:
                assert got == want, a
            else:
                assert abs(got - want) <= 1e-9 * abs(want), a
        assert r["strs"] == [e if e is not None else " " for e in a], a
        assert r["filtered"] == [e for e in a if e is not None], a


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_element, min_size=1, max_size=30))
def test_array_cast_arms_match_duckdb_oracle_arms(spark, elements):
    """Engine vs the ORACLE's own per-element SQL arms from
    CDC_BSON_CASTS_SQL — fuzzed over elements the fixture inputs never
    produce (overflow digits, saturating literals, NULLs)."""
    import duckdb

    df = spark.createDataFrame(
        [(i, [e]) for i, e in enumerate(elements)], "i long, arr array<string>"
    )
    got = {
        r["i"]: (r["ints"][0], r["dbls"][0])
        for r in df.select(
            "i",
            mongo_array_int(F.col("arr")).alias("ints"),
            mongo_array_double(F.col("arr")).alias("dbls"),
        ).collect()
    }
    con = duckdb.connect()
    for i, e in enumerate(elements):
        oi = con.execute(
            "SELECT CASE WHEN regexp_matches(?, '^[+-]?[0-9]+$') "
            "THEN COALESCE(TRY_CAST(? AS BIGINT), 0) ELSE 0 END",
            [e, e],
        ).fetchone()[0]
        od = con.execute(
            "SELECT CASE WHEN regexp_matches(?, ?) "
            "THEN CAST(? AS DOUBLE) ELSE 0.0 END",
            [e, _DBL_PAT, e],
        ).fetchone()[0]
        # NULL element: regexp_matches(NULL) is NULL -> CASE else-arm 0
        assert got[i][0] == (oi if oi is not None else 0), repr(e)
        g = got[i][1]
        od = od if od is not None else 0.0
        if od in (float("inf"), float("-inf")) or od == 0:
            assert g == od, repr(e)
        else:
            assert abs(g - od) <= 1e-9 * abs(od), repr(e)
