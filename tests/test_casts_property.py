"""Property-based cast-quirk checks: the zero-default int/real casts
and bool parse over arbitrary strings, batched (one Spark job per
hypothesis example would be prohibitive — each example carries a LIST
of values through a single DataFrame)."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from clockpipe_spark.functions.casts import pg_bool_parse, pg_to_int, pg_to_real

_INT_RE = re.compile(r"^[+-]?[0-9]+$")

# mix of adversarial shapes: random text, numeric-ish strings, padded
_value = st.one_of(
    st.text(max_size=12),
    st.from_regex(r"[+-]?[0-9]{1,18}", fullmatch=True),
    st.from_regex(r" ?[+-]?[0-9]{1,6}(\.[0-9]{1,6})? ?", fullmatch=True),
    st.sampled_from(["t", "T", "1", "true", "TRUE", "false", "", " t", "2.5"]),
)


def _py_int(s: str) -> int:
    t = s.strip()
    return int(t) if _INT_RE.match(t) and len(t.lstrip("+-")) <= 19 else 0


def _py_real(s: str) -> float:
    # python float() accepts digit-group underscores ("1_000"); Spark's
    # double cast does not (verified: try_cast -> NULL -> 0.0 default).
    # "inf"/"Infinity"/"NaN" parse identically in both.
    if "_" in s:
        return 0.0
    try:
        return float(s)
    except ValueError:
        return 0.0


def _py_bool(s: str) -> bool:
    return s.lower() in ("t", "1", "true")


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_value, min_size=1, max_size=40))
def test_cast_quirks_match_reference_semantics(spark, values):
    # keep magnitudes within int64 so the python model matches the cast
    values = [v for v in values if not (_INT_RE.match(v.strip()) and abs(_py_int(v)) > 2**62)]
    if not values:
        values = ["0"]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)], "i long, s string")
    rows = df.select(
        "i",
        pg_to_int(F.col("s")).alias("as_int"),
        pg_to_real(F.col("s")).alias("as_real"),
        pg_bool_parse(F.col("s")).alias("as_bool"),
    ).collect()
    by_i = {r["i"]: r for r in rows}
    for i, v in enumerate(values):
        r = by_i[i]
        assert r["as_int"] == _py_int(v), repr(v)
        got, want = r["as_real"], _py_real(v)
        if want != want:  # NaN
            assert got != got
        else:
            assert abs(got - want) <= 1e-9 * max(1.0, abs(want)), repr(v)
        assert r["as_bool"] == _py_bool(v), repr(v)
