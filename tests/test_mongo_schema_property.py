"""Property-based first-type-wins schema inference: random document
streams (mixed types per field, nulls, missing fields, non-dict rows)
against a pure-Python model of the reference's contract — first
observation types the column, null-first fields are skipped, order is
first appearance, later conflicts coerce to zero values."""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clockpipe_spark.cdc.mongo_schema import (
    infer_first_type_wins,
    project_collection,
)

_FIELDS = ["a", "b", "c"]
_VALUES = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-1000, max_value=1000),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(max_size=6),
)


@st.composite
def doc_streams(draw):
    n = draw(st.integers(min_value=1, max_value=15))
    rows = []
    for seq in range(1, n + 1):
        doc = {
            f: draw(_VALUES)
            for f in _FIELDS
            if draw(st.booleans())
        }
        rows.append((seq, json.dumps(doc)))
    return rows


def _jtype(v):
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "float"
    return "str"


_SPARK = {"str": "string", "bool": "boolean", "int": "bigint", "float": "double"}


def _py_infer(rows):
    first: dict[str, tuple[int, str]] = {}
    for seq, raw in rows:
        for k, v in json.loads(raw).items():
            if k not in first:
                first[k] = (seq, _jtype(v))
    out = [
        (k, _SPARK[jt], seq)
        for k, (seq, jt) in first.items()
        if jt != "null"  # null-first fields skipped (Unknown type)
    ]
    return sorted(out, key=lambda t: t[2])


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(doc_streams())
def test_first_type_wins_matches_model(spark, rows):
    docs = spark.createDataFrame(rows, "seq long, props string")
    got = infer_first_type_wins(docs)
    assert got == _py_infer(rows)
    # projection honors the inferred schema: ints under a string-typed
    # column render as strings; strings under an int column coerce to 0
    projected = project_collection(docs, got).collect()
    schema = {f: t for f, t, _ in got}
    for r in projected:
        doc = json.loads(r["props"])
        for f, t in schema.items():
            v = doc.get(f)
            if v is None:
                assert r[f] is None, (f, v)
            elif t == "bigint" and _jtype(v) not in ("int", "bool"):
                # bool coerces ('true'->cast fails->0); float strings too
                assert isinstance(r[f], int), (f, v)
