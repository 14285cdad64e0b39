"""Property-based pgoutput codec checks: encode→decode round-trips for
random change sets (arbitrary unicode text cells, binary cells, NULLs,
TOAST markers, composite updates), plus decoder totality on random
prefixes of valid frames (truncation must raise, never mis-parse)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clockpipe_spark.cdc.pgoutput import (
    encode_delete,
    encode_insert,
    encode_truncate,
    encode_update,
    parse_pg_output,
)

# cells the wire format can carry: text (any unicode), binary, null
_cell = st.one_of(
    st.tuples(st.just("t"), st.text(max_size=40), st.none()),
    st.tuples(st.just("b"), st.none(), st.binary(max_size=40)),
    st.tuples(st.just("n"), st.none(), st.none()),
)
_cells = st.lists(_cell, min_size=1, max_size=8)


@settings(max_examples=200, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.integers(min_value=1, max_value=2**31 - 1), _cells)
def test_insert_round_trip(relid, cells):
    out = parse_pg_output(encode_insert(relid, cells))
    assert out["msg_type"] == "I"
    assert out["relation_id"] == relid
    assert out["cells"] == cells


@settings(max_examples=200, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.integers(min_value=1, max_value=2**31 - 1),
    _cells,
    _cells,
    st.sampled_from([b"K", b"O"]),
)
def test_update_with_old_tuple_round_trip(relid, old, new, old_marker):
    out = parse_pg_output(
        encode_update(relid, new, old_cells=old, old_marker=old_marker)
    )
    assert out["msg_type"] == "U"
    assert out["old_cells"] == old
    # TOAST resolution happens later (resolve_toast); raw decode keeps 'u'
    assert out["cells"] == new


@settings(max_examples=100, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.integers(min_value=1, max_value=2**31 - 1), _cells)
def test_delete_round_trip(relid, key):
    out = parse_pg_output(encode_delete(relid, key))
    assert out["msg_type"] == "D"
    assert out["cells"] == key


@settings(max_examples=100, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.integers(min_value=1, max_value=2**31 - 1), min_size=1, max_size=5))
def test_truncate_keeps_all_relids(relids):
    out = parse_pg_output(encode_truncate(relids))
    assert out["msg_type"] == "T"
    # divergence from the reference (pgoutput.rs:427-448 keeps only the
    # first): every relid survives so routed truncates reach all tables
    assert out["relation_id"] == relids[0]
    assert out["relation_ids"] == relids


@settings(max_examples=200, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.integers(min_value=1, max_value=2**31 - 1), _cells, st.data())
def test_truncated_frames_raise_not_misparse(relid, cells, data):
    frame = encode_insert(relid, cells)
    cut = data.draw(st.integers(min_value=1, max_value=len(frame) - 1))
    try:
        out = parse_pg_output(frame[:cut])
    except (ValueError, IndexError, Exception):
        return  # raising on truncation is the contract
    # the only acceptable non-raise: the truncated frame decodes to a
    # STRICT PREFIX with fewer cells — never invented or corrupted cells
    assert out is None or out["cells"] == cells[: len(out["cells"])]
