"""Property-based change-stream decoding: random event batches (mixed
op types incl. unhandled ones, mixed collections, unicode keys/docs)
against a pure-Python model of the decode contract — op mapping, the
`_ => {}` drop quirk, collection filtering, delete-keeps-key-only."""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clockpipe_spark.cdc.mongo_changestream import decode_change_events

_OPS = ["insert", "update", "delete", "replace", "drop", "invalidate"]
_COLLS = ["users", "orders", "ignored"]
_CONFIGURED = ["users", "orders"]
_OP_MAP = {"insert": "I", "update": "U", "delete": "D"}


@st.composite
def event_batches(draw):
    n = draw(st.integers(min_value=1, max_value=20))
    events = []
    for seq in range(n):
        op = draw(st.sampled_from(_OPS))
        coll = draw(st.sampled_from(_COLLS))
        key = {"_id": draw(st.text(max_size=8))}
        doc = {"_id": key["_id"], "v": draw(st.integers(0, 999))}
        ev = {
            "operationType": op,
            "ns": {"db": "app", "coll": coll},
            "documentKey": json.dumps(key),
        }
        if op in ("insert", "update", "replace"):
            ev["fullDocument"] = json.dumps(doc)
        events.append((seq, json.dumps(ev)))
    return events


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(event_batches())
def test_decode_matches_contract_model(spark, events):
    raw = spark.createDataFrame(events, "seq long, event_json string")
    got = {
        r["seq"]: (r["op"], r["collection"], r["key_json"], r["doc_json"])
        for r in decode_change_events(raw, _CONFIGURED).collect()
    }
    expect = {}
    for seq, ev_json in events:
        ev = json.loads(ev_json)
        op = _OP_MAP.get(ev["operationType"])
        if op is None:  # `_ => {}` quirk: unhandled ops dropped
            continue
        if ev["ns"]["coll"] not in _CONFIGURED:  # P5 filter
            continue
        doc = None if op == "D" else ev.get("fullDocument")  # P6 shaping
        expect[seq] = (op, ev["ns"]["coll"], ev["documentKey"], doc)
    assert got == expect
