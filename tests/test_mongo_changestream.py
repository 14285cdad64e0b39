"""Mongo change-stream event decoding: reference-shaped event vectors
(pipes/mongodb.rs:353-417, adapter/mongodb.rs:169-305)."""

from __future__ import annotations

import json

from clockpipe_spark.cdc.mongo_changestream import (
    FileResumeTokenStore,
    decode_change_events,
    route_counts,
)


def _event(op, coll, key, doc=None):
    e = {
        "_id": {"_data": "8262E2..."},
        "operationType": op,
        "ns": {"db": "app", "coll": coll},
        "documentKey": json.dumps(key),
        "clusterTime": 7,
    }
    if doc is not None:
        e["fullDocument"] = json.dumps(doc)
    return json.dumps(e)


def _raw(spark, rows):
    return spark.createDataFrame(rows, "seq long, event_json string")


def test_decode_insert_update_delete(spark):
    rows = [
        (1, _event("insert", "users", {"_id": 1}, {"_id": 1, "name": "a"})),
        (2, _event("update", "users", {"_id": 1}, {"_id": 1, "name": "b"})),
        (3, _event("delete", "users", {"_id": 1})),
    ]
    got = {
        r["seq"]: r
        for r in decode_change_events(_raw(spark, rows), ["users"]).collect()
    }
    assert got[1]["op"] == "I" and json.loads(got[1]["doc_json"])["name"] == "a"
    # UpdateLookup: update arrives with the full post-image, same shape
    assert got[2]["op"] == "U" and json.loads(got[2]["doc_json"])["name"] == "b"
    # P6: delete keeps the key only
    assert got[3]["op"] == "D" and got[3]["doc_json"] is None
    assert json.loads(got[3]["key_json"]) == {"_id": 1}


def test_unhandled_ops_and_other_collections_dropped(spark):
    rows = [
        (1, _event("insert", "users", {"_id": 1}, {"_id": 1})),
        (2, _event("replace", "users", {"_id": 1}, {"_id": 1})),  # `_ => {}`
        (3, _event("invalidate", "users", {"_id": 1})),
        (4, _event("insert", "audit", {"_id": 9}, {"_id": 9})),  # P5 filter
    ]
    got = decode_change_events(_raw(spark, rows), ["users"]).collect()
    assert [r["seq"] for r in got] == [1]


def test_route_counts(spark):
    rows = [
        (1, _event("insert", "users", {"_id": 1}, {"_id": 1})),
        (2, _event("update", "users", {"_id": 1}, {"_id": 1})),
        (3, _event("update", "users", {"_id": 1}, {"_id": 1})),
        (4, _event("delete", "orders", {"_id": 2})),
    ]
    decoded = decode_change_events(_raw(spark, rows), ["users", "orders"])
    got = {r["collection"]: r for r in route_counts(decoded).collect()}
    assert (got["users"]["insert_count"], got["users"]["update_count"]) == (1, 2)
    assert got["orders"]["delete_count"] == 1


def test_resume_token_file_store(tmp_path):
    store = FileResumeTokenStore(str(tmp_path / "token.json"))
    assert store.load() is None  # missing file = start from beginning
    store.store({"_data": "8262AAAA"})
    assert store.load() == {"_data": "8262AAAA"}
    store.store({"_data": "8262BBBB"})  # atomic replace
    assert store.load() == {"_data": "8262BBBB"}
    assert not (tmp_path / "token.json.tmp").exists()
