"""Mongo change-stream EVENT decoder + file-backed resume token: the S6
depth layer — raw change-stream event documents decoded into changelog
rows, declaratively (json_tuple + projections, zero UDFs).

Mirrors the reference's change-stream consumption
(adapter/mongodb.rs:169-257, pipes/mongodb.rs:353-417):

- events carry operationType / documentKey / fullDocument / ns; the
  watch runs with fullDocument=UpdateLookup (mongodb.rs:180) so updates
  arrive with the complete post-image — which is why Insert and Update
  both route to the upsert queue with the SAME row shape
  (pipes/mongodb.rs:359-390).
- Delete events carry only documentKey; the delete row keeps the key
  alone (P6 parity — pipes/mongodb.rs:392-407 builds the copy row from
  the keyless default).
- any other operationType (replace, invalidate, drop, rename) is
  DROPPED — the reference's match arm is `_ => {}`
  (pipes/mongodb.rs:412). A deliberate parity quirk: a real `replace`
  loses data there; we reproduce the behavior and document it rather
  than silently fixing semantics.
- events for non-configured collections are filtered out
  (adapter/mongodb.rs:233-240, the P5 collection filter).
- the resume token persists to a FILE between peeks
  (ResumeTokenStorage::File, adapter/mongodb.rs:259-305); the harness
  analog of `start_after(token)` is the seq > token predicate pushed
  into the event scan.

At 100 TB: the decode is one json_tuple generator projection —
map-side, no shuffle, one envelope parse per event.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
# The change-stream envelope fields the reference consumes (decode uses
# json_tuple — one parse per event; a from_json struct re-parses once
# per downstream field reference after projection collapse, measured 6x
# at sf0.1): _id._data (resume token), operationType, ns.db/coll,
# documentKey + fullDocument (kept as raw JSON — a consumer parses the
# payload it needs), clusterTime (raw extended-JSON token: a long-typed
# read would silently null on real streams' {"$timestamp": ...}).

_OP_MAP = {"insert": "I", "update": "U", "delete": "D"}


def _op_col(op: Column) -> Column:
    expr = F.lit(None).cast("string")
    for raw, mapped in reversed(_OP_MAP.items()):
        expr = F.when(op == raw, F.lit(mapped)).otherwise(expr)
    return expr


def decode_change_events(
    raw: DataFrame,
    collections: list[str],
    json_col: str = "event_json",
    seq_col: str = "seq",
) -> DataFrame:
    """(seq, event_json) -> (seq, op, collection, key_json, doc_json).

    Insert/Update rows carry the fullDocument post-image (UpdateLookup
    contract); Delete rows carry documentKey only. Unhandled operation
    types and non-configured collections are dropped, as the reference
    does."""
    # json_tuple, not from_json (r14): Catalyst collapses the
    # projections so a from_json struct re-parses the envelope once
    # PER FIELD REFERENCE downstream (4 field reads + 2 filter reads
    # measured 3.0 s vs 0.5 s at sf0.1 — a 6x re-parse). json_tuple is
    # a generator: one parse, fields emitted as plain columns that
    # every later reference reuses. ns is nested, so its coll comes
    # from a second parse of the (tiny) ns object only.
    ev = raw.select(
        F.col(seq_col).alias("seq"),
        F.json_tuple(
            F.col(json_col), "operationType", "ns", "documentKey", "fullDocument"
        ).alias("op_raw", "ns_json", "key_json", "doc_json"),
    )
    op = _op_col(F.col("op_raw"))
    return (
        ev.withColumn(
            "collection", F.get_json_object("ns_json", "$.coll")
        )
        .filter(F.col("collection").isin(collections))
        .withColumn("op", op)
        .filter(F.col("op").isNotNull())  # `_ => {}`: replace/drop/... dropped
        .select(
            "seq",
            "op",
            "collection",
            "key_json",
            # delete keeps the key only (P6): doc payload nulled
            F.when(F.col("op") != "D", F.col("doc_json"))
            .otherwise(F.lit(None).cast("string"))
            .alias("doc_json"),
        )
    )


def route_counts(decoded: DataFrame) -> DataFrame:
    """WriteCounter parity (pipes/mongodb.rs:382-410): per collection,
    inserted / updated / deleted counts in one partial-aggregated pass."""
    return decoded.groupBy("collection").agg(
        F.sum(F.when(F.col("op") == "I", 1).otherwise(0)).alias("insert_count"),
        F.sum(F.when(F.col("op") == "U", 1).otherwise(0)).alias("update_count"),
        F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("delete_count"),
    )


class FileResumeTokenStore:
    """ResumeTokenStorage::File (adapter/mongodb.rs:259-305): the resume
    token survives process restarts in a JSON file; missing file = start
    from the beginning. Writes are atomic (tmp + rename) so a crash
    mid-store leaves the previous token readable."""

    def __init__(self, path: str):
        self.path = path

    def load(self):
        if not os.path.exists(self.path):
            return None
        with open(self.path) as f:
            return json.load(f)

    def store(self, token) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(token, f)
        os.replace(tmp, self.path)
