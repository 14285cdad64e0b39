"""Mongo change-stream EVENT decoder + file-backed resume token: the S6
depth layer — raw change-stream event documents decoded into changelog
rows, declaratively (from_json + projections, zero UDFs).

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

At 100 TB: the decode is one from_json projection — map-side, no
shuffle; the collection filter prunes before parsing the (larger)
fullDocument payload.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# change-stream event envelope (the subset the reference consumes)
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.StructType([T.StructField("_data", T.StringType())])),
        T.StructField("operationType", T.StringType()),
        T.StructField(
            "ns",
            T.StructType(
                [T.StructField("db", T.StringType()), T.StructField("coll", T.StringType())]
            ),
        ),
        T.StructField("documentKey", T.StringType()),  # kept as raw JSON
        T.StructField("fullDocument", T.StringType()),  # kept as raw JSON
        # raw text, not LongType: real change streams encode clusterTime
        # as a BSON Timestamp ({"$timestamp": ...}) in extended JSON, and
        # a long-typed field would silently read null there. Kept as the
        # unparsed token (same treatment as documentKey) until a consumer
        # needs the inner ordinal.
        T.StructField("clusterTime", T.StringType()),
    ]
)

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
    ev = raw.select(
        F.col(seq_col).alias("seq"),
        F.from_json(F.col(json_col), EVENT_SCHEMA).alias("e"),
    )
    op = _op_col(F.col("e.operationType"))
    return (
        ev.filter(F.col("e.ns.coll").isin(collections))
        .withColumn("op", op)
        .filter(F.col("op").isNotNull())  # `_ => {}`: replace/drop/... dropped
        .select(
            "seq",
            "op",
            F.col("e.ns.coll").alias("collection"),
            F.col("e.documentKey").alias("key_json"),
            # delete keeps the key only (P6): doc payload nulled
            F.when(F.col("op") != "D", F.col("e.fullDocument"))
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
