"""clockpipe_spark — a PySpark-native analytics + CDC-replication engine.

Re-expresses the capabilities of the reference CDC pipeline
(myyrakle/clockpipe: Postgres/MongoDB -> ClickHouse replication) as an
idiomatic Spark engine:

- batch snapshot + change-log upsert semantics (``clockpipe_spark.cdc``)
- the full relational query surface the replica delivers
  (``clockpipe_spark.queries``)
- Structured Streaming continuous sync (``clockpipe_spark.streaming``)
- large-scale training-data operators: dedup, similarity search, text
  analysis, multimodal plumbing (``clockpipe_spark.operators``)

Everything is DataFrame/SQL-first so Catalyst handles pushdown, pruning,
join planning and whole-stage codegen; Python UDFs appear only where the
semantics genuinely cannot be expressed with built-ins, and then always as
Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"

from clockpipe_spark.session import get_spark  # noqa: F401
