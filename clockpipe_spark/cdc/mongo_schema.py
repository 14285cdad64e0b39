"""MongoDB-style dynamic schema handling (SURVEY.md §1.2 regime 2).

The reference infers each ClickHouse column type from the FIRST observed
BSON value of that field (MongoDBColumn::to_clickhouse_type,
adapter/mongodb.rs:523-559), appends columns as new fields appear, and
never widens: later values of a conflicting type are coerced or zeroed
(docs/mongodb/README.md:12-14). Null/Undefined-typed fields are skipped
entirely (pipes/mongodb.rs:615-627).

Spark-native embodiment over a JSON-string column:
- ``infer_first_type_wins``: one distributed pass (mapInPandas) emitting
  (order, field, jtype); a min_by aggregation picks each field's first
  observation. Column order = first-seen order (append-only evolution).
- ``project_collection``: pure projection applying the inferred schema
  with the reference's coercion rules: missing field -> NULL, present
  but unparsable -> type's zero value (matches §1.3 cast quirks).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# BSON-ish JSON type -> Spark type (mirrors adapter/mongodb.rs:523-559,
# collapsed to JSON's type universe)
_JSON_TO_SPARK = {
    "str": "string",
    "bool": "boolean",
    "int": "bigint",
    "float": "double",
}


def infer_first_type_wins(
    docs: DataFrame, json_col: str = "props", order_col: str = "seq"
) -> list[tuple[str, str, int]]:
    """Returns [(field, spark_type, first_seen_order)] sorted by first
    appearance. Fields whose first value is null are skipped (Unknown
    type, pipes/mongodb.rs:615-627)."""

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            orders, fields, jtypes = [], [], []
            for order, raw in zip(pdf[order_col], pdf[json_col]):
                try:
                    doc = json.loads(raw) if raw else {}
                except (TypeError, ValueError):
                    continue
                if not isinstance(doc, dict):
                    continue
                for k, v in doc.items():
                    # bool before int: bool is an int subclass in Python
                    if v is None:
                        jt = "null"
                    elif isinstance(v, bool):
                        jt = "bool"
                    elif isinstance(v, int):
                        jt = "int"
                    elif isinstance(v, float):
                        jt = "float"
                    else:
                        jt = "str"
                    orders.append(order)
                    fields.append(k)
                    jtypes.append(jt)
            yield pd.DataFrame(
                {"order": orders, "field": fields, "jtype": jtypes}
            )

    observed = docs.select(order_col, json_col).mapInPandas(
        scan, "order long, field string, jtype string"
    )
    firsts = (
        observed.groupBy("field")
        .agg(
            F.min("order").alias("first_order"),
            F.min_by("jtype", "order").alias("first_type"),
        )
        .orderBy("first_order")
        .collect()
    )
    return [
        (r["field"], _JSON_TO_SPARK[r["first_type"]], r["first_order"])
        for r in firsts
        if r["first_type"] in _JSON_TO_SPARK  # null-typed fields skipped
    ]


def project_collection(
    docs: DataFrame, schema: list[tuple[str, str, int]], json_col: str = "props"
) -> DataFrame:
    """Apply an inferred schema: typed columns extracted from the JSON,
    missing -> NULL, type-conflicting -> zero value (never widened) —
    the reference's coercion contract (docs/mongodb/README.md:14)."""
    zero = {"bigint": F.lit(0), "double": F.lit(0.0), "boolean": F.lit(False)}
    cols = list(docs.columns)
    projected = []
    for field, dtype, _ in schema:
        raw = F.get_json_object(F.col(json_col), f"$.{field}")
        if dtype == "string":
            col = raw
        else:
            col = F.when(raw.isNull(), F.lit(None).cast(dtype)).otherwise(
                F.coalesce(raw.try_cast(dtype), zero[dtype])
            )
        projected.append(col.alias(field))
    return docs.select(*cols, *projected)
