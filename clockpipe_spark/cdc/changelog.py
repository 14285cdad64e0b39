"""Change-log shaping (FIXTURES.md §A convention).

The harness has no live Postgres/Mongo, so the CDC stream is derived
deterministically from the ``events`` fixture: ``event_id`` plays the LSN
/ resume-token role (adapter/postgres.rs:103-107), ``event_type`` maps
onto pgoutput message types (pgoutput.rs:10-20), ``user_id`` is the
primary key, and a synthetic ``tbl`` column exercises group-by-table
routing (pipes/postgres.rs:316-326).

The SQL rendering (CHANGELOG_SQL) is shared verbatim with the DuckDB
oracles so both engines see the identical log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# op mapping: signup -> Insert, error -> Delete, everything else -> Update.
CHANGELOG_SQL = """
    SELECT
        event_id AS seq,
        CASE event_type
            WHEN 'signup' THEN 'I'
            WHEN 'error' THEN 'D'
            ELSE 'U'
        END AS op,
        concat('t', CAST(user_id % 4 AS VARCHAR)) AS tbl,
        user_id,
        value,
        ts,
        props
    FROM events
"""


def changelog_from_events(events: DataFrame) -> DataFrame:
    """Spark twin of CHANGELOG_SQL."""
    return events.select(
        F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == "signup", "I")
        .when(F.col("event_type") == "error", "D")
        .otherwise("U")
        .alias("op"),
        F.concat(F.lit("t"), (F.col("user_id") % 4).cast("string")).alias("tbl"),
        "user_id",
        "value",
        "ts",
        "props",
    )
