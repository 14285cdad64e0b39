"""Z-order layout statistics: per Morton tile of the (user_id, time)
plane, the row count and the tile's bounding box — the data-layout
diagnostic behind `operators/layout.zorder_repartition` (each tile is
what one output file would hold, and the bounding box is exactly the
min/max pruning stats a parquet reader sees).

The oracle replays the full bit-interleave in SQL (unnest over the 21
bit positions), so the Morton code itself — quantization, shifts,
interleave — is value-pinned between engines, not just the rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clockpipe_spark.catalog import load_table
from clockpipe_spark.operators.layout import (
    MORTON_BITS,
    morton_interleave,
    quantize_expr,
)

_TILE_SHIFT = 2 * MORTON_BITS - 8  # keep the top 8 bits -> <=256 tiles


def zorder_tile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-tile census of events over (user_id, ts): quantize both
    dimensions to 21-bit ranks (time in milliseconds so span * 2^21
    stays far inside int64), interleave, and roll up the top 8 bits —
    one tile per prospective output file. Per tile: rows and the
    (user, time) bounding box, i.e. the pruning rectangle.

    One scan + broadcast bounds + one 256-cell aggregation; the
    interleave fold runs inside codegen. Compare any tile's box to the
    full range: a linear ts-sort would give every file the full user
    span — the measured contrast lives in tests/test_layout.py."""
    events = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr("unix_micros(ts) div 1000L").alias("tms")
    )
    bounds = events.agg(
        F.min("user_id").alias("xlo"),
        F.max("user_id").alias("xhi"),
        F.min("tms").alias("ylo"),
        F.max("tms").alias("yhi"),
    )
    coded = events.crossJoin(F.broadcast(bounds)).withColumn(
        "z",
        morton_interleave(
            quantize_expr("user_id", "xlo", "xhi"),
            quantize_expr("tms", "ylo", "yhi"),
        ),
    )
    return (
        coded.groupBy(F.shiftright("z", _TILE_SHIFT).alias("tile"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min("user_id").alias("user_lo"),
            F.max("user_id").alias("user_hi"),
            F.min("tms").alias("tms_lo"),
            F.max("tms").alias("tms_hi"),
        )
    )


_TOP = (1 << MORTON_BITS) - 1

ZORDER_TILE_SQL = f"""
WITH t AS (
  SELECT event_id, user_id, epoch_us(ts) // 1000 AS tms FROM events
),
b AS (
  SELECT min(user_id) AS xlo, max(user_id) AS xhi,
         min(tms) AS ylo, max(tms) AS yhi
  FROM t
),
r AS (
  SELECT event_id, user_id, tms,
         CASE WHEN b.xhi <= b.xlo THEN 0
              ELSE (user_id - b.xlo) * {_TOP} // (b.xhi - b.xlo) END AS xr,
         CASE WHEN b.yhi <= b.ylo THEN 0
              ELSE (tms - b.ylo) * {_TOP} // (b.yhi - b.ylo) END AS yr
  FROM t, b
),
m AS (
  SELECT r.event_id, r.user_id, r.tms,
         sum((((r.xr >> i) & 1) << (2 * i))
             + (((r.yr >> i) & 1) << (2 * i + 1))) AS z
  FROM r, unnest(generate_series(0, {MORTON_BITS - 1})) AS u(i)
  GROUP BY 1, 2, 3
)
SELECT CAST(z AS BIGINT) >> {_TILE_SHIFT} AS tile,
       count(*) AS n_rows,
       min(user_id) AS user_lo, max(user_id) AS user_hi,
       CAST(min(tms) AS BIGINT) AS tms_lo, CAST(max(tms) AS BIGINT) AS tms_hi
FROM m GROUP BY 1
"""


QUERIES = {"zorder_tile_stats": zorder_tile_stats}
ORACLES = {"zorder_tile_stats": ZORDER_TILE_SQL}
