"""Data-layout operators: space-filling-curve (Z-order) clustering audit.

At 100 TB the dominant cost is the scan, and the dominant scan lever is
LAYOUT: files clustered so that a (user, time) predicate touches few of
them. Z-ordering interleaves the bits of two dimensions so that rows close
in BOTH dimensions land close on the curve — the technique behind
Delta/Iceberg ``OPTIMIZE ZORDER BY``. This module computes the curve key
and audits what clustering by it would buy, entirely with integer bit
arithmetic that both engines evaluate identically (Spark renders
``shiftleft/shiftright`` calls, DuckDB the ``<<``/``>>`` operators — same
16 terms, generated from one Python loop).

The audit reports, per coarse Z-tile, the row count and the min/max of
each dimension inside the tile: tight per-tile dimension ranges are
exactly the file-level min/max statistics (zone maps) that let a reader
prune files — so narrow ranges here = fewer files scanned there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table

Z_BITS = 8  # bits per dimension → 16-bit curve, 2^16 positions
Z_TILE_SHIFT = 10  # keep the top 6 bits → 64 coarse tiles


def _interleave_expr(x: str, y: str, spark_dialect: bool) -> str:
    """Bit-interleave two Z_BITS-wide non-negative ints: x in even bit
    positions, y in odd. Rendered per dialect from the same term list."""
    terms = []
    for i in range(Z_BITS):
        if spark_dialect:
            terms.append(f"shiftleft(shiftright({x}, {i}) & 1, {2 * i})")
            terms.append(f"shiftleft(shiftright({y}, {i}) & 1, {2 * i + 1})")
        else:
            terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
            terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def zorder_tile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering audit over events on (user bucket, day bucket).

    Each event maps to an 8-bit user bucket (``user_id % 256``) and an
    8-bit day bucket (epoch day % 256); the interleaved 16-bit Z value,
    truncated to 64 coarse tiles, is the clustering key a writer would
    ``repartitionByRange`` on. Per tile the audit emits the row count and
    the spread of both dimensions — the zone-map tightness a reader's
    file pruning would see. Pure map-side integer expressions + one
    64-group aggregate: free at any scale.
    """
    ev = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 256).alias("ub"),
        (F.floor(F.unix_micros("ts") / F.lit(86_400_000_000)) % 256)
        .cast("long")
        .alias("db"),
    )
    z = F.expr(_interleave_expr("ub", "db", spark_dialect=True))
    tiled = ev.select(
        F.shiftright(z, Z_TILE_SHIFT).alias("z_tile"), "ub", "db"
    )
    return (
        tiled.groupBy("z_tile")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("ub").alias("min_user_bucket"),
            F.max("ub").alias("max_user_bucket"),
            F.min("db").alias("min_day_bucket"),
            F.max("db").alias("max_day_bucket"),
        )
        .orderBy("z_tile")
    )


def _zorder_oracle() -> str:
    inter = _interleave_expr("ub", "db", spark_dialect=False)
    return f"""
WITH dims AS (
  SELECT user_id % 256 AS ub,
    CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) % 256 AS db
  FROM events
),
tiled AS (
  SELECT (({inter}) >> {Z_TILE_SHIFT}) AS z_tile, ub, db FROM dims
)
SELECT z_tile, count(*) AS n_rows,
  min(ub) AS min_user_bucket, max(ub) AS max_user_bucket,
  min(db) AS min_day_bucket, max(db) AS max_day_bucket
FROM tiled
GROUP BY z_tile
ORDER BY z_tile
"""


ORACLE: dict[str, str] = {
    "zorder_tile_stats": _zorder_oracle(),
}

QUERIES = {
    "zorder_tile_stats": zorder_tile_stats,
}
