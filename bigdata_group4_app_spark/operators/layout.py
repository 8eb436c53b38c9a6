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


N_FILES = 64
N_PROBES = 16


def layout_skipping_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified zone-map file skipping under three write layouts —
    the number that justifies Z-ordering: for a fleet of deterministic
    point probes ``(user_bucket, day_bucket)``, how many of 64 files must
    a reader open when the same rows were written (a) in insertion order,
    (b) sorted by user, (c) Z-ordered on (user, day)?

    Files are simulated as 64 equal row-count chunks of each ordering
    (row_number div chunk — exactly what ``repartitionByRange(64, key)``
    + per-file min/max footer stats produce). A file must be read iff its
    [min,max] envelope on BOTH dimensions contains the probe — the
    standard zone-map test. Expected result: insertion layout reads ~all
    files (random envelopes), user-sorted reads few files for the user
    dimension but can't prune on day, Z-order prunes on both.

    The global row_number here is the simulation's stand-in for the
    writer's range partitioner; a real writer never global-sorts on one
    machine — ``repartitionByRange`` sample-splits, then sorts within
    partitions.

    Bucket widths are sized to the DATA's cardinality (64 user buckets,
    16 day buckets — both fully populated from sf0.01 up), and probes are
    2-D ranges (8 user buckets × 2 day buckets): point probes on a
    near-unique sort key make any single-dim sort look perfect, which is
    exactly the regime Z-order does NOT target. Range probes over both
    dimensions are the realistic dashboard/backfill slice.
    """
    ev = load_table(spark, sf_dir, "events")
    dims = ev.select(
        (F.col("user_id") % 64).alias("ub"),
        (F.floor(F.unix_micros("ts") / F.lit(86_400_000_000)) % 16)
        .cast("long")
        .alias("db"),
        "event_id",
    ).withColumn(
        "z", F.expr(_interleave_expr("ub", "db", spark_dialect=True))
    ).localCheckpoint()  # consumed by count() + THREE layout branches
    n_rows = dims.count()
    chunk = -(-n_rows // N_FILES)  # ceil

    from pyspark.sql import Window as W

    layouts = {
        "a_insertion": W.orderBy("event_id"),
        "b_user_sorted": W.orderBy("ub", "event_id"),
        "c_zorder": W.orderBy("z", "event_id"),
    }
    probes = spark.range(N_PROBES).select(
        ((F.col("id") * 37) % 56).alias("p_ub_lo"),
        ((F.col("id") * 37) % 56 + 7).alias("p_ub_hi"),
        ((F.col("id") * 91) % 15).alias("p_db_lo"),
        ((F.col("id") * 91) % 15 + 1).alias("p_db_hi"),
    )
    pieces = []
    for name, w in layouts.items():
        files = (
            dims.withColumn(
                "file_id",
                ((F.row_number().over(w) - 1) / chunk).cast("long"),
            )
            .groupBy("file_id")
            .agg(
                F.min("ub").alias("min_ub"),
                F.max("ub").alias("max_ub"),
                F.min("db").alias("min_db"),
                F.max("db").alias("max_db"),
            )
        )
        touched = (
            probes.crossJoin(F.broadcast(files))
            .select(
                F.when(
                    (F.col("p_ub_hi") >= F.col("min_ub"))
                    & (F.col("p_ub_lo") <= F.col("max_ub"))
                    & (F.col("p_db_hi") >= F.col("min_db"))
                    & (F.col("p_db_lo") <= F.col("max_db")),
                    1,
                )
                .otherwise(0)
                .alias("hit")
            )
            .agg(
                F.count(F.lit(1)).alias("n_probe_file_pairs"),
                F.sum("hit").alias("files_read"),
                F.round(
                    F.sum("hit") / F.lit(float(N_PROBES)), 4
                ).alias("avg_files_per_probe"),
            )
            .select(
                F.lit(name).alias("layout"),
                "n_probe_file_pairs",
                "files_read",
                "avg_files_per_probe",
            )
        )
        pieces.append(touched)
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out.orderBy("layout")


def _skipping_oracle() -> str:
    inter = _interleave_expr("ub", "db", spark_dialect=False)
    layouts = {
        "a_insertion": "event_id",
        "b_user_sorted": "ub, event_id",
        "c_zorder": "z, event_id",
    }
    branches = []
    for name, order in layouts.items():
        branches.append(f"""
SELECT '{name}' AS layout, count(*) AS n_probe_file_pairs,
  CAST(sum(hit) AS BIGINT) AS files_read,
  round(sum(hit) / CAST({N_PROBES} AS DOUBLE), 4) AS avg_files_per_probe
FROM (
  SELECT CASE WHEN p.p_ub_hi >= f.min_ub AND p.p_ub_lo <= f.max_ub
              AND p.p_db_hi >= f.min_db AND p.p_db_lo <= f.max_db
         THEN 1 ELSE 0 END AS hit
  FROM probes p CROSS JOIN (
    SELECT file_id, min(ub) AS min_ub, max(ub) AS max_ub,
           min(db) AS min_db, max(db) AS max_db
    FROM (
      SELECT ub, db,
        (row_number() OVER (ORDER BY {order}) - 1) // chunk.c AS file_id
      FROM dims CROSS JOIN chunk
    ) GROUP BY file_id
  ) f
)""")
    return f"""
WITH dims AS (
  SELECT user_id % 64 AS ub,
    CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) % 16 AS db,
    event_id,
    CAST({inter} AS BIGINT) AS z
  FROM events
),
chunk AS (
  SELECT CAST(ceil(count(*) / CAST({N_FILES} AS DOUBLE)) AS BIGINT) AS c
  FROM dims
),
probes AS (
  SELECT (i * 37) % 56 AS p_ub_lo, (i * 37) % 56 + 7 AS p_ub_hi,
         (i * 91) % 15 AS p_db_lo, (i * 91) % 15 + 1 AS p_db_hi
  FROM generate_series(0, {N_PROBES - 1}) AS t(i)
)
{" UNION ALL ".join(branches)}
ORDER BY layout
"""


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


# ---------------------------------------------------------------------------
# range-partitioner boundary audit — the repartitionByRange primitive,
# made deterministic and measured
# ---------------------------------------------------------------------------

RANGE_AUDIT_PARTS = 8  # target partition count P
RANGE_SAMPLE_MOD = 16  # deterministic md5 sample at rate 1/16


def range_partition_balance_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """What ``repartitionByRange`` does under the hood, made auditable:
    pick P-1 range boundaries from a SAMPLE of the sort key, assign
    every row to its range, and report how balanced the resulting
    partitions would be — the pre-write check a 100 TB layout job runs
    before committing to a range-clustered table (a bad boundary set
    means one straggler file and a hot reducer; Spark's own
    RangePartitioner samples nondeterministically, so its splits can't
    be audited cross-engine or reproduced between runs).

    Determinism: the sample is ``md5(o_orderkey) % RANGE_SAMPLE_MOD ==
    0`` (the house md5-int convention — reproducible on both engines,
    unlike Spark's seeded sampler); boundaries are the last (cents,
    okey) key of each sample ntile, extracted with a two-step exact agg
    (max cents per tile, then max okey at that cents — no struct
    arg-max, the CLAUDE.md DuckDB rule); assignment compares the FULL
    (cents, okey) key against the 7-boundary broadcast array map-side
    (``size(filter(...))`` — no join, no shuffle), so ties at a
    boundary split identically on both engines. Share deviations are
    integer-position-rounded basis points.

    Scale shape: the sample ntile runs on the SHARED distributed
    two-pass rank (``functions/ranking.py::dist_ntile``, round 10 —
    cents are value-bounded by the o_totalprice price range, so
    ``cents div 10^6`` is an order-preserving ≤~60-value bucket and the
    sample never funnels through one reducer; Spark's own
    RangePartitioner collects the sample TO THE DRIVER — this is
    stronger), then one map-side assignment pass + a P-group
    aggregate. The 1-row boundary-array crossJoin is an allowlisted
    tiny-broadcast BNLJ."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"),
        F.round(F.col("o_totalprice") * 100.0, 0)
        .cast("long")
        .alias("cents"),
    )
    from ..functions.hashing import md5_int_sql

    h = md5_int_sql("CAST(okey AS STRING)")
    sample = orders.filter(F.expr(f"({h}) % {RANGE_SAMPLE_MOD} = 0"))
    from pyspark.sql import Window

    from ..functions.ranking import dist_ntile

    tiled = dist_ntile(
        sample,
        RANGE_AUDIT_PARTS,
        F.expr("cents div 1000000"),
        [F.col("cents"), F.col("okey")],
        out_col="tile",
    )
    bc = tiled.groupBy("tile").agg(F.max("cents").alias("bc"))
    bounds = (
        tiled.join(bc, "tile")
        .filter(
            (F.col("cents") == F.col("bc"))
            & (F.col("tile") < RANGE_AUDIT_PARTS)
        )
        .groupBy("tile", "bc")
        .agg(F.max("okey").alias("bk"))
    )
    barr = bounds.groupBy().agg(
        F.collect_list(F.struct("bc", "bk")).alias("bs")
    )
    assigned = orders.crossJoin(F.broadcast(barr)).select(
        "cents",
        F.expr(
            "size(filter(bs, b -> cents > b.bc OR "
            "(cents = b.bc AND okey > b.bk)))"
        ).alias("partition_id"),
    )
    w_all = Window.orderBy("partition_id").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    even_bp = 10000 // RANGE_AUDIT_PARTS
    return (
        assigned.groupBy("partition_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.min("cents").cast("double") / 100.0).alias("price_lo"),
            (F.max("cents").cast("double") / 100.0).alias("price_hi"),
        )
        .withColumn(
            "share_bp",
            F.round(
                F.col("n_rows").cast("double")
                * 10000.0
                / F.sum("n_rows").over(w_all).cast("double"),
                0,
            ),
        )
        .withColumn("dev_bp", F.col("share_bp") - F.lit(float(even_bp)))
        .select(
            "partition_id", "n_rows", "price_lo", "price_hi",
            "share_bp", "dev_bp",
        )
        .orderBy("partition_id")
    )


def _range_audit_oracle() -> str:
    from ..functions.hashing import duck_md5_int

    h = duck_md5_int("CAST(okey AS VARCHAR)")
    even_bp = 10000 // RANGE_AUDIT_PARTS
    return f"""
WITH rbase AS (
  SELECT o_orderkey AS okey,
    CAST(round(o_totalprice * 100.0, 0) AS BIGINT) AS cents
  FROM orders
),
rsample AS (
  SELECT cents, okey,
    ntile({RANGE_AUDIT_PARTS}) OVER (ORDER BY cents, okey) AS tile
  FROM rbase WHERE ({h}) % {RANGE_SAMPLE_MOD} = 0
),
rbc AS (
  SELECT tile, max(cents) AS bc FROM rsample GROUP BY tile
),
rbounds AS (
  SELECT b.tile, b.bc, max(s.okey) AS bk
  FROM rbc b JOIN rsample s ON s.tile = b.tile AND s.cents = b.bc
  WHERE b.tile < {RANGE_AUDIT_PARTS}
  GROUP BY b.tile, b.bc
),
rassigned AS (
  SELECT o.cents,
    (SELECT count(*) FROM rbounds b
     WHERE o.cents > b.bc OR (o.cents = b.bc AND o.okey > b.bk))
      AS partition_id
  FROM rbase o
),
ragg AS (
  SELECT CAST(partition_id AS INT) AS partition_id,
    CAST(count(*) AS BIGINT) AS n_rows,
    CAST(min(cents) AS DOUBLE) / 100.0 AS price_lo,
    CAST(max(cents) AS DOUBLE) / 100.0 AS price_hi
  FROM rassigned GROUP BY 1
),
rtot AS (SELECT CAST(sum(n_rows) AS BIGINT) AS t FROM ragg)
SELECT partition_id, n_rows, price_lo, price_hi,
  round(CAST(n_rows AS DOUBLE) * 10000.0 / CAST(t AS DOUBLE), 0) AS share_bp,
  round(CAST(n_rows AS DOUBLE) * 10000.0 / CAST(t AS DOUBLE), 0)
    - CAST({even_bp} AS DOUBLE) AS dev_bp
FROM ragg CROSS JOIN rtot
ORDER BY partition_id
"""


ORACLE: dict[str, str] = {
    "zorder_tile_stats": _zorder_oracle(),
    "layout_skipping_compare": _skipping_oracle(),
    "range_partition_balance_audit": _range_audit_oracle(),
}

QUERIES = {
    "zorder_tile_stats": zorder_tile_stats,
    "layout_skipping_compare": layout_skipping_compare,
    "range_partition_balance_audit": range_partition_balance_audit,
}
