"""Table registry: explicit schemas + parquet loaders for the testdata star schema.

The reference app never declares a schema (pandas infers from Mongo/CSV —
reference app_test.py:53-54); this engine declares every table explicitly so
a schema drift in input data fails loudly at analysis time instead of
producing silently wrong plans.

Scans stay lazy: ``spark.read.parquet`` + Catalyst column pruning replaces the
reference's eager full-collection fetch with server-side projection
(reference app_test.py:36-57, operator S1 in SURVEY.md §2.1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import tune_session

SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    # Logical (post-load) events schema: ts is always a µs TimestampType.
    # The on-disk encoding has varied across driver testdata generations —
    # TIMESTAMP(NANOS) (read as int64 + truncate) vs plain timestamp[us]
    # (read directly) — so load_table sniffs the parquet footer and picks
    # the matching read schema (see _events_ts_is_nanos).
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}


# ts LongType read schema for the TIMESTAMP(NANOS) testdata generation:
# Spark's TimestampType is µs, so nanos must come in as raw int64
# (nanosAsLong) and be integer-truncated to µs after the scan.
_EVENTS_NANOS_SCHEMA = T.StructType(
    [
        T.StructField(f.name, T.LongType() if f.name == "ts" else f.dataType)
        for f in SCHEMAS["events"].fields
    ]
)

_TS_NANOS_CACHE: dict[str, bool] = {}


def _events_ts_is_nanos(path: str) -> bool:
    """Sniff whether an events parquet file (or directory of files) stores
    ``ts`` as TIMESTAMP(NANOS) (older testdata) or timestamp[us] (current).

    Footer-only read, cached per path — one driver-side metadata fetch, no
    data scan. An empty directory (streaming source before the first file
    lands) defaults to the current µs encoding."""
    if path not in _TS_NANOS_CACHE:
        import glob

        import pyarrow.parquet as pq

        target = path
        if os.path.isdir(path):
            files = sorted(glob.glob(os.path.join(path, "*.parquet")))
            if not files:
                return False  # don't cache: the dir may fill in later
            target = files[0]
        unit = pq.read_schema(target).field("ts").type
        _TS_NANOS_CACHE[path] = str(unit) in ("int64", "timestamp[ns]")
    return _TS_NANOS_CACHE[path]


def events_read_schema(path: str) -> T.StructType:
    return _EVENTS_NANOS_SCHEMA if _events_ts_is_nanos(path) else SCHEMAS["events"]


def normalize_events_ts(df: DataFrame, path: str) -> DataFrame:
    """ns→µs truncation for the nanos generation; identity for µs data.

    Integer division, NOT float: ns values (~1.7e18) exceed double's 53-bit
    mantissa, so float division would corrupt timestamps."""
    if _events_ts_is_nanos(path):
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one star-schema table.

    Column pruning and predicate pushdown happen automatically downstream:
    callers ``select``/``filter`` and Catalyst pushes both into the scan
    (visible as ReadSchema / PushedFilters in ``.explain``).
    """
    tune_session(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        df = spark.read.schema(events_read_schema(path)).parquet(path)
        return normalize_events_ts(df, path)
    return spark.read.schema(SCHEMAS[name]).parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in SCHEMAS}


def cached_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """S7 — memoized source (reference ``@st.cache_data``, app_test.py:36):
    ``MEMORY_AND_DISK`` persist so repeated queries over the same table hit
    executor block storage instead of re-scanning parquet. Lazy — the first
    action materializes the cache. Callers own ``unpersist()``."""
    from pyspark import StorageLevel

    return load_table(spark, sf_dir, name).persist(
        StorageLevel.MEMORY_AND_DISK
    )
