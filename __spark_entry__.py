"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001; ``queries()``
exposes every implemented operator as ``(spark, sf_dir) -> DataFrame``;
``oracle_sql()`` holds the matching DuckDB-ANSI SQL (same column aliases, so
the order-insensitive value-hash matches). Implementation lives in
``bigdata_group4_app_spark``; this module only aggregates the registries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bigdata_group4_app_spark.registry import ORACLE_REGISTRY, QUERY_REGISTRY

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the fused churn stats block (reference app_test.py:86-94

    as ONE aggregate pass) on sf0.001. Driver checks rows > 0."""
    return QUERY_REGISTRY["churn_stats"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERY_REGISTRY)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_REGISTRY)
