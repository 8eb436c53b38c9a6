"""Advanced-operator tests: oracle parity (as-of vs DuckDB native ASOF
JOIN, rollup, set ops, cardinalities) plus the HyperLogLog approximation
bound that justifies approx_count_distinct as the at-scale path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_group4_app_spark.operators.advanced import ORACLE, QUERIES
from bigdata_group4_app_spark.sources.registry import load_table

from .conftest import SF_SMOKE, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_advanced_oracle(spark, name):
    assert_matches_oracle(
        QUERIES[name](spark, SF_SMOKE), ORACLE[name], SF_SMOKE
    )


def test_approx_count_distinct_within_5pct(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    row = ev.agg(
        F.countDistinct("event_id").alias("exact"),
        F.approx_count_distinct("event_id").alias("approx"),
    ).first()
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.05
