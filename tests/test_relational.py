"""Oracle-parity tests for joins / windows / time-bucketed aggregation."""

import pytest

from bigdata_group4_app_spark.operators import relational

from .conftest import SF_CORRECT, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(relational.QUERIES))
def test_oracle_parity(spark, name):
    df = relational.QUERIES[name](spark, SF_CORRECT)
    assert_matches_oracle(df, relational.ORACLE[name], SF_CORRECT)


def test_broadcast_in_plan(spark):
    """Dimension joins must be broadcast, not shuffled (scale contract)."""
    plan = relational.revenue_by_region(spark, SF_CORRECT)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_topk_plan_is_take_ordered(spark):
    """orderBy+limit must plan TakeOrderedAndProject, not a global sort."""
    plan = relational.top_customers_by_revenue(spark, SF_CORRECT)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
