"""The same engine through spark.sql(): register the star schema as temp
views and author queries in SQL — results must equal the DataFrame API
forms (they compile to the same Catalyst plans)."""

from __future__ import annotations

from bigdata_group4_app_spark.operators.relational import revenue_by_region
from bigdata_group4_app_spark.plans.churn import churn_select_sql
from bigdata_group4_app_spark.sources.registry import SCHEMAS, load_table

from .conftest import SF_SMOKE


def _register_views(spark):
    for name in SCHEMAS:
        load_table(spark, SF_SMOKE, name).createOrReplaceTempView(name)


def test_sql_equals_dataframe_api(spark):
    _register_views(spark)
    got = spark.sql(
        """
        SELECT r_name,
               round(sum(o_totalprice), 4) AS revenue,
               count(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
        ORDER BY r_name
        """
    ).collect()
    want = revenue_by_region(spark, SF_SMOKE).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_churn_derivation_sql_rendering(spark):
    """The dual-rendered churn derivation (backtick dialect) runs under
    spark.sql and matches the DataFrame derivation row-for-row."""
    from bigdata_group4_app_spark.plans.churn import churn_customers

    _register_views(spark)
    sql_rows = spark.sql(churn_select_sql(quote="`")).orderBy("CustomerID").collect()
    df_rows = churn_customers(spark, SF_SMOKE).orderBy("CustomerID").collect()
    assert [tuple(r) for r in sql_rows] == [tuple(r) for r in df_rows]
