"""Round-5 regression tests: the three round-4 ADVICE fixes.

1. ordered-fold oracle cosines (mmr/contrastive/knn templates) — covered
   by the oracle-parity tests in test_llm_pipeline; here we pin the
   helper renders the exact Spark fold shape.
2. absolute-date train/eval splits (ips_policy_value, cuped_adjusted_ab)
   — a cross-month dataset must NOT interleave the periods.
3. degree_distribution_stats degenerate-OLS guard — a single-row
   histogram yields NULL slope on both engines, not NaN-vs-NULL.
"""

from __future__ import annotations

import pandas as pd

from bigdata_group4_app_spark.operators.advanced import (
    OPE_SPLIT_TS,
    ips_policy_value,
)
from bigdata_group4_app_spark.operators.graph import (
    degree_distribution_stats,
)


def test_duck_dot_matches_spark_fold_literally():
    from bigdata_group4_app_spark.functions.vector_sql import (
        duck_dot_sql,
        duck_l2_sql,
    )

    # the fold must seed 0.0 and accumulate left-to-right — the shape that
    # makes it bit-identical to Spark's aggregate(zip_with(...), 0.0, +)
    s = duck_dot_sql("a", "b")
    assert "list_prepend(CAST(0.0 AS DOUBLE)" in s
    assert "(acc, v) -> acc + v" in s
    assert "list_transform(a, (x, i)" in s  # left operand drives order
    assert "sum(" not in s  # never an unordered aggregate
    assert "sum(" not in duck_l2_sql("a")


def test_duck_dot_numeric_parity(spark):
    """The rendered DuckDB fold equals Spark's _cosine_expr on an
    adversarial vector (magnitudes spanning 12 orders, where summation
    order changes the last bits)."""
    import duckdb
    from pyspark.sql import functions as F

    from bigdata_group4_app_spark.functions.vector_sql import duck_dot_sql
    from bigdata_group4_app_spark.operators.dedup import _cosine_expr

    a = [1e9, 1.0, -1e9, 1e-3, 7.5, -2.25, 1e6, -1e-3]
    b = [1e-3, 1e9, 1.0, -1e9, -2.25, 7.5, 1e-3, 1e6]
    sdf = spark.createDataFrame(
        [(a, b)], schema="a array<double>, b array<double>"
    ).select(_cosine_expr("a", "b").alias("c"))
    s_val = sdf.collect()[0]["c"]
    con = duckdb.connect()
    nrm_a = duck_dot_sql("a", "a")
    nrm_b = duck_dot_sql("b", "b")
    d_val = con.execute(
        f"SELECT {duck_dot_sql('a', 'b')} / (sqrt({nrm_a}) * sqrt({nrm_b}))"
        f" FROM (SELECT {a!r}::DOUBLE[] AS a, {b!r}::DOUBLE[] AS b)"
    ).fetchone()[0]
    # bit-identical, not approx: that is the whole point of the fold
    assert s_val == d_val


def _write_events(tmp_path, rows):
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    df["ts"] = pd.to_datetime(df["ts"])
    df["props"] = "{}"
    df.to_parquet(tmp_path / "events.parquet", index=False)
    return str(tmp_path)


def test_ips_split_is_absolute_not_day_of_month(spark, tmp_path):
    """An event on 2024-02-05 (day-of-month 5 < 16) is AFTER the split
    timestamp: it must land in the eval window, not retrain the policy.
    Under the old dayofmonth() split the two February 'view' events would
    flip the trained policy from 'click' to 'view'."""
    assert OPE_SPLIT_TS == "2024-01-16 00:00:00"
    sf = _write_events(
        tmp_path,
        [
            (1, "2024-01-05 10:00:00", 1, "click", 1.0),
            (2, "2024-01-20 10:00:00", 1, "view", 2.0),
            (3, "2024-01-21 10:00:00", 1, "view", 2.0),
            (4, "2024-02-05 10:00:00", 1, "view", 2.0),
            (5, "2024-02-05 11:00:00", 1, "view", 2.0),
        ],
    )
    rows = ips_policy_value(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["rec_action"] == "click"  # trained ONLY on the pre-split event
    assert r["n_logged"] == 4  # all four post-split events evaluate it
    assert r["n_matched"] == 0


def _write_lineitem(tmp_path, rows):
    df = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    # pad the columns other consumers of the table expect at read time
    df["l_quantity"] = 1.0
    df["l_extendedprice"] = 1.0
    df.to_parquet(tmp_path / "lineitem.parquet", index=False)
    return str(tmp_path)


def test_degree_distribution_degenerate_slope_is_null(spark, tmp_path):
    """Three orders over the same 2-part basket: one edge, both nodes
    degree 1, a single histogram row — the OLS denominator is 0 and the
    slope must be NULL (matching DuckDB's NULL division), never NaN."""
    sf = _write_lineitem(
        tmp_path,
        [(1, 10), (1, 20), (2, 10), (2, 20), (3, 10), (3, 20)],
    )
    rows = degree_distribution_stats(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["degree"] == 1 and r["n_nodes"] == 2
    assert r["node_share"] == 1.0
    assert r["loglog_slope"] is None
