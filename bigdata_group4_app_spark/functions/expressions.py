"""Scalar expression suite (SURVEY.md §2.8, E1-E4).

Each helper exists twice, deliberately: a Spark ``Column`` builder and a
dialect-neutral SQL fragment builder, generated from the same thresholds so
engine and oracle can never drift.

Reference sites: risk bucketing app_test.py:238,247,301; percent formatting
app_test.py:300; CustomerID-or-ordinal fallback app_test.py:299.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

RISK_LOW_THRESHOLD = 0.3
RISK_HIGH_THRESHOLD = 0.7
RISK_LABELS = ("Low Risk", "Medium Risk", "High Risk")


def risk_bucket(prob: Column) -> Column:
    """E1 — 3-way CASE WHEN bucketing on churn probability."""
    return (
        F.when(prob < RISK_LOW_THRESHOLD, RISK_LABELS[0])
        .when(prob < RISK_HIGH_THRESHOLD, RISK_LABELS[1])
        .otherwise(RISK_LABELS[2])
    )


def risk_bucket_sql(prob_expr: str) -> str:
    return (
        f"CASE WHEN {prob_expr} < {RISK_LOW_THRESHOLD} THEN '{RISK_LABELS[0]}' "
        f"WHEN {prob_expr} < {RISK_HIGH_THRESHOLD} THEN '{RISK_LABELS[1]}' "
        f"ELSE '{RISK_LABELS[2]}' END"
    )


def pct_format(prob: Column) -> Column:
    """E2 — '12.34%' formatting of a probability already rounded to 4dp.

    Feeding a 4dp-rounded probability keeps the printf 2dp rounding step
    away from half-way cases, so C (DuckDB) and Java (Spark) tie-breaking
    rules can't disagree.
    """
    return F.format_string("%.2f%%", prob * 100)


def pct_format_sql(prob_expr: str) -> str:
    return f"printf('%.2f%%', ({prob_expr}) * 100)"


def hard_label(prob: Column, threshold: float = 0.5) -> Column:
    """M6 — hard 0/1 prediction at the reference's 0.5 threshold."""
    return (prob >= threshold).cast("int")


def with_customer_id(df):
    """E3/L2 — schema-conditional CustomerID: keep the column if the upload
    has it, else synthesize 1-based ordinals (reference ``df.get("CustomerID",
    df.index + 1)``, app_test.py:299).

    The ordinal fallback forces a global row_number — a single-partition
    window, exactly as expensive as it sounds. That is inherent to the
    semantics (reference file order doesn't exist in a distributed read),
    so the fallback is for small uploads; big inputs should carry an ID.
    """
    if "CustomerID" in df.columns:
        return df
    from pyspark.sql import Window

    w = Window.orderBy(F.monotonically_increasing_id())
    return df.withColumn(
        "CustomerID", F.row_number().over(w).cast("long")
    )
