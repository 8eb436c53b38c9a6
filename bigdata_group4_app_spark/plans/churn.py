"""The ``churn_customers`` relation — the reference app's canonical table.

The reference pulls a 12-column customer-churn collection from MongoDB
(reference app_test.py:29-54, schema at app_test.py:38-52). The driver
testdata has no such table, so per FIXTURES.md §1 we derive it
deterministically from the pre-registered ``customer`` table with
integer-only arithmetic on ``c_custkey``. Because every expression below is
exact integer (or a double passthrough), Spark and the DuckDB oracle compute
bit-identical values — the derivation is the SAME expression list rendered
into both dialects (only identifier quoting differs: backtick vs. ").

Domains follow the reference widget ranges (Age 18-100 app_test.py:122,174;
Tenure 0-72 :196; Usage Frequency 0-50 :197; Support Calls 0-20 :198;
Payment Delay 0-30 :199; Last Interaction 0-30 :200) and the categorical
vocabularies recovered from the fitted model (best_model.pkl: Gender
{Female,Male}, Subscription {Basic,Premium,Standard}, Contract
{Annual,Monthly,Quarterly}). The churn label threshold (>= 94) is tuned so
the overall rate is ~62.7%, matching the reference training base rate of
63.19% (best_model.pkl learner_model_param).

Multipliers (17, 7, 13, 11, 5, 3, 19) are coprime to their moduli so each
column cycles through its full domain; distinct multiplier/modulus pairs
de-correlate the columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.registry import load_table

# (column name, dialect-neutral SQL expression over customer's columns).
# Expressions use only integer arithmetic, CASE, ABS, FLOOR and single-quoted
# string literals — identical semantics in Spark SQL and DuckDB.
CHURN_COLUMNS: list[tuple[str, str]] = [
    ("CustomerID", "c_custkey"),
    ("Age", "CAST(18 + (c_custkey * 17) % 83 AS INT)"),
    ("Gender", "CASE WHEN (c_custkey * 7) % 100 < 55 THEN 'Male' ELSE 'Female' END"),
    ("Tenure", "CAST((c_custkey * 13) % 73 AS INT)"),
    ("Usage Frequency", "CAST((c_custkey * 11) % 51 AS INT)"),
    ("Support Calls", "CAST((c_custkey * 5) % 21 AS INT)"),
    ("Payment Delay", "CAST((c_custkey * 3) % 31 AS INT)"),
    (
        "Subscription Type",
        "CASE c_custkey % 3 WHEN 0 THEN 'Basic' WHEN 1 THEN 'Standard' ELSE 'Premium' END",
    ),
    (
        "Contract Length",
        "CASE CAST(FLOOR(c_custkey / 3.0) AS BIGINT) % 3 "
        "WHEN 0 THEN 'Monthly' WHEN 1 THEN 'Quarterly' ELSE 'Annual' END",
    ),
    ("Total Spend", "ABS(c_acctbal)"),
    ("Last Interaction", "CAST((c_custkey * 19) % 31 AS INT)"),
    (
        "Churn",
        "CAST(CASE WHEN 4 * ((c_custkey * 5) % 21) + 2 * ((c_custkey * 3) % 31)"
        " + (72 - (c_custkey * 13) % 73) >= 94 THEN 1 ELSE 0 END AS INT)",
    ),
]


def churn_select_sql(quote: str = '"', table: str = "customer") -> str:
    """Render the derivation as a SELECT in either dialect.

    ``quote='"'`` → DuckDB / ANSI; ``quote='`'`` → Spark SQL.
    """
    cols = ",\n  ".join(f"{expr} AS {quote}{name}{quote}" for name, expr in CHURN_COLUMNS)
    return f"SELECT\n  {cols}\nFROM {table}"


def churn_cte(quote: str = '"') -> str:
    """``WITH churn_customers AS (...)`` prefix for oracle SQL strings."""
    return f"WITH churn_customers AS (\n{churn_select_sql(quote)}\n)"


def churn_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The churn table as a lazy Spark DataFrame.

    Narrow projection over the customer scan — no shuffle; at 100 TB this is
    a pure map stage and Catalyst prunes the scan to (c_custkey, c_acctbal).
    """
    customer = load_table(spark, sf_dir, "customer")
    return customer.selectExpr(
        *[f"{expr} AS `{name}`" for name, expr in CHURN_COLUMNS]
    )
