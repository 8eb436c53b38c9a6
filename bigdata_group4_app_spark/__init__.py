"""bigdata_group4_app_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference app ``anhxll22406-source/bigdata-group4-app``
(a single-node pandas/Streamlit customer-churn analytics + ML scoring app;
see ``/root/reference/app_test.py``), extended with the LLM-data-pipeline
operators (deduplication, similarity search, text analysis, multimodal
column plumbing) required for large-scale training-data preparation.

Design stance (NOT a port):
  * lazy DataFrames with explicit schemas — Catalyst prunes/pushes down
  * ONE fused aggregation where the reference did seven full scans
    (reference: app_test.py:86-94, seven separate pandas passes)
  * joins broadcast small dimensions; aggregations are partial+final
  * Python UDFs only where native expressions can't reach (model scoring),
    and then Arrow-batched pandas UDFs, never per-row
"""

__version__ = "0.1.0"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
