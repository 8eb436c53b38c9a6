from .churn import CHURN_COLUMNS, churn_customers, churn_cte, churn_select_sql  # noqa: F401
