from .registry import SCHEMAS, load_table, load_tables  # noqa: F401
