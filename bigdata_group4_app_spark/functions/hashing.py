"""Cross-engine md5-derived integer hashing (the repo's one hashing
convention, CLAUDE.md): the first 8 hex chars of md5 as a non-negative
32-bit value in a BIGINT. Spark `hash()`/`xxhash64` are NOT reproducible in
DuckDB; this is. Both helpers must stay textually parallel — every Spark
use has a DuckDB oracle twin built from the same inner expression.
"""

from __future__ import annotations


def md5_int_sql(inner: str) -> str:
    """Spark SQL expression string: md5-derived 32-bit int of ``inner``."""
    return f"CAST(conv(substr(md5({inner}), 1, 8), 16, 10) AS BIGINT)"


def duck_md5_int(inner: str) -> str:
    """DuckDB twin of :func:`md5_int_sql` (same value, same type)."""
    return f"CAST(('0x' || substr(md5({inner}), 1, 8)) AS BIGINT)"


def md5_int60_sql(inner: str) -> str:
    """Spark SQL: md5-derived 60-bit int (15 hex chars — the widest prefix
    that cannot overflow a signed BIGINT). Use when 32-bit collision odds
    matter (e.g. join keys standing in for string identity)."""
    return f"CAST(conv(substr(md5({inner}), 1, 15), 16, 10) AS BIGINT)"


def duck_md5_int60(inner: str) -> str:
    """DuckDB twin of :func:`md5_int60_sql`."""
    return f"CAST(('0x' || substr(md5({inner}), 1, 15)) AS BIGINT)"


def md5_int60b_sql(inner: str) -> str:
    """Spark SQL: the SECOND independent 60-bit lane of the same md5 (hex
    chars 16-30). One md5 call yields 120 usable bits as two signed-BIGINT
    lanes — the widest cross-engine signature the md5 convention supports
    (wide SimHash uses both lanes)."""
    return f"CAST(conv(substr(md5({inner}), 16, 15), 16, 10) AS BIGINT)"


def duck_md5_int60b(inner: str) -> str:
    """DuckDB twin of :func:`md5_int60b_sql`."""
    return f"CAST(('0x' || substr(md5({inner}), 16, 15)) AS BIGINT)"
