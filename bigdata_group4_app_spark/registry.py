"""Central query/oracle registry.

Every operator module contributes a ``QUERIES`` dict
(name -> (spark, sf_dir) -> DataFrame) and an ``ORACLE`` dict
(name -> DuckDB SQL). Names present in QUERIES but absent from ORACLE get
the driver's weaker rows-only check (non-SQL-expressible operators).
"""

from __future__ import annotations

from .ml import scoring
from .operators import (
    advanced,
    analytics,
    corpus,
    dedup,
    multimodal,
    relational,
    similarity,
    text,
)
from .streaming import windows as streaming_windows

_MODULES = [
    advanced,
    analytics,
    relational,
    scoring,
    text,
    corpus,
    dedup,
    similarity,
    multimodal,
    streaming_windows,
]

QUERY_REGISTRY: dict = {}
ORACLE_REGISTRY: dict[str, str] = {}

for _m in _MODULES:
    for _name, _fn in _m.QUERIES.items():
        assert _name not in QUERY_REGISTRY, f"duplicate query name: {_name}"
        QUERY_REGISTRY[_name] = _fn
    for _name, _sql in getattr(_m, "ORACLE", {}).items():
        assert _name in _m.QUERIES, f"oracle without query: {_name}"
        ORACLE_REGISTRY[_name] = _sql
