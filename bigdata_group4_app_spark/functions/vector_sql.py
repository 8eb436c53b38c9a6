"""DuckDB-side ordered-fold vector expressions.

The Spark engine computes dot products and L2 norms as ORDERED left
folds over the array (``aggregate(zip_with(...), 0.0, (acc, v) -> acc +
v)`` in ``operators/dedup.py::_cosine_expr``). Any oracle that instead
sums the per-dimension products with an unordered ``SUM() GROUP BY``
can land a different last-bit and flip a 4dp rounding boundary or an
argmax pick (the kmeans ordered-fold finding, round 3; re-flagged for
the MMR/contrastive oracles in round-4 ADVICE). These helpers render
the EXACT DuckDB twin of the Spark fold — ``list_reduce`` with a
prepended 0.0 over ``list_transform`` products in index order — so
per-pair cosines are bit-identical before rounding, not merely close.

Always build oracle cosines from these; never inline an UNNEST+SUM.
"""

from __future__ import annotations


def duck_l2_sql(col: str) -> str:
    """Ordered-fold L2 norm of a DuckDB list column — bit-identical to
    Spark's ``_l2_norm_expr`` (sqrt of a left-fold of squares)."""
    return (
        f"sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform({col}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), "
        f"(acc, v) -> acc + v))"
    )


def duck_dot_sql(a: str, b: str) -> str:
    """Ordered-fold dot product of two DuckDB list columns — bit-identical
    to Spark's ``aggregate(zip_with(a, b, x*y), 0.0, +)`` (products in
    index order, left fold, 0.0 seed). ``a`` must be the Spark
    ``zip_with``'s LEFT operand so the multiply order matches too."""
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform({a}, (x, i) -> "
        f"CAST(x AS DOUBLE) * CAST({b}[i] AS DOUBLE))), "
        f"(acc, v) -> acc + v)"
    )


def duck_cosine_sql(a: str, b: str, na: str, nb: str) -> str:
    """cosine(a, b) with precomputed norm columns ``na``/``nb`` — the
    division/multiplication shape mirrors Spark's ``_cosine_expr``
    (``dot / (norm_a * norm_b)``)."""
    return f"({duck_dot_sql(a, b)} / ({na} * {nb}))"
