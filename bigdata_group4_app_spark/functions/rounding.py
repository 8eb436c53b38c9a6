"""Driver-side half-up rounding — the ONE definition of the repo's
cross-engine rounding primitive for Python code.

Spark ``F.round`` and DuckDB ``round`` both round the shortest DECIMAL
repr of a double half-up; Python/numpy ``round`` are half-even on the
BINARY double and diverge exactly on the .5 boundaries fixed-point
schemes create (CLAUDE.md replay rule). Any driver-side fold or replay
that must agree with an engine ``round`` goes through this helper.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal


def round_half_up(v: float, dp: int) -> float:
    """``round(v, dp)`` with Spark/DuckDB semantics (shortest-repr,
    half-up) — bit-equal to ``F.round(lit(v), dp)``."""
    q = Decimal(1).scaleb(-dp)
    return float(Decimal(repr(v)).quantize(q, ROUND_HALF_UP))
