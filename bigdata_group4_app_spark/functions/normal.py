"""Cross-engine standard-normal tail probability as shared SQL text.

Neither Spark nor DuckDB ships a normal CDF, and shipping scipy to
executors is off the table — so p-values are computed IN-QUERY from the
Abramowitz & Stegun 26.2.17 polynomial tail approximation (|error| <
7.5e-8, far below the house 4dp rounding grain). The same expression
string renders into both engines (`abs`, `exp`, `round`, arithmetic —
identical SQL on both), the z input is 4dp-rounded BEFORE the polynomial
so both engines evaluate `exp` on the same double, and the emitted p is
4dp-rounded — the only cross-engine risk is a last-bit `exp` skew landing
exactly on a 4dp half boundary (~1e-12 per value; the house accepts the
same class for `log2` in the n-gram LM scorers).

Every Spark use must pair with a DuckDB oracle twin built from THIS
helper (the ``functions/hashing.py`` contract), so the polynomial can
never drift between engines.
"""

from __future__ import annotations

# A&S 26.2.17 constants — rendered via repr() into both engines so the
# literals are character-identical (cross-engine float-literal rule).
_AS_P = 0.2316419
_AS_B = (0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429)
_INV_SQRT_2PI = 0.3989422804014327  # 1/sqrt(2*pi), shortest repr


def norm_sf_sql(z: str) -> str:
    """SQL text for the upper-tail P(Z > z) at z >= 0 (pass ``abs(...)``
    for two-sided use). Identical text is valid Spark SQL and DuckDB SQL.
    Horner-form polynomial: one shared parenthesization on both engines.
    """
    b1, b2, b3, b4, b5 = (repr(b) for b in _AS_B)
    t = f"(CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + {_AS_P!r} * ({z})))"
    horner = (
        f"({t} * ({b1} + {t} * ({b2} + {t} * "
        f"({b3} + {t} * ({b4} + {t} * {b5})))))"
    )
    phi = f"({_INV_SQRT_2PI!r} * exp(-(({z}) * ({z})) / CAST(2.0 AS DOUBLE)))"
    return f"({phi} * {horner})"


def two_sided_p_sql(z: str) -> str:
    """SQL text for the two-sided p-value 2*P(Z > |z|), 4dp-rounded.
    ``z`` should itself be a 4dp-rounded expression so both engines feed
    `exp` the identical double.
    """
    return f"round(CAST(2.0 AS DOUBLE) * {norm_sf_sql(f'abs({z})')}, 4)"
