"""Skew- and shuffle-management utilities for the 100 TB path.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin`) handles most
hot-key cases at runtime; ``salted_join`` is the explicit fallback for
the pathological ones AQE can't split (e.g. a single key holding >50% of
a side, or aggregations rather than joins). ``bucketed`` writes a table
pre-hashed on its join key so repeated joins on that key are co-located
scans — zero Exchange at query time, the amortize-one-shuffle-forever
pattern for fact tables queried daily.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 8


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Equi-join where ``skewed``'s hot keys overwhelm single reducers.

    The skewed side gets a uniform salt in [0, n_salts); the other side is
    exploded n_salts× so every (key, salt) bucket still finds its match.
    One hot key's rows then spread over n_salts reducers instead of one.
    The salt is derived from ``monotonically_increasing_id`` (partition id
    × offset), not from the key — salting BY the key would put identical
    keys back on one reducer, which is the problem being solved.

    Only inner/left joins are supported: under right/full outer an
    unmatched small-side key would surface once PER SALT (n_salts
    duplicate null-padded rows), so those join types are rejected.

    Cost: the small side is replicated n_salts× through the shuffle, so
    keep it the dimension side (or use broadcast and skip salting — this
    helper is for when the small side is too big to broadcast but small
    enough to replicate).
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got {how!r}: "
            "right/full outer would emit unmatched small-side keys once "
            "per salt"
        )
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), n_salts)
    left = skewed.withColumn("__salt", salt.cast("int"))
    right = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    joined = left.join(right, on=[on, "__salt"], how=how)
    return joined.drop("__salt")


def write_bucketed(
    df: DataFrame, table: str, key: str, n_buckets: int = 16
) -> None:
    """Persist ``df`` hash-bucketed on ``key``: subsequent equi-joins or
    aggregations on ``key`` between tables bucketed the same way need no
    Exchange (the scan already satisfies the hash distribution)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )
