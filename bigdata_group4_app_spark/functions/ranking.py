"""Distributed exact rank / ntile — the shared two-pass sharded
prefix-sum helper (VERDICT r9 item 3).

A ``Window.orderBy`` with no partition key funnels every row through ONE
reducer: fine on a bounded dimension, a scale-killer on a fact. The
exact swap — proven bit-equal to the global ntile at two SFs by
``spend_equidepth_bins_dist`` (tests/test_round9.py) — is:

  bucket: rows bucket by an ORDER-PRESERVING value-range expression
          (deterministic, no sampled boundaries), so global order ≡
          bucket order + within-bucket order;
  pass 1: per-bucket row counts → exclusive prefix offsets + group
          totals over the bucket relation (value-bounded, tiny at any
          corpus size — the only no-partition-key window runs HERE);
  pass 2: each row's exact rank = broadcast carry + local row_number
          within its bucket. ONE ``repartition(groups..., bucket)``
          serves the count agg, the offset join, and the local window
          (superset-clustering rule).
  ntile:  bin = closed-form ntile arithmetic on the exact rank (the
          first n % B bins take ⌈n/B⌉ rows) — all-BIGINT, both engines
          agree exactly; ``greatest(sz, 1)`` keeps ANSI Spark from
          evaluating a div-by-zero in the branch n < B makes
          unreachable.

Every global-ntile family member (``spend_equidepth_bins_dist``,
``segment_spend_quartiles``, ``rfm_segments``, ``calibration_curve``)
calls THIS helper, so the rank scheme can never desync from the proven
form; oracles stay the plain global-window SQL — the semantic contract
the distributed rank reproduces bit-for-bit. The engine-wide plan audit
(tests/test_scale.py) asserts no registered query plans a row-level
no-partition-key Window outside the whitelisted tiny-relation cases.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BKT = "__rank_bkt"
_OFF = "__rank_off"
_TOT = "__rank_tot"


def bucketed_rank(
    df: DataFrame,
    bucket: Column,
    order_cols: list,
    group_cols: list[str] | None = None,
    rank_col: str = "rnk",
    total_col: str | None = None,
    persist_base: bool = False,
) -> DataFrame:
    """Exact 1-based rank of each row under (group_cols →)
    ``order_cols`` total order, without a row-level no-partition-key
    window.

    ``bucket`` must be order-preserving w.r.t. the FIRST order column's
    direction (monotone non-decreasing), and coarse enough that the
    (groups × buckets) offset relation stays broadcast-tiny —
    value-range expressions over bounded metrics (``cents div 50_000``,
    ``floor(p * 50)``) satisfy both at any corpus size. Rows with equal
    first-order-column values MUST map to the same bucket (any
    function of that column alone does). ``total_col``, if given, also
    attaches the per-group row total (needed for closed-form ntile).

    ``persist_base`` lazily caches the repartitioned input: the rank
    consumes its base twice (offset counts + the rank join), and plain
    exchange reuse does not dedup the two differently-projected copies —
    set it when the input is itself an expensive subtree (e.g. a chained
    multi-metric rank like ``rfm_segments``), leave it off when the
    input is a cheap scan projection. persist() is construction-lazy
    (no job until an action) and MEMORY_AND_DISK, so a dimension-sized
    base spills rather than OOMs at scale.

    PRECONDITION — ``bucket`` must never evaluate to NULL (ADVICE r10):
    the engine ntile ranks NULL order keys NULLS FIRST, but a NULL
    bucket would fall out of the non-null-safe offset equi-join and the
    row would silently VANISH. No current call site can produce one
    (every bucket expr is arithmetic over a non-null metric); the
    in-plan assert_true below turns a future nullable caller into a
    loud query failure instead of lost rows — NULL-order-key callers
    must pre-coalesce the key into the sort floor (e.g. coalesce to
    -inf) so the bucket stays non-null."""
    group_cols = list(group_cols or [])
    # assert_true yields NULL when the predicate holds; coalescing the
    # guarded bucket keeps the guard inside the expression at zero cost
    # on valid data and fails the query on the first NULL bucket
    guarded = F.coalesce(
        F.when(bucket.isNotNull(), bucket),
        F.assert_true(
            bucket.isNotNull(),
            F.lit(
                "bucketed_rank: bucket expression evaluated to NULL — "
                "rows would be dropped by the offset equi-join; "
                "pre-coalesce the order key (see docstring)"
            ),
        ).cast("long"),
    )
    base = df.withColumn(_BKT, guarded).repartition(*(group_cols + [_BKT]))
    if persist_base:
        base = base.persist()
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy(_BKT)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy(*group_cols).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offs = (
        base.groupBy(*group_cols, _BKT)
        .agg(F.count(F.lit(1)).alias("__bn"))
        .select(
            *group_cols,
            _BKT,
            F.coalesce(F.sum("__bn").over(w_off), F.lit(0)).alias(_OFF),
            F.sum("__bn").over(w_all).alias(_TOT),
        )
    )
    w_loc = Window.partitionBy(*group_cols, _BKT).orderBy(*order_cols)
    ranked = (
        base.join(F.broadcast(offs), group_cols + [_BKT])
        .withColumn(rank_col, F.col(_OFF) + F.row_number().over(w_loc))
    )
    if total_col is not None:
        ranked = ranked.withColumn(total_col, F.col(_TOT))
    return ranked.drop(_BKT, _OFF, _TOT)


def ntile_from_rank(n_buckets: int, rank_col: str, total_col: str) -> Column:
    """Closed-form ntile(B) from an exact 1-based rank and the group row
    total — INT, bit-identical to the engine ntile's first-buckets-
    take-the-remainder rule. All-BIGINT arithmetic; the greatest(sz, 1)
    guard keeps ANSI Spark out of the unreachable div-by-zero branch
    when n < B."""
    b = int(n_buckets)
    return F.expr(
        f"CAST(CASE WHEN {rank_col} <= ({total_col} % {b}) * "
        f"({total_col} div {b} + 1) "
        f"THEN ({rank_col} - 1) div ({total_col} div {b} + 1) + 1 "
        f"ELSE ({total_col} % {b}) + ({rank_col} - ({total_col} % {b}) * "
        f"({total_col} div {b} + 1) - 1) div greatest({total_col} div {b}, 1) + 1 "
        f"END AS INT)"
    )


def dist_ntile(
    df: DataFrame,
    n_buckets: int,
    bucket: Column,
    order_cols: list,
    group_cols: list[str] | None = None,
    out_col: str = "bin",
    persist_base: bool = False,
) -> DataFrame:
    """``ntile(n_buckets) OVER ([PARTITION BY group_cols] ORDER BY
    order_cols)`` as a distributed two-pass rank + closed-form bin —
    output bit-identical to the engine ntile, plan free of row-level
    no-partition-key windows. Adds ``out_col``; drops the internal rank
    columns."""
    ranked = bucketed_rank(
        df,
        bucket,
        order_cols,
        group_cols=group_cols,
        rank_col="__rank_rnk",
        total_col="__rank_n",
        persist_base=persist_base,
    )
    return ranked.withColumn(
        out_col, ntile_from_rank(n_buckets, "__rank_rnk", "__rank_n")
    ).drop("__rank_rnk", "__rank_n")
