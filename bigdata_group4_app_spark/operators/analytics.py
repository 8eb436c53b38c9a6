"""Reference-parity analytics operators (SURVEY.md §2.2-2.3, §2.6).

Each public function is a ``queries()`` entry: ``(spark, sf_dir) -> DataFrame``.
``ORACLE`` maps the same names to DuckDB-ANSI SQL over the pre-registered
testdata views; both sides alias every computed column identically so the
driver's order-insensitive value-hash can match.

Scale notes (local[32] today, 1000 executors tomorrow):
  * ``churn_stats`` is ONE hash-aggregate pass — the reference did seven
    full scans for the same numbers (reference app_test.py:86-94). Partial
    aggregation (map-side combine) means the shuffle carries 7 numbers per
    partition, not rows.
  * group-by rates shuffle on a 3-value key; AQE coalesces the post-shuffle
    partitions. Low-cardinality group-bys like these are partial-agg
    friendly: the map side reduces each partition to ≤3 rows first.
  * ``age_filter_topn`` pushes the Age predicate into the parquet scan and
    uses a global sort ONLY on the 10 surviving rows' ordering key
    (TakeOrderedAndProject — no full sort at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.churn import churn_cte, churn_customers

# ---------------------------------------------------------------------------
# A1-A3 + P3 + P5 — the stats block, fused into one aggregate pass.
# Reference: app_test.py:86-94 (seven separate pandas scans).
# ---------------------------------------------------------------------------


def churn_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = churn_customers(spark, sf_dir)
    churned = F.col("Churn") == 1
    retained = F.col("Churn") == 0
    # avg over an empty slice is NULL in Spark; the reference guards the
    # empty case to 0 (app_test.py:88-93) → coalesce to 0.0 (operator P5).
    return df.agg(
        F.count(F.lit(1)).alias("total_customers"),
        (F.avg("Churn") * 100).alias("churn_rate_pct"),
        F.coalesce(F.avg(F.when(churned, F.col("Age"))), F.lit(0.0)).alias(
            "avg_age_churned"
        ),
        F.coalesce(F.avg(F.when(retained, F.col("Age"))), F.lit(0.0)).alias(
            "avg_age_retained"
        ),
        F.round(
            F.coalesce(F.avg(F.when(churned, F.col("Total Spend"))), F.lit(0.0)), 4
        ).alias("avg_spend_churned"),
        F.round(
            F.coalesce(F.avg(F.when(retained, F.col("Total Spend"))), F.lit(0.0)), 4
        ).alias("avg_spend_retained"),
        F.coalesce(F.avg(F.when(churned, F.col("Support Calls"))), F.lit(0.0)).alias(
            "avg_support_calls_churned"
        ),
    )


# ---------------------------------------------------------------------------
# A4 — group-by churn rate (reference app_test.py:99).
# ---------------------------------------------------------------------------


def _rate_by(spark: SparkSession, sf_dir: str, key: str) -> DataFrame:
    df = churn_customers(spark, sf_dir)
    return (
        df.groupBy(key)
        .agg(
            F.avg("Churn").alias("churn_rate"),
            F.count(F.lit(1)).alias("n_customers"),
        )
        .orderBy(key)
    )


def churn_rate_by_subscription(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _rate_by(spark, sf_dir, "Subscription Type")


def churn_rate_by_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _rate_by(spark, sf_dir, "Contract Length")


# ---------------------------------------------------------------------------
# P4 + L1 — parameterized range filter + top-N (reference app_test.py:122-125).
# The reference's head(10) is file-order; Spark row order is nondeterministic,
# so the engine adds the explicit ORDER BY CustomerID the oracle needs
# (SURVEY.md §2.6 L1).
# ---------------------------------------------------------------------------

DEFAULT_MIN_AGE = 30  # reference slider default, app_test.py:122


def age_filter_topn(
    spark: SparkSession, sf_dir: str, min_age: int = DEFAULT_MIN_AGE, n: int = 10
) -> DataFrame:
    df = churn_customers(spark, sf_dir)
    return df.filter(F.col("Age") > min_age).orderBy("CustomerID").limit(n)


# ---------------------------------------------------------------------------
# A5 — histogram binning (reference app_test.py:109, seaborn histplot).
# Seaborn's auto bin rule is data-dependent; the engine spec fixes width=10
# starting at age 18 so the oracle can reproduce it (SURVEY.md §7 risk 4).
# ---------------------------------------------------------------------------

AGE_BIN_WIDTH = 10
AGE_BIN_LO = 18


def age_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = churn_customers(spark, sf_dir)
    bin_start = (
        F.floor((F.col("Age") - AGE_BIN_LO) / AGE_BIN_WIDTH).cast("int")
        * AGE_BIN_WIDTH
        + AGE_BIN_LO
    )
    return (
        df.groupBy(bin_start.alias("age_bin_start"), F.col("Churn"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("age_bin_start", "Churn")
    )


# A5 KDE overlay (reference sns.histplot kde=True, app_test.py:109).
# Expressed RELATIONALLY instead of via mllib.stat.KernelDensity: the
# gaussian KDE at a fixed grid point g is avg over rows of K((g-Age)/h)/h,
# i.e. broadcast-crossjoin the tiny grid against the table and aggregate —
# map-side partial agg, one shuffle of |grid| rows, fully oracle-checkable.
KDE_BANDWIDTH = 5.0
KDE_GRID = (18, 100, 2)  # lo, hi, step → 42 evaluation points


def age_kde(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = churn_customers(spark, sf_dir)
    lo, hi, step = KDE_GRID
    grid = spark.sql(f"SELECT explode(sequence({lo}, {hi}, {step})) AS age_grid")
    kernel = F.expr(
        f"exp(-0.5 * pow((age_grid - Age) / {KDE_BANDWIDTH}, 2))"
        f" / ({KDE_BANDWIDTH} * sqrt(2 * pi()))"
    )
    return (
        df.crossJoin(F.broadcast(grid))
        .groupBy("age_grid")
        .agg(F.round(F.avg(kernel), 6).alias("density"))
        .orderBy("age_grid")
    )


CORR_FEATURES = ("Age", "Tenure", "Support Calls", "Payment Delay", "Total Spend")


def churn_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of each numeric feature with the churn label —
    the quick-look feature-importance table. All correlations compute in
    ONE aggregate pass (corr is an algebraic aggregate: partial moments
    map-side, one tiny shuffle)."""
    df = churn_customers(spark, sf_dir)
    # + 0.0 kills IEEE negative zero (CLAUDE.md: -0.0 vs 0.0 hash hazard
    # on correlations that can round to zero)
    aggs = [
        (F.round(F.corr(F.col(c), F.col("Churn")), 4) + F.lit(0.0)).alias(c)
        for c in CORR_FEATURES
    ]
    wide = df.agg(*aggs)
    stack = ", ".join(f"'{c}', `{c}`" for c in CORR_FEATURES)
    return wide.selectExpr(
        f"stack({len(CORR_FEATURES)}, {stack}) AS (feature, corr_with_churn)"
    ).orderBy("feature")


def spend_age_scatter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 scatter (reference plt.scatter Age × Total Spend hued by Churn,
    app_test.py:113-118): the engine emits the plotted relation, thinned
    deterministically (CustomerID % 20) instead of TABLESAMPLE so both
    engines select identical rows — at corpus scale a plot never wants
    every point anyway."""
    df = churn_customers(spark, sf_dir)
    return (
        df.filter(F.col("CustomerID") % 20 == 0)
        .select(
            "CustomerID",
            "Age",
            F.round(F.col("Total Spend"), 4).alias("Total Spend"),
            "Churn",
        )
        .orderBy("CustomerID")
    )


# ---------------------------------------------------------------------------
# DuckDB oracle SQL — same names, same aliases.
# ---------------------------------------------------------------------------

_CTE = churn_cte()

ORACLE: dict[str, str] = {
    "churn_stats": f"""
{_CTE}
SELECT
  count(*) AS total_customers,
  avg("Churn") * 100 AS churn_rate_pct,
  coalesce(avg(CASE WHEN "Churn" = 1 THEN "Age" END), 0.0) AS avg_age_churned,
  coalesce(avg(CASE WHEN "Churn" = 0 THEN "Age" END), 0.0) AS avg_age_retained,
  round(coalesce(avg(CASE WHEN "Churn" = 1 THEN "Total Spend" END), 0.0), 4) AS avg_spend_churned,
  round(coalesce(avg(CASE WHEN "Churn" = 0 THEN "Total Spend" END), 0.0), 4) AS avg_spend_retained,
  coalesce(avg(CASE WHEN "Churn" = 1 THEN "Support Calls" END), 0.0) AS avg_support_calls_churned
FROM churn_customers
""",
    "churn_rate_by_subscription": f"""
{_CTE}
SELECT
  "Subscription Type",
  avg("Churn") AS churn_rate,
  count(*) AS n_customers
FROM churn_customers
GROUP BY "Subscription Type"
ORDER BY "Subscription Type"
""",
    "churn_rate_by_contract": f"""
{_CTE}
SELECT
  "Contract Length",
  avg("Churn") AS churn_rate,
  count(*) AS n_customers
FROM churn_customers
GROUP BY "Contract Length"
ORDER BY "Contract Length"
""",
    "age_filter_topn": f"""
{_CTE}
SELECT *
FROM churn_customers
WHERE "Age" > {DEFAULT_MIN_AGE}
ORDER BY "CustomerID"
LIMIT 10
""",
    "age_histogram": f"""
{_CTE}
SELECT
  CAST(FLOOR(("Age" - {AGE_BIN_LO}) / {AGE_BIN_WIDTH}.0) AS INT) * {AGE_BIN_WIDTH} + {AGE_BIN_LO} AS age_bin_start,
  "Churn",
  count(*) AS n
FROM churn_customers
GROUP BY 1, 2
ORDER BY age_bin_start, "Churn"
""",
    "age_kde": f"""
{_CTE},
grid AS (
  SELECT unnest(generate_series({KDE_GRID[0]}, {KDE_GRID[1]}, {KDE_GRID[2]})) AS age_grid
)
SELECT age_grid,
  round(avg(exp(-0.5 * pow((age_grid - "Age") / {KDE_BANDWIDTH}, 2))
            / ({KDE_BANDWIDTH} * sqrt(2 * pi()))), 6) AS density
FROM churn_customers CROSS JOIN grid
GROUP BY age_grid
ORDER BY age_grid
""",
    "spend_age_scatter": f"""
{_CTE}
SELECT "CustomerID", "Age", round("Total Spend", 4) AS "Total Spend", "Churn"
FROM churn_customers
WHERE "CustomerID" % 20 = 0
ORDER BY "CustomerID"
""",
    "churn_correlations": f"""
{_CTE}
{" UNION ALL ".join(
    f'''SELECT '{c}' AS feature, round(corr("{c}", "Churn"), 4) + 0.0 AS corr_with_churn FROM churn_customers'''
    for c in CORR_FEATURES)}
ORDER BY feature
""",
}

QUERIES = {
    "churn_stats": churn_stats,
    "churn_rate_by_subscription": churn_rate_by_subscription,
    "churn_rate_by_contract": churn_rate_by_contract,
    "age_filter_topn": age_filter_topn,
    "age_histogram": age_histogram,
    "age_kde": age_kde,
    "spend_age_scatter": spend_age_scatter,
    "churn_correlations": churn_correlations,
}


# ---------------------------------------------------------------------------
# A5 deepening: EQUI-DEPTH spend histogram (ntile deciles)
# ---------------------------------------------------------------------------

EQUIDEPTH_BINS = 10


def spend_equidepth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (ntile decile) histogram of Total Spend with per-bin
    churn rate — the reference's equi-WIDTH histogram (A5,
    ``age_histogram``) deepened to the quantile-bucket readout an
    analyst uses when the distribution is skewed (every bin holds the
    same row count, so the tail stops vanishing into one bucket).

    Determinism: ntile needs a TOTAL order or the two engines can split
    ties differently — rows order by (exact spend cents, CustomerID);
    both engines give the first buckets the extra rows under the same
    rule. Churn rate is a single division of exact BIGINTs rounded 4dp;
    bin edges display as cents/100. Scale shape: the global ntile
    window is a ONE-REDUCER sort — fine on a customer dimension, wrong
    on a fact; the 100 TB form is the REGISTERED
    ``spend_equidepth_bins_dist`` (two-pass sharded prefix-sum rank,
    hash-checked against this same oracle and pinned equal at two
    SFs). Round 10 swapped every OTHER global-ntile entry onto the
    shared ``functions/ranking.py::dist_ntile`` helper; this entry
    alone keeps the plain window deliberately — it IS the
    oracle-contract twin the distributed rank is proven against
    (whitelisted in the engine-wide window audit)."""
    binned = _spend_churn_cents(spark, sf_dir).withColumn(
        "bin",
        F.ntile(EQUIDEPTH_BINS).over(
            Window.orderBy(F.col("cents"), F.col("CustomerID"))
        ),
    )
    return _equidepth_fold(binned)


def _spend_churn_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(CustomerID, churn, exact spend cents) — the shared input both
    equi-depth entries bin (shared-helper rule: the global-window form
    and the distributed swap must bin identical rows)."""
    df = churn_customers(spark, sf_dir)
    return df.select(
        "CustomerID",
        F.col("Churn").cast("long").alias("churn"),
        F.round(F.col("`Total Spend`") * 100.0, 0).cast("long").alias("cents"),
    )


def _equidepth_fold(binned: DataFrame) -> DataFrame:
    """The shared per-bin aggregation list over a (bin, churn, cents)
    relation — one fold for both equi-depth entries so the output
    contract can't drift."""
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.min("cents").cast("double") / 100.0).alias("spend_lo"),
            (F.max("cents").cast("double") / 100.0).alias("spend_hi"),
            F.sum("churn").alias("n_churned"),
            (
                F.round(
                    F.sum("churn").cast("double")
                    / F.count(F.lit(1)).cast("double"),
                    4,
                )
                + F.lit(0.0)
            ).alias("churn_rate"),
        )
        .orderBy("bin")
    )


def _equidepth_oracle() -> str:
    from ..plans.churn import churn_cte

    return (
        churn_cte()
        + f"""
, binned AS (
  SELECT "CustomerID",
    CAST("Churn" AS BIGINT) AS churn,
    CAST(round("Total Spend" * 100.0, 0) AS BIGINT) AS cents,
    ntile({EQUIDEPTH_BINS}) OVER (ORDER BY
      CAST(round("Total Spend" * 100.0, 0) AS BIGINT), "CustomerID") AS bin
  FROM churn_customers
)
SELECT bin, CAST(count(*) AS BIGINT) AS n,
  CAST(min(cents) AS DOUBLE) / 100.0 AS spend_lo,
  CAST(max(cents) AS DOUBLE) / 100.0 AS spend_hi,
  CAST(sum(churn) AS BIGINT) AS n_churned,
  round(CAST(sum(churn) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) + 0.0
    AS churn_rate
FROM binned
GROUP BY bin
ORDER BY bin
"""
    )


ORACLE["spend_equidepth_bins"] = _equidepth_oracle()
QUERIES["spend_equidepth_bins"] = spend_equidepth_bins


# value-range bucket width for the distributed rank (cents): spend is
# value-bounded (~$0-10k), so the bucket relation is ≤ ~21 rows at ANY
# corpus size — the offsets stay a broadcast no matter how many rows rank
RANK_BUCKET_CENTS = 50_000


def spend_equidepth_bins_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``spend_equidepth_bins`` with the global ntile window replaced by
    the DISTRIBUTED exact rank — the two-pass sharded prefix-sum the
    ntile family's docstrings used to point at as prose (VERDICT r8
    item 3: land the swap as a registered query). The global form
    funnels every row through ONE reducer (Window.orderBy with no
    partition key); this form never does:

      bucket: rows bucket by the order-preserving value range
              ``cents div RANK_BUCKET_CENTS`` (deterministic — no
              sampled boundaries — and global (cents, CustomerID) order
              ≡ bucket order + within-bucket order);
      pass 1: per-bucket row counts → exclusive prefix offsets + grand
              total over the ≤~21-row bucket relation (the only
              no-partition-key window runs HERE, never over customers);
      pass 2: each row's global rank = broadcast carry + local
              row_number within its bucket — ONE ``repartition(bkt)``
              serves both passes (superset-clustering rule);
      ntile:  bin = closed-form ntile arithmetic on the exact rank
              (first n%B bins take ⌈n/B⌉ rows) — all-BIGINT, so both
              engines agree exactly; the ``greatest(sz, 1)`` guard
              keeps ANSI Spark from evaluating a div-by-zero in the
              branch that n < B would make unreachable.

    Output is bit-identical to the global-window entry (rank over a
    total order is invariant to where bucket boundaries fall) — pinned
    at two SFs by ``tests/test_round9.py`` and hash-checked against the
    SAME plain-ntile oracle, which stays the semantic contract. At
    production skew (one hot spend value), the same salting/levels
    levers as ``pack_shards`` apply; buckets stay value-bounded.

    Round 10 (VERDICT r9 item 3): the two-pass rank is now the SHARED
    ``functions/ranking.py::dist_ntile`` helper, which the whole
    global-ntile family (``segment_spend_quartiles``, ``rfm_segments``,
    ``calibration_curve``) calls — one proven implementation, no
    per-query re-derivation."""
    from ..functions.ranking import dist_ntile

    binned = dist_ntile(
        _spend_churn_cents(spark, sf_dir),
        EQUIDEPTH_BINS,
        F.expr(f"cents div {RANK_BUCKET_CENTS}"),
        [F.col("cents"), F.col("CustomerID")],
    )
    return _equidepth_fold(binned)


# the oracle is the plain global ntile — the semantic CONTRACT the
# distributed rank must reproduce bit-for-bit
ORACLE["spend_equidepth_bins_dist"] = _equidepth_oracle()
QUERIES["spend_equidepth_bins_dist"] = spend_equidepth_bins_dist
