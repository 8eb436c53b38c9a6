"""Feature-selection diagnostics over ``churn_customers`` — the screen
a training pipeline runs BEFORE the in-engine trainers (ml/gbdt.py,
ml/cart.py, ml/scoring.py::logreg_churn_gd): rank every candidate
feature by mutual information with the label from ONE melted
contingency pass. Complements ``chi2_churn_contract`` (a single
categorical's independence test) with the all-features ranking view.

Scale shape: stack-melt the feature matrix map-side (no shuffle), then
ONE partial-aggregating groupBy(feat, bucket, y) — the shuffle carries
contingency cells (|feats| x |buckets| x 2 rows), never data. The MI
assembly runs entirely on that tiny cell relation via two window sums
and an exact-integer reduction.

Cross-engine exactness: all cell/marginal counts are exact BIGINTs;
each cell's MI term (p_vy * ln(p_vy / (p_v * p_y)) in nats) is ONE
identical double chain over those ints (ln on identical doubles is the
house precedent), scaled to a 1e8 BIGINT per cell BEFORE the final
sum so the per-feature total is order-free; the emitted mi_nats is
the exact division mi_i8 / 1e8 with NO re-rounding (a rounded derived
value at 1e-8 granularity is precisely the near-half repr trap
CLAUDE.md bans). Ranking orders by the INTEGER mi_i8 (desc, feat) so
both engines agree on every rank. The ratio inside ln multiplies
counts in DOUBLE (n_vy * n can pass 2^63 at row counts ~3e9 — the
Gini rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.churn import churn_cte, churn_customers

# (feature label, dialect-neutral bucket expression over churn columns;
# {q} is the identifier quote). FLOOR(int / int) is exact in both
# engines (`/` yields DOUBLE in Spark AND DuckDB; floor of a dyadic-
# exact quotient); categoricals map to small integer codes.
MI_FEATS: list[tuple[str, str]] = [
    ("age_decade", "CAST(FLOOR({q}Age{q} / 10) AS BIGINT)"),
    ("tenure_year", "CAST(FLOOR({q}Tenure{q} / 12) AS BIGINT)"),
    ("usage_band", "CAST(FLOOR({q}Usage Frequency{q} / 10) AS BIGINT)"),
    ("support_calls_band", "CAST(FLOOR({q}Support Calls{q} / 5) AS BIGINT)"),
    ("payment_delay_band", "CAST(FLOOR({q}Payment Delay{q} / 5) AS BIGINT)"),
    ("last_interaction_band", "CAST(FLOOR({q}Last Interaction{q} / 10) AS BIGINT)"),
    ("spend_band", "CAST(FLOOR({q}Total Spend{q} / 2000) AS BIGINT)"),
    (
        "gender",
        "CAST(CASE {q}Gender{q} WHEN 'Male' THEN 1 ELSE 0 END AS BIGINT)",
    ),
    (
        "subscription",
        "CAST(CASE {q}Subscription Type{q} WHEN 'Basic' THEN 0 "
        "WHEN 'Standard' THEN 1 ELSE 2 END AS BIGINT)",
    ),
    (
        "contract",
        "CAST(CASE {q}Contract Length{q} WHEN 'Monthly' THEN 0 "
        "WHEN 'Quarterly' THEN 1 ELSE 2 END AS BIGINT)",
    ),
]
MI_SCALE = 100000000.0  # per-cell MI terms -> exact 1e8 BIGINTs


def mi_feature_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank the 10 churn feature candidates by mutual information with
    the label (nats). The synthetic label is a linear threshold on
    Support Calls / Payment Delay / Tenure (plans/churn.py), so the
    pytest companion pins those three as the top-3 ranks — the sanity
    check that the screen finds the real signal."""
    cc = churn_customers(spark, sf_dir)
    melted = cc.selectExpr(
        "CAST(Churn AS BIGINT) AS y",
        "stack({n}, {pairs}) AS (feat, bucket)".format(
            n=len(MI_FEATS),
            pairs=", ".join(
                f"'{name}', {expr.format(q='`')}" for name, expr in MI_FEATS
            ),
        ),
    )
    cells = melted.groupBy("feat", "bucket", "y").agg(
        F.count(F.lit(1)).alias("n_vy")
    )
    wv = Window.partitionBy("feat", "bucket")
    wy = Window.partitionBy("feat", "y")
    wn = Window.partitionBy("feat")
    marg = cells.select(
        "feat",
        "bucket",
        "y",
        "n_vy",
        F.sum("n_vy").over(wv).alias("n_v"),
        F.sum("n_vy").over(wy).alias("n_y"),
        F.sum("n_vy").over(wn).alias("n"),
    )
    term = (
        F.col("n_vy").cast("double")
        / F.col("n").cast("double")
        * F.log(
            F.col("n_vy").cast("double") * F.col("n").cast("double")
            / (F.col("n_v").cast("double") * F.col("n_y").cast("double"))
        )
    )
    per_feat = marg.select(
        "feat",
        F.round(term * F.lit(MI_SCALE), 0).cast("long").alias("t_i8"),
        "bucket",
    ).groupBy("feat").agg(
        F.sum("t_i8").alias("mi_i8"),
        F.countDistinct("bucket").alias("n_buckets"),
    )
    rw = Window.orderBy(F.desc("mi_i8"), "feat")
    return per_feat.select(
        "feat",
        "n_buckets",
        (F.col("mi_i8").cast("double") / F.lit(MI_SCALE)).alias("mi_nats"),
        F.row_number().over(rw).cast("int").alias("mi_rank"),
    ).orderBy("mi_rank")


def _duck_mi_sql() -> str:
    melt = " UNION ALL ".join(
        "SELECT CAST(\"Churn\" AS BIGINT) AS y, '{name}' AS feat, "
        "{expr} AS bucket FROM churn_customers".format(
            name=name, expr=expr.format(q='"')
        )
        for name, expr in MI_FEATS
    )
    return (
        churn_cte()
        + f""",
melted AS ({melt}),
cells AS (
  SELECT feat, bucket, y, CAST(count(*) AS BIGINT) AS n_vy
  FROM melted GROUP BY 1, 2, 3
),
marg AS (
  SELECT feat, bucket, y, n_vy,
    CAST(sum(n_vy) OVER (PARTITION BY feat, bucket) AS BIGINT) AS n_v,
    CAST(sum(n_vy) OVER (PARTITION BY feat, y) AS BIGINT) AS n_y,
    CAST(sum(n_vy) OVER (PARTITION BY feat) AS BIGINT) AS n
  FROM cells
),
per_feat AS (
  SELECT feat,
    CAST(sum(CAST(round(
      CAST(n_vy AS DOUBLE) / CAST(n AS DOUBLE)
      * ln(CAST(n_vy AS DOUBLE) * CAST(n AS DOUBLE)
        / (CAST(n_v AS DOUBLE) * CAST(n_y AS DOUBLE)))
      * CAST({MI_SCALE!r} AS DOUBLE), 0) AS BIGINT)) AS BIGINT) AS mi_i8,
    CAST(count(DISTINCT bucket) AS BIGINT) AS n_buckets
  FROM marg GROUP BY 1
)
SELECT feat, n_buckets,
  CAST(mi_i8 AS DOUBLE) / CAST({MI_SCALE!r} AS DOUBLE) AS mi_nats,
  CAST(row_number() OVER (ORDER BY mi_i8 DESC, feat) AS INT) AS mi_rank
FROM per_feat
ORDER BY mi_rank
"""
    )


ORACLE: dict[str, str] = {"mi_feature_ranking": _duck_mi_sql()}
QUERIES = {"mi_feature_ranking": mi_feature_ranking}
