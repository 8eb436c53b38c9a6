"""Churn scoring (SURVEY.md §2.9, M5-M6) — three tiers.

1. **Expression tier** (the oracle-checked default): a deterministic
   linear-sigmoid scorer over the 15 preprocessed features. Pure Column
   arithmetic → whole-stage codegen, no Python in the hot path, and the
   exact same expression renders into DuckDB SQL for the correctness gate.
   (The reference scores through a pickled sklearn→XGBoost pipeline,
   app_test.py:235-236,296; xgboost isn't available here, and a 400-tree
   booster isn't SQL-expressible anyway — the linear scorer keeps the
   *operator surface* (impute→scale→OHE→score→bucket→format) oracle-checkable
   end-to-end.)

2. **pandas-UDF tier**: the same scorer routed through an Arrow-batched
   ``pandas_udf`` — the integration point where a real booster artifact
   would plug in (broadcast the model, score per Arrow batch). A test
   asserts it agrees with the expression tier to 1e-9.

3. **Spark ML tier**: a native ``GBTClassifier`` pipeline trained in-Spark
   (``train_gbt``), the idiomatic replacement for the reference's offline
   sklearn fit. Distributed training, no driver-side model dependency.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.expressions import (
    hard_label,
    pct_format,
    pct_format_sql,
    risk_bucket,
    risk_bucket_sql,
)
from ..functions.hashing import duck_md5_int, md5_int_sql
from ..plans.churn import churn_cte, churn_customers
from .preprocess import (
    CATEGORICAL_STATS,
    NUMERIC_STATS,
    onehot,
    onehot_sql,
    scaled_numeric,
    scaled_numeric_sql,
)

# Engine-owned linear model over the 15-feature space (7 scaled numeric +
# 8 one-hot). Weights are fixed literals — deterministic across engines.
INTERCEPT = 0.40
WEIGHTS: list[tuple[str, str | tuple[str, str], float]] = [
    # (kind, column-or-(column,category), weight) in fixed evaluation order
    ("num", "Age", 0.10),
    ("num", "Tenure", -0.45),
    ("num", "Usage Frequency", 0.05),
    ("num", "Support Calls", 0.85),
    ("num", "Payment Delay", 0.55),
    ("num", "Total Spend", -0.25),
    ("num", "Last Interaction", -0.10),
    ("cat", ("Gender", "Female"), -0.05),
    ("cat", ("Gender", "Male"), 0.05),
    ("cat", ("Subscription Type", "Basic"), 0.10),
    ("cat", ("Subscription Type", "Premium"), -0.10),
    ("cat", ("Subscription Type", "Standard"), 0.0),
    ("cat", ("Contract Length", "Annual"), -0.20),
    ("cat", ("Contract Length", "Monthly"), 0.20),
    ("cat", ("Contract Length", "Quarterly"), 0.0),
]


def _logit() -> Column:
    """z = intercept + Σ wᵢ·featureᵢ, additions in WEIGHTS order (so the
    left-associated FP sum is bit-identical to the SQL rendering)."""
    z: Column = F.lit(INTERCEPT)
    for kind, key, w in WEIGHTS:
        feat = scaled_numeric(key) if kind == "num" else onehot(*key)
        z = z + F.lit(w) * feat
    return z


def _logit_sql(q: str = '"') -> str:
    terms = [repr(INTERCEPT)]
    for kind, key, w in WEIGHTS:
        feat = scaled_numeric_sql(key, q) if kind == "num" else onehot_sql(*key, q=q)
        terms.append(f"{w!r} * {feat}")
    return " + ".join(terms)


def churn_probability() -> Column:
    """Sigmoid of the logit, rounded to 4dp (keeps libm exp() ulp
    differences between the JVM and DuckDB out of the value hash)."""
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-_logit())), 4)


def churn_probability_sql(q: str = '"') -> str:
    return f"round(1.0 / (1.0 + exp(-({_logit_sql(q)}))), 4)"


def _score_projection(df: DataFrame) -> DataFrame:
    """The reference's result shaping (app_test.py:298-301): id, probability,
    percent string, risk bucket, hard label."""
    p = churn_probability()
    return df.select(
        F.col("CustomerID"),
        p.alias("churn_probability"),
        pct_format(p).alias("churn_pct"),
        risk_bucket(p).alias("risk"),
        hard_label(p).alias("predicted_churn"),
    )


def _score_projection_sql(q: str = '"') -> str:
    p = churn_probability_sql(q)
    return (
        f"SELECT {q}CustomerID{q},\n"
        f"  {p} AS churn_probability,\n"
        f"  {pct_format_sql(p)} AS churn_pct,\n"
        f"  {risk_bucket_sql(p)} AS risk,\n"
        f"  CAST({p} >= 0.5 AS INT) AS predicted_churn"
    )


# ---------------------------------------------------------------------------
# queries() entries
# ---------------------------------------------------------------------------


def churn_score_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk scoring path (reference app_test.py:295-301) over the full
    churn table. Narrow map-only plan: scan → expressions → project."""
    return _score_projection(churn_customers(spark, sf_dir))


def churn_risk_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Risk-bucket distribution: scoring feeding a group-by."""
    scored = _score_projection(churn_customers(spark, sf_dir))
    return (
        scored.groupBy("risk")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("churn_probability"), 4).alias("avg_probability"),
        )
        .orderBy("risk")
    )


# The reference's single-row wizard defaults (app_test.py:143-147) —
# FIXTURES.md §3. Scoring a 1-row literal relation (operator S4).
SINGLE_ROW = {
    "CustomerID": 1,
    "Age": 35,
    "Gender": "Male",
    "Tenure": 12,
    "Usage Frequency": 15,
    "Support Calls": 2,
    "Payment Delay": 5,
    "Subscription Type": "Standard",
    "Contract Length": "Annual",
    "Total Spend": 500.0,
    "Last Interaction": 10,
}


def single_customer_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.createDataFrame([tuple(SINGLE_ROW.values())], list(SINGLE_ROW))
    return _score_projection(df)


# Bulk upload with missing values and an unseen category — exercises M1/M3
# imputation and OHE handle_unknown="ignore" (all-zero row). Derived
# deterministically from churn_customers so the oracle sees identical input
# (FIXTURES.md §2 semantics without an external CSV).
_UPLOAD_NULLS = """
SELECT
  {q}CustomerID{q},
  CASE WHEN {q}CustomerID{q} % 11 = 0 THEN NULL ELSE {q}Age{q} END AS {q}Age{q},
  CASE WHEN {q}CustomerID{q} % 13 = 0 THEN NULL ELSE {q}Gender{q} END AS {q}Gender{q},
  {q}Tenure{q},
  {q}Usage Frequency{q},
  CASE WHEN {q}CustomerID{q} % 17 = 0 THEN NULL ELSE {q}Support Calls{q} END AS {q}Support Calls{q},
  {q}Payment Delay{q},
  CASE WHEN {q}CustomerID{q} % 7 = 0 THEN 'Platinum' ELSE {q}Subscription Type{q} END AS {q}Subscription Type{q},
  {q}Contract Length{q},
  CASE WHEN {q}CustomerID{q} % 19 = 0 THEN NULL ELSE {q}Total Spend{q} END AS {q}Total Spend{q},
  {q}Last Interaction{q}
FROM churn_customers
"""


def bulk_score_with_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    churn_customers(spark, sf_dir).createOrReplaceTempView("churn_customers")
    upload = spark.sql(_UPLOAD_NULLS.format(q="`"))
    return _score_projection(upload)


def calibration_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-evaluation operator: decile calibration of the churn scorer —
    per predicted-probability decile, mean prediction vs observed churn
    rate. The reliability diagram behind every 'is the model calibrated'
    review. The decile order is (probability, CustomerID) — a TOTAL
    order, so tied probabilities land in the same decile in both engines
    (CLAUDE.md tie rule). Observed rates are integer-count averages:
    engine-exact.

    Round 10 (VERDICT r9 item 3): the decile comes from the SHARED
    distributed two-pass rank (``functions/ranking.py::dist_ntile``) —
    no row-level no-partition-key window anywhere in the plan.
    Probabilities are in [0, 1], so ``floor(p * 50)`` is an
    order-preserving ≤51-value bucket at any corpus size; the oracle
    stays the plain global ntile, the contract the distributed rank
    reproduces bit-for-bit."""
    from ..functions.ranking import dist_ntile

    scored = churn_customers(spark, sf_dir).select(
        F.col("CustomerID"),
        F.col("Churn"),
        churn_probability().alias("churn_probability"),
    )
    binned = dist_ntile(
        scored,
        10,
        F.expr("CAST(floor(churn_probability * 50) AS BIGINT)"),
        [F.col("churn_probability"), F.col("CustomerID")],
        out_col="decile",
    )
    return (
        binned.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("churn_probability"), 4).alias("mean_predicted"),
            F.round(F.avg("Churn"), 4).alias("observed_rate"),
        )
        .orderBy("decile")
    )


N_FOLDS = 5


def kfold_churn_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-fold ROC-AUC of the churn scorer under a deterministic md5
    5-fold assignment — the rank-statistic form (AUC = normalized
    Mann-Whitney U with midranks for ties).

    Scale shape: the naive AUC ranks every ROW per fold (a per-fold
    global sort — 5 reducers at any corpus size). Instead the corpus
    pass is a hash agg on (fold, score): scores are 4dp-rounded, so the
    distinct-score relation is ≤ folds×10001 rows, and the rank window
    runs over THAT. midrank_s = cum_before + (n_s+1)/2 replays the
    per-row midranks exactly from the (n, n_pos) cells — all integer /
    half-integer arithmetic, so both engines agree bit-for-bit before
    the single final division.
    """
    from pyspark.sql import Window

    base = churn_customers(spark, sf_dir)
    fold = (
        F.expr(md5_int_sql("concat('fold_', CustomerID)")) % N_FOLDS
    ).alias("fold")
    scored = base.select(
        fold,
        F.col("Churn").cast("long").alias("y"),
        churn_probability().alias("p"),
    )
    cells = scored.groupBy("fold", "p").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("n_pos")
    )
    w = (
        Window.partitionBy("fold")
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = cells.withColumn(
        "cum_before", F.coalesce(F.sum("n").over(w), F.lit(0))
    )
    midrank = F.col("cum_before") + (F.col("n") + F.lit(1)) / F.lit(2.0)
    per_fold = ranked.groupBy("fold").agg(
        F.sum("n").alias("n_rows"),
        F.sum("n_pos").alias("pos"),
        F.sum(F.col("n_pos") * midrank).alias("prs"),
    )
    auc = (
        F.col("prs") - F.col("pos") * (F.col("pos") + F.lit(1)) / F.lit(2.0)
    ) / (F.col("pos") * (F.col("n_rows") - F.col("pos")))
    return per_fold.select(
        "fold",
        F.col("n_rows").alias("n"),
        F.col("pos").alias("n_pos"),
        (F.col("n_rows") - F.col("pos")).alias("n_neg"),
        F.round(auc, 4).alias("auc"),
    ).orderBy("fold")


def churn_scorer_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proper-scoring-rule evaluation per fold: Brier score, log loss,
    and accuracy@0.5 — the calibration-sensitive complement to
    ``kfold_churn_auc`` (AUC only ranks; Brier/log-loss punish
    miscalibrated confidence). Probabilities are clamped to
    [1e-6, 1-1e-6] before the logs (4dp-rounded sigmoids CAN hit exactly
    0/1) with the identical clamp on both engines; everything else is
    one hash-agg pass of per-row deterministic terms, rounded 4dp."""
    base = churn_customers(spark, sf_dir)
    fold = (
        F.expr(md5_int_sql("concat('fold_', CustomerID)")) % N_FOLDS
    ).alias("fold")
    p = churn_probability()
    pc = F.least(F.greatest(p, F.lit(1e-6)), F.lit(1.0 - 1e-6))
    scored = base.select(
        fold,
        F.col("Churn").cast("double").alias("y"),
        p.alias("p"),
        pc.alias("pc"),
    )
    return (
        scored.groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.avg((F.col("p") - F.col("y")) * (F.col("p") - F.col("y"))),
                4,
            ).alias("brier"),
            F.round(
                -F.avg(
                    F.col("y") * F.log("pc")
                    + (1 - F.col("y")) * F.log(1 - F.col("pc"))
                ),
                4,
            ).alias("log_loss"),
            F.round(
                F.avg(
                    F.when(
                        F.when(F.col("p") >= 0.5, F.lit(1.0)).otherwise(0.0)
                        == F.col("y"),
                        1.0,
                    ).otherwise(0.0)
                ),
                4,
            ).alias("accuracy"),
        )
        .orderBy("fold")
    )


def score_upload(upload: DataFrame, scorer: str = "linear") -> DataFrame:
    """The reference's full bulk path (app_test.py:295-302) over an
    arbitrary upload relation: CustomerID-or-ordinal fallback (E3/L2),
    preprocess, score, risk shaping. Use with ``sources.files.read_csv``
    / ``read_excel`` output.

    ``scorer="booster"`` routes through the reference's actual 400-tree
    XGBoost artifact (``ml/booster.py`` tree-parity path) — the
    probabilities a reference user expects from their upload; "linear"
    keeps the engine-owned oracle-checkable scorer."""
    from ..functions.expressions import with_customer_id

    if scorer == "booster":
        from .booster import score_with_booster

        return score_with_booster(with_customer_id(upload))
    return _score_projection(with_customer_id(upload))


ORACLE: dict[str, str] = {
    "churn_score_batch": f"""
{churn_cte()}
{_score_projection_sql()}
FROM churn_customers
""",
    "churn_risk_summary": f"""
{churn_cte()},
scored AS (
{_score_projection_sql()}
FROM churn_customers
)
SELECT risk, count(*) AS n_customers,
       round(avg(churn_probability), 4) AS avg_probability
FROM scored
GROUP BY risk
ORDER BY risk
""",
    "single_customer_score": f"""
WITH churn_input AS (
  SELECT
    CAST(1 AS BIGINT) AS "CustomerID", 35 AS "Age", 'Male' AS "Gender", 12 AS "Tenure",
    15 AS "Usage Frequency", 2 AS "Support Calls", 5 AS "Payment Delay",
    'Standard' AS "Subscription Type", 'Annual' AS "Contract Length",
    500.0 AS "Total Spend", 10 AS "Last Interaction"
)
{_score_projection_sql().replace('churn_customers', 'churn_input')}
FROM churn_input
""",
    "bulk_score_with_nulls": f"""
{churn_cte()},
upload AS (
{_UPLOAD_NULLS.format(q='"')}
)
{_score_projection_sql()}
FROM upload
""",
}

ORACLE["calibration_curve"] = f"""
{churn_cte()},
scored AS (
  SELECT "CustomerID", "Churn",
    {churn_probability_sql()} AS churn_probability
  FROM churn_customers
),
binned AS (
  SELECT "Churn", churn_probability,
    ntile(10) OVER (ORDER BY churn_probability, "CustomerID") AS decile
  FROM scored
)
SELECT decile,
  count(*) AS n_customers,
  round(avg(churn_probability), 4) AS mean_predicted,
  round(avg("Churn"), 4) AS observed_rate
FROM binned
GROUP BY decile
ORDER BY decile
"""

_FOLD_HASH = duck_md5_int('concat(\'fold_\', "CustomerID")')

ORACLE["kfold_churn_auc"] = f"""
{churn_cte()},
scored AS (
  SELECT {_FOLD_HASH} % {N_FOLDS} AS fold,
    CAST("Churn" AS BIGINT) AS y,
    {churn_probability_sql()} AS p
  FROM churn_customers
),
cells AS (
  SELECT fold, p, count(*) AS n, CAST(sum(y) AS BIGINT) AS n_pos
  FROM scored GROUP BY fold, p
),
ranked AS (
  SELECT fold, n, n_pos,
    COALESCE(CAST(sum(n) OVER (
      PARTITION BY fold ORDER BY p
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
      AS cum_before
  FROM cells
),
per_fold AS (
  SELECT fold,
    CAST(sum(n) AS BIGINT) AS n_rows,
    CAST(sum(n_pos) AS BIGINT) AS pos,
    sum(n_pos * (cum_before + (n + 1) / CAST(2 AS DOUBLE))) AS prs
  FROM ranked GROUP BY fold
)
SELECT fold, n_rows AS n, pos AS n_pos, n_rows - pos AS n_neg,
  round((prs - pos * (pos + 1) / CAST(2 AS DOUBLE))
        / (pos * (n_rows - pos)), 4) AS auc
FROM per_fold
ORDER BY fold
"""

ORACLE["churn_scorer_metrics"] = f"""
{churn_cte()},
scored AS (
  SELECT {_FOLD_HASH} % {N_FOLDS} AS fold,
    CAST("Churn" AS DOUBLE) AS y,
    {churn_probability_sql()} AS p
  FROM churn_customers
),
clamped AS (
  SELECT fold, y, p,
    least(greatest(p, CAST(0.000001 AS DOUBLE)),
          CAST(0.999999 AS DOUBLE)) AS pc
  FROM scored
)
SELECT fold, count(*) AS n,
  round(avg((p - y) * (p - y)), 4) AS brier,
  round(-avg(y * ln(pc) + (1 - y) * ln(1 - pc)), 4) AS log_loss,
  round(avg(CASE WHEN (CASE WHEN p >= 0.5 THEN 1.0 ELSE 0.0 END) = y
            THEN 1.0 ELSE 0.0 END), 4) AS accuracy
FROM clamped
GROUP BY fold
ORDER BY fold
"""

QUERIES = {
    "churn_score_batch": churn_score_batch,
    "churn_risk_summary": churn_risk_summary,
    "single_customer_score": single_customer_score,
    "bulk_score_with_nulls": bulk_score_with_nulls,
    "calibration_curve": calibration_curve,
    "kfold_churn_auc": kfold_churn_auc,
    "churn_scorer_metrics": churn_scorer_metrics,
}


# ---------------------------------------------------------------------------
# pandas-UDF tier (M5's real surface): Arrow-batched scoring.
# ---------------------------------------------------------------------------


def score_with_pandas_udf(df: DataFrame) -> DataFrame:
    """Score via an Arrow-batched pandas UDF over the assembled feature
    vector — the plug-in point for a real serialized booster (broadcast
    the artifact; score one Arrow batch at a time, numpy-vectorized).
    """
    from pyspark.sql.functions import pandas_udf

    weights = np.array([w for _, _, w in WEIGHTS])
    intercept = INTERCEPT

    @pandas_udf("double")
    def score_batch(features: pd.Series) -> pd.Series:
        x = np.vstack(features.to_numpy())  # (batch, 15)
        z = intercept + x @ weights
        # NO np.round here: numpy rounds half-even on the binary double,
        # F.round half-up on its decimal repr (CLAUDE.md) — rounding
        # happens in-query below so this tier stays bit-compatible with
        # the expression tier on exact halves
        return pd.Series(1.0 / (1.0 + np.exp(-z)))

    feats = [
        (scaled_numeric(key) if kind == "num" else onehot(*key))
        for kind, key, _ in WEIGHTS
    ]
    return df.select(
        F.col("CustomerID"),
        F.round(score_batch(F.array(*feats)), 4).alias("churn_probability"),
    )


# ---------------------------------------------------------------------------
# Spark ML tier: native distributed GBT training (idiomatic replacement for
# the reference's offline sklearn/XGBoost fit).
# ---------------------------------------------------------------------------


def train_gbt(train_df: DataFrame, max_iter: int = 20, seed: int = 42):
    """Train a GBT churn classifier on the preprocessed feature space.

    Returns (pipeline_model, scored_df with probability/prediction).
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import GBTClassifier
    from pyspark.ml.feature import VectorAssembler

    feats = [
        (scaled_numeric(key) if kind == "num" else onehot(*key)).alias(
            f"f_{i}"
        )
        for i, (kind, key, _) in enumerate(WEIGHTS)
    ]
    prepared = train_df.select("*", *feats)
    assembler = VectorAssembler(
        inputCols=[f"f_{i}" for i in range(len(WEIGHTS))], outputCol="features"
    )
    gbt = GBTClassifier(
        labelCol="Churn",
        featuresCol="features",
        maxIter=max_iter,
        maxDepth=4,
        stepSize=0.05,
        seed=seed,
    )
    model = Pipeline(stages=[assembler, gbt]).fit(prepared)
    return model, model.transform(prepared)


def sigmoid(z: float) -> float:
    return 1.0 / (1.0 + math.exp(-z))


def isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAV) calibration of the churn scorer over the decile
    reliability bins — the non-parametric calibrator applied when
    ``calibration_curve`` shows the scores are mis-calibrated but
    rank-ordered. Instead of the sequential pool-adjacent-violators
    stack (driver-side, order-dependent), the fit uses the exact minimax
    identity ``cal_i = max_{j<=i} min_{k>=i} avg(pos[j..k])/avg(n[j..k])``
    — set-based, so it runs as three joins/aggregations over the
    10-row bin relation (constant B³ = 1000 combinations at ANY corpus
    size; the only corpus-scaled work is the one decile pass). That
    decile pass is a global ``ntile(10)`` window — a single-partition
    sort here; at 100 TB swap it for the ``calibration_curve`` recipe
    (approx_percentile decile edges + a map-side bin lookup — same
    bins up to edge-tie placement, no global sort). The exact ntile
    stays the oracle-checkable contract at test scale.

    Cross-engine: pooled averages divide exact integer sums, so every
    candidate value is the identical double on both engines and the
    min/max lattice — and therefore the fitted monotone curve — matches
    bit-for-bit before the presentational 4dp rounds.
    ``tests/test_round5.py`` replays classic sequential PAV in Python
    and pins equality with the minimax result."""
    from pyspark.sql import Window

    scored = churn_customers(spark, sf_dir).select(
        F.col("CustomerID"),
        F.col("Churn"),
        churn_probability().alias("p"),
    )
    w = Window.orderBy("p", "CustomerID")
    bins = (
        scored.withColumn("decile", F.ntile(10).over(w))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("Churn").cast("long")).alias("pos"),
            F.round(F.avg("p"), 4).alias("mean_predicted"),
        )
        .localCheckpoint()  # 10 rows, consumed by 4 branches below
    )
    j = bins.select(F.col("decile").alias("j"))
    k = bins.select(F.col("decile").alias("k"))
    member = bins.select(F.col("decile").alias("d"), "n", "pos")
    ranges = (
        j.join(k, F.col("j") <= F.col("k"))
        .join(
            member,
            (F.col("d") >= F.col("j")) & (F.col("d") <= F.col("k")),
        )
        .groupBy("j", "k")
        .agg(
            (
                F.sum("pos").cast("double") / F.sum("n").cast("double")
            ).alias("avg_jk")
        )
    )
    i_rel = bins.select(F.col("decile").alias("i"))
    cal = (
        ranges.join(
            i_rel, (F.col("j") <= F.col("i")) & (F.col("i") <= F.col("k"))
        )
        .groupBy("i", "j")
        .agg(F.min("avg_jk").alias("mn"))
        .groupBy("i")
        .agg(F.max("mn").alias("cal"))
    )
    return (
        bins.join(cal, bins.decile == cal.i)
        .select(
            "decile",
            F.col("n").alias("n_customers"),
            "mean_predicted",
            F.round(
                F.col("pos").cast("double") / F.col("n").cast("double"), 4
            ).alias("observed_rate"),
            F.round("cal", 4).alias("calibrated_rate"),
        )
        .orderBy("decile")
    )


ORACLE["isotonic_calibration"] = f"""
{churn_cte()},
scored AS (
  SELECT "CustomerID", "Churn",
    {churn_probability_sql()} AS churn_probability
  FROM churn_customers
),
binned AS (
  SELECT "Churn", churn_probability,
    ntile(10) OVER (ORDER BY churn_probability, "CustomerID") AS decile
  FROM scored
),
bins AS (
  SELECT decile, CAST(count(*) AS BIGINT) AS n,
    CAST(sum("Churn") AS BIGINT) AS pos,
    round(avg(churn_probability), 4) AS mean_predicted
  FROM binned GROUP BY decile
),
ranges AS (
  SELECT j.decile AS j, k.decile AS k,
    CAST(sum(b.pos) AS DOUBLE) / CAST(sum(b.n) AS DOUBLE) AS avg_jk
  FROM bins j JOIN bins k ON j.decile <= k.decile
  JOIN bins b ON b.decile BETWEEN j.decile AND k.decile
  GROUP BY 1, 2
),
inner_min AS (
  SELECT i.decile AS i, r.j, min(r.avg_jk) AS mn
  FROM ranges r JOIN bins i ON r.j <= i.decile AND i.decile <= r.k
  GROUP BY 1, 2
),
cal AS (SELECT i, max(mn) AS cal FROM inner_min GROUP BY i)
SELECT b.decile, b.n AS n_customers, b.mean_predicted,
  round(CAST(b.pos AS DOUBLE) / CAST(b.n AS DOUBLE), 4) AS observed_rate,
  round(c.cal, 4) AS calibrated_rate
FROM bins b JOIN cal c ON c.i = b.decile
ORDER BY b.decile
"""
QUERIES["isotonic_calibration"] = isotonic_calibration


CONFORMAL_ALPHA_PCT = 10  # target miscoverage 10% -> 90% coverage sets


def conformal_churn_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction sets (Vovk; Angelopoulos & Bates 2021)
    for the churn scorer — the distribution-free uncertainty wrapper a
    production scorer ships with: on a calibration split, take the
    ceil((n+1)(1−α))-th smallest nonconformity score (1 − P(true
    class)); on the eval split, each customer's prediction SET contains
    every class whose nonconformity is ≤ that threshold, guaranteeing
    ≥ 1−α marginal coverage with NO model assumptions. Output: the set-
    composition census (both / only_1 / only_0 / empty), per-set
    empirical coverage counts, and the threshold — the relation a risk
    review reads to see where the model is genuinely uncertain.

    Cross-engine: the split is md5 parity, scores round 4dp before
    ranking, the threshold is an EXACT order statistic (row_number at an
    integer rank computed with integer ceiling arithmetic — no float
    quantile), and set membership compares identical 4dp doubles, so
    both engines build identical sets. Scale: two passes over the
    scored relation; the 1-row threshold broadcasts. Round 10: the
    calibration rank comes from the SHARED distributed two-pass rank
    (``functions/ranking.py::bucketed_rank`` — scores are 4dp in
    [0, 1], so ``floor(s*50)`` is an order-preserving ≤51-value
    bucket), so the exact order statistic needs NO global
    single-partition sort at any calibration-set size; and the eval
    census total is a 1-row in-plan aggregate instead of an eager
    driver-side ``count()`` at query-construction time (the
    ``ra_link_prediction_scaled`` lazy-construction rule).
    """
    from ..functions.ranking import bucketed_rank

    scored = churn_customers(spark, sf_dir).select(
        "CustomerID",
        F.col("Churn").cast("long").alias("y"),
        churn_probability().alias("p"),
        (
            F.expr(md5_int_sql("concat('conf_', CustomerID)")) % 2
        ).alias("split"),
    )
    # r13 optimization: cal feeds the size aggregate AND both passes of
    # the distributed rank — unpersisted, each consumer replanned the
    # scored subtree (8 customer scans in the before-plan). One lazy
    # persist brings the query to the documented two passes (calibrate,
    # evaluate); at scale caching the calibration scores is the
    # standard split-conformal layout.
    cal = scored.filter(F.col("split") == 0).select(
        "CustomerID",
        F.round(
            F.when(F.col("y") == 1, 1.0 - F.col("p")).otherwise(F.col("p")),
            4,
        ).alias("s"),
    ).persist()
    n_cal = cal.agg(F.count(F.lit(1)).alias("n"))
    ranked = bucketed_rank(
        cal,
        F.expr("CAST(floor(s * 50) AS BIGINT)"),
        [F.col("s"), F.col("CustomerID")],
        rank_col="rn",
    )
    qhat = (
        ranked.crossJoin(F.broadcast(n_cal))
        .filter(
            F.col("rn")
            == F.expr(
                f"CAST(({100 - CONFORMAL_ALPHA_PCT} * (n + 1) + 99) "
                "DIV 100 AS BIGINT)"
            )
        )
        .select(F.col("s").alias("qhat"))
    )
    ev = (
        scored.filter(F.col("split") == 1)
        .crossJoin(F.broadcast(qhat))
        .select(
            "y",
            "qhat",
            (F.round(1.0 - F.col("p"), 4) <= F.col("qhat")).alias("in1"),
            (F.round(F.col("p"), 4) <= F.col("qhat")).alias("in0"),
        )
        .select(
            "y",
            "qhat",
            "in1",
            "in0",
            F.when(F.col("in1") & F.col("in0"), "both")
            .when(F.col("in1"), "only_1")
            .when(F.col("in0"), "only_0")
            .otherwise("empty")
            .alias("set_type"),
        )
    )
    # the census total is the sum of the (≤4-row) census itself — a
    # global window over aggregated rows (benign per the engine-wide
    # window audit) replaces a second full pass over ev (r13
    # optimization; same numbers by construction)
    wtot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        ev.groupBy("set_type")
        .agg(
            F.count(F.lit(1)).alias("n_eval"),
            F.sum(
                (
                    ((F.col("y") == 1) & F.col("in1"))
                    | ((F.col("y") == 0) & F.col("in0"))
                ).cast("long")
            ).alias("n_covered"),
            F.round(F.first("qhat"), 4).alias("qhat"),
        )
        .select(
            "set_type",
            "n_eval",
            F.round(
                F.col("n_eval") / F.sum("n_eval").over(wtot).cast("double"),
                4,
            ).alias("share"),
            "n_covered",
            "qhat",
        )
        .orderBy("set_type")
    )


_CONF_HASH = duck_md5_int("concat('conf_', \"CustomerID\")")

ORACLE["conformal_churn_sets"] = f"""
{churn_cte()},
scored AS (
  SELECT "CustomerID", CAST("Churn" AS BIGINT) AS y,
    {churn_probability_sql()} AS p,
    {_CONF_HASH} % 2 AS split
  FROM churn_customers
),
cal AS (
  SELECT "CustomerID",
    round(CASE WHEN y = 1 THEN 1.0 - p ELSE p END, 4) AS s
  FROM scored WHERE split = 0
),
n_cal AS (SELECT CAST(count(*) AS BIGINT) AS n FROM cal),
ranked AS (
  SELECT s, row_number() OVER (ORDER BY s, "CustomerID") AS rn FROM cal
),
qhat AS (
  SELECT s AS qhat FROM ranked, n_cal
  WHERE rn = ({100 - CONFORMAL_ALPHA_PCT} * (n + 1) + 99) // 100
),
ev AS (
  SELECT y, q.qhat,
    round(1.0 - p, 4) <= q.qhat AS in1,
    round(p, 4) <= q.qhat AS in0
  FROM scored, qhat q WHERE split = 1
),
tagged AS (
  SELECT y, qhat, in1, in0,
    CASE WHEN in1 AND in0 THEN 'both'
         WHEN in1 THEN 'only_1'
         WHEN in0 THEN 'only_0'
         ELSE 'empty' END AS set_type
  FROM ev
),
total AS (SELECT CAST(count(*) AS BIGINT) AS t FROM tagged)
SELECT set_type,
  CAST(count(*) AS BIGINT) AS n_eval,
  round(CAST(count(*) AS DOUBLE) / t.t, 4) AS share,
  CAST(sum(CASE WHEN (y = 1 AND in1) OR (y = 0 AND in0)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
  round(min(qhat), 4) AS qhat
FROM tagged, total t
GROUP BY set_type, t.t
ORDER BY set_type
"""
QUERIES["conformal_churn_sets"] = conformal_churn_sets


# ---------------------------------------------------------------------------
# Distributed full-batch logistic-regression training (gradient descent)
# ---------------------------------------------------------------------------

LOGREG_LR = 8.0  # learning rate (centered features; probe: SCALE.md r6)
LOGREG_ROUNDS = 10  # fixed GD rounds (oracle unrolls them)
LOGREG_RESID_SCALE = 100000000.0  # residuals -> exact 1e8 BIGINTs
LOGREG_LL_SCALE = 1000000.0  # per-row log-loss -> exact 1e6 BIGINTs
# (feature, centering constant, dyadic scale) — centering at the integer
# domain midpoint conditions the GD (uncentered probe needed ~4x the
# rounds); dyadic scales make x/S EXACT in binary FP on both engines
LOGREG_FEATS: list[tuple[str, int, float]] = [
    ("Support Calls", 10, 32.0),
    ("Payment Delay", 15, 32.0),
    ("Tenure", 36, 128.0),
]


def logreg_churn_gd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the churn classifier IN the engine: full-batch logistic
    regression by gradient descent over ``churn_customers`` — the
    training counterpart of the M5 scoring tiers (the reference fits
    offline in sklearn, app_test.py best_model.pkl; a Spark-native
    pipeline trains where the data lives). Emits the 10-round fit
    trajectory: post-update weights plus the log-loss/accuracy the
    round's gradient saw (standard epoch logging).

    Scale shape: ONE map-side partial hash aggregate per round over the
    localCheckpointed 5-column training matrix — the classic "logistic
    regression = one allreduce per epoch" layout; driver traffic is 7
    fit scalars per round (the BPE-loop contract), and the gradient
    state is 4 doubles regardless of corpus size.

    Cross-engine exactness (the kmeans fixed-point discipline, applied
    to GD): the carried state (weights) is rounded to 6dp at every
    round boundary; z = w·x is pure +,*,/ on 6dp weights and EXACT
    dyadic-scaled integer features, so both engines sigmoid the same
    double; p is rounded to 8dp and clamped to [1e-8, 1-1e-8] (ln(0)
    guard); per-row residuals and log-losses are scaled to exact
    BIGINTs BEFORE summing, so the gradient aggregate is order-free.
    exp/ln on identical inputs is the house precedent
    (churn_probability, dsir_importance_select). BIGINT headroom: the
    residual sum is bounded by 1e8·|x|·n = 7.2e9·n — past n ~ 1e9 rows
    drop LOGREG_RESID_SCALE to 1e6 (the pq_codebook_audit fix, round-5
    ADVICE). Driver-side weight updates replay engine rounding via
    ``round_half_up`` (CLAUDE.md replay rule); the DuckDB oracle
    unrolls all 10 rounds as gradient/update CTE pairs and reproduces
    the trajectory bit-for-bit.

    The companion pytest pins monotone log-loss descent and a final
    accuracy floor (the label is linear in the features, so GD must
    beat the 0.627 base rate decisively)."""
    from ..functions.rounding import round_half_up

    cc = churn_customers(spark, sf_dir)
    feats = cc.select(
        *[
            (F.col(name) - F.lit(c)).cast("long").alias(f"x{j}")
            for j, (name, c, _) in enumerate(LOGREG_FEATS, start=1)
        ],
        F.col("Churn").cast("long").alias("y"),
    ).localCheckpoint()

    w = [0.0] + [0.0] * len(LOGREG_FEATS)
    rows = []
    for rnd in range(1, LOGREG_ROUNDS + 1):
        z = F.lit(w[0])
        for j, (_, _, s) in enumerate(LOGREG_FEATS, start=1):
            z = z + F.lit(w[j]) * (F.col(f"x{j}") / F.lit(s))
        z = F.round(z, 6)
        p_raw = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 8)
        p = F.least(F.greatest(p_raw, F.lit(1e-8)), F.lit(0.99999999))
        ri = F.round((F.col("y") - p) * F.lit(LOGREG_RESID_SCALE), 0).cast(
            "long"
        )
        ll = F.round(
            -(
                F.col("y") * F.log(p)
                + (F.lit(1) - F.col("y")) * F.log(F.lit(1.0) - p)
            )
            * F.lit(LOGREG_LL_SCALE),
            0,
        ).cast("long")
        hit = (
            ((p >= F.lit(0.5)) == (F.col("y") == F.lit(1)))
            .cast("long")
        )
        agg = feats.agg(
            F.sum(ri).alias("g0"),
            *[
                F.sum(ri * F.col(f"x{j}")).alias(f"g{j}")
                for j in range(1, len(LOGREG_FEATS) + 1)
            ],
            F.sum(ll).alias("ll"),
            F.sum(hit).alias("hits"),
            F.count(F.lit(1)).alias("n"),
        ).first()
        n = agg["n"]
        w[0] = round_half_up(
            w[0] + LOGREG_LR * agg["g0"] / (LOGREG_RESID_SCALE * n * 1.0), 6
        )
        for j, (_, _, s) in enumerate(LOGREG_FEATS, start=1):
            w[j] = round_half_up(
                w[j]
                + LOGREG_LR * agg[f"g{j}"] / (LOGREG_RESID_SCALE * n * s),
                6,
            )
        rows.append(
            (
                rnd,
                w[0] + 0.0,
                w[1] + 0.0,
                w[2] + 0.0,
                w[3] + 0.0,
                round_half_up(agg["ll"] / (LOGREG_LL_SCALE * n), 6) + 0.0,
                round_half_up(agg["hits"] / (n * 1.0), 6),
            )
        )
    # bounded fit-trajectory relation (LOGREG_ROUNDS rows of driver
    # scalars) — the S4 literal-source shape, not a data-sized collect
    return spark.createDataFrame(
        rows,
        "round INT, w_intercept DOUBLE, w_support_calls DOUBLE, "
        "w_payment_delay DOUBLE, w_tenure DOUBLE, "
        "log_loss DOUBLE, accuracy DOUBLE",
    ).orderBy("round")


def _duck_logreg_sql() -> str:
    """Unrolled-CTE oracle: per round one gradient aggregate (g{r},
    computed against w{r-1}) and one 1-row weight update (w{r})."""
    # every float literal goes through CAST(... AS DOUBLE): bare DuckDB
    # decimal literals are DECIMAL, and BIGINT/DECIMAL division would
    # replace the exact dyadic double division (CLAUDE.md literal rule)
    def dlit(x: float) -> str:
        return f"CAST({x!r} AS DOUBLE)"

    rs, lls, lr = dlit(LOGREG_RESID_SCALE), dlit(LOGREG_LL_SCALE), dlit(
        LOGREG_LR
    )
    feat_exprs = ", ".join(
        f'CAST("{name}" - {c} AS BIGINT) AS x{j}'
        for j, (name, c, _) in enumerate(LOGREG_FEATS, start=1)
    )
    z_terms = " + ".join(
        f"w.w{j} * (f.x{j} / {dlit(s)})"
        for j, (_, _, s) in enumerate(LOGREG_FEATS, start=1)
    )
    parts = [
        f'feat AS (SELECT {feat_exprs}, CAST("Churn" AS BIGINT) AS y '
        "FROM churn_customers)",
        "n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM feat)",
        "w0 AS (SELECT "
        + ", ".join(f"CAST(0.0 AS DOUBLE) AS w{j}" for j in range(4))
        + ")",
    ]
    for r in range(1, LOGREG_ROUNDS + 1):
        p_ = r - 1
        parts.append(f"""z{r} AS MATERIALIZED (
  SELECT f.y, f.x1, f.x2, f.x3,
    round(w.w0 + {z_terms}, 6) AS z
  FROM feat f CROSS JOIN w{p_} w
)""")
        parts.append(f"""p{r} AS MATERIALIZED (
  SELECT y, x1, x2, x3,
    least(greatest(round(1e0 / (1e0 + exp(-z)), 8), 1e-08),
          CAST(0.99999999 AS DOUBLE)) AS p
  FROM z{r}
)""")
        parts.append(f"""g{r} AS MATERIALIZED (
  SELECT
    CAST(sum(CAST(round((y - p) * {rs}, 0) AS BIGINT)) AS BIGINT) AS g0,
    CAST(sum(CAST(round((y - p) * {rs}, 0) AS BIGINT) * x1) AS BIGINT) AS g1,
    CAST(sum(CAST(round((y - p) * {rs}, 0) AS BIGINT) * x2) AS BIGINT) AS g2,
    CAST(sum(CAST(round((y - p) * {rs}, 0) AS BIGINT) * x3) AS BIGINT) AS g3,
    CAST(sum(CAST(round(-(y * ln(p) + (1 - y) * ln(1e0 - p)) * {lls}, 0) AS BIGINT)) AS BIGINT) AS ll,
    CAST(sum(CASE WHEN (p >= 0.5) = (y = 1) THEN 1 ELSE 0 END) AS BIGINT) AS hits
  FROM p{r}
)""")
        upd = ", ".join(
            f"round(w.w{j} + {lr} * g.g{j} / "
            f"({rs} * n.n * {dlit(s)}), 6) AS w{j}"
            for j, s in enumerate(
                [1.0] + [s for (_, _, s) in LOGREG_FEATS]
            )
        )
        parts.append(
            f"w{r} AS MATERIALIZED (SELECT {upd} FROM w{p_} w CROSS JOIN g{r} g "
            f"CROSS JOIN n)"
        )
    traj = "\nUNION ALL\n".join(
        f"SELECT {r} AS round, w.w0 + 0.0 AS w_intercept, "
        f"w.w1 + 0.0 AS w_support_calls, w.w2 + 0.0 AS w_payment_delay, "
        f"w.w3 + 0.0 AS w_tenure, "
        f"round(g.ll / ({lls} * n.n), 6) + 0.0 AS log_loss, "
        f"round(CAST(g.hits AS DOUBLE) / n.n, 6) AS accuracy "
        f"FROM w{r} w CROSS JOIN g{r} g CROSS JOIN n"
        for r in range(1, LOGREG_ROUNDS + 1)
    )
    return (
        churn_cte()
        + ",\n"
        + ",\n".join(parts)
        + f"\nSELECT * FROM (\n{traj}\n) ORDER BY round\n"
    )


ORACLE["logreg_churn_gd"] = _duck_logreg_sql()
QUERIES["logreg_churn_gd"] = logreg_churn_gd


# ---------------------------------------------------------------------------
# Out-of-fold target encoding (leakage-safe categorical features)
# ---------------------------------------------------------------------------

OOF_FOLDS = 5  # CustomerID % 5 — the kfold_churn_auc fold rule


def oof_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe TARGET ENCODING of the churn categoricals — the
    feature-engineering companion to the trainers: replace a category
    with the churn rate computed on the OTHER folds only, so a row
    never sees its own label (the leak that makes naive target
    encoding overfit). For every (category value, fold):

        oof_rate = (global_pos - fold_pos) / (global_n - fold_n)

    Scale shape: ONE groupBy(category, fold) pass over the data gives
    fold-level counts; the global terms are a second aggregate OVER
    that tiny (|categories|·k)-row relation (window-free, partial-
    aggregating); nothing else touches the data. This is how OOF
    encoding is computed at 100 TB — never k separate anti-join
    passes.

    Cross-engine: counts are exact BIGINTs; the single division
    happens once per output row, rounded 4dp with +0.0 (a rate can
    round to -0.0 only via 0/0 — excluded, every fold×category is
    populated; the guard is for the encode - global_rate delta column,
    which straddles 0). The 9-category space is Gender x Subscription
    crossed with Contract, matching the scorer's OHE vocabulary."""
    cc = churn_customers(spark, sf_dir).select(
        F.concat_ws(
            "|", F.col("Subscription Type"), F.col("Contract Length")
        ).alias("category"),
        (F.col("CustomerID") % OOF_FOLDS).alias("fold"),
        F.col("Churn").cast("long").alias("y"),
    )
    per_fold = cc.groupBy("category", "fold").agg(
        F.count(F.lit(1)).alias("n_f"), F.sum("y").alias("pos_f")
    )
    glob = per_fold.groupBy("category").agg(
        F.sum("n_f").alias("n_g"), F.sum("pos_f").alias("pos_g")
    )
    j = per_fold.join(glob, "category")
    oof = (F.col("pos_g") - F.col("pos_f")) / (
        F.col("n_g") - F.col("n_f")
    )
    glob_rate = F.col("pos_g") / F.col("n_g")
    return j.select(
        "category",
        "fold",
        F.col("n_f").alias("n_fold_rows"),
        (F.round(oof, 4) + F.lit(0.0)).alias("oof_churn_rate"),
        (F.round(oof - glob_rate, 4) + F.lit(0.0)).alias("leakage_delta"),
    ).orderBy("category", "fold")


ORACLE["oof_target_encoding"] = (
    churn_cte()
    + f""",
base AS (
  SELECT concat_ws('|', "Subscription Type", "Contract Length") AS category,
    "CustomerID" % {OOF_FOLDS} AS fold,
    CAST("Churn" AS BIGINT) AS y
  FROM churn_customers
),
per_fold AS (
  SELECT category, fold, CAST(count(*) AS BIGINT) AS n_f,
    CAST(sum(y) AS BIGINT) AS pos_f
  FROM base GROUP BY 1, 2
),
gtot AS (
  SELECT category, CAST(sum(n_f) AS BIGINT) AS n_g,
    CAST(sum(pos_f) AS BIGINT) AS pos_g
  FROM per_fold GROUP BY 1
)
SELECT p.category, p.fold, p.n_f AS n_fold_rows,
  round((g.pos_g - p.pos_f) / (g.n_g - p.n_f), 4) + 0.0 AS oof_churn_rate,
  round((g.pos_g - p.pos_f) / (g.n_g - p.n_f)
        - g.pos_g / g.n_g, 4) + 0.0 AS leakage_delta
FROM per_fold p JOIN gtot g USING (category)
ORDER BY p.category, p.fold
"""
)
QUERIES["oof_target_encoding"] = oof_target_encoding


# ---------------------------------------------------------------------------
# Murphy decomposition of the Brier score — reliability / resolution /
# uncertainty over prediction deciles
# ---------------------------------------------------------------------------


def brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the churn scorer's Brier score over
    prediction deciles: Brier ≈ reliability − resolution + uncertainty,
    with the within-bin variance emitted as the explicit binning
    residual (the three-term identity is exact only when forecasts are
    constant within a bin). The standard forecast-verification read on
    WHERE a probabilistic model loses points: miscalibration
    (reliability) vs inability to separate (low resolution).

    Distributed shape: scores bin by the same total-order decile as
    ``calibration_curve`` (ties impossible: (p, CustomerID)) via the
    SHARED distributed two-pass rank (``functions/ranking.py::
    dist_ntile``, round 10 — no row-level no-partition-key window);
    the bin relation is 10 rows, so the global-mean window and final
    fold are trivial. Cross-engine exactness: probabilities are 4dp
    sigmoids → 1e4-scaled EXACT integers; every sufficient statistic
    (Σp4, Σy, Σ(p4−y·1e4)²) folds as exact integers, and the
    decomposition algebra is identical double expressions over
    identical inputs — bit-equal before the output round (CLAUDE.md
    fixed-point rule)."""
    from pyspark.sql import Window

    from ..functions.ranking import dist_ntile

    scored = churn_customers(spark, sf_dir).select(
        F.col("CustomerID"),
        F.col("Churn").cast("long").alias("y"),
        churn_probability().alias("p"),
    )
    p4 = F.round(F.col("p") * 10000.0, 0).cast("long")
    binned = dist_ntile(
        scored,
        10,
        F.expr("CAST(floor(p * 50) AS BIGINT)"),
        [F.col("p"), F.col("CustomerID")],
        out_col="decile",
    ).select("y", p4.alias("p4"), "decile")
    err = F.col("p4") - F.col("y") * F.lit(10000)
    bins = binned.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_k"),
        F.sum("p4").alias("sp4"),
        F.sum("y").alias("sy"),
        F.sum(err * err).alias("se2"),
    )
    wg = Window.partitionBy()
    g = bins.select(
        "n_k",
        "sp4",
        "sy",
        "se2",
        F.sum("n_k").over(wg).alias("n"),
        F.sum("sy").over(wg).alias("sy_tot"),
    )
    dn = F.col("n").cast("double")
    ybar = F.col("sy_tot").cast("double") / dn
    pbar_k = F.col("sp4").cast("double") / (F.col("n_k").cast("double") * 10000.0)
    obar_k = F.col("sy").cast("double") / F.col("n_k").cast("double")
    out = g.agg(
        F.max("n").alias("n"),
        F.round(F.max(ybar), 4).alias("base_rate"),
        F.round(
            F.sum(F.col("se2").cast("double")) / (F.max(dn) * 1e8), 4
        ).alias("brier"),
        (
            F.round(
                F.sum(
                    F.col("n_k").cast("double")
                    * (pbar_k - obar_k)
                    * (pbar_k - obar_k)
                )
                / F.max(dn),
                4,
            )
            + F.lit(0.0)
        ).alias("reliability"),
        (
            F.round(
                F.sum(
                    F.col("n_k").cast("double")
                    * (obar_k - ybar)
                    * (obar_k - ybar)
                )
                / F.max(dn),
                4,
            )
            + F.lit(0.0)
        ).alias("resolution"),
        F.round(F.max(ybar * (1.0 - ybar)), 4).alias("uncertainty"),
        (
            F.round(
                F.sum(F.col("se2").cast("double")) / (F.max(dn) * 1e8)
                - (
                    F.sum(
                        F.col("n_k").cast("double")
                        * (pbar_k - obar_k)
                        * (pbar_k - obar_k)
                    )
                    / F.max(dn)
                    - F.sum(
                        F.col("n_k").cast("double")
                        * (obar_k - ybar)
                        * (obar_k - ybar)
                    )
                    / F.max(dn)
                    + F.max(ybar * (1.0 - ybar))
                ),
                4,
            )
            + F.lit(0.0)
        ).alias("within_bin_var"),
    )
    return out


ORACLE["brier_decomposition"] = (
    churn_cte()
    + f"""
, scored AS (
  SELECT "CustomerID",
    CAST("Churn" AS BIGINT) AS y,
    CAST(round({churn_probability_sql()} * 10000.0, 0) AS BIGINT) AS p4,
    {churn_probability_sql()} AS p
  FROM churn_customers
),
binned AS (
  SELECT y, p4, ntile(10) OVER (ORDER BY p, "CustomerID") AS decile
  FROM scored
),
bins AS (
  SELECT decile, CAST(count(*) AS BIGINT) AS n_k,
    CAST(sum(p4) AS BIGINT) AS sp4,
    CAST(sum(y) AS BIGINT) AS sy,
    CAST(sum((p4 - y * 10000) * (p4 - y * 10000)) AS BIGINT) AS se2
  FROM binned GROUP BY 1
),
g AS (
  SELECT *,
    CAST(sum(n_k) OVER () AS BIGINT) AS n,
    CAST(sum(sy) OVER () AS BIGINT) AS sy_tot
  FROM bins
),
alg AS (
  SELECT n_k, sp4, sy, se2, n,
    CAST(n AS DOUBLE) AS dn,
    CAST(sy_tot AS DOUBLE) / CAST(n AS DOUBLE) AS ybar,
    CAST(sp4 AS DOUBLE) / (CAST(n_k AS DOUBLE) * 10000.0) AS pbar_k,
    CAST(sy AS DOUBLE) / CAST(n_k AS DOUBLE) AS obar_k
  FROM g
)
SELECT CAST(max(n) AS BIGINT) AS n,
  round(max(ybar), 4) AS base_rate,
  round(sum(CAST(se2 AS DOUBLE)) / (max(dn) * 1e8), 4) AS brier,
  round(sum(CAST(n_k AS DOUBLE) * (pbar_k - obar_k) * (pbar_k - obar_k))
    / max(dn), 4) + 0.0 AS reliability,
  round(sum(CAST(n_k AS DOUBLE) * (obar_k - ybar) * (obar_k - ybar))
    / max(dn), 4) + 0.0 AS resolution,
  round(max(ybar * (1.0 - ybar)), 4) AS uncertainty,
  round(sum(CAST(se2 AS DOUBLE)) / (max(dn) * 1e8)
    - (sum(CAST(n_k AS DOUBLE) * (pbar_k - obar_k) * (pbar_k - obar_k))
         / max(dn)
       - sum(CAST(n_k AS DOUBLE) * (obar_k - ybar) * (obar_k - ybar))
         / max(dn)
       + max(ybar * (1.0 - ybar))), 4) + 0.0 AS within_bin_var
FROM alg
"""
)
QUERIES["brier_decomposition"] = brier_decomposition


# ---------------------------------------------------------------------------
# Gaussian Naive Bayes churn classifier — in-engine fit + score, one pass each
# ---------------------------------------------------------------------------

# numeric churn features; Total Spend folds as exact integer cents
_GNB_INT_FEATS = [
    "Age",
    "Tenure",
    "Usage Frequency",
    "Support Calls",
    "Payment Delay",
    "Last Interaction",
]
GNB_VAR_FLOOR = 1e-6


def _gnb_feats_spark() -> list[tuple[str, "Column"]]:
    feats = [(n, F.col(f"`{n}`").cast("double")) for n in _GNB_INT_FEATS]
    feats.append(
        ("Spend Cents", F.round(F.col("`Total Spend`") * 100.0, 0))
    )
    return feats


def _gnb_feats_sql() -> list[tuple[str, str]]:
    feats = [(n, f'CAST("{n}" AS DOUBLE)') for n in _GNB_INT_FEATS]
    feats.append(("Spend Cents", 'round("Total Spend" * 100.0, 0)'))
    return feats


def gaussian_nb_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaussian Naive Bayes fit AND scored in-engine: class-conditional
    feature means/variances from ONE conditional-aggregate pass, the
    1-row fit broadcast back onto the table (fit-scalar BNLJ, house
    pattern), per-row log-likelihood-ratio decision, confusion fold.

    Cross-engine exactness (CLAUDE.md fixed-point discipline): all
    seven features are exact integers (spend → cents), so the
    sufficient statistics Σx, Σx² fold order-free; means/variances
    round 6dp and the log constants (class prior ratio, per-feature
    log-variance) round 8dp IN THE FIT — after that the per-row
    quadratic margin is identical double arithmetic over identical
    constants on both engines, bit-equal before the output round.
    At 100 TB the fit stays one map-side partial-agg pass and the
    score pass is embarrassingly parallel."""
    df = churn_customers(spark, sf_dir)
    feats = _gnb_feats_spark()
    churn1 = F.col("Churn") == 1
    aggs = [
        F.sum(F.when(churn1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(~churn1, 1).otherwise(0)).alias("n0"),
    ]
    # exact BIGINT sufficient statistics (all features are integers) —
    # double hash-agg sums of Σcents² reach 4.62e15 at sf0.1 (measured),
    # crossing 2^53 ≈ 9.01e15 around sf0.2, after which they lose
    # exactness and become partition-order-dependent on Spark
    for i, (_, x) in enumerate(feats):
        xl = x.cast("long")
        for c, cond in ((1, churn1), (0, ~churn1)):
            aggs.append(
                F.sum(F.when(cond, xl).otherwise(F.lit(0))).alias(f"sx{i}_{c}")
            )
            aggs.append(
                F.sum(F.when(cond, xl * xl).otherwise(F.lit(0))).alias(
                    f"sxx{i}_{c}"
                )
            )
    raw_fit = df.agg(*aggs)
    derived = [
        F.round(
            F.log(F.col("n1").cast("double"))
            - F.log(F.col("n0").cast("double")),
            8,
        ).alias("lpr")
    ]
    for i in range(len(feats)):
        for c in (1, 0):
            dn = F.col(f"n{c}").cast("double")
            mu = F.round(F.col(f"sx{i}_{c}") / dn, 6)
            # square of the BIGINT sum in DOUBLE (ANSI overflow rule)
            var = F.round(
                (
                    F.col(f"sxx{i}_{c}")
                    - F.col(f"sx{i}_{c}").cast("double")
                    * F.col(f"sx{i}_{c}")
                    / dn
                )
                / dn,
                6,
            )
            v = F.greatest(var, F.lit(GNB_VAR_FLOOR))
            derived.append(mu.alias(f"mu{i}_{c}"))
            derived.append(v.alias(f"v{i}_{c}"))
            derived.append(F.round(F.log(v), 8).alias(f"lv{i}_{c}"))
    fit = raw_fit.select(F.col("n1"), F.col("n0"), *derived)
    scored = df.crossJoin(F.broadcast(fit))
    delta = F.col("lpr")
    for i, (_, x) in enumerate(feats):
        d1 = x - F.col(f"mu{i}_1")
        d0 = x - F.col(f"mu{i}_0")
        delta = delta + 0.5 * (F.col(f"lv{i}_0") - F.col(f"lv{i}_1"))
        delta = delta + d0 * d0 / (2.0 * F.col(f"v{i}_0"))
        delta = delta - d1 * d1 / (2.0 * F.col(f"v{i}_1"))
    pred = (delta > 0).cast("int")
    y = F.col("Churn")
    return scored.select(y.alias("y"), pred.alias("pred")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when((F.col("y") == 1) & (F.col("pred") == 1), 1).otherwise(0)).alias("tp"),
        F.sum(F.when((F.col("y") == 0) & (F.col("pred") == 1), 1).otherwise(0)).alias("fp"),
        F.sum(F.when((F.col("y") == 1) & (F.col("pred") == 0), 1).otherwise(0)).alias("fn"),
        F.sum(F.when((F.col("y") == 0) & (F.col("pred") == 0), 1).otherwise(0)).alias("tn"),
        (
            F.round(
                F.sum(F.when(F.col("y") == F.col("pred"), 1).otherwise(0)).cast(
                    "double"
                )
                / F.count(F.lit(1)),
                4,
            )
            + F.lit(0.0)
        ).alias("accuracy"),
    )


def _gnb_oracle() -> str:
    feats = _gnb_feats_sql()
    agg_cols = [
        'CAST(sum(CASE WHEN "Churn" = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1',
        'CAST(sum(CASE WHEN "Churn" = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0',
    ]
    for i, (_, x) in enumerate(feats):
        for c in (1, 0):
            agg_cols.append(
                f'CAST(sum(CASE WHEN "Churn" = {c}'
                f" THEN CAST({x} AS BIGINT) ELSE 0 END) AS BIGINT)"
                f" AS sx{i}_{c}"
            )
            agg_cols.append(
                f'CAST(sum(CASE WHEN "Churn" = {c}'
                f" THEN CAST({x} AS BIGINT) * CAST({x} AS BIGINT)"
                f" ELSE 0 END) AS BIGINT) AS sxx{i}_{c}"
            )
    der_cols = [
        "n1",
        "n0",
        "round(ln(CAST(n1 AS DOUBLE)) - ln(CAST(n0 AS DOUBLE)), 8) AS lpr",
    ]
    for i in range(len(feats)):
        for c in (1, 0):
            dn = f"CAST(n{c} AS DOUBLE)"
            mu = f"round(sx{i}_{c} / {dn}, 6)"
            var = (
                f"round((sxx{i}_{c} - CAST(sx{i}_{c} AS DOUBLE)"
                f" * sx{i}_{c} / {dn}) / {dn}, 6)"
            )
            v = f"greatest({var}, {GNB_VAR_FLOOR})"
            der_cols.append(f"{mu} AS mu{i}_{c}")
            der_cols.append(f"{v} AS v{i}_{c}")
            der_cols.append(f"round(ln({v}), 8) AS lv{i}_{c}")
    delta_terms = ["lpr"]
    for i, (_, x) in enumerate(feats):
        delta_terms.append(f"0.5 * (lv{i}_0 - lv{i}_1)")
        delta_terms.append(
            f"({x} - mu{i}_0) * ({x} - mu{i}_0) / (2.0 * v{i}_0)"
        )
        delta_terms.append(
            f"- (({x} - mu{i}_1) * ({x} - mu{i}_1) / (2.0 * v{i}_1))"
        )
    delta = " + ".join(delta_terms).replace("+ -", "-")
    agg_sql = ",\n    ".join(agg_cols)
    der_sql = ",\n    ".join(der_cols)
    return (
        churn_cte()
        + f"""
, raw_fit AS (
  SELECT
    {agg_sql}
  FROM churn_customers
),
fit AS (
  SELECT
    {der_sql}
  FROM raw_fit
),
scored AS (
  SELECT c."Churn" AS y,
    CAST(({delta}) > 0 AS INT) AS pred
  FROM churn_customers c CROSS JOIN fit
)
SELECT CAST(count(*) AS BIGINT) AS n,
  CAST(sum(CASE WHEN y = 1 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
  CAST(sum(CASE WHEN y = 0 AND pred = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
  CAST(sum(CASE WHEN y = 1 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
  CAST(sum(CASE WHEN y = 0 AND pred = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
  round(CAST(sum(CASE WHEN y = pred THEN 1 ELSE 0 END) AS DOUBLE)
    / count(*), 4) + 0.0 AS accuracy
FROM scored
"""
    )


ORACLE["gaussian_nb_churn"] = _gnb_oracle()
QUERIES["gaussian_nb_churn"] = gaussian_nb_churn


# ---------------------------------------------------------------------------
# Elastic-net coordinate descent on the Gram matrix — L1 feature selection
# ---------------------------------------------------------------------------

EN_LAMBDAS = (0.01, 0.05, 0.2)
EN_ALPHA = 0.5
EN_SWEEPS = 3


def _en_feats_sql() -> list[tuple[str, str]]:
    feats = [(n, f'CAST("{n}" AS DOUBLE)') for n in _GNB_INT_FEATS]
    feats.append(("Spend Cents", 'round("Total Spend" * 100.0, 0)'))
    return feats


def elastic_net_churn_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Elastic-net (α={EN_ALPHA}) regularization path for the linear-
    probability churn model, solved by coordinate descent ON THE GRAM
    MATRIX: ONE data pass collects the exact-integer sufficient
    statistics (feature sums, squares, cross-products, covariances with
    the label), then every coordinate update for every λ is O(k²)
    driver-side scalar algebra — zero further cluster work at ANY
    corpus size (the same sufficient-statistics shape as
    ``ridge_spend_model``, extended to the L1 path). Emits the
    coefficient path over λ ∈ {EN_LAMBDAS} in correlation units —
    the L1 feature-selection readout (the synthetic churn label is
    linear in Tenure / Support Calls / Payment Delay, and the path
    zeroes everything else as λ grows).

    Cross-engine exactness: the sufficient statistics are exact
    BIGINTs; standardized correlations round 8dp on both engines; the
    CD recurrence is IDENTICAL scalar double arithmetic (explicit
    left-to-right accumulation, branch-form soft threshold — never
    copysign, which births −0.0) replayed by the oracle as unrolled
    1-row CTE chains; coefficients round 6dp with the +0.0 negative-
    zero guard at output."""
    import math

    from ..functions.rounding import round_half_up as rhu

    feats = _gnb_feats_spark()
    k = len(feats)
    df = churn_customers(spark, sf_dir)
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("Churn").cast("long")).alias("sy"),
    ]
    for i, (_, x) in enumerate(feats):
        aggs.append(F.sum(x.cast("long")).alias(f"s{i}"))
        aggs.append(
            F.sum((x * x).cast("long")).alias(f"q{i}")
        )
        aggs.append(
            F.sum((x * F.col("Churn")).cast("long")).alias(f"cy{i}")
        )
    for i in range(k):
        for j in range(i + 1, k):
            aggs.append(
                F.sum(
                    (feats[i][1] * feats[j][1]).cast("long")
                ).alias(f"g{i}_{j}")
            )
    d = df.agg(*aggs).collect()[0].asDict()
    n = d["n"]
    ybar = d["sy"] / n
    sdy = math.sqrt(ybar - ybar * ybar)
    xb = [d[f"s{i}"] / n for i in range(k)]
    sd = [math.sqrt(d[f"q{i}"] / n - xb[i] * xb[i]) for i in range(k)]
    corr = {}
    for i in range(k):
        for j in range(k):
            if i == j:
                continue
            key = f"g{min(i, j)}_{max(i, j)}"
            corr[(i, j)] = rhu(
                (d[key] / n - xb[i] * xb[j]) / (sd[i] * sd[j]), 8
            )
    cy = [
        rhu((d[f"cy{i}"] / n - xb[i] * ybar) / (sd[i] * sdy), 8)
        for i in range(k)
    ]
    out = []
    for lam in EN_LAMBDAS:
        g = lam * EN_ALPHA
        den = 1.0 + lam * (1.0 - EN_ALPHA)
        w = [0.0] * k
        for _ in range(EN_SWEEPS):
            for j in range(k):
                rho = cy[j]
                for kk in range(k):
                    if kk != j:
                        rho = rho - corr[(j, kk)] * w[kk]
                if rho > g:
                    w[j] = (rho - g) / den
                elif rho < -g:
                    w[j] = (rho + g) / den
                else:
                    w[j] = 0.0
        for j, (name, _) in enumerate(feats):
            out.append(
                (
                    lam,
                    name,
                    rhu(w[j], 6) + 0.0,
                    int(w[j] != 0.0),
                )
            )
    return spark.createDataFrame(
        out, "lam double, feature string, coef double, selected int"
    ).orderBy("lam", "feature")


def _en_oracle() -> str:
    import math

    feats = _en_feats_sql()
    k = len(feats)
    agg_cols = [
        "CAST(count(*) AS BIGINT) AS n",
        'CAST(sum("Churn") AS BIGINT) AS sy',
    ]
    # per-row CAST to BIGINT BEFORE multiplying/summing (gaussian_nb /
    # welch pattern): a DOUBLE hash-agg over the products loses exactness
    # (and becomes partition-order-dependent) once the sum passes 2^53 —
    # Σcents² is 4.62e15 at sf0.1, crossing the boundary around sf0.2.
    # DuckDB sums BIGINT into HUGEINT (exact); the outer CAST normalizes
    # the arrow type back to BIGINT per the CLAUDE.md integer-sum rule.
    for i, (_, x) in enumerate(feats):
        xb = f"CAST({x} AS BIGINT)"
        agg_cols.append(f"CAST(sum({xb}) AS BIGINT) AS s{i}")
        agg_cols.append(f"CAST(sum({xb} * {xb}) AS BIGINT) AS q{i}")
        agg_cols.append(
            f'CAST(sum({xb} * CAST("Churn" AS BIGINT)) AS BIGINT) AS cy{i}'
        )
    for i in range(k):
        for j in range(i + 1, k):
            x1 = f"CAST({feats[i][1]} AS BIGINT)"
            x2 = f"CAST({feats[j][1]} AS BIGINT)"
            agg_cols.append(
                f"CAST(sum({x1} * {x2}) AS BIGINT) AS g{i}_{j}"
            )
    stats_cols = [
        "n",
        "CAST(sy AS DOUBLE) / n AS ybar",
        "sqrt(CAST(sy AS DOUBLE) / n"
        " - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n)) AS sdy",
    ]
    for i in range(k):
        stats_cols.append(f"CAST(s{i} AS DOUBLE) / n AS xb{i}")
        stats_cols.append(
            f"sqrt(CAST(q{i} AS DOUBLE) / n"
            f" - (CAST(s{i} AS DOUBLE) / n) * (CAST(s{i} AS DOUBLE) / n))"
            f" AS sd{i}"
        )
    stats_cols += [f"cy{i}" for i in range(k)]
    stats_cols += [
        f"g{i}_{j}" for i in range(k) for j in range(i + 1, k)
    ]
    corr_cols = []
    for i in range(k):
        for j in range(k):
            if i == j:
                continue
            key = f"g{min(i, j)}_{max(i, j)}"
            corr_cols.append(
                f"round((CAST({key} AS DOUBLE) / n - xb{i} * xb{j})"
                f" / (sd{i} * sd{j}), 8) AS c{i}_{j}"
            )
    cyn_cols = [
        f"round((CAST(cy{i} AS DOUBLE) / n - xb{i} * ybar)"
        f" / (sd{i} * sdy), 8) AS cyn{i}"
        for i in range(k)
    ]
    chains = []
    finals = []
    for li, lam in enumerate(EN_LAMBDAS):
        g = lam * EN_ALPHA
        den = 1.0 + lam * (1.0 - EN_ALPHA)
        prev = "corr8"
        init = ", ".join(f"CAST(0.0 AS DOUBLE) AS w{j}" for j in range(k))
        chains.append(f"st{li}_0 AS (SELECT *, {init} FROM corr8)")
        prev = f"st{li}_0"
        t = 0
        for _ in range(EN_SWEEPS):
            for j in range(k):
                t += 1
                rho = f"cyn{j}"
                for kk in range(k):
                    if kk != j:
                        rho = f"({rho} - c{j}_{kk} * w{kk})"
                upd = (
                    f"CASE WHEN {rho} > {g!r} THEN ({rho} - {g!r}) / {den!r} "
                    f"WHEN {rho} < {-g!r} THEN ({rho} + {g!r}) / {den!r} "
                    f"ELSE 0.0 END"
                )
                keep = ", ".join(
                    f"w{m}" for m in range(k) if m != j
                )
                chains.append(
                    f"st{li}_{t} AS MATERIALIZED (SELECT * EXCLUDE (w{j}),"
                    f" {upd} AS w{j} FROM {prev})"
                )
                prev = f"st{li}_{t}"
        for j, (name, _) in enumerate(feats):
            nm = name.replace("'", "''")
            finals.append(
                f"SELECT CAST({lam!r} AS DOUBLE) AS lam, '{nm}' AS feature,"
                f" round(w{j}, 6) + 0.0 AS coef,"
                f" CAST(w{j} <> 0.0 AS INT) AS selected FROM {prev}"
            )
    from ..plans.churn import churn_cte as _cte

    return (
        _cte()
        + f"""
, suff AS (
  SELECT {", ".join(agg_cols)} FROM churn_customers
),
stats AS (
  SELECT {", ".join(stats_cols)} FROM suff
),
corr8 AS (
  SELECT {", ".join(corr_cols + cyn_cols)} FROM stats
),
{",".join(chains)}
SELECT * FROM (
{" UNION ALL ".join(finals)}
) ORDER BY lam, feature
"""
    )


ORACLE["elastic_net_churn_path"] = _en_oracle()
QUERIES["elastic_net_churn_path"] = elastic_net_churn_path


# ---------------------------------------------------------------------------
# Partial-dependence profile of the churn scorer over Age
# ---------------------------------------------------------------------------

PDP_AGE_GRID = list(range(18, 100, 9))  # 18, 27, ..., 99


def pdp_age_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-dependence profile (Friedman 2001) of the churn scorer
    over Age: for each grid value g, every customer is re-scored with
    Age forced to g (all other features as observed) and the mean and
    spread of the predictions are reported — the standard model-
    explanation readout ("how does predicted churn move with age,
    marginalizing the rest of the population"), plus the per-point ICE
    dispersion that flags interaction effects.

    Scale shape: the grid explode is a ×{len(PDP_AGE_GRID)} map-side
    projection followed by ONE partial-aggregating groupBy on the
    10-value grid — no joins, no windows. Cross-engine: predictions
    are the house 4dp sigmoids → 1e4-scaled exact ints; mean and the
    ICE standard deviation fold from exact Σp and Σp² and are emitted
    as raw identical doubles (no output re-round)."""
    grid = F.array(*[F.lit(g) for g in PDP_AGE_GRID])
    base = churn_customers(spark, sf_dir).withColumn(
        "age_grid", F.explode(grid)
    ).withColumn("Age", F.col("age_grid"))
    p4 = F.round(churn_probability() * 10000, 0).cast("long")
    g = base.select("age_grid", p4.alias("p4")).groupBy("age_grid").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("p4").alias("sp"),
        F.sum(F.col("p4") * F.col("p4")).alias("sp2"),
    )
    dn = F.col("n").cast("double")
    mean = F.col("sp").cast("double") / (dn * 10000.0)
    var = (
        F.col("sp2").cast("double") / dn
        - (F.col("sp").cast("double") / dn) * (F.col("sp").cast("double") / dn)
    ) / 1e8
    return g.select(
        F.col("age_grid").cast("int").alias("age"),
        "n",
        mean.alias("mean_churn_p"),
        F.sqrt(F.greatest(var, F.lit(0.0))).alias("ice_std"),
    ).orderBy("age")


ORACLE["pdp_age_churn"] = (
    churn_cte()
    + f"""
, forced AS (
  SELECT g.age AS age_grid,
    CAST(round({churn_probability_sql()} * 10000, 0) AS BIGINT) AS p4
  FROM (
    SELECT * EXCLUDE ("Age"), g0.age, CAST(g0.age AS INT) AS "Age"
    FROM churn_customers
    CROSS JOIN UNNEST([{", ".join(str(g) for g in PDP_AGE_GRID)}]) g0(age)
  ) g
),
agg AS (
  SELECT age_grid, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(p4) AS BIGINT) AS sp,
    CAST(sum(p4 * p4) AS BIGINT) AS sp2
  FROM forced GROUP BY 1
)
SELECT CAST(age_grid AS INT) AS age, n,
  CAST(sp AS DOUBLE) / (CAST(n AS DOUBLE) * 10000.0) AS mean_churn_p,
  sqrt(greatest((CAST(sp2 AS DOUBLE) / n
    - (CAST(sp AS DOUBLE) / n) * (CAST(sp AS DOUBLE) / n)) / 1e8, 0.0))
    AS ice_std
FROM agg
ORDER BY age
"""
)
QUERIES["pdp_age_churn"] = pdp_age_churn


# ---------------------------------------------------------------------------
# Cumulative gains / lift table of the churn scorer
# ---------------------------------------------------------------------------


def cumulative_gains_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains and lift by score decile — the campaign-
    targeting readout next to ``calibration_curve`` (calibration asks
    "are the probabilities honest", gains asks "how many churners do I
    capture by contacting the top k%"): deciles by DESCENDING score
    (total order with CustomerID tie-break), cumulative share of all
    churners captured, and lift vs random targeting.

    Cross-engine exactness: decile stats are exact integer counts; the
    cumulative window runs over 10 rows; gains/lift are identical
    double ratios over exact ints, emitted raw. Deciles come from the
    SHARED distributed two-pass rank (``functions/ranking.py::
    dist_ntile``, round 10) — the bucket expression is NEGATED
    (``-floor(p*50)``) so it is order-preserving along the descending
    score window."""
    from pyspark.sql import Window

    from ..functions.ranking import dist_ntile

    scored = churn_customers(spark, sf_dir).select(
        F.col("CustomerID"),
        F.col("Churn").cast("long").alias("y"),
        churn_probability().alias("p"),
    )
    deciles = (
        dist_ntile(
            scored,
            10,
            F.expr("CAST(-floor(p * 50) AS BIGINT)"),
            [F.desc("p"), F.col("CustomerID")],
            out_col="decile",
        )
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("churners"))
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy()
    g = deciles.select(
        "decile",
        "n",
        "churners",
        F.sum("n").over(wc).alias("cum_n"),
        F.sum("churners").over(wc).alias("cum_churners"),
        F.sum("n").over(wt).alias("n_tot"),
        F.sum("churners").over(wt).alias("churn_tot"),
    )
    gain = F.col("cum_churners").cast("double") / F.col("churn_tot")
    frac = F.col("cum_n").cast("double") / F.col("n_tot")
    return g.select(
        "decile",
        "n",
        "churners",
        gain.alias("cum_gain"),
        (F.when(frac > 0, gain / frac) + F.lit(0.0)).alias("lift"),
    ).orderBy("decile")


ORACLE["cumulative_gains_churn"] = (
    churn_cte()
    + f"""
, scored AS (
  SELECT "CustomerID", CAST("Churn" AS BIGINT) AS y,
    {churn_probability_sql()} AS p
  FROM churn_customers
),
deciles AS (
  SELECT decile, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(y) AS BIGINT) AS churners
  FROM (
    SELECT y, ntile(10) OVER (ORDER BY p DESC, "CustomerID") AS decile
    FROM scored
  ) GROUP BY 1
),
g AS (
  SELECT decile, n, churners,
    CAST(sum(n) OVER (ORDER BY decile
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
    CAST(sum(churners) OVER (ORDER BY decile
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS cum_churners,
    CAST(sum(n) OVER () AS BIGINT) AS n_tot,
    CAST(sum(churners) OVER () AS BIGINT) AS churn_tot
  FROM deciles
)
SELECT decile, n, churners,
  CAST(cum_churners AS DOUBLE) / churn_tot AS cum_gain,
  CASE WHEN CAST(cum_n AS DOUBLE) / n_tot > 0 THEN
    (CAST(cum_churners AS DOUBLE) / churn_tot)
    / (CAST(cum_n AS DOUBLE) / n_tot) END + 0.0 AS lift
FROM g
ORDER BY decile
"""
)
QUERIES["cumulative_gains_churn"] = cumulative_gains_churn
