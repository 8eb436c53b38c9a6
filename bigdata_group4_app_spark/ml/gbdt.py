"""Gradient-boosted depth-1 stumps (Newton boosting, logistic loss) —
the third in-engine trainer, completing the family next to full-batch
logistic GD (``ml/scoring.py::logreg_churn_gd``) and single-tree CART
(``ml/cart.py``): the reference fits a sklearn GBM offline
(app_test.py, best_model.pkl is a 400-tree booster); this is the
XGBoost recipe run where the data lives.

Per boosting round (exactly how XGBoost/LightGBM do it at 100 TB):
one pass over the data computes per-row gradient/hessian from the
current margin and aggregates them into per-(feature, value)
histograms (partial-aggregating groupBy — the shuffle carries at most
|features|x|domain| rows, never data); the split search (cumulative
G_L/H_L windows + gain argmax) runs on that tiny histogram relation;
leaf weights come from the Newton step w = -eta*G/(H+lambda). Driver
traffic per round is the BPE-loop contract: one 5-scalar totals row +
one 4-scalar best-split row; the carried model state is the stump
list (ROUNDS x 4 scalars), re-entering the next round as literals in
the margin expression — no per-row state anywhere.

Cross-engine exactness (the logreg_churn_gd fixed-point discipline):
margins are sums of 6dp-rounded stump weights over EXACT integer
features, rounded 6dp; p = sigmoid(z) rounds 8dp and clamps to
[1e-8, 1-1e-8] (exp/ln on identical doubles is the house precedent);
per-row g/h/log-loss scale to exact BIGINTs BEFORE summing so every
aggregate is order-free; gains are a single double chain over the
int sums, rounded 6dp BEFORE the argmax, ties broken (feat, value);
weight updates replay engine rounding via ``round_half_up``. BIGINT
headroom: |g|<=1e8 per row, so the G sums pass 2^63 only past ~9e10
rows — beyond that drop GBDT_GH_SCALE to 1e6 (the pq_codebook_audit
fix). The DuckDB oracle unrolls all rounds and reproduces every
split choice and weight bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.rounding import round_half_up
from ..plans.churn import churn_cte, churn_customers

# (short label, churn_customers column) — same drivers as ml/cart.py
GBDT_FEATS: list[tuple[str, str]] = [
    ("pd", "Payment Delay"),
    ("sc", "Support Calls"),
    ("tn", "Tenure"),
]
GBDT_ROUNDS = 4
GBDT_ETA = 0.5  # shrinkage
GBDT_LAMBDA = 1.0  # L2 on leaf weights
GBDT_GH_SCALE = 100000000.0  # g/h -> exact 1e8 BIGINTs
GBDT_LL_SCALE = 1000000.0  # per-row log-loss -> exact 1e6 BIGINTs

_STACK = "stack(3, " + ", ".join(
    f"'{k}', {k}" for k, _ in GBDT_FEATS
) + ") AS (feat, value)"


def gbdt_churn_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train GBDT_ROUNDS boosted stumps on ``churn_customers`` and emit
    the fit trajectory: per round the chosen split, the two Newton leaf
    weights, and the log-loss/accuracy the round's gradients saw
    (epoch logging, pre-update — the logreg convention). The pytest
    companion pins monotone log-loss descent and a final-accuracy
    floor; the DuckDB oracle replays the full boosting loop."""
    base = churn_customers(spark, sf_dir).select(
        *[F.col(col).cast("long").alias(k) for k, col in GBDT_FEATS],
        F.col("Churn").cast("long").alias("y"),
    ).localCheckpoint()

    stumps: list[tuple[str, int, float, float]] = []
    rows = []
    for rnd in range(1, GBDT_ROUNDS + 1):
        margin = F.lit(0.0)
        for feat, val, wl, wr in stumps:
            margin = margin + F.when(
                F.col(feat) <= F.lit(val), F.lit(wl)
            ).otherwise(F.lit(wr))
        z = F.round(margin, 6)
        p_raw = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 8)
        p = F.least(F.greatest(p_raw, F.lit(1e-8)), F.lit(0.99999999))
        gi = F.round((p - F.col("y")) * F.lit(GBDT_GH_SCALE), 0).cast("long")
        hi = F.round(p * (F.lit(1.0) - p) * F.lit(GBDT_GH_SCALE), 0).cast(
            "long"
        )
        ll = F.round(
            -(
                F.col("y") * F.log(p)
                + (F.lit(1) - F.col("y")) * F.log(F.lit(1.0) - p)
            )
            * F.lit(GBDT_LL_SCALE),
            0,
        ).cast("long")
        hit = ((p >= F.lit(0.5)) == (F.col("y") == F.lit(1))).cast("long")
        gh = base.select(
            *[F.col(k) for k, _ in GBDT_FEATS],
            gi.alias("g"),
            hi.alias("h"),
            ll.alias("ll"),
            hit.alias("hit"),
        )
        tot = gh.agg(
            F.sum("g").alias("gt"),
            F.sum("h").alias("ht"),
            F.sum("ll").alias("llt"),
            F.sum("hit").alias("hits"),
            F.count(F.lit(1)).alias("n"),
        ).first()
        gt, ht, n = tot["gt"], tot["ht"], tot["n"]

        hist = (
            gh.select("g", "h", F.expr(_STACK))
            .groupBy("feat", "value")
            .agg(F.sum("g").alias("glc"), F.sum("h").alias("hlc"))
        )
        w = Window.partitionBy("feat").orderBy("value")
        cum = hist.select(
            "feat",
            "value",
            F.sum("glc").over(w).alias("gl"),
            F.sum("hlc").over(w).alias("hl"),
        ).filter(F.col("hl") < F.lit(ht))
        sc = F.lit(GBDT_GH_SCALE)
        gld = F.col("gl").cast("double") / sc
        hld = F.col("hl").cast("double") / sc
        grd = (F.lit(gt) - F.col("gl")).cast("double") / sc
        hrd = (F.lit(ht) - F.col("hl")).cast("double") / sc
        gtd = F.lit(float(gt)) / sc
        htd = F.lit(float(ht)) / sc
        lam = F.lit(GBDT_LAMBDA)
        gain = F.round(
            gld * gld / (hld + lam)
            + grd * grd / (hrd + lam)
            - gtd * gtd / (htd + lam),
            6,
        )
        rw = Window.orderBy(F.desc("gain"), F.col("feat"), F.col("value"))
        best = (
            cum.withColumn("gain", gain)
            .withColumn("rn", F.row_number().over(rw))
            .filter(F.col("rn") == 1)
            .select("feat", "value", "gl", "hl")
            .first()
        )
        feat, val, gl, hl = best["feat"], best["value"], best["gl"], best["hl"]
        wl = round_half_up(
            -GBDT_ETA * (gl / GBDT_GH_SCALE)
            / ((hl / GBDT_GH_SCALE) + GBDT_LAMBDA),
            6,
        )
        wr = round_half_up(
            -GBDT_ETA * ((gt - gl) / GBDT_GH_SCALE)
            / (((ht - hl) / GBDT_GH_SCALE) + GBDT_LAMBDA),
            6,
        )
        stumps.append((feat, int(val), wl, wr))
        rows.append(
            (
                rnd,
                feat,
                int(val),
                wl + 0.0,
                wr + 0.0,
                round_half_up(tot["llt"] / (GBDT_LL_SCALE * n), 6) + 0.0,
                round_half_up(tot["hits"] / (n * 1.0), 6),
            )
        )
    # bounded fit-trajectory relation (ROUNDS rows of driver scalars)
    return spark.createDataFrame(
        rows,
        "round INT, split_feature STRING, split_value BIGINT, "
        "w_left DOUBLE, w_right DOUBLE, log_loss DOUBLE, accuracy DOUBLE",
    ).orderBy("round")


def _duck_gbdt_sql() -> str:
    """Unrolled-CTE oracle: per round margin -> p -> int g/h -> feature
    histograms -> cumulative windows -> 6dp gain argmax -> Newton
    weights, each replaying the Spark chain operation-for-operation."""

    def dlit(x: float) -> str:
        return f"CAST({x!r} AS DOUBLE)"

    ghs, lls = dlit(GBDT_GH_SCALE), dlit(GBDT_LL_SCALE)
    eta, lam = dlit(GBDT_ETA), dlit(GBDT_LAMBDA)
    feats = ", ".join(
        f'CAST("{col}" AS BIGINT) AS {k}' for k, col in GBDT_FEATS
    )

    parts = [
        f'feat0 AS (SELECT {feats}, CAST("Churn" AS BIGINT) AS y '
        "FROM churn_customers)"
    ]
    for r in range(1, GBDT_ROUNDS + 1):
        if r == 1:
            zexpr = f"round({dlit(0.0)}, 6)"
            msrc = "feat0 x"
        else:
            terms = " + ".join(
                f"(CASE WHEN (CASE b{t}.f "
                + " ".join(
                    f"WHEN '{k}' THEN x.{k}" for k, _ in GBDT_FEATS[:-1]
                )
                + f" ELSE x.{GBDT_FEATS[-1][0]} END) <= b{t}.v "
                f"THEN b{t}.wl ELSE b{t}.wr END)"
                for t in range(1, r)
            )
            zexpr = f"round({dlit(0.0)} + {terms}, 6)"
            msrc = "feat0 x " + " ".join(
                f"CROSS JOIN b{t}" for t in range(1, r)
            )
        parts.append(f"""z{r} AS MATERIALIZED (
  SELECT x.pd, x.sc, x.tn, x.y, {zexpr} AS z FROM {msrc}
)""")
        parts.append(f"""gh{r} AS MATERIALIZED (
  SELECT pd, sc, tn, y,
    CAST(round((p - y) * {ghs}, 0) AS BIGINT) AS g,
    CAST(round(p * (1e0 - p) * {ghs}, 0) AS BIGINT) AS h,
    CAST(round(-(y * ln(p) + (1 - y) * ln(1e0 - p)) * {lls}, 0)
      AS BIGINT) AS ll,
    CASE WHEN (p >= 0.5) = (y = 1) THEN 1 ELSE 0 END AS hit
  FROM (
    SELECT *, least(greatest(round(1e0 / (1e0 + exp(-z)), 8), 1e-08),
      CAST(0.99999999 AS DOUBLE)) AS p
    FROM z{r}
  )
)""")
        parts.append(f"""tot{r} AS MATERIALIZED (
  SELECT CAST(sum(g) AS BIGINT) AS gt, CAST(sum(h) AS BIGINT) AS ht,
    CAST(sum(ll) AS BIGINT) AS llt, CAST(sum(hit) AS BIGINT) AS hits,
    CAST(count(*) AS BIGINT) AS n
  FROM gh{r}
)""")
        melt = " UNION ALL ".join(
            f"SELECT '{k}' AS feat, {k} AS value, g, h FROM gh{r}"
            for k, _ in GBDT_FEATS
        )
        parts.append(f"""cum{r} AS (
  SELECT feat, value,
    CAST(sum(glc) OVER (PARTITION BY feat ORDER BY value) AS BIGINT) AS gl,
    CAST(sum(hlc) OVER (PARTITION BY feat ORDER BY value) AS BIGINT) AS hl
  FROM (
    SELECT feat, value, CAST(sum(g) AS BIGINT) AS glc,
      CAST(sum(h) AS BIGINT) AS hlc
    FROM ({melt}) GROUP BY 1, 2
  )
)""")
        parts.append(f"""best{r} AS (
  SELECT feat, value, gl, hl FROM (
    SELECT c.feat, c.value, c.gl, c.hl,
      row_number() OVER (ORDER BY round(
        (CAST(c.gl AS DOUBLE) / {ghs}) * (CAST(c.gl AS DOUBLE) / {ghs})
          / ((CAST(c.hl AS DOUBLE) / {ghs}) + {lam})
        + (CAST(t.gt - c.gl AS DOUBLE) / {ghs})
          * (CAST(t.gt - c.gl AS DOUBLE) / {ghs})
          / ((CAST(t.ht - c.hl AS DOUBLE) / {ghs}) + {lam})
        - (CAST(t.gt AS DOUBLE) / {ghs}) * (CAST(t.gt AS DOUBLE) / {ghs})
          / ((CAST(t.ht AS DOUBLE) / {ghs}) + {lam}), 6) DESC,
        c.feat, c.value) AS rn
    FROM cum{r} c CROSS JOIN tot{r} t
    WHERE c.hl < t.ht
  ) WHERE rn = 1
)""")
        parts.append(f"""b{r} AS (
  SELECT b.feat AS f, b.value AS v,
    round(-{eta} * (CAST(b.gl AS DOUBLE) / {ghs})
      / ((CAST(b.hl AS DOUBLE) / {ghs}) + {lam}), 6) AS wl,
    round(-{eta} * (CAST(t.gt - b.gl AS DOUBLE) / {ghs})
      / ((CAST(t.ht - b.hl AS DOUBLE) / {ghs}) + {lam}), 6) AS wr
  FROM best{r} b CROSS JOIN tot{r} t
)""")
    traj = "\nUNION ALL\n".join(
        f"SELECT {r} AS round, b.f AS split_feature, b.v AS split_value, "
        f"b.wl + 0.0 AS w_left, b.wr + 0.0 AS w_right, "
        f"round(t.llt / ({lls} * t.n), 6) + 0.0 AS log_loss, "
        f"round(CAST(t.hits AS DOUBLE) / t.n, 6) AS accuracy "
        f"FROM b{r} b CROSS JOIN tot{r} t"
        for r in range(1, GBDT_ROUNDS + 1)
    )
    return (
        churn_cte()
        + ",\n"
        + ",\n".join(parts)
        + f"\nSELECT * FROM (\n{traj}\n) ORDER BY round\n"
    )


ORACLE: dict[str, str] = {"gbdt_churn_stumps": _duck_gbdt_sql()}
QUERIES = {"gbdt_churn_stumps": gbdt_churn_stumps}
