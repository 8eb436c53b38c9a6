"""Depth-2 CART decision-tree training by distributed histogram split
search — the second in-engine trainer next to the logistic-GD fit
(``ml/scoring.py::logreg_churn_gd``).

The reference fits its churn model offline in sklearn (app_test.py,
best_model.pkl); tree ensembles at 100 TB are trained the way XGBoost
/ LightGBM / Spark ML actually do it: per tree node, ONE pass over the
data builds per-(feature, value) label histograms (a partial-aggregating
groupBy — the shuffle carries at most |features|·|domain| rows per
node, never data), then the split search runs entirely on that tiny
histogram relation (cumulative windows + an argmax). This module is
that recipe, depth 2, kept fully declarative: the chosen split is a
1-row relation CROSS JOINed (broadcast) back onto the scan — no driver
traffic at all, and both levels of the tree cost exactly one data pass
each.

Cross-engine exactness: split scores are built from EXACT integer
histogram counts (pos², neg² ≤ n² — past n ~ 3e9 rows ANSI BIGINT
overflow says compute the squares in DOUBLE, the Gini rule in
CLAUDE.md), divided once into DOUBLE with an identical expression
shape on both engines, rounded to 6dp BEFORE the argmax; argmax ties
break on (feature, value). Leaf predictions use the integer majority
rule 2·pos >= n, so engines can't disagree on a 50/50 leaf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.churn import churn_cte, churn_customers

# (short label, churn_customers column) — the three integer drivers of
# the synthetic label (plans/churn.py)
CART_FEATS: list[tuple[str, str]] = [
    ("pd", "Payment Delay"),
    ("sc", "Support Calls"),
    ("tn", "Tenure"),
]
_STACK = "stack(3, " + ", ".join(
    f"'{k}', {k}" for k, _ in CART_FEATS
) + ") AS (feat, value)"


def _gini(pos, n):
    p1 = pos / n
    p0 = (n - pos) / n
    return F.round(F.lit(1.0) - p1 * p1 - p0 * p0, 4)


def _best_split(melted: DataFrame, totals: DataFrame) -> DataFrame:
    """Histogram → cumulative counts → 6dp score → per-node argmax.
    ``melted``: (node, feat, value, y); ``totals``: (node, n, pos)."""
    hist = melted.groupBy("node", "feat", "value").agg(
        F.sum("y").alias("pos"), F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("node", "feat").orderBy("value")
    cum = hist.select(
        "node",
        "feat",
        "value",
        F.sum("pos").over(w).alias("pos_l"),
        F.sum("cnt").over(w).alias("n_l"),
    )
    cand = cum.join(F.broadcast(totals), "node").filter(
        F.col("n_l") < F.col("n")
    )
    neg_l = F.col("n_l") - F.col("pos_l")
    pos_r = F.col("pos") - F.col("pos_l")
    n_r = F.col("n") - F.col("n_l")
    neg_r = n_r - pos_r
    score = F.round(
        (F.col("pos_l") * F.col("pos_l") + neg_l * neg_l) / F.col("n_l")
        + (pos_r * pos_r + neg_r * neg_r) / n_r,
        6,
    )
    rw = Window.partitionBy("node").orderBy(
        F.desc("score"), F.col("feat"), F.col("value")
    )
    return (
        cand.withColumn("score", score)
        .withColumn("rn", F.row_number().over(rw))
        .filter(F.col("rn") == 1)
        .select("node", "feat", "value", "pos_l", "n_l", "n", "pos")
    )


def _route(best: DataFrame, alias_feat: str, alias_val: str) -> DataFrame:
    return best.select(
        F.col("feat").alias(alias_feat), F.col("value").alias(alias_val)
    )


def cart_churn_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the depth-2 CART on churn_customers and emit the 7-node
    tree table (see module docstring for the scale/exactness story):
    node_id 1 = root, 2/3 = its children (all three split nodes), 4-7 =
    leaves with the integer-majority prediction. Gini impurities are
    4dp presentation columns derived from the exact counts.

    The DuckDB oracle replays the identical histogram → cumulative →
    argmax pipeline per level, so every split choice (and therefore
    the whole tree) is reproduced decision-for-decision."""
    # r13 optimization (CLAUDE.md round-10 two-consumer rule): best1
    # feeds FOUR branches (routing, tot2, root_row — and best2 feeds
    # three more), and without materialization every consumer replans
    # the whole upstream subtree — the committed before-plan shows 23
    # parquet scans of the training matrix for one depth-2 tree. Lazy
    # persist() of the matrix and the two tiny split relations collapses
    # that to the two data passes the algorithm actually needs
    # (construction stays zero-job; persisting the training matrix is
    # what every tree trainer does at scale).
    base = churn_customers(spark, sf_dir).select(
        *[F.col(col).cast("long").alias(k) for k, col in CART_FEATS],
        F.col("Churn").cast("long").alias("y"),
    ).persist()
    melt1 = base.select("y", F.expr(_STACK)).withColumn("node", F.lit(1))
    tot1 = base.agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos")
    ).withColumn("node", F.lit(1))
    best1 = _best_split(melt1, tot1).persist()

    # route every row through the root split: 1-row broadcast, no keys
    # (intentional BroadcastNestedLoopJoin — tests/test_scale.py)
    feat_of = "CASE rf " + " ".join(
        f"WHEN '{k}' THEN {k}" for k, _ in CART_FEATS[:-1]
    ) + f" ELSE {CART_FEATS[-1][0]} END"
    routed = base.crossJoin(
        F.broadcast(_route(best1, "rf", "rt"))
    ).withColumn(
        "node",
        F.when(F.expr(feat_of) <= F.col("rt"), F.lit(2)).otherwise(
            F.lit(3)
        ),
    )
    melt2 = routed.select("node", "y", F.expr(_STACK))
    tot2 = best1.select(
        F.lit(2).alias("node"),
        F.col("n_l").alias("n"),
        F.col("pos_l").alias("pos"),
    ).unionByName(
        best1.select(
            F.lit(3).alias("node"),
            (F.col("n") - F.col("n_l")).alias("n"),
            (F.col("pos") - F.col("pos_l")).alias("pos"),
        )
    )
    best2 = _best_split(melt2, tot2).persist()

    null_feat = F.lit(None).cast("string")
    null_val = F.lit(None).cast("long")
    null_pred = F.lit(None).cast("int")
    pred = lambda pos, n: (pos * 2 >= n).cast("int")  # noqa: E731

    root_row = best1.select(
        F.lit(1).alias("node_id"),
        F.lit(0).alias("depth"),
        F.col("feat").alias("split_feature"),
        F.col("value").alias("split_value"),
        F.col("n"),
        F.col("pos").alias("n_pos"),
        _gini(F.col("pos"), F.col("n")).alias("gini"),
        null_pred.alias("prediction"),
    )
    mid_rows = best2.select(
        F.col("node").alias("node_id"),
        F.lit(1).alias("depth"),
        F.col("feat").alias("split_feature"),
        F.col("value").alias("split_value"),
        F.col("n"),
        F.col("pos").alias("n_pos"),
        _gini(F.col("pos"), F.col("n")).alias("gini"),
        null_pred.alias("prediction"),
    )
    leaf_l = best2.select(
        (F.col("node") * 2).alias("node_id"),
        F.lit(2).alias("depth"),
        null_feat.alias("split_feature"),
        null_val.alias("split_value"),
        F.col("n_l").alias("n"),
        F.col("pos_l").alias("n_pos"),
        _gini(F.col("pos_l"), F.col("n_l")).alias("gini"),
        pred(F.col("pos_l"), F.col("n_l")).alias("prediction"),
    )
    leaf_r = best2.select(
        (F.col("node") * 2 + 1).alias("node_id"),
        F.lit(2).alias("depth"),
        null_feat.alias("split_feature"),
        null_val.alias("split_value"),
        (F.col("n") - F.col("n_l")).alias("n"),
        (F.col("pos") - F.col("pos_l")).alias("n_pos"),
        _gini(
            F.col("pos") - F.col("pos_l"), F.col("n") - F.col("n_l")
        ).alias("gini"),
        pred(
            F.col("pos") - F.col("pos_l"), F.col("n") - F.col("n_l")
        ).alias("prediction"),
    )
    return (
        root_row.unionByName(mid_rows)
        .unionByName(leaf_l)
        .unionByName(leaf_r)
        .orderBy("node_id")
    )


def _duck_cart_sql() -> str:
    feats = ", ".join(
        f'CAST("{col}" AS BIGINT) AS {k}' for k, col in CART_FEATS
    )
    melt = " UNION ALL ".join(
        f"SELECT node, '{k}' AS feat, {k} AS value, y FROM {{src}}"
        for k, _ in CART_FEATS
    )
    feat_of = "CASE b.feat " + " ".join(
        f"WHEN '{k}' THEN f.{k}" for k, _ in CART_FEATS[:-1]
    ) + f" ELSE f.{CART_FEATS[-1][0]} END"
    score = (
        "round((pos_l*pos_l + (n_l-pos_l)*(n_l-pos_l)) / n_l"
        " + ((pos-pos_l)*(pos-pos_l)"
        " + ((n-n_l)-(pos-pos_l))*((n-n_l)-(pos-pos_l))) / (n-n_l), 6)"
    )

    def g(pos, n):
        return (
            f"round(CAST(1.0 AS DOUBLE) - ({pos}/{n})*({pos}/{n})"
            f" - (({n}-{pos})/{n})*(({n}-{pos})/{n}), 4)"
        )

    def level(lvl: str, src: str, tot: str, part: str) -> str:
        return f"""hist{lvl} AS (
  SELECT node, feat, value, CAST(sum(y) AS BIGINT) AS pos,
    CAST(count(*) AS BIGINT) AS cnt
  FROM melt{lvl} GROUP BY 1, 2, 3
),
cum{lvl} AS (
  -- window sum over BIGINT is HUGEINT in DuckDB: cast back (driver
  -- arrow-type rule, CLAUDE.md)
  SELECT node, feat, value,
    CAST(sum(pos) OVER (PARTITION BY node, feat ORDER BY value) AS BIGINT) AS pos_l,
    CAST(sum(cnt) OVER (PARTITION BY node, feat ORDER BY value) AS BIGINT) AS n_l
  FROM hist{lvl}
),
sc{lvl} AS (
  SELECT c.node, c.feat, c.value, c.pos_l, c.n_l, t.n, t.pos,
    {score} AS score
  FROM cum{lvl} c JOIN {tot} t USING (node)
  WHERE c.n_l < t.n
),
best{lvl} AS (
  SELECT node, feat, value, pos_l, n_l, n, pos FROM (
    SELECT *, row_number() OVER (PARTITION BY {part}
      ORDER BY score DESC, feat, value) AS rn
    FROM sc{lvl}
  ) WHERE rn = 1
)"""

    return (
        churn_cte()
        + f""",
feat0 AS (
  SELECT {feats}, CAST("Churn" AS BIGINT) AS y,
    1 AS node
  FROM churn_customers
),
melt1 AS ({melt.format(src='feat0')}),
tot1 AS (SELECT 1 AS node, CAST(count(*) AS BIGINT) AS n,
  CAST(sum(y) AS BIGINT) AS pos FROM feat0),
{level('1', 'feat0', 'tot1', 'node')},
routed AS (
  SELECT f.*, CASE WHEN {feat_of} <= b.value THEN 2 ELSE 3 END AS node2
  FROM feat0 f CROSS JOIN best1 b
),
feat2 AS (SELECT pd, sc, tn, y, node2 AS node FROM routed),
melt2 AS ({melt.format(src='feat2')}),
tot2 AS (
  SELECT 2 AS node, b.n_l AS n, b.pos_l AS pos FROM best1 b
  UNION ALL
  SELECT 3 AS node, b.n - b.n_l, b.pos - b.pos_l FROM best1 b
),
{level('2', 'feat2', 'tot2', 'node')}
SELECT * FROM (
  SELECT 1 AS node_id, 0 AS depth, feat AS split_feature,
    value AS split_value, n, pos AS n_pos, {g('pos', 'n')} AS gini,
    CAST(NULL AS INT) AS prediction
  FROM best1
  UNION ALL
  SELECT node, 1, feat, value, n, pos, {g('pos', 'n')},
    CAST(NULL AS INT)
  FROM best2
  UNION ALL
  SELECT node * 2, 2, CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
    n_l, pos_l, {g('pos_l', 'n_l')},
    CAST(pos_l * 2 >= n_l AS INT)
  FROM best2
  UNION ALL
  SELECT node * 2 + 1, 2, CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT),
    n - n_l, pos - pos_l, {g('(pos-pos_l)', '(n-n_l)')},
    CAST((pos - pos_l) * 2 >= (n - n_l) AS INT)
  FROM best2
) ORDER BY node_id
"""
    )


ORACLE: dict[str, str] = {"cart_churn_tree": _duck_cart_sql()}
QUERIES = {"cart_churn_tree": cart_churn_tree}


# ---------------------------------------------------------------------------
# random forest of bagged stumps + out-of-bag accuracy
# ---------------------------------------------------------------------------

RF_TREES = 5


def rf_churn_oob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-forest-style bagging over depth-1 trees with OUT-OF-BAG
    evaluation — the ensemble counterpart of ``cart_churn_tree`` and
    the validation scheme that needs no holdout: each tree trains on a
    Poisson(1) bootstrap (the ``poisson_bootstrap_ci`` md5 weights, the
    resampling that works in one pass at any scale); rows drawn ZERO
    times by a tree are that tree's test set, and the forest's OOB
    accuracy aggregates their majority votes.

    Fully declarative — NO driver loop, unlike the sequential trainers
    (gbdt/logreg must iterate; bagging is embarrassingly parallel, so
    the whole forest is ONE DataFrame DAG): the tree axis is an
    explode(1..T), every tree's weighted histogram lands in the same
    partial-aggregating groupBy(tree, feat, value), the per-tree argmax
    is a T-partition window over the tiny histogram relation, and the
    T-row forest broadcast-joins back onto the row x tree grid for OOB
    voting. At 100 TB: two data passes (histograms, voting), both
    linear, shuffle keyed by bounded domains.

    Cross-engine: bootstrap weights are md5-uniforms through literal
    Poisson breakpoints (exact integers); split scores are the CART
    6dp rule on WEIGHTED integer counts; leaf predictions and OOB
    majority votes are integer-threshold rules (2*pos >= n), so no
    float can decide a label on either engine; the one emitted ratio
    (oob accuracy) is a fresh int chain rounded 6dp.
    """
    from ..operators.stats import _poisson_weight_sql
    from ..functions.hashing import md5_int_sql

    base = churn_customers(spark, sf_dir).select(
        F.col("CustomerID").alias("cid"),
        *[F.col(col).cast("long").alias(k) for k, col in CART_FEATS],
        F.col("Churn").cast("long").alias("y"),
    )
    h = md5_int_sql("concat('rf_', cid, '_', b)")
    u = f"({h} / CAST(4294967296 AS DOUBLE))"
    w = _poisson_weight_sql(u)
    grid = base.select(
        "cid",
        *[k for k, _ in CART_FEATS],
        "y",
        F.explode(F.expr(f"sequence(1, {RF_TREES})")).alias("b"),
    ).withColumn("w", F.expr(w).cast("long"))

    melted = grid.select("b", "w", "y", F.expr(_STACK))
    hist = melted.groupBy("b", "feat", "value").agg(
        F.sum(F.col("w") * F.col("y")).alias("pos"),
        F.sum("w").alias("cnt"),
    )
    cw = Window.partitionBy("b", "feat").orderBy("value")
    tot = melted.groupBy("b").agg(
        F.sum(F.col("w") * F.col("y")).alias("pos"),
        F.sum("w").alias("n"),
    )
    cum = hist.select(
        "b",
        "feat",
        "value",
        F.sum("pos").over(cw).alias("pos_l"),
        F.sum("cnt").over(cw).alias("n_l"),
    )
    cand = cum.join(F.broadcast(tot), "b").filter(
        (F.col("n_l") > 0) & (F.col("n_l") < F.col("n"))
    )
    neg_l = F.col("n_l") - F.col("pos_l")
    pos_r = F.col("pos") - F.col("pos_l")
    n_r = F.col("n") - F.col("n_l")
    neg_r = n_r - pos_r
    score = F.round(
        (F.col("pos_l") * F.col("pos_l") + neg_l * neg_l) / F.col("n_l")
        + (pos_r * pos_r + neg_r * neg_r) / n_r,
        6,
    )
    rw = Window.partitionBy("b").orderBy(
        F.desc("score"), F.col("feat"), F.col("value")
    )
    forest = (
        cand.withColumn("score", score)
        .withColumn("rn", F.row_number().over(rw))
        .filter(F.col("rn") == 1)
        .select(
            "b",
            "feat",
            "value",
            (F.col("pos_l") * 2 >= F.col("n_l")).cast("int").alias("pred_l"),
            ((F.col("pos") - F.col("pos_l")) * 2
             >= F.col("n") - F.col("n_l")).cast("int").alias("pred_r"),
            F.col("n").alias("inbag_weight"),
        )
        .localCheckpoint()
    )
    feat_of = "CASE feat " + " ".join(
        f"WHEN '{k}' THEN {k}" for k, _ in CART_FEATS[:-1]
    ) + f" ELSE {CART_FEATS[-1][0]} END"
    votes = (
        grid.filter(F.col("w") == 0)
        .join(F.broadcast(forest), "b")
        .select(
            "cid",
            "y",
            F.when(
                F.expr(feat_of) <= F.col("value"), F.col("pred_l")
            ).otherwise(F.col("pred_r")).alias("vote"),
        )
        .groupBy("cid", "y")
        .agg(F.sum("vote").alias("v"), F.count(F.lit(1)).alias("nv"))
    )
    acc = votes.select(
        (
            ((F.col("v") * 2 >= F.col("nv")).cast("long") == F.col("y"))
        ).cast("long").alias("hit")
    ).agg(
        F.count(F.lit(1)).alias("n_oob_rows"),
        F.sum("hit").alias("hits"),
    ).select(
        "n_oob_rows",
        F.round(
            F.col("hits").cast("double") / F.col("n_oob_rows").cast("double"),
            6,
        ).alias("forest_oob_accuracy"),
    )
    return (
        forest.crossJoin(F.broadcast(acc))
        .select(
            F.col("b").alias("tree"),
            F.col("feat").alias("split_feature"),
            F.col("value").alias("split_value"),
            F.col("pred_l").alias("pred_left"),
            F.col("pred_r").alias("pred_right"),
            "inbag_weight",
            "n_oob_rows",
            "forest_oob_accuracy",
        )
        .orderBy("tree")
    )


def _duck_rf_sql() -> str:
    from ..functions.hashing import duck_md5_int
    from ..operators.stats import _poisson_weight_sql

    h = duck_md5_int("concat('rf_', cid, '_', b)")
    u = f"({h} / CAST(4294967296 AS DOUBLE))"
    w = _poisson_weight_sql(u)
    feats = ", ".join(
        f'CAST("{col}" AS BIGINT) AS {k}' for k, col in CART_FEATS
    )
    melt = " UNION ALL ".join(
        f"SELECT b, w, y, '{k}' AS feat, {k} AS value FROM grid"
        for k, _ in CART_FEATS
    )
    feat_of = "CASE f.feat " + " ".join(
        f"WHEN '{k}' THEN g.{k}" for k, _ in CART_FEATS[:-1]
    ) + f" ELSE g.{CART_FEATS[-1][0]} END"
    score = (
        "round((pos_l*pos_l + (n_l-pos_l)*(n_l-pos_l)) / n_l"
        " + ((pos-pos_l)*(pos-pos_l)"
        " + ((n-n_l)-(pos-pos_l))*((n-n_l)-(pos-pos_l))) / (n-n_l), 6)"
    )
    return (
        churn_cte()
        + f""",
base AS (
  SELECT "CustomerID" AS cid, {feats}, CAST("Churn" AS BIGINT) AS y
  FROM churn_customers
),
grid AS (
  SELECT cid, pd, sc, tn, y, b.b, CAST({w} AS BIGINT) AS w
  FROM base CROSS JOIN (
    SELECT unnest(generate_series(1, {RF_TREES})) AS b
  ) b
),
melted AS ({melt}),
hist AS (
  SELECT b, feat, value, CAST(sum(w * y) AS BIGINT) AS pos,
    CAST(sum(w) AS BIGINT) AS cnt
  FROM melted GROUP BY 1, 2, 3
),
tot AS (
  SELECT b, CAST(sum(w * y) AS BIGINT) AS pos, CAST(sum(w) AS BIGINT) AS n
  FROM melted GROUP BY 1
),
cum AS (
  SELECT b, feat, value,
    CAST(sum(pos) OVER (PARTITION BY b, feat ORDER BY value) AS BIGINT)
      AS pos_l,
    CAST(sum(cnt) OVER (PARTITION BY b, feat ORDER BY value) AS BIGINT)
      AS n_l
  FROM hist
),
forest AS (
  SELECT b, feat, value,
    CAST(pos_l * 2 >= n_l AS INT) AS pred_l,
    CAST((pos - pos_l) * 2 >= n - n_l AS INT) AS pred_r,
    n AS inbag_weight
  FROM (
    SELECT c.*, t.pos, t.n,
      row_number() OVER (PARTITION BY c.b
        ORDER BY {score} DESC, c.feat, c.value) AS rn
    FROM cum c JOIN tot t USING (b)
    WHERE c.n_l > 0 AND c.n_l < t.n
  ) WHERE rn = 1
),
votes AS (
  SELECT g.cid, g.y,
    CAST(sum(CASE WHEN {feat_of} <= f.value THEN f.pred_l
      ELSE f.pred_r END) AS BIGINT) AS v,
    CAST(count(*) AS BIGINT) AS nv
  FROM grid g JOIN forest f USING (b)
  WHERE g.w = 0
  GROUP BY 1, 2
),
acc AS (
  SELECT CAST(count(*) AS BIGINT) AS n_oob_rows,
    round(CAST(sum(CASE WHEN CAST(v * 2 >= nv AS BIGINT) = y
        THEN 1 ELSE 0 END) AS DOUBLE)
      / CAST(count(*) AS DOUBLE), 6) AS forest_oob_accuracy
  FROM votes
)
SELECT f.b AS tree, f.feat AS split_feature, f.value AS split_value,
  f.pred_l AS pred_left, f.pred_r AS pred_right, f.inbag_weight,
  a.n_oob_rows, a.forest_oob_accuracy
FROM forest f CROSS JOIN acc a
ORDER BY tree
"""
    )


ORACLE["rf_churn_oob"] = _duck_rf_sql()
QUERIES["rf_churn_oob"] = rf_churn_oob
