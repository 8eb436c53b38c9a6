"""Declarative data-quality rule engine (the Deequ/Great-Expectations
shape): a rule table of (rule_id, table, violation predicate) evaluated as
conditional aggregates — never one job per rule.

The engine's contract at scale: ALL single-table rules for a table fuse
into ONE hash-aggregate pass over its scan (the shuffle carries one row of
counters per partition), and cross-table rules (referential integrity,
temporal ordering) share ONE join. A 50-rule suite on a 100 TB table costs
exactly one scan — the reference has no quality checks at all, while
production ingest gates on them.

Rules are chosen so the suite exercises both outcomes on this data: the
discount-policy, value-range and acctbal rules genuinely fire; the domain,
referential and temporal rules genuinely pass (asserted in tests — a DQ
engine that can't find seeded violations or false-alarms on clean columns
is broken either way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import duck_md5_int, md5_int_sql
from ..sources.registry import load_table

# (rule_id, table, violation predicate SQL — identical text in both
# dialects: comparisons, IN lists, IS NULL, date literals only)
SINGLE_TABLE_RULES: list[tuple[str, str, str]] = [
    ("li_quantity_positive", "lineitem", "l_quantity <= 0"),
    ("li_discount_max_5pct", "lineitem", "l_discount > 0.05"),
    ("li_tax_range", "lineitem", "l_tax < 0 OR l_tax > 0.2"),
    ("ord_status_domain", "orders", "o_orderstatus NOT IN ('O', 'F', 'P')"),
    (
        "ord_date_in_range",
        "orders",
        "o_orderdate < TIMESTAMP '1995-01-01 00:00:00' "
        "OR o_orderdate >= TIMESTAMP '2002-01-01 00:00:00'",
    ),
    (
        "ev_type_domain",
        "events",
        "event_type NOT IN ('click', 'view', 'purchase', 'signup', 'error')",
    ),
    ("ev_value_range", "events", "value <= 0 OR value > 400"),
    ("cust_acctbal_nonneg", "customer", "c_acctbal < 0"),
    ("cust_mktsegment_nonnull", "customer", "c_mktsegment IS NULL"),
]

# cross-table rules ride ONE lineitem⟕orders join:
#   li_orphan_orderkey     — referential integrity (no parent order)
#   li_ship_after_order    — temporal ordering (shipped before ordered)
JOIN_RULES = ("li_orphan_orderkey", "li_ship_after_order")


def dq_rule_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluate the whole rule suite; one row per rule with row/violation
    counts and the violation rate (exact integer division, 6dp)."""
    per_table: dict[str, list[tuple[str, str]]] = {}
    for rule_id, table, pred in SINGLE_TABLE_RULES:
        per_table.setdefault(table, []).append((rule_id, pred))

    def rule_rows(agg: DataFrame, emit: list[tuple[str, str, str]]) -> DataFrame:
        """Unpivot one aggregate row into one row PER RULE via a single
        explode — N selects from the same agg would re-plan (and re-scan)
        its whole subtree N times (the two-consumer trap, CLAUDE.md);
        this keeps every table at exactly one scan."""
        structs = [
            F.struct(
                F.lit(rule_id).alias("rule_id"),
                F.lit(table).alias("table_name"),
                F.col("n_rows").alias("n_rows"),
                F.col(counter).alias("n_violations"),
            )
            for rule_id, table, counter in emit
        ]
        return agg.select(F.explode(F.array(*structs)).alias("r")).select(
            "r.*"
        )

    pieces: list[DataFrame] = []
    for table, rules in per_table.items():
        if table == "lineitem":
            continue  # folded into the join pass below: the left join
            # preserves lineitem rows 1:1 (o_orderkey unique), so its
            # single-table counters ride the SAME scan as the
            # cross-table rules — the engine's largest table is read
            # once per suite run, not twice
        df = load_table(spark, sf_dir, table)
        agg = df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[
                F.sum(
                    F.when(F.expr(pred), 1).otherwise(0)
                ).alias(f"v_{i}")
                for i, (_, pred) in enumerate(rules)
            ],
        )
        pieces.append(
            rule_rows(
                agg,
                [
                    (rule_id, table, f"v_{i}")
                    for i, (rule_id, _) in enumerate(rules)
                ],
            )
        )

    li_rules = per_table.get("lineitem", [])
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_quantity", "l_discount", "l_tax"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey, "left").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)
        ).alias("v_orphan"),
        F.sum(
            F.when(F.col("l_shipdate") < F.col("o_orderdate"), 1).otherwise(0)
        ).alias("v_temporal"),
        *[
            F.sum(F.when(F.expr(pred), 1).otherwise(0)).alias(f"lv_{i}")
            for i, (_, pred) in enumerate(li_rules)
        ],
    )
    pieces.append(
        rule_rows(
            joined,
            [
                ("li_orphan_orderkey", "lineitem⋈orders", "v_orphan"),
                ("li_ship_after_order", "lineitem⋈orders", "v_temporal"),
                *[
                    (rule_id, "lineitem", f"lv_{i}")
                    for i, (rule_id, _) in enumerate(li_rules)
                ],
            ],
        )
    )

    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out.select(
        "rule_id",
        "table_name",
        "n_rows",
        "n_violations",
        F.round(F.col("n_violations") / F.col("n_rows"), 6).alias(
            "violation_rate"
        ),
    ).orderBy("rule_id")


def _dq_oracle() -> str:
    per_table: dict[str, list[tuple[str, str]]] = {}
    for rule_id, table, pred in SINGLE_TABLE_RULES:
        per_table.setdefault(table, []).append((rule_id, pred))
    selects = []
    for table, rules in per_table.items():
        counters = ", ".join(
            f"CAST(sum(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT) AS v_{i}"
            for i, (_, pred) in enumerate(rules)
        )
        agg = (
            f"agg_{table} AS (SELECT count(*) AS n_rows, {counters} "
            f"FROM {table})"
        )
        selects.append((table, agg, rules))
    ctes = [s[1] for s in selects]
    ctes.append(
        "agg_join AS (SELECT count(*) AS n_rows, "
        "CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) "
        "AS BIGINT) AS v_orphan, "
        "CAST(sum(CASE WHEN l.l_shipdate < o.o_orderdate THEN 1 ELSE 0 END) "
        "AS BIGINT) AS v_temporal "
        "FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey)"
    )
    rows = []
    for table, _, rules in selects:
        for i, (rule_id, _) in enumerate(rules):
            rows.append(
                f"SELECT '{rule_id}' AS rule_id, '{table}' AS table_name, "
                f"n_rows, v_{i} AS n_violations FROM agg_{table}"
            )
    rows.append(
        "SELECT 'li_orphan_orderkey', 'lineitem⋈orders', n_rows, v_orphan "
        "FROM agg_join"
    )
    rows.append(
        "SELECT 'li_ship_after_order', 'lineitem⋈orders', n_rows, "
        "v_temporal FROM agg_join"
    )
    union = "\nUNION ALL\n".join(rows)
    return (
        "WITH " + ",\n".join(ctes) + ",\nall_rules AS (\n" + union + "\n)\n"
        "SELECT rule_id, table_name, n_rows, n_violations,\n"
        "  round(n_violations / CAST(n_rows AS DOUBLE), 6) AS violation_rate\n"
        "FROM all_rules ORDER BY rule_id"
    )


def observed_lineitem_metrics(spark: SparkSession, sf_dir: str):
    """Pipeline instrumentation via ``df.observe``: attach named metrics
    (row count, violation counters, revenue total) to a DataFrame so
    ANY downstream action reports them as a side effect — quality
    telemetry at ZERO extra passes, where a naive monitor re-aggregates
    the table once per metric batch.

    Returns ``(df, observation)``: run an action on ``df``, then read
    ``observation.get``. The test asserts the observed numbers equal
    direct aggregation. This is the mechanism a production job uses to
    export freshness/violation counters to its metrics sink per batch
    (streaming twin: ``writeStream`` + ``StreamingQueryListener``)."""
    from pyspark.sql import Observation

    li = load_table(spark, sf_dir, "lineitem")
    obs = Observation("lineitem_quality")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.expr("l_discount > 0.05"), 1).otherwise(0)
        ).alias("n_discount_violations"),
        F.round(F.sum("l_extendedprice"), 4).alias("total_base_price"),
    )
    return observed, obs


ORACLE: dict[str, str] = {
    "dq_rule_violations": _dq_oracle(),
}

QUERIES = {
    "dq_rule_violations": dq_rule_violations,
}


# ---------------------------------------------------------------------------
# pre-shuffle partition-skew diagnostic
# ---------------------------------------------------------------------------

SKEW_BUCKETS = 32  # simulated shuffle width


def partition_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew forecast for the three hot join keys: hash every key
    into a simulated 32-partition shuffle and report max/avg rows,
    skew ratio, and the coefficient of variation per table — the
    diagnostic you run BEFORE a 100 TB join to decide whether the key
    needs salting (`functions/skew.py::salted_join`) or AQE skew
    handling. A healthy key shows ratio ≈ 1; a hot key pushes one
    bucket's share toward its frequency.

    One partial-aggregating pass per table (bucket counts), then O(32)
    algebra; md5-derived buckets so the oracle reproduces the exact
    assignment (Spark's real shuffle uses Murmur3 — the SHAPE of the
    distribution is the same for any good hash, and md5 keeps it
    cross-engine checkable).
    """
    parts = []
    for table, key in (
        ("orders", "o_custkey"),
        ("lineitem", "l_orderkey"),
        ("events", "user_id"),
    ):
        t = load_table(spark, sf_dir, table)
        b = F.expr(
            md5_int_sql(f"CAST({key} AS STRING)") + f" % {SKEW_BUCKETS}"
        )
        counts = t.groupBy(b.alias("bucket")).agg(
            F.count(F.lit(1)).alias("rows")
        )
        parts.append(
            counts.agg(
                F.lit(table).alias("table_name"),
                F.lit(key).alias("key_col"),
                F.count(F.lit(1)).alias("n_buckets"),
                F.sum("rows").alias("n_rows"),
                F.max("rows").alias("max_rows"),
                F.round(F.avg("rows"), 4).alias("avg_rows"),
                F.round(F.max("rows") / F.avg("rows"), 4).alias(
                    "skew_ratio"
                ),
                F.round(F.stddev_pop("rows") / F.avg("rows"), 4).alias(
                    "cv"
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("table_name")


def _duck_skew_sql() -> str:
    arms = []
    for table, key in (
        ("orders", "o_custkey"),
        ("lineitem", "l_orderkey"),
        ("events", "user_id"),
    ):
        h = duck_md5_int(f"CAST({key} AS VARCHAR)")
        arms.append(f"""
SELECT '{table}' AS table_name, '{key}' AS key_col,
  CAST(count(*) AS BIGINT) AS n_buckets,
  CAST(sum(rows) AS BIGINT) AS n_rows,
  CAST(max(rows) AS BIGINT) AS max_rows,
  round(avg(rows), 4) AS avg_rows,
  round(max(rows) / avg(rows), 4) AS skew_ratio,
  round(stddev_pop(rows) / avg(rows), 4) AS cv
FROM (
  SELECT {h} % {SKEW_BUCKETS} AS bucket, CAST(count(*) AS BIGINT) AS rows
  FROM {table} GROUP BY 1
)""")
    return "\nUNION ALL\n".join(arms) + "\nORDER BY table_name"


ORACLE["partition_skew_report"] = _duck_skew_sql()
QUERIES["partition_skew_report"] = partition_skew_report


# ---------------------------------------------------------------------------
# k-anonymity / attribute-disclosure audit over quasi-identifiers
# ---------------------------------------------------------------------------

KANON_K = 5  # the k in k-anonymity (HIPAA-ish smallest safe class)


def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy audit of the churn table BEFORE it leaves the engine:
    group rows by the quasi-identifier tuple (5-year age band, gender,
    contract length) and report the k-anonymity profile — smallest
    equivalence class, classes below ``KANON_K``, share of rows
    re-identifiable through them, and the classes where the churn
    label is HOMOGENEOUS (l-diversity = 1: membership alone discloses
    the sensitive attribute). The release-gate twin of
    ``dp_noisy_counts`` (corpus.py): that one perturbs, this one
    measures whether perturbation/suppression is needed at all.

    Scale: ONE partial-aggregating groupBy on a domain-bounded QI space
    (17 x 2 x 3 classes regardless of row count), then a second
    aggregate over that tiny class relation. No windows, no joins.

    Cross-engine: every audit number is an exact BIGINT count except
    the two ratios, which are single int-derived double chains rounded
    4dp in-query (direct class, never re-rounded).
    """
    from ..plans.churn import churn_customers

    cc = churn_customers(spark, sf_dir)
    cls = (
        cc.selectExpr(
            "CAST(FLOOR(`Age` / 5) AS BIGINT) AS age_band",
            "`Gender` AS gender",
            "`Contract Length` AS contract",
            "CAST(`Churn` AS BIGINT) AS y",
        )
        .groupBy("age_band", "gender", "contract")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
    )
    agg = cls.agg(
        F.sum("n").alias("n_rows"),
        F.count(F.lit(1)).alias("n_classes"),
        F.min("n").alias("min_class_size"),
        F.sum(F.when(F.col("n") < KANON_K, F.lit(1)).otherwise(F.lit(0))).alias(
            "k_viol"
        ),
        F.sum(F.when(F.col("n") < KANON_K, F.col("n")).otherwise(F.lit(0))).alias(
            "rows_risk"
        ),
        F.sum(
            F.when(F.col("y_min") == F.col("y_max"), F.lit(1)).otherwise(F.lit(0))
        ).alias("homo"),
    )
    return agg.select(
        "n_rows",
        "n_classes",
        "min_class_size",
        F.round(
            F.col("n_rows").cast("double") / F.col("n_classes").cast("double"),
            4,
        ).alias("avg_class_size"),
        F.col("k_viol").alias("k5_violating_classes"),
        F.col("rows_risk").alias("rows_at_risk"),
        F.round(
            F.col("rows_risk").cast("double")
            / F.col("n_rows").cast("double")
            * 100.0,
            4,
        ).alias("rows_at_risk_pct"),
        F.col("homo").alias("label_homogeneous_classes"),
    )


def _duck_kanon_sql() -> str:
    from ..plans.churn import churn_cte

    return (
        churn_cte()
        + f""",
cls AS (
  SELECT CAST(FLOOR("Age" / 5) AS BIGINT) AS age_band,
    "Gender" AS gender, "Contract Length" AS contract,
    CAST(count(*) AS BIGINT) AS n,
    CAST(min(CAST("Churn" AS BIGINT)) AS BIGINT) AS y_min,
    CAST(max(CAST("Churn" AS BIGINT)) AS BIGINT) AS y_max
  FROM churn_customers GROUP BY 1, 2, 3
),
agg AS (
  SELECT CAST(sum(n) AS BIGINT) AS n_rows,
    CAST(count(*) AS BIGINT) AS n_classes,
    CAST(min(n) AS BIGINT) AS min_class_size,
    CAST(sum(CASE WHEN n < {KANON_K} THEN 1 ELSE 0 END) AS BIGINT) AS k_viol,
    CAST(sum(CASE WHEN n < {KANON_K} THEN n ELSE 0 END) AS BIGINT)
      AS rows_risk,
    CAST(sum(CASE WHEN y_min = y_max THEN 1 ELSE 0 END) AS BIGINT) AS homo
  FROM cls
)
SELECT n_rows, n_classes, min_class_size,
  round(CAST(n_rows AS DOUBLE) / CAST(n_classes AS DOUBLE), 4)
    AS avg_class_size,
  k_viol AS k5_violating_classes,
  rows_risk AS rows_at_risk,
  round(CAST(rows_risk AS DOUBLE) / CAST(n_rows AS DOUBLE) * 100.0, 4)
    AS rows_at_risk_pct,
  homo AS label_homogeneous_classes
FROM agg
"""
    )


ORACLE["k_anonymity_audit"] = _duck_kanon_sql()
QUERIES["k_anonymity_audit"] = k_anonymity_audit


# ---------------------------------------------------------------------------
# Entropy l-diversity profile — per-QI-class sensitive-attribute diversity
# ---------------------------------------------------------------------------

LDIV_MIN_L = 2  # distinct-l threshold flagged in the output


def l_diversity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-equivalence-class l-diversity of the churn table
    (Machanavajjhala et al. 2007) — the release-gate companion of
    ``k_anonymity_audit``: k-anonymity bounds RE-IDENTIFICATION,
    l-diversity bounds ATTRIBUTE disclosure. Same quasi-identifier
    classes (5-year age band, gender, contract); sensitive attribute =
    Subscription Type. Emits per class the distinct-l, the entropy
    effective-l (exp of the sensitive-distribution entropy — the
    measure that catches 99:1 skew that distinct-l misses), and the
    below-threshold flag.

    Scale: two domain-bounded hash aggs ((QI × sensitive) cells →
    classes); no joins, no windows. Cross-engine exactness: entropy
    folds as Σ c·round(ln c, 8) over exact integer cell counts (the
    8dp log-constant rule — Java and DuckDB ln() differ in the last
    ulp), so every class entropy is identical double algebra over
    exact integers; effective-l emitted raw."""
    from ..plans.churn import churn_customers

    cc = churn_customers(spark, sf_dir)
    cells = (
        cc.selectExpr(
            "CAST(FLOOR(`Age` / 5) AS BIGINT) AS age_band",
            "`Gender` AS gender",
            "`Contract Length` AS contract",
            "`Subscription Type` AS sensitive",
        )
        .groupBy("age_band", "gender", "contract", "sensitive")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # log terms as 1e8-scaled exact BIGINTs so the per-class fold is
    # order-free (a plain double Σ c·ln(c) differs in the last ulp
    # between partial-agg orders)
    lnc8 = F.round(F.log("c") * 1e8, 0).cast("long")
    cls = cells.groupBy("age_band", "gender", "contract").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("distinct_l"),
        F.sum(F.col("c") * lnc8).alias("sclnc8"),
    )
    dn = F.col("n").cast("double")
    entropy = (
        F.round(F.log(dn) * 1e8, 0) - F.col("sclnc8").cast("double") / dn
    ) / 1e8
    return cls.select(
        "age_band",
        "gender",
        "contract",
        "n",
        "distinct_l",
        # entropy itself is identical double algebra over exact ints;
        # exp() is libm (last-ulp engine skew) so the effective-l is
        # 4dp-rounded and the raw entropy rides along un-rounded
        entropy.alias("entropy_nats"),
        (F.round(F.exp(entropy), 4) + F.lit(0.0)).alias("effective_l"),
        (F.col("distinct_l") < LDIV_MIN_L).cast("int").alias("below_min_l"),
    ).orderBy("age_band", "gender", "contract")


def _ldiv_oracle() -> str:
    from ..plans.churn import churn_cte

    return (
        churn_cte()
        + f"""
, base AS (
  SELECT CAST(FLOOR("Age" / 5) AS BIGINT) AS age_band,
    "Gender" AS gender,
    "Contract Length" AS contract,
    "Subscription Type" AS sensitive
  FROM churn_customers
),
cells AS (
  SELECT age_band, gender, contract, sensitive,
    CAST(count(*) AS BIGINT) AS c
  FROM base GROUP BY 1, 2, 3, 4
),
cls AS (
  SELECT age_band, gender, contract,
    CAST(sum(c) AS BIGINT) AS n,
    CAST(count(*) AS BIGINT) AS distinct_l,
    CAST(sum(c * CAST(round(ln(c) * 1e8, 0) AS BIGINT)) AS BIGINT) AS sclnc8
  FROM cells GROUP BY 1, 2, 3
)
SELECT age_band, gender, contract, n, distinct_l,
  (round(ln(CAST(n AS DOUBLE)) * 1e8, 0)
    - CAST(sclnc8 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e8 AS entropy_nats,
  round(exp((round(ln(CAST(n AS DOUBLE)) * 1e8, 0)
    - CAST(sclnc8 AS DOUBLE) / CAST(n AS DOUBLE)) / 1e8), 4)
    + 0.0 AS effective_l,
  CAST(distinct_l < {LDIV_MIN_L} AS INT) AS below_min_l
FROM cls
ORDER BY age_band, gender, contract
"""
    )


ORACLE["l_diversity_profile"] = _ldiv_oracle()
QUERIES["l_diversity_profile"] = l_diversity_profile


# ---------------------------------------------------------------------------
# t-closeness — the third release gate of the privacy triad
# ---------------------------------------------------------------------------

# threshold as an INTEGER basis-point constant rendered into both engines
# (a float product like 0.2*10000 is 2000.0000000000002 in Python but
# exact DECIMAL 2000.0 in DuckDB — the identical-literal rule)
TCLOSE_MAX_BP = 2000  # t = 0.2


def t_closeness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-equivalence-class t-closeness (Li et al. 2007) — completes
    the privacy release-gate triad: ``k_anonymity_audit`` bounds
    re-identification, ``l_diversity_profile`` bounds attribute
    disclosure, t-closeness bounds DISTRIBUTION disclosure (a class
    can be 3-diverse yet still reveal that its members skew 90/10
    against the population). Same QI classes (5-year age band, gender,
    contract); sensitive = Subscription Type (categorical ⇒ distance =
    total variation, ½·Σ|p_class − p_global|).

    Exactness: the TVD numerator folds ENTIRELY in integers via the
    absent-cell closed form — Σ_s|c_s·N − g_s·n| = Σ_present(|c_s·N −
    g_s·n| − g_s·n) + n·N — so no per-cell division, no missing-
    sensitive-value cross join, and both engines compare identical
    BIGINTs (headroom: n·N < 2^63 needs N < ~3e9 rows; past that the
    Gini rule applies — widen the products to DOUBLE and accept 2^53
    exactness). The single division happens once per class for
    display, identical doubles both sides, basis points via the
    integer-position round. Scale: two domain-bounded hash aggs plus a
    3-row broadcast of the global mix."""
    from ..plans.churn import churn_customers

    cc = churn_customers(spark, sf_dir)
    base = cc.selectExpr(
        "CAST(FLOOR(`Age` / 5) AS BIGINT) AS age_band",
        "`Gender` AS gender",
        "`Contract Length` AS contract",
        "`Subscription Type` AS sensitive",
    )
    cells = base.groupBy("age_band", "gender", "contract", "sensitive").agg(
        F.count(F.lit(1)).alias("c")
    )
    glob = base.groupBy("sensitive").agg(F.count(F.lit(1)).alias("g"))
    # N as a 1-row IN-PLAN aggregate (Σg over the 3-row global mix)
    # broadcast onto the cells — not an eager driver-side count at
    # query-construction time (round 10, the lazy-construction rule)
    glob_n = glob.agg(F.sum("g").alias("__N"))
    w = Window.partitionBy("age_band", "gender", "contract")
    term = (
        F.abs(F.col("c") * F.col("__N") - F.col("g") * F.col("n"))
        - F.col("g") * F.col("n")
    )
    cls = (
        cells.withColumn("n", F.sum("c").over(w))
        .join(F.broadcast(glob), "sensitive")
        .crossJoin(F.broadcast(glob_n))
        .groupBy("age_band", "gender", "contract", "n", "__N")
        .agg(F.sum(term).alias("present_num"))
        .select(
            "age_band",
            "gender",
            "contract",
            "n",
            "__N",
            (F.col("present_num") + F.col("n") * F.col("__N")).alias(
                "tvd_num"
            ),
        )
    )
    tvd_bp = F.round(
        F.col("tvd_num").cast("double")
        / (2.0 * F.col("n").cast("double") * F.col("__N").cast("double"))
        * 10000.0,
        0,
    )
    return cls.select(
        "age_band",
        "gender",
        "contract",
        "n",
        tvd_bp.alias("tvd_bp"),
        (tvd_bp > TCLOSE_MAX_BP).cast("int").alias("exceeds_t"),
    ).orderBy("age_band", "gender", "contract")


def _tclose_oracle() -> str:
    from ..plans.churn import churn_cte

    return (
        churn_cte()
        + f"""
, base AS (
  SELECT CAST(FLOOR("Age" / 5) AS BIGINT) AS age_band,
    "Gender" AS gender,
    "Contract Length" AS contract,
    "Subscription Type" AS sensitive
  FROM churn_customers
),
cells AS (
  SELECT age_band, gender, contract, sensitive,
    CAST(count(*) AS BIGINT) AS c
  FROM base GROUP BY 1, 2, 3, 4
),
gmix AS (
  SELECT sensitive, CAST(count(*) AS BIGINT) AS g FROM base GROUP BY 1
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM base),
cls AS (
  SELECT c.age_band, c.gender, c.contract,
    CAST(sum(c.c) AS BIGINT) AS n,
    CAST(sum(abs(c.c * t.nt - g.g * cn.n) - g.g * cn.n) AS BIGINT)
      AS present_num,
    t.nt AS nt
  FROM cells c
  JOIN gmix g ON g.sensitive = c.sensitive
  JOIN (SELECT age_band, gender, contract, CAST(sum(c) AS BIGINT) AS n
        FROM cells GROUP BY 1, 2, 3) cn
    ON cn.age_band = c.age_band AND cn.gender = c.gender
   AND cn.contract = c.contract
  CROSS JOIN tot t
  GROUP BY 1, 2, 3, t.nt
)
SELECT age_band, gender, contract, n,
  round(CAST(present_num + n * nt AS DOUBLE)
        / (2.0 * CAST(n AS DOUBLE) * CAST(nt AS DOUBLE)) * 10000.0, 0)
    AS tvd_bp,
  CAST(round(CAST(present_num + n * nt AS DOUBLE)
        / (2.0 * CAST(n AS DOUBLE) * CAST(nt AS DOUBLE)) * 10000.0, 0)
       > {TCLOSE_MAX_BP} AS INT) AS exceeds_t
FROM cls
ORDER BY age_band, gender, contract
"""
    )


ORACLE["t_closeness_profile"] = _tclose_oracle()
QUERIES["t_closeness_profile"] = t_closeness_profile
