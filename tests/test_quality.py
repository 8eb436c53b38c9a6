"""Oracle-parity + semantic tests for the declarative DQ rule engine."""

from bigdata_group4_app_spark.operators import quality

from .conftest import SF_CORRECT, assert_matches_oracle


def test_dq_oracle_parity(spark):
    df = quality.dq_rule_violations(spark, SF_CORRECT)
    assert_matches_oracle(
        df, quality.ORACLE["dq_rule_violations"], SF_CORRECT
    )


def test_dq_rules_discriminate(spark):
    """The suite must both FIND real violations (policy rules seeded to
    fire on this data) and NOT false-alarm on clean invariants."""
    rows = {
        r["rule_id"]: r
        for r in quality.dq_rule_violations(spark, SF_CORRECT).collect()
    }
    assert len(rows) == len(quality.SINGLE_TABLE_RULES) + len(
        quality.JOIN_RULES
    )
    # genuinely firing policy rules
    for rule in ("li_discount_max_5pct", "ev_value_range",
                 "cust_acctbal_nonneg"):
        assert rows[rule]["n_violations"] > 0, rule
    # clean invariants: domains, referential + temporal integrity
    for rule in ("li_quantity_positive", "ord_status_domain",
                 "ev_type_domain", "li_orphan_orderkey"):
        assert rows[rule]["n_violations"] == 0, rule
    for r in rows.values():
        assert 0 <= r["n_violations"] <= r["n_rows"]
        assert abs(
            r["violation_rate"] - round(r["n_violations"] / r["n_rows"], 6)
        ) < 1e-9


def test_dq_single_scan_per_table(spark):
    """Scale contract: all lineitem rules fuse into one aggregate over one
    scan — the plan must contain exactly one lineitem file scan per
    consumer branch, not one per rule. (Three lineitem rules + two
    join-rule branches → the lineitem parquet appears ≤ 2× : once for the
    fused single-table agg, once for the join.)"""
    plan = (
        quality.dq_rule_violations(spark, SF_CORRECT)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("lineitem.parquet") <= 2
