"""Round-8 additions: registry-gate honesty, ADVICE regression pins,
and tests for the round's new operators."""

import os

from bigdata_group4_app_spark import registry
from bigdata_group4_app_spark.ml import booster


class TestGatedRegistryHonesty:
    """VERDICT r7 item 9: ``churn_score_booster`` silently drops out of
    ``_CHECK_FIRST`` when the pkl artifact is absent (the one legitimate
    environment gate). In THIS environment the artifact exists, so the
    query MUST be registered — otherwise the gate is masking an
    accidental regression, not an absent dependency."""

    def test_booster_artifact_present(self):
        assert os.path.exists(booster.REFERENCE_PKL), (
            "reference model artifact vanished — the _GATED allowance for "
            "churn_score_booster would silently hide a real regression"
        )

    def test_booster_query_registered_when_artifact_present(self):
        assert "churn_score_booster" in registry.QUERY_REGISTRY
        assert "churn_score_booster" in registry.ORACLE_REGISTRY

    def test_gated_set_is_exactly_the_documented_gates(self):
        # any new name added to _GATED must be argued in a code comment
        # and covered by a presence test like the two above
        assert registry._GATED == {"churn_score_booster"}


class TestAdviceIntegerFolds:
    """ADVICE r7: oracle-side sufficient statistics must fold as exact
    integers (per-row CAST to BIGINT BEFORE the product/sum), not as
    DOUBLE hash-aggs that lose exactness past 2^53 (~sf0.2 for
    Σcents²). Textual pins so the fixes can't silently regress."""

    def test_elastic_net_oracle_folds_bigint_products(self):
        sql = registry.ORACLE_REGISTRY["elastic_net_churn_path"]
        # every squared/cross/label moment casts each factor per-row
        assert "AS BIGINT) * CAST(" in sql
        # no double-sum-then-cast moments remain for the spend feature
        assert 'sum((round("Total Spend"' not in sql

    def test_rank_test_oracles_fold_tie_term_bigint(self):
        for name in ("kruskal_wallis_value_test", "mann_whitney_value_test"):
            sql = registry.ORACLE_REGISTRY[name]
            assert "CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT)" in sql, name
            assert "CAST(cnt AS DOUBLE) * cnt * cnt" not in sql, name
