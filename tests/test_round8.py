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


class TestTpchShapes:
    """Round-8 TPC-H additions (Q15/Q20/Q22/Q11 shapes) — oracle parity
    is covered by test_relational's parametrized sweep; these pin the
    SCALE claims the docstrings make."""

    def test_dominant_suppliers_single_fact_shuffle(self, spark):
        """Q20: the explicit repartition on l_partkey must serve BOTH
        the (part, supplier) agg and the per-part window — exactly one
        data Exchange before EnsureRequirements."""
        from bigdata_group4_app_spark.operators.relational import (
            dominant_part_suppliers,
        )

        plan = (
            dominant_part_suppliers(spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution()
            .sparkPlan()
            .toString()
        )
        assert plan.count("Exchange") == 1, plan

    def test_dormant_customers_anti_join_is_broadcast(self, spark):
        """Q22: the cutoff-filtered order keys must probe as a
        broadcast anti-join (no fact-sized shuffle for the NOT EXISTS)."""
        from bigdata_group4_app_spark.operators.relational import (
            dormant_rich_customers,
        )

        plan = (
            dormant_rich_customers(spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution()
            .sparkPlan()
            .toString()
        )
        assert "LeftAnti" in plan, plan

    def test_integer_threshold_compares(self):
        """Q11/Q22/Q15: threshold/max compares must be integer
        arithmetic — no double division or fraction literal on either
        side (the cross-multiplication discipline)."""
        from bigdata_group4_app_spark import registry

        q11 = registry.ORACLE_REGISTRY["concentrated_part_values"]
        assert "v.v_c * 10000 > 8 * t.t_c" in q11
        q22 = registry.ORACLE_REGISTRY["dormant_rich_customers"]
        assert "c.cents * g.n_pos > g.tot_c" in q22
        q15 = registry.ORACLE_REGISTRY["top_revenue_supplier"]
        assert "r.rev_c = (SELECT max(rev_c) FROM rev)" in q15


class TestIncrementalMinhash:
    def test_union_equivalence_with_full_mining(self, spark):
        """Incremental probing (new→corpus + new→smaller-batch-peer)
        must find EXACTLY the full pipeline's verified pairs that touch
        the new batch — band collision is symmetric, so skipping
        old×old loses nothing. Verdicts/counts replayed from the full
        pair set must equal the operator's output."""
        from bigdata_group4_app_spark.operators.dedup import (
            INCREMENT_MOD,
            incremental_minhash_lsh,
            minhash_lsh_pairs,
        )
        from tests.conftest import SF_CORRECT

        full = minhash_lsh_pairs(spark, SF_CORRECT).collect()
        is_new = lambda d: d % INCREMENT_MOD >= 8  # noqa: E731
        n_corpus, n_batch = {}, {}
        for r in full:
            a, b = r["doc_id_1"], r["doc_id_2"]  # a < b
            for me, peer in ((a, b), (b, a)):
                if not is_new(me):
                    continue
                if not is_new(peer):
                    n_corpus[me] = n_corpus.get(me, 0) + 1
                elif peer < me:
                    n_batch[me] = n_batch.get(me, 0) + 1
        got = incremental_minhash_lsh(spark, SF_CORRECT).collect()
        assert len(got) > 0
        seen_dup = False
        for r in got:
            d = r["doc_id"]
            assert r["n_corpus_dups"] == n_corpus.get(d, 0), d
            assert r["n_batch_dups"] == n_batch.get(d, 0), d
            expect = (
                "dup_of_corpus"
                if n_corpus.get(d, 0) > 0
                else "dup_in_batch"
                if n_batch.get(d, 0) > 0
                else "fresh"
            )
            assert r["verdict"] == expect, d
            seen_dup = seen_dup or expect != "fresh"
        assert seen_dup  # the fixture corpus must exercise dup verdicts


class TestBinaryFixture:
    def test_fixture_regenerates_byte_identical(self):
        """The committed parquet's data must equal a fresh deterministic
        rebuild — anyone can regenerate it and tests would catch drift."""
        import pyarrow.parquet as pq
        import sys

        sys.path.insert(0, "/root/repo/scripts")
        from make_binary_fixture import build_table

        on_disk = pq.read_table(
            "/root/repo/fixtures/binary_assets.parquet"
        )
        assert on_disk.equals(build_table())

    def test_blob_is_true_binary_and_magic_sniff_agrees(self, spark):
        """The Spark schema must be BinaryType (not string), and the
        sniffed kind must equal the catalog kind for every asset (the
        fixture has no deliberately-corrupt rows — kind_matches == 1)."""
        from bigdata_group4_app_spark.operators.multimodal import (
            BINARY_FIXTURE,
            binary_asset_profile,
        )
        from tests.conftest import SF_CORRECT

        schema = dict(spark.read.parquet(BINARY_FIXTURE).dtypes)
        assert schema["blob"] == "binary"
        rows = binary_asset_profile(spark, SF_CORRECT).collect()
        assert len(rows) == 256
        assert all(r["kind_matches"] == 1 for r in rows)
        assert {r["detected_kind"] for r in rows} == {"png", "jpeg", "wav"}
