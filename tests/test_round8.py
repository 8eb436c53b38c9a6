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


class TestBandTuning:
    def test_scurve_monotonicity_and_superset(self, spark):
        """Coarser bands (more rows per band) must only SHRINK the
        candidate set; the r=1 config catches every discoverable true
        dup by construction (recall 10000 bp); the theoretical
        collision probability at the threshold falls with r."""
        from bigdata_group4_app_spark.operators.dedup import (
            minhash_band_tuning,
        )
        from tests.conftest import SF_CORRECT

        rows = {
            r["rows_per_band"]: r
            for r in minhash_band_tuning(spark, SF_CORRECT).collect()
        }
        assert set(rows) == {1, 2, 4, 8}
        assert rows[1]["recall_bp"] == 10000.0
        for lo, hi in ((1, 2), (2, 4), (4, 8)):
            assert rows[lo]["n_candidates"] >= rows[hi]["n_candidates"]
            assert rows[lo]["n_true"] >= rows[hi]["n_true"]
            assert (
                rows[lo]["expected_p_at_thr"] > rows[hi]["expected_p_at_thr"]
            )
        # precision never drops as banding coarsens (sharper S-curve),
        # provided the coarser config still has candidates
        assert rows[2]["precision_bp"] >= rows[1]["precision_bp"]


class TestClusterHistogram:
    def test_doc_accounting_is_exact(self, spark):
        """Bucket doc counts must add to the corpus size and cluster
        counts to |distinct cluster ids| (singletons included)."""
        from bigdata_group4_app_spark.operators.dedup import (
            dedup_cluster_size_histogram,
            near_dup_clusters,
        )
        from bigdata_group4_app_spark.sources.registry import load_table
        from tests.conftest import SF_CORRECT

        hist = dedup_cluster_size_histogram(spark, SF_CORRECT).collect()
        n_docs = load_table(spark, SF_CORRECT, "documents").count()
        labeled = near_dup_clusters(spark, SF_CORRECT).collect()
        n_clustered_docs = len(labeled)
        n_nonsingleton = len({r["cluster_id"] for r in labeled})
        assert sum(r["n_docs"] for r in hist) == n_docs
        n_singletons = n_docs - n_clustered_docs
        assert (
            sum(r["n_clusters"] for r in hist)
            == n_singletons + n_nonsingleton
        )
        assert abs(sum(r["doc_share"] for r in hist) - 1.0) < 0.01


class TestNearestAlignment:
    def test_gaps_replay_from_raw_events(self, spark):
        """Per-purchase gaps replayed in Python from the raw event list
        (bisect over each user's sorted click times) must equal the
        operator's RANGE-window answer exactly — microsecond integers,
        no float tolerance."""
        import bisect
        from collections import defaultdict

        from bigdata_group4_app_spark.operators.advanced import (
            nearest_click_alignment,
        )
        from bigdata_group4_app_spark.sources.registry import load_table
        from tests.conftest import SF_SMOKE

        ev = (
            load_table(spark, SF_SMOKE, "events")
            .filter("event_type IN ('click', 'purchase')")
            .collect()
        )
        clicks = defaultdict(list)
        for r in ev:
            if r["event_type"] == "click":
                clicks[r["user_id"]].append(int(r["ts"].timestamp() * 1e6))
        for v in clicks.values():
            v.sort()
        got = nearest_click_alignment(spark, SF_SMOKE).collect()
        purchases = [r for r in ev if r["event_type"] == "purchase"]
        assert len(got) == len(purchases)
        for r in got:
            cs = clicks.get(r["user_id"], [])
            t = next(
                int(p["ts"].timestamp() * 1e6)
                for p in purchases
                if p["event_id"] == r["event_id"]
            )
            i = bisect.bisect_right(cs, t)
            back = t - cs[i - 1] if i > 0 else None
            fwd = cs[i] - t if i < len(cs) else None
            # a click at exactly t sits in BOTH directions (gap 0)
            if i > 0 and cs[i - 1] == t:
                fwd = 0
            assert r["back_gap_us"] == back
            assert r["fwd_gap_us"] == fwd
            vals = [g for g in (back, fwd) if g is not None]
            assert r["nearest_gap_us"] == (min(vals) if vals else None)


class TestTCloseness:
    def test_tvd_replays_from_raw_rows(self, spark):
        """Per-class total-variation distance replayed in Python over
        the FULL sensitive domain must equal the closed-form integer
        fold (which never materializes absent cells)."""
        from collections import Counter, defaultdict

        from bigdata_group4_app_spark.operators.quality import (
            t_closeness_profile,
        )
        from bigdata_group4_app_spark.plans.churn import churn_customers
        from tests.conftest import SF_CORRECT

        rows = churn_customers(spark, SF_CORRECT).collect()
        glob = Counter(r["Subscription Type"] for r in rows)
        nt = len(rows)
        per_class = defaultdict(Counter)
        for r in rows:
            key = (
                int(r["Age"] // 5),
                r["Gender"],
                r["Contract Length"],
            )
            per_class[key][r["Subscription Type"]] += 1
        got = t_closeness_profile(spark, SF_CORRECT).collect()
        assert len(got) == len(per_class)
        for r in got:
            key = (r["age_band"], r["gender"], r["contract"])
            cc = per_class[key]
            n = sum(cc.values())
            assert n == r["n"]
            num = sum(
                abs(cc.get(s, 0) * nt - g * n) for s, g in glob.items()
            )
            expect_bp = num / (2.0 * n * nt) * 10000.0
            assert abs(r["tvd_bp"] - expect_bp) <= 0.5  # integer round


class TestRaLinkPrediction:
    def test_scores_replay_and_predicted_edges_are_absent(self, spark):
        """RA scores replayed from the raw edge set (same integer
        quantization) must match, and no predicted pair may already be
        an edge."""
        from collections import defaultdict

        from bigdata_group4_app_spark.operators.graph import (
            RA_SCALE,
            TRI_MIN_SUPPORT,
            ra_link_prediction,
        )
        from bigdata_group4_app_spark.operators.relational import (
            basket_pairs_from,
        )
        from bigdata_group4_app_spark.sources.registry import load_table
        from pyspark.sql import functions as F
        from tests.conftest import SF_SMOKE

        li = load_table(spark, SF_SMOKE, "lineitem").select(
            F.col("l_orderkey").alias("okey"),
            F.col("l_partkey").alias("pkey"),
        )
        edges = {
            (r["part1"], r["part2"])
            for r in basket_pairs_from(li, ordered=False)
            .filter(F.col("n_orders") >= TRI_MIN_SUPPORT)
            .collect()
        }
        nbrs = defaultdict(set)
        for a, b in edges:
            nbrs[a].add(b)
            nbrs[b].add(a)
        got = ra_link_prediction(spark, SF_SMOKE).collect()
        assert 0 < len(got) <= 50
        for r in got:
            a, b = r["a"], r["b"]
            assert (a, b) not in edges and (b, a) not in edges
            common = nbrs[a] & nbrs[b]
            assert r["n_common"] == len(common)
            expect = sum(RA_SCALE // len(nbrs[z]) for z in common)
            assert r["ra_score_scaled"] == expect


class TestReviewFixPins:
    """Round-8 self-review regression pins."""

    def test_tcloseness_threshold_is_integer_bp(self):
        from bigdata_group4_app_spark import registry
        from bigdata_group4_app_spark.operators.quality import TCLOSE_MAX_BP

        assert isinstance(TCLOSE_MAX_BP, int)
        assert f"> {TCLOSE_MAX_BP} AS INT" in registry.ORACLE_REGISTRY[
            "t_closeness_profile"
        ]

    def test_quantity_folds_round_then_cast_on_both_sides(self):
        from bigdata_group4_app_spark import registry

        for name in ("dominant_part_suppliers", "cheapest_supplier_per_part"):
            sql = registry.ORACLE_REGISTRY[name]
            assert "CAST(round(l_quantity, 0) AS BIGINT)" in sql, name
            assert "sum(CAST(l_quantity AS BIGINT))" not in sql, name

    def test_knn_ivf_oracle_materializes_shared_ctes(self):
        from bigdata_group4_app_spark import registry

        sql = registry.ORACLE_REGISTRY["knn_ivf"]
        assert "ad AS MATERIALIZED" in sql
        assert "carrF AS MATERIALIZED" in sql

    def test_band_tuning_counts_all_candidates(self):
        from bigdata_group4_app_spark import registry

        sql = registry.ORACLE_REGISTRY["minhash_band_tuning"]
        assert "LEFT JOIN verified" in sql
        assert "coalesce(v.jaccard" in sql

    def test_rev_cents_helper_is_shared(self):
        """Every round-8 TPC-H oracle that folds discounted revenue
        renders the ONE shared fragment."""
        from bigdata_group4_app_spark import registry
        from bigdata_group4_app_spark.operators.relational import (
            _DUCK_REV_CENTS,
        )

        for name in (
            "top_revenue_supplier",
            "returned_item_losses",
            "promo_revenue_share",
            "disjunctive_bulk_revenue",
            "cheapest_supplier_per_part",
            "concentrated_part_values",
        ):
            assert _DUCK_REV_CENTS in registry.ORACLE_REGISTRY[name], name


class TestSemanticSweep:
    def test_monotone_and_floor_consistent(self, spark):
        """Counts must fall monotonically with the threshold, and the
        floor row (t = COSINE_DUP_THRESHOLD) must equal the registered
        pair report's volume exactly."""
        from bigdata_group4_app_spark.operators.dedup import (
            COSINE_DUP_THRESHOLD,
        )
        from bigdata_group4_app_spark.operators.similarity import (
            semantic_dedup_pairs,
            semantic_threshold_sweep,
        )
        from tests.conftest import SF_CORRECT

        rows = semantic_threshold_sweep(spark, SF_CORRECT).collect()
        assert [r["threshold"] for r in rows] == [0.4, 0.5, 0.6, 0.7]
        for lo, hi in zip(rows, rows[1:]):
            assert lo["n_pairs"] >= hi["n_pairs"]
            assert lo["n_dup_docs"] >= hi["n_dup_docs"]
            assert lo["reduction_bp"] >= hi["reduction_bp"]
        pair_rows = semantic_dedup_pairs(spark, SF_CORRECT).collect()
        floor = rows[0]
        assert floor["threshold"] == COSINE_DUP_THRESHOLD
        assert floor["n_pairs"] == len(pair_rows)
        docs = {r["vec_id_a"] for r in pair_rows} | {
            r["vec_id_b"] for r in pair_rows
        }
        assert floor["n_dup_docs"] == len(docs)


class TestTvdClosedFormProperty:
    def test_absent_cell_identity_holds_for_random_distributions(self):
        """Pure-math pin of the t-closeness fold: for ANY class/global
        integer distributions, sum over the full domain of |c·N − g·n|
        equals sum over PRESENT cells of (|c·N − g·n| − g·n) plus n·N —
        the identity that lets the operator skip absent-cell cross
        joins entirely."""
        from hypothesis import given, strategies as st

        @given(
            st.dictionaries(
                st.sampled_from(list("abcdef")),
                st.integers(min_value=1, max_value=1000),
                min_size=1,
            ),
            st.dictionaries(
                st.sampled_from(list("abcdef")),
                st.integers(min_value=0, max_value=1000),
            ),
        )
        def check(glob_counts, extra_class):
            # class cells must be a subset of the global support
            cells = {
                s: c for s, c in extra_class.items()
                if s in glob_counts and c > 0
            }
            nt = sum(glob_counts.values())
            n = sum(cells.values())
            if n == 0:
                return
            full = sum(
                abs(cells.get(s, 0) * nt - g * n)
                for s, g in glob_counts.items()
            )
            closed = (
                sum(
                    abs(c * nt - glob_counts[s] * n) - glob_counts[s] * n
                    for s, c in cells.items()
                )
                + n * nt
            )
            assert full == closed

        check()


class TestRaScaledVariant:
    def test_floors_to_fixed_support_at_oracle_sf(self, spark):
        """At the oracle SF the scaled support floors to
        TRI_MIN_SUPPORT, so the production variant must be row-for-row
        identical to the registered entry (the _scaled precedent)."""
        from bigdata_group4_app_spark.operators.graph import (
            ra_link_prediction,
            ra_link_prediction_scaled,
        )
        from tests.conftest import SF_CORRECT

        a = [tuple(r) for r in ra_link_prediction(spark, SF_CORRECT).collect()]
        b = [
            tuple(r)
            for r in ra_link_prediction_scaled(spark, SF_CORRECT).collect()
        ]
        assert a == b


class TestEquidepthBins:
    def test_bins_are_depth_balanced_and_edges_monotone(self, spark):
        from bigdata_group4_app_spark.operators.analytics import (
            EQUIDEPTH_BINS,
            spend_equidepth_bins,
        )
        from tests.conftest import SF_CORRECT

        rows = spend_equidepth_bins(spark, SF_CORRECT).collect()
        assert [r["bin"] for r in rows] == list(
            range(1, EQUIDEPTH_BINS + 1)
        )
        sizes = [r["n"] for r in rows]
        # ntile: first buckets absorb the remainder — sizes differ by <= 1
        # and are non-increasing
        assert max(sizes) - min(sizes) <= 1
        assert sizes == sorted(sizes, reverse=True)
        for lo, hi in zip(rows, rows[1:]):
            assert lo["spend_hi"] <= hi["spend_lo"] or (
                # equal cents can straddle a bin edge under the id tiebreak
                lo["spend_hi"] == hi["spend_lo"]
            )
            assert lo["spend_lo"] <= lo["spend_hi"]
