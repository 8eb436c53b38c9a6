"""Round-14 focused tests: the convergence-fold helper and the loop
rewrites that use it.

The optimization claim (OPTIMIZATION_r14.md §1) is that observing the
convergence aggregates during the eager localCheckpoint's own job is
(a) exact — identical numbers to a separate count()/filter-count, and
(b) free — no extra Spark job beyond the checkpoint's; and that the
capture-mode fallback (identity-patched localCheckpoint, as
scripts/capture_plan_r14.py does) cannot deadlock. The loop outputs
themselves stay pinned by their oracle checks and the older suites;
these tests pin the MECHANISM so a refactor can't silently turn the
metrics into estimates or resurrect the per-round count job.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from bigdata_group4_app_spark.functions.iterative import (
    checkpoint_with_metrics,
)


@pytest.fixture(scope="module")
def skewed_df(spark):
    return spark.range(0, 5000).select(
        (F.col("id") % 101).alias("k"),
        (F.col("id") % 7 == 0).alias("flag"),
    )


class TestCheckpointWithMetrics:
    def test_metrics_match_direct_aggregates(self, spark, skewed_df):
        out, m = checkpoint_with_metrics(
            skewed_df,
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("flag").cast("long")).alias("n_flag"),
        )
        assert m["n"] == skewed_df.count()
        assert (
            m["n_flag"]
            == skewed_df.filter("flag").count()
        )
        # the returned frame is the checkpointed data, fully usable
        assert out.count() == m["n"]
        assert out.columns == ["k", "flag"]

    def test_zero_extra_jobs_beyond_checkpoint(self, spark, skewed_df):
        sc = spark.sparkContext
        agg = skewed_df.groupBy("k").agg(F.count(F.lit(1)).alias("c"))
        # baseline: checkpoint + separate count (the pre-r14 loop shape)
        sc.setJobGroup("r14-base", "base")
        ck = agg.localCheckpoint()
        ck.count()
        base_jobs = len(sc.statusTracker().getJobIdsForGroup("r14-base"))
        # folded: metrics ride the checkpoint job
        sc.setJobGroup("r14-fold", "fold")
        _, m = checkpoint_with_metrics(
            agg, F.count(F.lit(1)).alias("n")
        )
        fold_jobs = len(sc.statusTracker().getJobIdsForGroup("r14-fold"))
        sc.setJobGroup("", "")
        assert m["n"] == 101
        assert fold_jobs < base_jobs  # the count job is gone

    def test_identity_checkpoint_fallback_no_deadlock(self, spark, skewed_df):
        # plan-capture scripts patch localCheckpoint to identity; the
        # helper must detect it and fire one explicit action instead of
        # blocking forever on Observation.get
        from pyspark.sql.classic.dataframe import DataFrame as CDF

        real = CDF.localCheckpoint
        try:
            CDF.localCheckpoint = lambda self, eager=True: self  # type: ignore
            out, m = checkpoint_with_metrics(
                skewed_df, F.count(F.lit(1)).alias("n")
            )
            assert m["n"] == 5000
            assert out.count() == 5000
        finally:
            CDF.localCheckpoint = real  # type: ignore

    def test_empty_frame_metrics(self, spark):
        empty = spark.range(0).select(F.col("id").alias("k"))
        _, m = checkpoint_with_metrics(
            empty,
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum(F.col("k")), F.lit(0)).alias("s"),
        )
        # count over no rows is 0; the coalesce guard keeps sums numeric
        # (the _star_components n_new metric relies on exactly this)
        assert m["n"] == 0
        assert m["s"] == 0


class TestLoopRewritesStillConverge:
    def test_star_components_chain_and_clique(self, spark):
        # a chain (worst case for propagation) and a separate clique;
        # exact expected labels — convergence must be EXACT set equality
        from bigdata_group4_app_spark.operators.dedup import (
            _star_components,
        )

        chain = [(i, i + 1) for i in range(10, 17)]
        clique = [(a, b) for a in range(30, 34) for b in range(30, 34) if a != b]
        edges = spark.createDataFrame(
            chain + [(b, a) for a, b in chain] + clique,
            "doc_id_1 long, doc_id_2 long",
        )
        got = {
            (r["doc_id"], r["cluster_id"])
            for r in _star_components(edges).collect()
        }
        want = {(i, 10) for i in range(10, 18)} | {
            (i, 30) for i in range(30, 34)
        }
        assert got == want

    def test_propagate_min_labels_two_components(self, spark):
        from bigdata_group4_app_spark.operators.dedup import (
            _propagate_min_labels,
        )

        pairs = [(1, 2), (2, 3), (7, 8)]
        edges = spark.createDataFrame(
            pairs + [(b, a) for a, b in pairs],
            "doc_id_1 long, doc_id_2 long",
        )
        got = {
            (r["doc_id"], r["cluster_id"])
            for r in _propagate_min_labels(edges).collect()
        }
        assert got == {(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)}
