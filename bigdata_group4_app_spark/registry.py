"""Central query/oracle registry.

Every operator module contributes a ``QUERIES`` dict
(name -> (spark, sf_dir) -> DataFrame) and an ``ORACLE`` dict
(name -> DuckDB SQL). Names present in QUERIES but absent from ORACLE get
the driver's weaker rows-only check (non-SQL-expressible operators).
"""

from __future__ import annotations

from .ml import booster, cart, features, gbdt, scoring
from .operators import (
    advanced,
    analytics,
    corpus,
    dedup,
    graph,
    layout,
    multimodal,
    quality,
    relational,
    similarity,
    sketches,
    snapshots,
    sql_surface,
    stats,
    text,
)
from .streaming import windows as streaming_windows

_MODULES = [
    advanced,
    analytics,
    relational,
    scoring,
    booster,
    cart,
    gbdt,
    features,
    stats,
    graph,
    layout,
    quality,
    text,
    corpus,
    dedup,
    similarity,
    sketches,
    snapshots,
    multimodal,
    sql_surface,
    streaming_windows,
]

QUERY_REGISTRY: dict = {}
ORACLE_REGISTRY: dict[str, str] = {}

for _m in _MODULES:
    for _name, _fn in _m.QUERIES.items():
        assert _name not in QUERY_REGISTRY, f"duplicate query name: {_name}"
        QUERY_REGISTRY[_name] = _fn
    for _name, _sql in getattr(_m, "ORACLE", {}).items():
        assert _name in _m.QUERIES, f"oracle without query: {_name}"
        ORACLE_REGISTRY[_name] = _sql

# The verify driver checks queries in dict order with a ~50-query budget.
# Round-11 rotation (VERDICT r10 item 2), derived by
# scripts/verdict_freshness.py (the per-query latest-GREEN-verdict
# ledger over CORRECTNESS_r*.json — run it for the histogram and
# proposal): (1) round-11 additions, (2) the round-10 plan-changed
# cohort not already re-verified by the r10 driver window — the four
# remaining dist_ntile conversions (rank-invariant, each pinned
# bit-equal to its unchanged oracle at two SFs in pytest) and the
# lazy-construction sweep (checkpoint→persist conversions + the three
# in-plan scalar swaps; results identical, cache-leaf-only plan
# changes, all re-verified in the r10 307/307 contract runs;
# markov_next_event_accuracy and peak_concurrent_sessions already got
# post-change r10 driver verdicts), (3) the full r4 verdict cohort (31
# names; pmi_word_pairs is both r4-stale AND a scalar-swap — listed
# once, in the cohort). Budget math: 4 + 15 + 31 = 50 exactly, which
# forces 4 drops from the sweep cohort, each sharing its exact leaf
# change with a KEPT member and pinned by pytest oracle-parity:
# jaccard_prefix_filter_pairs and sorted_neighborhood_pairs (the
# identical one-line _shingles-persist change ngram_jaccard_pairs
# carries), minhash_band_tuning (the same persist leaf, and the
# freshest verdict of the cohort at r9), and perplexity_quality_filter
# (the same ngram-LM persist chain ngram_lm_perplexity and
# kneser_ney_perplexity carry). After this window no query's latest
# green verdict is older than r5.
_CHECK_FIRST = [
    # --- round-11 additions (append new queries here) ---
    "corpus_snapshot_diff_versions",
    "snapshot_catalog_read",
    "catalog_incremental_diff",
    "catalog_zonemap_prune",
    # --- dist_ntile conversions (plan changed r10, shared
    # functions/ranking.py helper; oracles unchanged) ---
    "brier_decomposition",
    "cumulative_gains_churn",
    "range_partition_balance_audit",
    "spend_equidepth_bins_dist",
    # --- lazy-construction sweep (checkpoint→persist leaf changes +
    # in-plan scalar swaps, r10) ---
    "permutation_test_value",
    "t_closeness_profile",
    "vocab_growth_curve",
    "winnowing_fingerprints",
    "ngram_lm_perplexity",
    "kneser_ney_perplexity",
    "negative_sampling_table",
    "simhash_dup_pairs",
    "ngram_jaccard_pairs",
    "copurchase_triangles",
    "image_phash_pairs",
    # --- stale cohort: latest driver verdict round 4 ---
    "cdc_apply",
    "ses_user_forecast",
    "daily_ctr",
    "asof_next_purchase",
    "documents_profile",
    "bucket_checksum_diff",
    "nation_revenue_share",
    "acctbal_percentile_ranks",
    "region_revenue_index",
    "pareto_frontier_customers",
    "benford_price_audit",
    "theil_sen_daily_trend",
    "dbscan_density_census",
    "acf_daily_value",
    "cusum_changepoint",
    "seasonal_naive_backtest",
    "huber_spend_model",
    "kaplan_meier_churn",
    "interarrival_burstiness",
    "partition_skew_report",
    "gini_token_concentration",
    "source_lang_entropy",
    "pmi_word_pairs",
    "quality_weighted_sample",
    "dp_noisy_counts",
    "weighted_reservoir_sample",
    "embedding_quant_error",
    "kmv_distinct_by_type",
    "cms_heavy_hitters",
    "histogram_quantile_audit",
    "grouping_sets_revenue",
]
# Only KNOWN environment-gated entries (artifact/dependency absent) may
# drop out of the window silently; any other missing name is a typo or a
# stale rename and must fail the import loudly.
_GATED = {"churn_score_booster"}
_missing = [n for n in _CHECK_FIRST if n not in QUERY_REGISTRY]
assert all(n in _GATED for n in _missing), f"unknown _CHECK_FIRST names: {_missing}"
_CHECK_FIRST = [n for n in _CHECK_FIRST if n in QUERY_REGISTRY]
QUERY_REGISTRY = {
    **{n: QUERY_REGISTRY[n] for n in _CHECK_FIRST},
    **{n: f for n, f in QUERY_REGISTRY.items() if n not in _CHECK_FIRST},
}
