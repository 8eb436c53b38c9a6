"""Central query/oracle registry.

Every operator module contributes a ``QUERIES`` dict
(name -> (spark, sf_dir) -> DataFrame) and an ``ORACLE`` dict
(name -> DuckDB SQL). Names present in QUERIES but absent from ORACLE get
the driver's weaker rows-only check (non-SQL-expressible operators).
"""

from __future__ import annotations

from .ml import booster, scoring
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
    stats,
    graph,
    layout,
    quality,
    text,
    corpus,
    dedup,
    similarity,
    sketches,
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
# Round-4 rotation: (1) round-4 additions (least locally-soaked), (2) the
# 23 queries no driver window has EVER checked (CORRECTNESS_r01∪r02∪r03
# diffed against the registry), (3) kmeans_fit_centroids — its oracle was
# rewritten this round (ordered list_reduce fold) and needs a fresh
# verdict, (4) re-confirmation slots for the most intricate round-3
# entries to fill the window.
_CHECK_FIRST = [
    # --- round-4 additions (prepend new queries here) ---
    "ips_policy_value",
    "degree_distribution_stats",
    "weighted_reservoir_sample",
    "pmi_word_pairs",
    "interarrival_burstiness",
    "contrastive_pair_sample",
    "kaplan_meier_churn",
    "partition_skew_report",
    "ngram_novelty_curve",
    "dp_noisy_counts",
    "bm25_search",
    "seasonal_naive_backtest",
    "huber_spend_model",
    "acf_daily_value",
    "cusum_changepoint",
    "cuped_adjusted_ab",
    "minhash_accuracy_audit",
    "histogram_quantile_audit",
    "dbscan_density_census",
    "pareto_frontier_customers",
    "mann_whitney_value_test",
    "theil_sen_daily_trend",
    "grouping_sets_revenue",
    "bloom_filter_fpr_audit",
    "winnowing_fingerprints",
    "gopher_quality_flags",
    "watermark_dedup_stats",
    "mmr_diverse_topk",
    # --- oracle changed this round: needs a fresh driver verdict ---
    "kmeans_fit_centroids",
    # --- never driver-checked in r1-r3 (the complete backfill) ---
    "acctbal_percentile_ranks",
    "asof_next_purchase",
    "benford_price_audit",
    "bucket_checksum_diff",
    "cdc_apply",
    "cms_heavy_hitters",
    "daily_ctr",
    "documents_profile",
    "embedding_quant_error",
    "gini_token_concentration",
    "kmv_distinct_by_type",
    "kmv_user_overlap",
    "knn_lsh_multiprobe",
    "nation_revenue_share",
    "ngram_lm_perplexity",
    "pit_priority_lookup",
    "quality_weighted_sample",
    "region_revenue_index",
    "rfm_segments",
    "ses_user_forecast",
    "source_lang_entropy",
    "trimmed_value_stats",
    "vocab_growth_curve",
    # --- re-confirmation: the most intricate round-3 surfaces ---
    "churn_score_booster",
    "duplicate_passage_spans",
    "levenshtein_dup_pairs",
    "trade_network_pagerank",
    "basket_pairs",
    "embedding_covariance",
    "peak_concurrent_sessions",
    "dq_rule_violations",
    "corpus_dedup_pipeline",
    "knn_jl_projected",
    "kfold_churn_auc",
    "markov_next_event_accuracy",
    "psi_value_drift",
    "sorted_neighborhood_pairs",
    "jaccard_prefix_filter_pairs",
    "events_sliding_window",
    "watermark_sizing_stats",
    "mv_delta_maintenance",
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
