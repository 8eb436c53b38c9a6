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
# Round-3 rotation: every entry below still lacks a driver verdict
# (r1 ∪ r2 checked the first two windows — see CORRECTNESS_r0{1,2}.json).
# Round-3 additions go at the TOP as they land (they're the least
# locally-soaked); then the judge's priority picks; then the backfill.
# Overflow past ~50 spills to round 4 — see the ROUND 4 note below.
_CHECK_FIRST = [
    # --- round-3 additions (prepend new queries here) ---
    "churn_score_booster",
    "duplicate_passage_spans",
    "mv_delta_maintenance",
    "sorted_neighborhood_pairs",
    "bpe_merge_candidates",
    "jl_projection_audit",
    "lateral_region_top_customers",
    "unpivot_returnflag_metrics",
    "near_dup_survivors",
    "kfold_churn_auc",
    "poisson_bootstrap_ci",
    "kmeans_fit_centroids",
    "knn_jl_projected",
    "copurchase_triangles",
    "neyman_allocation",
    "hill_tail_index",
    "corpus_dedup_pipeline",
    "churn_scorer_metrics",
    "psi_value_drift",
    "markov_next_event_accuracy",
    # --- judge-priority never-checked (VERDICT.md item 1) ---
    "levenshtein_dup_pairs",
    "trade_network_pagerank",
    "basket_pairs",
    "embedding_covariance",
    "peak_concurrent_sessions",
    "dq_rule_violations",
    "revenue_compound_projection",
    "props_variant_profile",
    "priority_revenue_pipe",
    # --- ADVICE-touched this round (fresh verdict needed post-fix) ---
    "ab_conversion_ztest",
    "ols_spend_by_segment",
    "ridge_spend_model",
    "jaccard_prefix_filter_pairs",
    # --- streaming batch-twins (VERDICT item 6) ---
    "events_sliding_window",
    "watermark_sizing_stats",
    # --- round-2 additions never reached ---
    "chi2_churn_contract",
    "weighted_median_spend",
    "ohlc_hourly_bars",
    "twap_user_value",
    "zorder_tile_stats",
    "session_path_trigrams",
    "attribution_models_daily",
    "fixed_k_group_sample",
    "layout_skipping_compare",
    "conversion_time_percentiles",
    "dow_seasonality",
    "dau_wau_stickiness",
    "salted_supplier_revenue",
    "daily_anomalies",
    "ship_lag_percentiles",
    "region_revenue_index",
    "bucket_checksum_diff",
    "documents_profile",
    "benford_price_audit",
    "vocab_growth_curve",
    # --- round-1 backfill (never reached by any window) ---
    "acctbal_percentile_ranks",
    "asof_next_purchase",
    "cdc_apply",
    "cms_heavy_hitters",
    "daily_ctr",
    "embedding_quant_error",
    "gini_token_concentration",
    "kmv_distinct_by_type",
    "kmv_user_overlap",
    "knn_lsh_multiprobe",
    "nation_revenue_share",
    "ngram_lm_perplexity",
    "pit_priority_lookup",
    "quality_weighted_sample",
    "rfm_segments",
    "ses_user_forecast",
    "source_lang_entropy",
    "trimmed_value_stats",
]
# ROUND 4: whatever spilled past the ~50 budget this round (the tail of
# the round-1 backfill above plus any round-3 additions that pushed them
# out) — diff CORRECTNESS_r03.json's keys against this list to rebuild.
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
