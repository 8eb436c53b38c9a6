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
# Round-7 rotation: (1) round-7 additions (prepend new queries here),
# (2) rf_churn_oob — landed in the r6 snapshot commit but NEVER driver-
# checked, (3) holt_winters_daily — recurrence state rewritten this round
# to 1e4-scaled BIGINT fixed-point (the r6 verdict's one correctness
# defect), (4) the remaining 36 re-confirmation backfill queries whose
# ONLY driver verdict is round 1 — any tail past the window rolls to r8.
_CHECK_FIRST = [
    # --- round-7 additions (prepend new queries here) ---
    "l_diversity_profile",
    "spearman_feature_pairs",
    "cumulative_gains_churn",
    "pdp_age_churn",
    "periodogram_daily_value",
    "markov_removal_attribution",
    "elastic_net_churn_path",
    "nelson_aalen_hazard",
    "ipw_churn_ate",
    "zipf_slope_tokens",
    "bfs_distance_histogram",
    "ndcg_retrieval_eval",
    "gmm2_value_em",
    "mips_norm_pruning_audit",
    "label_propagation_communities",
    "bloom_prefiltered_revenue",
    "stl_daily_decomposition",
    "kruskal_wallis_value_test",
    "welch_ttest_spend",
    "brier_decomposition",
    "gaussian_nb_churn",
    "association_rules",
    "waiting_suppliers",
    "nation_trade_volume",
    "brand_market_share",
    "customer_order_histogram",
    "temperature_mix_allocation",
    "matryoshka_dim_audit",
    "kcore_parts",
    "als_user_factors",
    "small_lot_brand_revenue",
    "big_ticket_orders",
    "logrank_contract_test",
    "corpus_semantic_pipeline",
    # --- never driver-checked / changed this round ---
    "rf_churn_oob",
    "holt_winters_daily",
    # --- re-confirmation backfill (r1-only verdicts) ---
    # 35 round-7 entries above consume most of the driver's ~50-query
    # window; roughly the first 15 below get r7 verdicts, the remainder
    # is EXPLICITLY QUEUED FOR R8 (keep this list's order intact and
    # prepend r8 additions above it)
    "urgent_customers_by_segment",
    "revenue_rollup",
    "customer_year_sets",
    "column_cardinalities",
    "churn_stats",
    "churn_rate_by_subscription",
    "churn_rate_by_contract",
    "age_filter_topn",
    "age_histogram",
    "age_kde",
    "spend_age_scatter",
    "churn_correlations",
    "daily_event_pivot",
    "event_trailing_avg",
    "shipping_priority",
    "pricing_summary",
    "top_customers_by_revenue",
    "revenue_by_region",
    "local_supplier_volume",
    "priority_region_sets",
    "segment_spend_quartiles",
    "brand_revenue",
    "order_priority_count",
    "top_event_per_user",
    "event_value_deltas",
    "events_hourly",
    "churn_score_batch",
    "churn_risk_summary",
    "single_customer_score",
    "bulk_score_with_nulls",
    "doc_chunks",
    "doc_repetition",
    "shared_chunks",
    "contamination_scan",
    "top_tokens",
    "top_bigrams_per_lang",
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
