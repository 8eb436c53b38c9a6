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
# Round-14 rotation (ADVICE r13 medium + this round's changes), derived
# with the CORRECTNESS_r* staleness histogram (r7 is now the oldest
# cohort: 39 names): (1) the twelve queries whose plans changed in THIS
# round (convergence-fold loops, LPA one-exchange rounds, NND pool
# dedup, HITS observed max); (2) semantic_dedup_pairs — the one r13
# window name the driver's 50 budget cut off — plus the eight
# r13-plan-changed names the r13 rotation missed (the ADVICE item);
# (3) the oldest 29 of the r7 cohort. Budget math: 12 + 9 + 29 = 50.
# The remaining 10 r7 names rotate in next round.
_CHECK_FIRST = [
    # --- (1) round-14 plan-changed ---
    "near_dup_clusters",
    "near_dup_survivors",
    "corpus_dedup_pipeline",
    "dedup_cluster_size_histogram",
    "multimodal_dup_clusters",
    "semantic_dedup_survivors",
    "corpus_semantic_pipeline",
    "kcore_parts",
    "bfs_distance_histogram",
    "knn_graph_nndescent",
    "label_propagation_communities",
    "hits_hub_authority",
    # --- (2) r13 budget cutoff + r13-plan-changed (ADVICE r13) ---
    "semantic_dedup_pairs",
    "conformal_churn_sets",
    "psi_value_drift",
    "association_rules",
    "knn_ivf",
    "kmeans_fit_centroids",
    "ndcg_retrieval_eval",
    "spearman_feature_pairs",
    "snapshot_catalog_read",
    # --- (3) stale cohort: latest driver verdict round 7 ---
    "age_filter_topn",
    "age_histogram",
    "age_kde",
    "als_user_factors",
    "big_ticket_orders",
    "bloom_prefiltered_revenue",
    "brand_market_share",
    "churn_correlations",
    "churn_rate_by_contract",
    "churn_rate_by_subscription",
    "churn_stats",
    "column_cardinalities",
    "customer_order_histogram",
    "customer_year_sets",
    "daily_event_pivot",
    "event_trailing_avg",
    "gaussian_nb_churn",
    "gmm2_value_em",
    "holt_winters_daily",
    "ipw_churn_ate",
    "l_diversity_profile",
    "logrank_contract_test",
    "markov_removal_attribution",
    "matryoshka_dim_audit",
    "mips_norm_pruning_audit",
    "nation_trade_volume",
    "nelson_aalen_hazard",
    "pdp_age_churn",
    "periodogram_daily_value",
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
