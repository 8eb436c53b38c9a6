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
# Round-12 rotation (VERDICT r11 item 5), derived by
# scripts/verdict_freshness.py (run it for the histogram and proposal):
# (1) the five round-12 additions; (2) the round-12 plan-changed
# MinHash cohort not already inside the stale window — every consumer
# of the shared shingle/signature chain changed plan this round
# (persist-by-default shingles + the set-size fold merged into the
# signature aggregate + (b,r)-parameterized banding), all re-matched in
# local contract probes but needing driver verdicts; (3) the full r5
# stale cohort (33 names — includes minhash_lsh_pairs,
# near_dup_clusters, minhash_accuracy_audit, which are both r5-stale
# AND plan-changed, listed once); (4) the oldest r6 names up to the
# 50 budget. Budget math: 5 + 6 + 33 = 44, leaving 6 r6 slots; the
# eight r6 names dropped from the script's proposal
# (user_ks_divergence, event_funnel, ewma_control_chart,
# shapley_channel_attribution, bandit_replay_eval, item_item_cosine,
# logreg_churn_gd, oof_target_encoding) have unchanged plans since
# their r6 verdicts and rotate in next round. After this window no
# verdict is older than round 6 except those eight.
_CHECK_FIRST = [
    # --- round-12 additions (append new queries here) ---
    "minhash_lsh_pairs_scaled",
    "simhash_hamming_pairs",
    "catalog_schema_evolution_read",
    "catalog_takedown_read",
    "catalog_bloom_point_lookup",
    # --- round-12 plan-changed MinHash-chain consumers ---
    "minhash_band_tuning",
    "incremental_minhash_lsh",
    "multimodal_dup_clusters",
    "near_dup_survivors",
    "corpus_dedup_pipeline",
    "dedup_cluster_size_histogram",
    # --- stale cohort: latest driver verdict round 5 ---
    "trimmed_value_stats",
    "events_profile",
    "ips_policy_value",
    "user_value_resampled",
    "isotonic_calibration",
    "churn_score_booster",
    "cuped_adjusted_ab",
    "sprt_ab_monitor",
    "trade_network_pagerank",
    "degree_distribution_stats",
    "gopher_quality_flags",
    "ngram_novelty_curve",
    "textrank_keywords",
    "bm25_search",
    "rrf_hybrid_search",
    "minhash_lsh_pairs",
    "near_dup_clusters",
    "sorted_neighborhood_pairs",
    "jaccard_prefix_filter_pairs",
    "levenshtein_dup_pairs",
    "embedding_dup_pairs",
    "duplicate_passage_spans",
    "minhash_accuracy_audit",
    "kmeans_fit_centroids",
    "knn_jl_projected",
    "knn_brute_force",
    "knn_lsh_bucketed",
    "knn_lsh_multiprobe",
    "mmr_diverse_topk",
    "contrastive_pair_sample",
    "cluster_balanced_sample",
    "bloom_filter_fpr_audit",
    "watermark_dedup_stats",
    # --- oldest r6 names (budget fill) ---
    "dormant_customers",
    "user_value_zscores",
    "value_percentiles",
    "event_type_hour_cube",
    "asof_click_purchase",
    "attribution_window_join",
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
