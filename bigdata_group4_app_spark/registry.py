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
    # --- round-13 additions (append new queries here) ---
    "simhash_wide_pairs",
    "catalog_mor_delete_read",
    "catalog_time_travel_read",
    "catalog_wap_publish_read",
    "catalog_bloom_sidecar_lookup",
    "catalog_position_delete_read",
    # --- fixture-catalog v4+: every reader of the shared fixture
    # store re-checks after the layout change ---
    "catalog_schema_evolution_read",
    "catalog_takedown_read",
    "catalog_bloom_point_lookup",
    "corpus_snapshot_diff_versions",
    "catalog_incremental_diff",
    "catalog_zonemap_prune",
    # --- stale cohort: latest driver verdict round 6 (all 39; the
    # eight the r12 rotation deferred lead) ---
    "user_ks_divergence",
    "event_funnel",
    "ewma_control_chart",
    "shapley_channel_attribution",
    "bandit_replay_eval",
    "item_item_cosine",
    "logreg_churn_gd",
    "oof_target_encoding",
    "ams_f2_sketch",
    "bh_fdr_user_deviations",
    "bpe_encode_stats",
    "bpe_fertility_hist",
    "cart_churn_tree",
    "cmh_stratified_test",
    "contamination_ngram_overlap",
    "cox_churn_hazard",
    "did_estimate",
    "dsir_importance_select",
    "fs_linkage_scores",
    "gbdt_churn_stumps",
    "hits_hub_authority",
    "hll_ngram_cardinality",
    "jackknife_ratio_se",
    "js_divergence_lang_mix",
    "k_anonymity_audit",
    "kmv_user_overlap",
    "knn_graph_nndescent",
    "knn_ivfpq",
    "mi_feature_ranking",
    "nb_lang_confusion",
    "pacf_daily_value",
    "pack_shards",
    "pack_shards_bpe",
    "pca_power_iteration",
    "perplexity_quality_filter",
    "pq_codebook_audit",
    "sampled_groupby_error_audit",
    "segmented_trend_fit",
    "semantic_dedup_pairs",
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
