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
# Round-5 rotation: (1) the LAST 2 never-driver-checked queries (closing
# the backfill: every registry query now has >= 1 driver verdict once
# these land), (2) round-5 additions, (3) queries whose ORACLE or
# implementation changed this round (ordered-fold cosine rewrite,
# absolute-date splits, degenerate-slope guard, kmeans/bm25/pack_shards
# refactors), (4) re-confirmation slots for the most intricate dedup/
# text surfaces to fill the window.
_CHECK_FIRST = [
    # --- never driver-checked in r1-r4 (the final backfill) ---
    "trimmed_value_stats",
    "vocab_growth_curve",
    # --- round-5 additions (prepend new queries here) ---
    "semantic_dedup_pairs",
    "bpe_encode_stats",
    "rrf_hybrid_search",
    "image_phash_pairs",
    "textrank_keywords",
    "cluster_balanced_sample",
    "bpe_fertility_hist",
    "pq_codebook_audit",
    "isotonic_calibration",
    "sprt_ab_monitor",
    "conformal_churn_sets",
    "negative_sampling_table",
    # --- oracle/implementation changed this round ---
    "mmr_diverse_topk",
    "contrastive_pair_sample",
    "knn_brute_force",
    "knn_lsh_bucketed",
    "knn_lsh_multiprobe",
    "knn_jl_projected",
    "ips_policy_value",
    "cuped_adjusted_ab",
    "degree_distribution_stats",
    "bm25_search",
    "kmeans_fit_centroids",
    "pack_shards",
    # --- re-confirmation: intricate surfaces, oldest verdicts first ---
    "churn_score_booster",
    "events_profile",
    "user_value_resampled",
    "watermark_dedup_stats",
    "winnowing_fingerprints",
    "minhash_lsh_pairs",
    "minhash_accuracy_audit",
    "near_dup_clusters",
    "near_dup_survivors",
    "corpus_dedup_pipeline",
    "levenshtein_dup_pairs",
    "sorted_neighborhood_pairs",
    "jaccard_prefix_filter_pairs",
    "simhash_dup_pairs",
    "ngram_jaccard_pairs",
    "duplicate_passage_spans",
    "embedding_dup_pairs",
    "knn_ivf",
    "gopher_quality_flags",
    "trade_network_pagerank",
    "copurchase_triangles",
    "ngram_lm_perplexity",
    "ngram_novelty_curve",
    "bloom_filter_fpr_audit",
    "cms_heavy_hitters",
    "kmv_user_overlap",
    "scd2_priority_history",
    "pit_priority_lookup",
    "cdc_apply",
    "mv_delta_maintenance",
    "events_sliding_window",
    "watermark_sizing_stats",
    "kaplan_meier_churn",
    "huber_spend_model",
    "theil_sen_daily_trend",
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
