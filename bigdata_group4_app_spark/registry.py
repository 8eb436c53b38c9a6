"""Central query/oracle registry.

Every operator module contributes a ``QUERIES`` dict
(name -> (spark, sf_dir) -> DataFrame) and an ``ORACLE`` dict
(name -> DuckDB SQL). Names present in QUERIES but absent from ORACLE get
the driver's weaker rows-only check (non-SQL-expressible operators).
"""

from __future__ import annotations

from .ml import scoring
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

# The verify driver checks queries in dict order with a bounded budget
# (round 1 covered exactly the first 50 entries). Front-load the entries
# that most need a fresh verdict: first the round-1 hash-mismatch fixes
# (DuckDB HUGEINT casts), then everything round 1 never reached; the 45
# already-confirmed queries follow.
_CHECK_FIRST = [
    # round-1 hash-mismatch fixes
    "events_profile",
    "table_checksums",
    "value_outliers_mad",
    "props_json_stats",
    "corpus_split_counts",
    # new in round 2
    "lang_confusion",
    "domain_mix_weights",
    "event_transitions",
    "above_nation_avg_customers",
    "char_entropy",
    "pack_shards",
    "cohort_retention",
    "heavy_hitters",
    "calibration_curve",
    "value_drift_weekly",
    "order_fanout_histogram",
    "incremental_dedup",
    "vocab_coverage",
    "scd2_priority_history",
    # not reached by round 1's 50-query budget
    "token_count_bpe",
    "rolling_hash_fingerprint",
    "text_stats",
    "language_profile",
    "lang_id_stopword",
    "doc_quality",
    "doc_fingerprint",
    "pii_redact",
    "tfidf_top_terms",
    "stratified_sample_counts",
    "inverted_index_stats",
    "dedup_exact_summary",
    "dedup_keep_canonical",
    "corpus_clean_summary",
    "minhash_lsh_pairs",
    "near_dup_clusters",
    "simhash_dup_pairs",
    "ngram_jaccard_pairs",
    "embedding_dup_pairs",
    "embedding_centroids",
    "embedding_norms",
    "knn_brute_force",
    "knn_lsh_bucketed",
    "knn_ivf",
    "image_resize",
    "audio_chunk_stats",
    "media_catalog",
    "image_features",
    "video_frame_sample",
    "event_sessions",
    "user_session_stats",
]
# NOTE: the 50-entry window is now full (the never-driver-checked entries
# above must stay inside it this round). Queries added later in the round
# deliberately sit past position 50 — locally verified now. ROUND 3:
# rebuild _CHECK_FIRST from the entries that will then still lack a
# driver verdict: acctbal_percentile_ranks, asof_next_purchase,
# basket_pairs, cdc_apply, cms_heavy_hitters, daily_ctr,
# embedding_quant_error, events_sliding_window, gini_token_concentration,
# kmv_distinct_by_type, kmv_user_overlap, knn_lsh_multiprobe,
# nation_revenue_share, ngram_lm_perplexity, pit_priority_lookup,
# quality_weighted_sample, rfm_segments, ses_user_forecast,
# source_lang_entropy, trimmed_value_stats, plus this round's additions:
# ab_conversion_ztest, chi2_churn_contract, ols_spend_by_segment,
# ohlc_hourly_bars, peak_concurrent_sessions, jaccard_prefix_filter_pairs,
# levenshtein_dup_pairs, trade_network_pagerank, weighted_median_spend,
# twap_user_value, zorder_tile_stats, dq_rule_violations,
# session_path_trigrams, attribution_models_daily, fixed_k_group_sample,
# layout_skipping_compare, revenue_compound_projection,
# props_variant_profile, priority_revenue_pipe, embedding_covariance,
# conversion_time_percentiles, dow_seasonality, dau_wau_stickiness,
# salted_supplier_revenue, daily_anomalies, ship_lag_percentiles,
# region_revenue_index, bucket_checksum_diff, documents_profile,
# ridge_spend_model, benford_price_audit, watermark_sizing_stats,
# vocab_growth_curve — plus anything round 3
# adds. (More than one window; prioritize round-3 additions and the
# newest queries, then backfill.)
assert set(_CHECK_FIRST) <= set(QUERY_REGISTRY), sorted(
    set(_CHECK_FIRST) - set(QUERY_REGISTRY)
)
QUERY_REGISTRY = {
    **{n: QUERY_REGISTRY[n] for n in _CHECK_FIRST},
    **{n: f for n, f in QUERY_REGISTRY.items() if n not in _CHECK_FIRST},
}
