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
# Round-9 rotation (per VERDICT r8 item 1): the 23 driver-blessed r8
# names rotate OUT; the window is (1) round-9 additions (append new
# queries at the marked slot), (2) queries whose PLAN changed in round 9
# (ADVICE broadcast-honesty fixes — results identical, but the driver
# should re-bless the changed code), (3) the oldest-verdict tranche: the
# queries whose latest driver verdict is round 2. Final count: 6
# additions + 8 changed + 35 backfill = 49, inside the ~50 window; r10
# rotates these out and backfills the 4 deferred r2 names
# (image_features, video_frame_sample, event_sessions,
# user_session_stats) then the r3 cohort (39 names, last verdict round
# 3 — see VERDICT r8's ledger-freshness item).
_CHECK_FIRST = [
    # --- round-9 additions (append new queries here) ---
    "ra_link_prediction_scaled",
    "semantic_dedup_pairs_scaled",
    "spend_equidepth_bins_dist",
    "range_partition_balance_audit",
    "epoch_shuffle_manifest",
    "multimodal_dup_clusters",
    # --- plan changed in round 9 (ADVICE broadcast-honesty fixes, plus
    # the engine-wide sweep's label-join consumers; the ~20 swept TPC-H
    # shapes all carry fresh r8 verdicts and results are join-strategy
    # independent, so they wait for their normal rotation) ---
    "incremental_minhash_lsh",
    "minhash_band_tuning",
    "dedup_cluster_size_histogram",
    "binary_asset_profile",
    "near_dup_survivors",
    "semantic_dedup_survivors",
    "corpus_dedup_pipeline",
    "corpus_semantic_pipeline",
    # --- oldest-verdict backfill: last driver verdict round 2 ---
    "table_checksums",
    "value_outliers_mad",
    "props_json_stats",
    "corpus_split_counts",
    "lang_confusion",
    "domain_mix_weights",
    "event_transitions",
    "above_nation_avg_customers",
    "char_entropy",
    "cohort_retention",
    "heavy_hitters",
    "calibration_curve",
    "value_drift_weekly",
    "order_fanout_histogram",
    "incremental_dedup",
    "vocab_coverage",
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
    "embedding_centroids",
    "embedding_norms",
    "image_resize",
    "audio_chunk_stats",
    "media_catalog",
    # (the cohort's last 4 — image_features, video_frame_sample,
    # event_sessions, user_session_stats — yield their slots to the 4
    # sweep-changed queries above and lead the r10 backfill instead)
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
