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
# Round-10 rotation (VERDICT r9 item 1), derived by
# scripts/verdict_freshness.py (the per-query latest-verdict ledger over
# CORRECTNESS_r*.json — run it to see the histogram and the proposed
# window): (1) round-10 additions, (2) the full stale cohort — the 4
# names whose latest verdict is round 2 plus the 39-name round-3 cohort
# (after this window no query's latest verdict is older than round 4),
# (3) the most structurally plan-changed round-10 conversions up to the
# budget. Count: 1 + 43 + 6 = 50. Round-11 window leads: the four
# remaining dist_ntile conversions (brier_decomposition,
# cumulative_gains_churn, range_partition_balance_audit,
# spend_equidepth_bins_dist — rank-invariant, each pinned bit-equal to
# its unchanged oracle at two SFs in pytest), then the lazy-construction
# sweep cohort (18 checkpoint→persist conversions + the three in-plan
# scalar swaps: pmi_word_pairs, t_closeness_profile,
# vocab_growth_curve — results identical, cache-leaf-only plan changes,
# all re-verified in this round's 307/307 contract runs), then the r4
# verdict cohort.
_CHECK_FIRST = [
    # --- round-10 additions (append new queries here) ---
    "corpus_snapshot_diff",
    # --- stale cohort: latest driver verdict round 2 ---
    "image_features",
    "video_frame_sample",
    "event_sessions",
    "user_session_stats",
    # --- stale cohort: latest driver verdict round 3 ---
    "psi_value_drift",
    "markov_next_event_accuracy",
    "daily_anomalies",
    "dau_wau_stickiness",
    "conversion_time_percentiles",
    "dow_seasonality",
    "attribution_models_daily",
    "basket_pairs",
    "events_sliding_window",
    "mv_delta_maintenance",
    "ohlc_hourly_bars",
    "twap_user_value",
    "ship_lag_percentiles",
    "salted_supplier_revenue",
    "kfold_churn_auc",
    "churn_scorer_metrics",
    "ab_conversion_ztest",
    "poisson_bootstrap_ci",
    "neyman_allocation",
    "hill_tail_index",
    "ridge_spend_model",
    "chi2_churn_contract",
    "ols_spend_by_segment",
    "weighted_median_spend",
    "zorder_tile_stats",
    "layout_skipping_compare",
    "dq_rule_violations",
    "bpe_merge_candidates",
    "fixed_k_group_sample",
    "jl_projection_audit",
    "embedding_covariance",
    "revenue_compound_projection",
    "props_variant_profile",
    "priority_revenue_pipe",
    "lateral_region_top_customers",
    "unpivot_returnflag_metrics",
    "peak_concurrent_sessions",
    "watermark_sizing_stats",
    "session_path_trigrams",
    # --- plan changed in round 10 (lazy in-plan support derivation;
    # dist_ntile conversions; the epoch pack guard) ---
    "ra_link_prediction_scaled",
    "rfm_segments",
    "calibration_curve",
    "conformal_churn_sets",
    "segment_spend_quartiles",
    "epoch_shuffle_manifest",
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
