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
# Round-8 rotation (per VERDICT r7 item 1): (1) the 22 re-confirmation
# backfill queries whose ONLY driver verdict is round 1 — r7's window
# covered 36 r7-adjacent entries plus the first 14 backfill names, so
# these 22 clear FIRST this round; (2) queries whose ORACLE changed in
# round 8 (ADVICE BIGINT-fold fixes); (3) round-8 additions (append new
# queries at the marked slot). Final count: 22 + 3 + 23 new = 48 —
# inside the ~50 window with two slots spare; r9 must rotate the 23
# round-8 names out once CORRECTNESS_r08 blesses them.
_CHECK_FIRST = [
    # --- r1-only driver-verdict backfill (order preserved from r7) ---
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
    # --- oracle changed in round 8 (ADVICE integer-fold fixes) ---
    "elastic_net_churn_path",
    "kruskal_wallis_value_test",
    "mann_whitney_value_test",
    # --- round-8 additions (append new queries here) ---
    "knn_ivf",  # quantizer rewritten to fixed-point sample fit — now oracle-checked
    "top_revenue_supplier",
    "dominant_part_suppliers",
    "dormant_rich_customers",
    "concentrated_part_values",
    "incremental_minhash_lsh",
    "binary_asset_profile",
    "forecast_discount_revenue",
    "priority_late_orders",
    "returned_item_losses",
    "promo_revenue_share",
    "color_part_profit",
    "supplier_breadth_by_parttype",
    "disjunctive_bulk_revenue",
    "cheapest_supplier_per_part",
    "dedup_cluster_size_histogram",
    "minhash_band_tuning",
    "nearest_click_alignment",
    "t_closeness_profile",
    "ra_link_prediction",
    "semantic_threshold_sweep",
    "late_lines_priority_mix",
    "spend_equidepth_bins",
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
