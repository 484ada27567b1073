"""Named query registry — the driver-facing surface.

Every operator from SURVEY.md §2 is exercised by at least one named query
here; each query carries an ANSI-SQL twin the DuckDB oracle runs on the same
parquet tables (driver contract in ``/root/repo/__spark_entry__.py``).

Import order matters only for registration side effects.
"""

from .registry import REGISTRY, Query, register, queries, oracle_sql

from . import text  # noqa: E402,F401
from . import dedup_ext  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401
from . import streaming  # noqa: E402,F401
from . import breadth  # noqa: E402,F401
from . import frame_api  # noqa: E402,F401
from . import round2  # noqa: E402,F401
from . import round3  # noqa: E402,F401
from . import round5  # noqa: E402,F401
from . import round6  # noqa: E402,F401
from . import round7  # noqa: E402,F401
from . import spans  # noqa: E402,F401
from . import retrieval  # noqa: E402,F401
from . import mutation  # noqa: E402,F401
from . import analytics  # noqa: E402,F401
from . import lakehouse  # noqa: E402,F401
from . import similarity_text  # noqa: E402,F401
from . import curation_pipeline  # noqa: E402,F401
from . import ml  # noqa: E402,F401
from . import relational  # noqa: E402,F401
from . import tpch_ext  # noqa: E402,F401
from . import aggregates  # noqa: E402,F401
from . import window  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Driver verification window: the driver's CORRECTNESS run covers the FIRST
# 50 registered queries, so registration order is rotated each round to get
# every query driver-verified on current code.  Round-7 window (the round-6
# verdict's item #1 — close ALL remaining verification debt), by priority:
#   * `rolling_time_5min` FIRST — the r4 driver failure (NTZ watermark);
#     its fix has been locally green since round 5 but never driver-hashed,
#   * the 3 queries never driver-verified by any window
#     (dedup_exact_survivors, profile_lineitem_columns,
#     stream_trending_event_types),
#   * the 22 queries whose last driver hash is r2-stale (str/dt showcases,
#     frame_api_*, roundtrips, sampling, misc breadth),
#   * the remaining 24 slots back-fill with the oldest r4-window relational
#     queries (q01.., joins, set ops) so their evidence stays fresh too.
# After this round every one of the 125 registered queries has a driver
# hash on r5-or-later code.  Every query NOT in the window stays locally
# oracle-checked at sf0.001 by tests/test_correctness.py (same compare,
# same DuckDB oracle); tests/test_registry_window.py pins the window to
# exactly this list.
#
# ROUND-7 ROTATION PLAN (edit this list at the START of round 7): lead
# with the 33 queries added after this window was pinned (round-6
# sessions 2-3, never driver-verified): dedup_winnowing_fingerprints,
# dedup_winnowing_components, compaction_roundtrip_documents,
# stream_binned_quantiles_value, lexical_rarity_by_source,
# cross_source_vocab_overlap, text_roundtrip_documents,
# ann_pq_cosine_topk, binned_quantiles_event_value,
# dedup_incremental_new_docs, ann_ivf_partitioned_store,
# dedup_substring_spans, bm25_search_topk, phrase_search_topk,
# merge_upsert_orders, scd2_customer_history, weighted_sample_by_source,
# graph_triangle_stats, stream_upsert_dedup_sink,
# funnel_view_click_purchase, cohort_retention_daily,
# cooccurrence_word_pairs, incremental_agg_maintenance,
# zorder_layout_stats, semantic_decontaminate_embeddings,
# editdistance_join_prefixes, source_divergence_stats,
# hard_negative_mining, curation_decision_table,
# pointintime_dim_join_orders, stream_windowed_distinct_users,
# ols_price_trend, naive_bayes_source_classifier;
# back-fill the remaining 17 slots with the oldest r4-window relational
# queries not re-verified in r6 (q18..q22 tail, aggregates, window fns).
DRIVER_WINDOW: list[str] = [
    # the r4 failure whose fix was never driver-confirmed
    "rolling_time_5min",
    # never driver-verified by any window
    "dedup_exact_survivors",
    "profile_lineitem_columns",
    "stream_trending_event_types",
    # r2-stale driver evidence
    "explode_doc_words",
    "str_accessor_showcase",
    "dt_accessor_showcase",
    "grouping_sets_status_year",
    "window_fn_breadth",
    "monotonic_user_events",
    "csv_roundtrip_nation",
    "parquet_roundtrip_supplier",
    "text_fingerprint_rolling_hash",
    "str_accessor_edit_ops",
    "dt_accessor_calendar_edges",
    "cumprod_linenumbers",
    "frame_api_groupby_pipeline",
    "frame_api_merge_value_counts",
    "frame_api_shift_diff",
    "frame_api_rolling_mean",
    "rolling_center_mean_5",
    "resample_quantile_daily",
    "timedelta_user_span",
    "merge_indicator_customer_orders",
    "stratified_sample_documents",
    "stratified_take_documents",
    # back-fill: oldest r4-window relational queries (freshness rotation)
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q06_forecast_revenue",
    "q10_returned_items",
    "join_semi_open_orders",
    "join_anti_no_big_orders",
    "join_outer_nation_customers",
    "filter_project_arith",
    "topk_orders_by_price",
    "concat_union_all",
    "set_intersect_nations",
    "set_except_nations",
    "q02_best_supplier_per_nation",
    "q04_order_priority",
    "q07_volume_shipping",
    "q08_market_share",
    "q09_product_profit",
    "q12_priority_by_shipyear",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_brand_supplier_count",
    "q17_small_quantity_revenue",
]

assert len(DRIVER_WINDOW) == 50, f"window must be exactly 50, got {len(DRIVER_WINDOW)}"
_missing = [n for n in DRIVER_WINDOW if n not in REGISTRY]
assert not _missing, f"window names not registered: {_missing}"

_front = {n: REGISTRY[n] for n in DRIVER_WINDOW}
_rest = {n: q for n, q in REGISTRY.items() if n not in _front}
REGISTRY.clear()
REGISTRY.update(_front)
REGISTRY.update(_rest)

__all__ = ["REGISTRY", "Query", "register", "queries", "oracle_sql", "DRIVER_WINDOW"]
