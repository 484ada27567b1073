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
from . import graphrank  # noqa: E402,F401
from . import sketches  # noqa: E402,F401
from . import vectorize  # noqa: E402,F401
from . import relational  # noqa: E402,F401
from . import tpch_ext  # noqa: E402,F401
from . import aggregates  # noqa: E402,F401
from . import window  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Driver verification window: the driver's CORRECTNESS run covers the FIRST
# 50 registered queries, so registration order is rotated each round to get
# every query driver-verified on current code.  ROUND-7 window executes the
# rotation plan committed in round 6 (and adds `ols_value_trend_by_type`,
# which was registered after that plan was written — the r6 verdict's
# item #1): lead with ALL 34 queries that have never been driver-verified
# (round-6 session additions, all locally oracle-green), then back-fill the
# remaining 16 slots with the oldest r4-window relational/aggregate queries
# so their evidence stays fresh.  Every query NOT in the window stays
# locally oracle-checked at sf0.001 by tests/test_correctness.py (same
# compare, same DuckDB oracle); tests/test_registry_window.py pins the
# window to exactly this list.
#
# ROUND-8 ROTATION PLAN (edit this list at the START of round 8): lead with
# the queries added during round 7 (never driver-verified):
# kmeans_embedding_clusters, bigram_lm_nll_by_source,
# robust_outliers_by_type, stream_sharded_distinct_users,
# zipf_fit_vocabulary, leakage_safe_split_stats, pagerank_word_centrality,
# hll_distinct_users, stream_hll_distinct_users, dedup_image_phash,
# cms_user_frequency, stream_cms_heavy_hitters, tfidf_hashed_features,
# snapshot_diff_orders, sessionize_users_batch, peak_concurrency_daily,
# bloom_semijoin_orders, hll_set_ops_users, dq_validation_report,
# time_weighted_avg_daily, markov_event_transitions, knn_label_classifier,
# bfs_khop_word_graph, stream_bloom_purchaser_filter,
# hopping_window_event_rates, session_conversion_daily,
# partition_checksum_diff_orders, column_entropy_profile,
# stream_session_conversion_daily, keyword_extraction_by_source,
# key_skew_report, robust_anomaly_flags_daily,
# mutual_information_event_dow, gini_spend_by_segment,
# funnel_time_to_convert_daily —
# plus anything registered after this comment was written — then back-fill
# with the oldest remaining r4-window queries: rollup_status_priority,
# groupby_median_quantity, groupby_cov_corr, cumsum_user_value,
# shift_diff_events, ffill_user_value, rolling_mean_7,
# rank_orders_in_customer, groupby_head_first_orders,
# resample_hourly_events, resample_daily_ohlc, then the oldest r5-window
# queries (asof/range/skew/streaming/curation) in registration order.
DRIVER_WINDOW: list[str] = [
    # never driver-verified: round-6 session additions (34)
    "dedup_winnowing_fingerprints",
    "dedup_winnowing_components",
    "compaction_roundtrip_documents",
    "stream_binned_quantiles_value",
    "lexical_rarity_by_source",
    "cross_source_vocab_overlap",
    "text_roundtrip_documents",
    "ann_pq_cosine_topk",
    "binned_quantiles_event_value",
    "dedup_incremental_new_docs",
    "ann_ivf_partitioned_store",
    "dedup_substring_spans",
    "bm25_search_topk",
    "phrase_search_topk",
    "merge_upsert_orders",
    "scd2_customer_history",
    "weighted_sample_by_source",
    "graph_triangle_stats",
    "stream_upsert_dedup_sink",
    "funnel_view_click_purchase",
    "cohort_retention_daily",
    "cooccurrence_word_pairs",
    "incremental_agg_maintenance",
    "zorder_layout_stats",
    "semantic_decontaminate_embeddings",
    "editdistance_join_prefixes",
    "source_divergence_stats",
    "hard_negative_mining",
    "curation_decision_table",
    "pointintime_dim_join_orders",
    "stream_windowed_distinct_users",
    "ols_price_trend",
    "naive_bayes_source_classifier",
    "ols_value_trend_by_type",
    # back-fill: oldest r4-window relational/aggregate queries (16)
    "q18_large_volume_customer",
    "q19_disjunctive_revenue",
    "q20_promo_suppliers",
    "q21_waiting_suppliers",
    "q22_idle_customers",
    "q11_important_part_value",
    "agg_global_stats",
    "agg_var_std",
    "value_counts_event_type",
    "mode_event_type",
    "idxmax_order_per_priority",
    "quantile_quantity",
    "distinct_segments",
    "drop_duplicates_keep_min",
    "pivot_returnflag_status",
    "groupby_multi_agg",
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
