"""Pin the driver verification window: the driver hash-verifies the FIRST
50 registered queries, so the front of the registry must be exactly the
rotation chosen for this round (see queries/__init__.py::DRIVER_WINDOW)."""

from __future__ import annotations

from dask_expr_rapids_spark.queries import DRIVER_WINDOW, REGISTRY


def test_window_is_exactly_the_first_fifty():
    assert list(REGISTRY)[:50] == DRIVER_WINDOW
    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50


def test_window_prioritizes_unverified_queries():
    # Round-8 rotation closes the verification debt itemized in the round-7
    # verdict: ALL 36 never-driver-verified queries (35 round-7 session
    # additions + ann_pq_cosine_topk, oracle-twinned this round) must lead
    # the window, followed by the 11 r4-vintage hashes.
    never_verified = [
        "kmeans_embedding_clusters",
        "bigram_lm_nll_by_source",
        "robust_outliers_by_type",
        "stream_sharded_distinct_users",
        "zipf_fit_vocabulary",
        "leakage_safe_split_stats",
        "pagerank_word_centrality",
        "hll_distinct_users",
        "stream_hll_distinct_users",
        "dedup_image_phash",
        "cms_user_frequency",
        "stream_cms_heavy_hitters",
        "tfidf_hashed_features",
        "snapshot_diff_orders",
        "sessionize_users_batch",
        "peak_concurrency_daily",
        "bloom_semijoin_orders",
        "hll_set_ops_users",
        "dq_validation_report",
        "time_weighted_avg_daily",
        "markov_event_transitions",
        "knn_label_classifier",
        "bfs_khop_word_graph",
        "stream_bloom_purchaser_filter",
        "hopping_window_event_rates",
        "session_conversion_daily",
        "partition_checksum_diff_orders",
        "column_entropy_profile",
        "stream_session_conversion_daily",
        "keyword_extraction_by_source",
        "key_skew_report",
        "robust_anomaly_flags_daily",
        "mutual_information_event_dow",
        "gini_spend_by_segment",
        "funnel_time_to_convert_daily",
        "ann_pq_cosine_topk",
    ]
    assert DRIVER_WINDOW[:36] == never_verified
    r4_vintage = [
        "rollup_status_priority",
        "groupby_median_quantity",
        "groupby_cov_corr",
        "cumsum_user_value",
        "shift_diff_events",
        "ffill_user_value",
        "rolling_mean_7",
        "rank_orders_in_customer",
        "groupby_head_first_orders",
        "resample_hourly_events",
        "resample_daily_ohlc",
    ]
    assert DRIVER_WINDOW[36:47] == r4_vintage


def test_every_registered_query_has_fn():
    for name, q in REGISTRY.items():
        assert callable(q.fn), name
