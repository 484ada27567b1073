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
    # Round-7 rotation closes the verification debt itemized in the round-6
    # verdict: ALL 34 never-driver-verified queries (round-6 session
    # additions, including ols_value_trend_by_type which the committed plan
    # comment omitted) must lead the window.
    never_verified = [
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
    ]
    assert DRIVER_WINDOW[:34] == never_verified


def test_every_registered_query_has_fn():
    for name, q in REGISTRY.items():
        assert callable(q.fn), name
