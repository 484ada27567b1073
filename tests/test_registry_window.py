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
    # Round-6 rotation closes the verification debt itemized in the round-5
    # verdict: the r4 failure's fix leads, then the 3 never-verified and
    # the 22 r2-stale queries — all must sit inside the window.
    assert DRIVER_WINDOW[0] == "rolling_time_5min"
    for name in (
        "dedup_exact_survivors",
        "profile_lineitem_columns",
        "stream_trending_event_types",
        "str_accessor_showcase",
        "dt_accessor_showcase",
        "grouping_sets_status_year",
        "window_fn_breadth",
        "monotonic_user_events",
        "csv_roundtrip_nation",
        "parquet_roundtrip_supplier",
        "frame_api_groupby_pipeline",
        "rolling_center_mean_5",
        "resample_quantile_daily",
        "timedelta_user_span",
        "merge_indicator_customer_orders",
        "stratified_sample_documents",
        "text_fingerprint_rolling_hash",
        "explode_doc_words",
        "cumprod_linenumbers",
    ):
        assert name in DRIVER_WINDOW[:26], name


def test_every_registered_query_has_fn():
    for name, q in REGISTRY.items():
        assert callable(q.fn), name
