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
    # Round-9 rotation closes the verification debt itemized in the round-8
    # verdict: the 8 round-8 additions (the registry's only
    # never-driver-verified queries) lead the window, followed by 42 of the
    # 45 r5-vintage queries (their driver evidence hits the age-4 freshness
    # limit this round).  The 3 deferred r5 queries (json_roundtrip_region,
    # orc_roundtrip_nation, timeseries_source_agg) MUST lead round 10's
    # window — tests/test_evidence_freshness.py enforces that arithmetic.
    never_verified = [
        "dedup_url_canonical",
        "quality_scorer_linear",
        "scorer_calibration_deciles",
        "cdc_apply_orders",
        "attribution_last_click_daily",
        "schema_evolution_roundtrip",
        "cv_scorer_fold_metrics",
        "jl_projection_quality",
    ]
    assert DRIVER_WINDOW[:8] == never_verified
    # every back-fill slot is an r5-vintage query
    deferred_to_r10 = {
        "json_roundtrip_region",
        "orc_roundtrip_nation",
        "timeseries_source_agg",
    }
    assert not deferred_to_r10 & set(DRIVER_WINDOW)
    assert len(DRIVER_WINDOW[8:]) == 42


def test_every_registered_query_has_fn():
    for name, q in REGISTRY.items():
        assert callable(q.fn), name
