"""Pin the driver verification window: the driver hash-verifies the FIRST
50 registered queries, so the front of the registry must be exactly the
rotation chosen for this round (see queries/__init__.py::DRIVER_WINDOW)."""

from __future__ import annotations

from dask_expr_rapids_spark.queries import DRIVER_WINDOW, REGISTRY


def test_window_is_exactly_the_first_fifty():
    assert list(REGISTRY)[:50] == DRIVER_WINDOW
    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50


def test_window_prioritizes_unverified_rounds():
    # every round-5 and round-6 query (never driver-verified before this
    # round's window) must sit inside the window
    from dask_expr_rapids_spark.queries import round5, round6  # noqa: F401

    for mod_prefixes in (
        ("quality_repetition_signals", "token_piece_stats", "pii_scrub_stats",
         "pack_sequences_greedy", "semantic_prune_prototypes",
         "domain_mix_resample", "length_decile_stats"),
        ("asof_join_click_purchase", "stream_join_click_purchase",
         "skew_salted_groupby_users", "decontaminate_train_eval"),
    ):
        for name in mod_prefixes:
            assert name in DRIVER_WINDOW[:25], name


def test_every_registered_query_has_fn():
    for name, q in REGISTRY.items():
        assert callable(q.fn), name
