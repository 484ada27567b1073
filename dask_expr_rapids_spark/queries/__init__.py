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
from . import relational  # noqa: E402,F401
from . import tpch_ext  # noqa: E402,F401
from . import aggregates  # noqa: E402,F401
from . import window  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Driver verification window: the driver's CORRECTNESS run covers the FIRST
# 50 registered queries, so registration order is rotated each round to get
# every query driver-verified on current code.  Round-6 window, by priority:
#   * 7 round-6 queries (new this round — never driver-verified),
#   * 13 round-5 queries (added after the r4 window was recorded; 8 of them
#     fell outside the round-5 ordering's first 50),
#   * 7 round-6 session-2 additions (TPC-H completions q11/q21, MinHash
#     components/survivors, ORC roundtrip, boilerplate grams, chunking —
#     never driver-verified),
#   * 5 round-3 queries never hash-verified by any driver window,
#   * 18 of the round-2-window LLM-pipeline/breadth queries whose last
#     driver verification predates three rounds of shared-machinery change
#     (the 27 that no longer fit stay locally oracle-verified and cycle in
#     next round).
# Every query NOT in the window stays locally oracle-checked at sf0.001 by
# tests/test_correctness.py (same compare, same DuckDB oracle); the
# relational core (q01..q22, aggregates, window fns) was hash-verified on
# current code in CORRECTNESS_r04.  tests/test_registry_window.py pins the
# window to exactly this list.
DRIVER_WINDOW: list[str] = [
    # round 6 (new)
    "quality_repetition_signals",
    "token_piece_stats",
    "pii_scrub_stats",
    "pack_sequences_greedy",
    "semantic_prune_prototypes",
    "domain_mix_resample",
    "length_decile_stats",
    # round 5
    "asof_join_click_purchase",
    "unpivot_lineitem_amounts",
    "gapfill_hourly_event_counts",
    "histogram_order_totals",
    "listagg_nations_by_region",
    "json_props_extract_agg",
    "skew_salted_join_revenue",
    "dataset_split_assign",
    "decontaminate_train_eval",
    "range_join_first_hour_events",
    "time_rollup_multigrain",
    "stream_join_click_purchase",
    "skew_salted_groupby_users",
    # TPC-H completions (new this round)
    "q11_important_part_value",
    "q21_waiting_suppliers",
    "dedup_minhash_components",
    "dedup_minhash_survivors",
    "orc_roundtrip_nation",
    "boilerplate_gram_stats",
    "chunk_documents_stats",
    # round 3, never hash-verified by a driver window
    "timeseries_source_agg",
    "lazy_above_mean_orders",
    "json_roundtrip_region",
    "stream_dedup_event_keys",
    "ann_lsh_cosine_topk",
    # round-2-window LLM-pipeline / breadth set (stale driver evidence)
    "text_stats",
    "lang_id_confusion",
    "text_quality_by_source",
    "dedup_exact_clusters",
    "dedup_exact_summary",
    "dedup_neardup_minhash_lsh",
    "dedup_simhash_components",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "ann_bruteforce_cosine_topk",
    "ann_ivf_cosine_topk",
    "embedding_centroids",
    "multimodal_payload_stats",
    "multimodal_decode_features",
    "multimodal_frame_stats",
    "stream_windowed_event_counts",
    "stream_sessionize_users",
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
