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
from . import round8  # noqa: E402,F401
from . import round9  # noqa: E402,F401
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
# every query driver-verified on current code.  ROUND-9 window executes the
# rotation plan committed in round 8: lead with the 8 round-8 additions
# (the registry's only never-driver-verified queries), then back-fill all
# 42 remaining slots with r5-vintage queries (oldest surviving driver
# hashes — at round 9 their evidence is age 4, the freshness limit).
# 45 queries carry r5-vintage hashes but only 42 slots remain, so THREE are
# deferred and MUST lead the round-10 window (at round 10 their age is 5 >
# MAX_AGE_ROUNDS, so tests/test_evidence_freshness.py will fail unless the
# r10 rotation covers them):
#
# ROUND-10 ROTATION PLAN (edit this list at the START of round 10): lead
# with the three deferred r5-vintage queries — json_roundtrip_region,
# orc_roundtrip_nation, timeseries_source_agg — plus every query
# registered during round 9 (never driver-verified — as of this comment:
# dedup_incremental_neardup_ingest, stream_lsh_neardup_ingest, plus
# anything registered later in round 9), then back-fill with
# the r6-vintage queries (50 of them; they reach the age-4 freshness limit
# at round 10, so any not covered by the r10 window must go in r11's).
# tests/test_evidence_freshness.py computes the exact stale set from the
# committed CORRECTNESS files — run it after editing the window.
#
# CAPACITY ARITHMETIC (round-9 decision, see BENCH_PROTOCOL.md): the
# freshness guard allows a query to wait at most 5 rounds between driver
# hashes (hashed at r, exempt through r+4, in-window again at r+5), so
# steady-state refresh capacity = 50 slots x 5 rounds = 250 queries.
# Registry growth is therefore CAPPED: at most 4 additions per round and a
# hard registry ceiling of 240 (margin >= 2 windows of slack for rotation
# mistakes), pinned by tests/test_evidence_freshness.py::test_registry_capacity_margin.
DRIVER_WINDOW: list[str] = [
    # never driver-verified: the 8 round-8 additions
    "dedup_url_canonical",
    "quality_scorer_linear",
    "scorer_calibration_deciles",
    "cdc_apply_orders",
    "attribution_last_click_daily",
    "schema_evolution_roundtrip",
    "cv_scorer_fold_metrics",
    "jl_projection_quality",
    # back-fill: 42 of the 45 r5-vintage queries (age-4 evidence)
    "ann_bruteforce_cosine_topk",
    "ann_ivf_cosine_topk",
    "ann_lsh_cosine_topk",
    "boilerplate_gram_stats",
    "chunk_documents_stats",
    "dataset_split_assign",
    "decontaminate_train_eval",
    "dedup_embedding_cosine",
    "dedup_exact_clusters",
    "dedup_exact_summary",
    "dedup_minhash_components",
    "dedup_minhash_survivors",
    "dedup_neardup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_simhash_components",
    "domain_mix_resample",
    "embedding_centroids",
    "gapfill_hourly_event_counts",
    "histogram_order_totals",
    "json_props_extract_agg",
    "lang_id_confusion",
    "lazy_above_mean_orders",
    "length_decile_stats",
    "listagg_nations_by_region",
    "multimodal_decode_features",
    "multimodal_frame_stats",
    "multimodal_payload_stats",
    "pack_sequences_greedy",
    "pii_scrub_stats",
    "quality_repetition_signals",
    "semantic_prune_prototypes",
    "skew_salted_groupby_users",
    "stream_dedup_event_keys",
    "stream_join_click_purchase",
    "stream_sessionize_users",
    "stream_windowed_event_counts",
    "text_quality_by_source",
    "text_stats",
    "time_rollup_multigrain",
    "token_piece_stats",
    "unpivot_lineitem_amounts",
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
