"""sf1 scale rehearsal (VERDICT r2 'Next round' #8).

The driver ships sf<=0.1; the 100 TB argument for the dedup/CC/ANN
operators was extrapolated from sf0.1.  This script rehearses one order
of magnitude up: it synthesizes sf1-scale documents (50k rows) and
embeddings (20k rows) with the same schema/statistics as the driver
tables (same vocabulary, length mix, language/source mix, cluster
structure) PLUS injected exact/near duplicates so dedup does real work,
then times the headline dedup/CC/ANN/time-semantics/training-pipeline
queries and writes BENCH_sf{SCALE}.json (sf1 default; set
SPARK_GRAFT_REHEARSAL_SCALE=10 for the 100×-the-driver-bench sf10 run).

Generated data lives in /root/repo/.scratch/sf1 (gitignored — testdata
is read-only and must not be touched).  Deterministic: numpy seed 1042.

Run: python scripts/scale_rehearsal.py
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
# SPARK_GRAFT_REHEARSAL_SCALE multiplies every table: 1 (default) = sf1
# (10× the driver's bench data), 10 = sf10 (100× — the "would it survive
# 100×" rehearsal).  Output goes to .scratch/sf{S} / BENCH_sf{S}.json.
SCALE = int(os.environ.get("SPARK_GRAFT_REHEARSAL_SCALE", "1"))
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", f"sf{SCALE}"
)
N_DOCS = 50_000 * SCALE
N_VECS = 20_000 * SCALE
SEED = 1042

N_EVENTS = 1_000_000 * SCALE
N_USERS = 15_000 * SCALE

HEADLINE = [
    "dedup_exact_clusters",
    "dedup_exact_summary",
    "dedup_neardup_minhash_lsh",
    "dedup_minhash_components",
    "dedup_minhash_survivors",
    "dedup_simhash",
    "dedup_simhash_components",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "ann_bruteforce_cosine_topk",
    "ann_ivf_cosine_topk",
    "embedding_centroids",
    # time-semantics set (events 10×: rows AND user cardinality scale
    # together, as a real clickstream would)
    "asof_join_click_purchase",
    "gapfill_hourly_event_counts",
    "rolling_time_5min",
    "json_props_extract_agg",
    "stream_sessionize_users",
    "range_join_first_hour_events",
    "time_rollup_multigrain",
    # training-pipeline set (documents 10×)
    "dataset_split_assign",
    "decontaminate_train_eval",
    # round-6 curation additions (first >sf0.01 measurement, r5 verdict #6)
    "quality_repetition_signals",
    "token_piece_stats",
    "pii_scrub_stats",
    "pack_sequences_greedy",
    "semantic_prune_prototypes",
    "domain_mix_resample",
    "length_decile_stats",
    "boilerplate_gram_stats",
    "chunk_documents_stats",
    "profile_lineitem_columns",
    "stream_trending_event_types",
    # round-7 additions (first >sf0.01 measurement)
    "lexical_rarity_by_source",
    "cross_source_vocab_overlap",
    "dedup_winnowing_fingerprints",
    "dedup_incremental_new_docs",
    "binned_quantiles_event_value",
    "stream_binned_quantiles_value",
    "ann_pq_cosine_topk",
    "compaction_roundtrip_documents",
    # round-6 session-3 additions (first >sf0.01 measurement): the
    # substring-span finisher is the scale question (gram stream = ~len
    # rows/doc); retrieval is broadcast-pruned postings
    "dedup_substring_spans",
    "bm25_search_topk",
    "phrase_search_topk",
    # round-6 session-3b: analytics set (events + corpus mining)
    "funnel_view_click_purchase",
    "cohort_retention_daily",
    "cooccurrence_word_pairs",
    "weighted_sample_by_source",
    "graph_triangle_stats",
    "stream_upsert_dedup_sink",
    # round-6 session-3c
    "editdistance_join_prefixes",
    "source_divergence_stats",
    "semantic_decontaminate_embeddings",
    "incremental_agg_maintenance",
    "zorder_layout_stats",
    "hard_negative_mining",
    "curation_decision_table",
    # mutation / point-in-time set (orders+customer scaled together —
    # fact AND dimension cardinality grow, per-key fan-out constant)
    "merge_upsert_orders",
    "scd2_customer_history",
    "pointintime_dim_join_orders",
    "ols_price_trend",
    "stream_windowed_distinct_users",
    "naive_bayes_source_classifier",
    # round-7 additions: sharded distinct-users (the r6 verdict's watch
    # item — rehearse the production mitigation), k-means over the scaled
    # embeddings, bigram LM scoring and median/MAD outliers over the
    # scaled corpus/events
    "stream_sharded_distinct_users",
    "kmeans_embedding_clusters",
    "bigram_lm_nll_by_source",
    "robust_outliers_by_type",
    "ols_value_trend_by_type",
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
    # round-8 additions
    "dedup_url_canonical",
    "quality_scorer_linear",
    "scorer_calibration_deciles",
    "cdc_apply_orders",
    "attribution_last_click_daily",
    "schema_evolution_roundtrip",
    "cv_scorer_fold_metrics",
    "jl_projection_quality",
    # round-9 additions
    "dedup_incremental_neardup_ingest",
    "stream_lsh_neardup_ingest",
]


def make_documents(rng: np.random.Generator) -> None:
    import duckdb

    # empirical vocabulary + length mix from the driver's own sf0.1 table
    rows = duckdb.sql(
        f"SELECT text, lang, source FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchall()
    # 10× the driver vocabulary (digit-suffixed variants): the raw sf0.1
    # vocab is ~40 words, which makes EVERY random doc near-identical under
    # simhash/Jaccard — realistic corpora have enough lexical entropy that
    # unrelated docs don't collide.  Suffixing keeps the text shape
    # (whitespace words, similar char lengths) the text operators expect.
    base_vocab = sorted({w for t, _, _ in rows for w in t.split()})
    # vocabulary scales with the corpus (Heaps' law, roughly): a fixed
    # lexicon at 10× the docs makes every shared-gram posting list 10×
    # denser — a data artifact real corpora don't have, which turned the
    # prefix-blocked join quadratic at the sf10 rehearsal
    vocab = [f"{w}{d}" for w in base_vocab for d in range(10 * SCALE)]
    lengths = [len(t.split()) for t, _, _ in rows]
    langs = [r[1] for r in rows]
    sources = [r[2] for r in rows]

    texts: list[str] = []
    for i in range(N_DOCS):
        n = lengths[int(rng.integers(0, len(lengths)))]
        words = rng.choice(vocab, size=n, replace=True)
        texts.append(" ".join(words))
    # inject duplicates: 4% exact copies, 4% near copies (1-2 word edits)
    n_dup = N_DOCS // 25
    for j in range(n_dup):
        src_i = int(rng.integers(0, N_DOCS))
        dst_i = int(rng.integers(0, N_DOCS))
        texts[dst_i] = texts[src_i]
    for j in range(n_dup):
        src_i = int(rng.integers(0, N_DOCS))
        dst_i = int(rng.integers(0, N_DOCS))
        w = texts[src_i].split()
        if len(w) > 3:
            w[int(rng.integers(0, len(w)))] = str(rng.choice(vocab))
        texts[dst_i] = " ".join(w)

    tbl = pa.table(
        {
            "doc_id": pa.array(range(N_DOCS), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array([langs[int(rng.integers(0, len(langs)))] for _ in range(N_DOCS)], pa.string()),
            "source": pa.array([sources[int(rng.integers(0, len(sources)))] for _ in range(N_DOCS)], pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(OUT, "documents.parquet"))


def make_embeddings(rng: np.random.Generator) -> None:
    dim, k = 64, 10
    # centers at half the per-vector noise scale: intra-cluster cosine
    # ~|c|²/(|c|²+dim) ≈ 0.2, BELOW the dedup threshold (0.3), so the
    # near-dup answer is the injected duplicates — realistic.  (center×3
    # made every intra-cluster pair a "near-dup": 5.8M artifact pairs;
    # center×1 still put intra-cluster cosine ≈0.5 above threshold.)
    # Clusters remain real geometric structure for IVF routing.
    centers = rng.normal(size=(k, dim)).astype("float32") * 0.5
    labels = rng.integers(0, k, size=N_VECS)
    vecs = centers[labels] + rng.normal(size=(N_VECS, dim)).astype("float32")
    # 3% near-duplicate vectors (tiny perturbation of another row)
    n_dup = N_VECS * 3 // 100
    src = rng.integers(0, N_VECS, size=n_dup)
    dst = rng.integers(0, N_VECS, size=n_dup)
    vecs[dst] = vecs[src] + rng.normal(scale=1e-3, size=(n_dup, dim)).astype("float32")
    labels[dst] = labels[src]
    tbl = pa.table(
        {
            "vec_id": pa.array(range(N_VECS), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
            "label": pa.array(labels.tolist(), pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(OUT, "embeddings.parquet"))


def make_events(rng: np.random.Generator) -> None:
    """10× the driver's sf0.1 events table, same schema/statistics: 1M rows,
    15k users (both axes scale — a bigger clickstream has more users, not
    denser ones), one month span, 5 uniform event types, JSON props.
    Written as naive timestamp[us] parquet — the driver's CURRENT events
    encoding — so the rehearsal also exercises the NTZ normalization path."""
    start_us = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")
    span_us = 30 * 24 * 3600 * 1_000_000
    ts = np.sort(start_us + (rng.random(N_EVENTS) * span_us).astype("int64"))
    types = np.array(["click", "purchase", "error", "signup", "view"])
    etype = types[rng.integers(0, len(types), size=N_EVENTS)]
    k = rng.integers(0, 100, size=N_EVENTS)
    tbl = pa.table(
        {
            "event_id": pa.array(range(N_EVENTS), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, N_USERS, size=N_EVENTS), pa.int64()),
            "event_type": pa.array(etype.tolist(), pa.string()),
            "value": pa.array(np.round(rng.random(N_EVENTS) * 560, 2), pa.float64()),
            "props": pa.array([f'{{"k": {v}}}' for v in k], pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(OUT, "events.parquet"))


def make_lineitem() -> None:
    """10×SCALE lineitem by replicating the driver's sf0.1 table with
    offset order keys — value distributions identical, volume scaled, so
    scan-bound profiling queries rehearse real row counts."""
    import duckdb

    reps = 10 * SCALE
    duckdb.sql(
        f"""
        COPY (
          SELECT l.* REPLACE (l_orderkey + r * 15015000 AS l_orderkey)
          FROM read_parquet('{SRC}/lineitem.parquet') l, range({reps}) t(r)
        ) TO '{os.path.join(OUT, "lineitem.parquet")}' (FORMAT PARQUET)
        """
    )


def make_orders_customer() -> None:
    """10×SCALE orders + customer by key-offset replication — BOTH sides
    of the dimension join scale (more customers, not denser ones), so the
    SCD2/point-in-time set rehearses constant per-key fan-out.  The
    15,015,000 offset is a multiple of lcm(5,7,11,13,15) = 15015, so
    every replica has the same matched/updated/inserted mix as the
    original under every branch modulus the queries use (the old 10M
    offset only preserved the %5 split — round-8 ADVICE fix)."""
    import duckdb

    reps = 10 * SCALE
    duckdb.sql(
        f"""
        COPY (
          SELECT c.* REPLACE (c_custkey + r * 15015000 AS c_custkey)
          FROM read_parquet('{SRC}/customer.parquet') c, range({reps}) t(r)
        ) TO '{os.path.join(OUT, "customer.parquet")}' (FORMAT PARQUET)
        """
    )
    duckdb.sql(
        f"""
        COPY (
          SELECT o.* REPLACE (o_orderkey + r * 15015000 AS o_orderkey,
                              o_custkey + r * 15015000 AS o_custkey)
          FROM read_parquet('{SRC}/orders.parquet') o, range({reps}) t(r)
        ) TO '{os.path.join(OUT, "orders.parquet")}' (FORMAT PARQUET)
        """
    )


def main() -> None:
    if not (
        os.path.exists(os.path.join(OUT, "documents.parquet"))
        and os.path.exists(os.path.join(OUT, "embeddings.parquet"))
        and os.path.exists(os.path.join(OUT, "events.parquet"))
        and os.path.exists(os.path.join(OUT, "lineitem.parquet"))
    ):
        os.makedirs(OUT, exist_ok=True)
        rng = np.random.default_rng(SEED)
        t0 = time.time()
        make_documents(rng)
        make_embeddings(rng)
        make_events(rng)
        make_lineitem()
        print(f"generated sf1 data in {time.time() - t0:.1f}s -> {OUT}")
    if not os.path.exists(os.path.join(OUT, "orders.parquet")):
        # added round 7 (rng-free, so augmenting an existing dir is safe)
        os.makedirs(OUT, exist_ok=True)
        t0 = time.time()
        make_orders_customer()
        print(f"generated orders/customer in {time.time() - t0:.1f}s -> {OUT}")

    from dask_expr_rapids_spark.queries import queries
    from dask_expr_rapids_spark.session import get_spark

    # shuffle partitions scale with the data (the prompt-level sizing rule:
    # partitions must fit in memory at the target SF) — 32 partitions of an
    # sf10 candidate shuffle put ~10× sf1's bytes in every task
    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32 * SCALE,
        extra_conf={"spark.ui.enabled": "false"},
    )
    qs = queries()
    results: dict[str, float] = {}
    rows: dict[str, int] = {}
    errors: dict[str, str] = {}
    from dask_expr_rapids_spark.queries.registry import release_caches

    # SPARK_GRAFT_REHEARSAL_ONLY=a,b,c reruns just those queries and MERGES
    # into the existing BENCH_sf{N}.json (late-round additions without a
    # full re-run; the full suite stays the per-round refresh).
    only = os.environ.get("SPARK_GRAFT_REHEARSAL_ONLY")
    names = [n for n in HEADLINE if n in only.split(",")] if only else HEADLINE
    for name in names:
        # same measurement hygiene as bench.py: drop the previous query's
        # scoped caches / checkpointed blocks and let the heap settle, so a
        # cache-heavy predecessor (the CC pipelines persist signatures and
        # localCheckpoint edge lists) doesn't force its successor to spill
        release_caches()
        import gc as _gc

        _gc.collect()  # drop py4j refs so ContextCleaner can reap checkpoint blocks
        spark.sparkContext._jvm.System.gc()
        try:
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                n = qs[name](spark, OUT).count()
                times.append(time.perf_counter() - t0)
            results[name] = round(statistics.median(times), 3)
            rows[name] = n
            print(f"{name}: {results[name]:.2f}s median, {n} rows", flush=True)
        except Exception as exc:  # noqa: BLE001 — a scale failure IS the finding
            errors[name] = f"{type(exc).__name__}: {exc}"[:400]
            print(f"{name}: ERROR {errors[name]}", flush=True)
    out = {
        "metric": "sf1_headline_total",
        "value": round(sum(results.values()), 3),
        "unit": "sec",
        "queries": results,
        "rows": rows,
        "sf": SCALE,
        "n_docs": N_DOCS,
        "n_vecs": N_VECS,
    }
    if errors:
        out["errors"] = errors
    path = os.path.join(os.path.dirname(OUT), "..", f"BENCH_sf{SCALE}.json")
    if only and os.path.exists(os.path.abspath(path)):
        with open(os.path.abspath(path)) as f:
            prev = json.loads(f.read())
        prev.get("queries", {}).update(results)
        prev.get("rows", {}).update(rows)
        if errors:
            prev.setdefault("errors", {}).update(errors)
        prev["value"] = round(sum(prev["queries"].values()), 3)
        out = prev
    with open(os.path.abspath(path), "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
