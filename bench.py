#!/usr/bin/env python
"""Headline benchmark: runs the engine's flagship queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Protocol (BASELINE.md): warm SparkSession, per-query wall clock =
median of 5 runs after 1 warm-up (raised from 3 in r5: at sf0.1 the
queries are stage-barrier-bound, so a single multi-second JVM hiccup
— codegen compile, old-gen collection — lands in 1-2 consecutive runs
and a median of 3 records it; a median of 5 does not).  ``value`` is
the sum of per-query medians (sec) — lower is better.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dask_expr_rapids_spark.queries import REGISTRY  # noqa: E402
from dask_expr_rapids_spark.session import get_spark  # noqa: E402

HEADLINE = [
    # relational core
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q06_forecast_revenue",
    "q07_volume_shipping",
    "q10_returned_items",
    "q11_important_part_value",
    "q18_large_volume_customer",
    "q21_waiting_suppliers",
    "groupby_multi_agg",
    # window / time-series
    "resample_hourly_events",
    "rolling_mean_7",
    "cumsum_user_value",
    "asof_join_click_purchase",
    "range_join_first_hour_events",
    "time_rollup_multigrain",
    # semi-structured
    "json_props_extract_agg",
    # training-pipeline
    "dataset_split_assign",
    "decontaminate_train_eval",
    # LLM-data extensions
    "dedup_exact_clusters",
    "dedup_neardup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    # the engine's most iterative plan (CC loop over the LSH pair graph) —
    # added r6 per the round-5 verdict so the driver watches it every round
    "dedup_minhash_components",
    # 7th dedup strategy (suffix-array analog) + lexical retrieval — the
    # two heaviest round-6-session-3 additions, added so the driver
    # watches the gram-stream and postings plans every round
    "dedup_substring_spans",
    "bm25_search_topk",
    "text_quality_by_source",
    "ann_bruteforce_cosine_topk",
    "ann_ivf_cosine_topk",
    "multimodal_decode_features",
    # streaming
    "stream_sessionize_users",
    # round-7 additions: the NB argmax fix (the r6 verdict's perf item)
    # plus the three new ML/statistics compositions, so the driver
    # watches their plans every round
    "naive_bayes_source_classifier",
    "kmeans_embedding_clusters",
    "bigram_lm_nll_by_source",
    "robust_outliers_by_type",
    # round-7 late additions: deterministic HLL + the 8th dedup strategy
    # (image perceptual hash over the binary payload column)
    "hll_distinct_users",
    "dedup_image_phash",
    # round-8 additions: the 9th dedup strategy (URL canonicalization)
    # and the learned linear quality scorer
    "dedup_url_canonical",
    "quality_scorer_linear",
    # round-9 additions (r8 verdict item #6): the two heaviest round-8
    # queries — CDC latest-wins apply and leave-fold-out CV-as-one-
    # aggregate — so the driver watches their plans every round
    "cdc_apply_orders",
    "cv_scorer_fold_metrics",
    # round-9 addition: the 10th dedup strategy (incremental near-dup
    # ingest — persisted LSH store probe; timed runs include the store
    # ETL that production amortizes, see BENCH_PROTOCOL.md)
    "dedup_incremental_neardup_ingest",
]

N_RUNS = 5


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark(
        app_name="bench",
        extra_conf={"spark.ui.showConsoleProgress": "false", "spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from dask_expr_rapids_spark.queries.registry import release_caches

    results: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        # Measurement hygiene: drop the previous query's persisted blocks and
        # let the JVM settle BEFORE timing, so one query's cache-release /
        # old-gen churn doesn't land as a multi-second GC pause inside the
        # next query's timed runs (observed: a 0.7 s query recording a 6.7 s
        # median purely from its predecessor's heap churn).
        release_caches()
        spark.sparkContext._jvm.System.gc()
        # fault isolation (round-4 lesson: ONE query's AnalysisException
        # killed the whole run and the round recorded no numbers at all) —
        # an erroring query is reported, the other 26 still measure
        try:
            fn = REGISTRY[name].fn
            fn(spark, sf_dir).count()  # warm-up (also primes file listing cache)
            times = []
            for _ in range(N_RUNS):
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                times.append(time.perf_counter() - t0)
            results[name] = round(statistics.median(times), 4)
        except Exception as exc:  # noqa: BLE001 — report, don't die
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"BENCH ERROR {name}: {errors[name]}", file=sys.stderr)

    release_caches()  # scoped caches from the last query

    out = {
        "metric": "sum_of_median_query_seconds",
        "value": round(sum(results.values()), 4),
        "unit": "sec",
        "queries": results,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors  # value covers measured queries only
    print(json.dumps(out))
    sys.exit(1 if errors else 0)


if __name__ == "__main__":
    main()
