"""Round-9 operator tests: incremental near-dup ingest (10th dedup
strategy) — oracle parity, count invariants, and the persisted-store
plan shape (the probe must read the parquet store, never re-scan the
store's text)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_expr_rapids_spark.queries import REGISTRY
from dask_expr_rapids_spark.queries.registry import release_caches

from .conftest import SF_DIR, assert_matches_oracle


def test_incremental_neardup_matches_oracle(spark, oracle):
    q = REGISTRY["dedup_incremental_neardup_ingest"]
    assert_matches_oracle(q.fn(spark, SF_DIR), oracle, q.sql, q.name)
    release_caches()


def test_incremental_neardup_count_invariants(spark):
    """Per source: the three disposition buckets partition the incoming
    batch, and the batch size equals the corpus's ~in_store split — the
    md5-uniform 90/10 assignment shared with dedup_incremental_new_docs."""
    from dask_expr_rapids_spark.operators.sampling import hash_uniform
    from dask_expr_rapids_spark.sources.tables import load_table

    out = REGISTRY["dedup_incremental_neardup_ingest"].fn(spark, SF_DIR).collect()
    release_caches()
    assert out, "at least one source must have incoming docs"
    for r in out:
        assert (
            r["n_incoming"]
            == r["n_neardup_vs_store"] + r["n_neardup_within_batch"] + r["n_admitted"]
        ), r
    got_incoming = {r["source"]: r["n_incoming"] for r in out}
    d = load_table(spark, SF_DIR, "documents")
    expect = {
        r["source"]: r["n"]
        for r in d.filter(~(hash_uniform(F.col("doc_id")) < 0.9))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got_incoming == expect


def test_incremental_neardup_probe_reads_persisted_store(spark):
    """The returned plan must source the store side from the scratch
    parquet store (sketch + band tables) and broadcast the BATCH side of
    the probe — the store is streamed, never shuffled or broadcast, which
    is the whole 100 TB contract of the strategy."""
    from dask_expr_rapids_spark.plans import plan_of

    df = REGISTRY["dedup_incremental_neardup_ingest"].fn(spark, SF_DIR)
    plan = plan_of(df, "formatted")
    release_caches()
    # the persisted sketch store is scanned (bands derive from it by
    # projection; column pruning keeps the probe scan slim)
    assert plan.count("spark_graft_ndstore_") >= 1, plan[:2000]
    # the band probe and the candidate-id gset fetch are broadcast joins
    assert "BroadcastHashJoin" in plan
    # no gset-carrying broadcast: every broadcast exchange in the plan
    # carries slim id/band columns only
    for seg in plan.split("BroadcastExchange")[1:]:
        head = seg.splitlines()[0]
        assert "gset" not in head, head


def test_stream_lsh_ingest_matches_oracle(spark, oracle):
    q = REGISTRY["stream_lsh_neardup_ingest"]
    assert_matches_oracle(q.fn(spark, SF_DIR), oracle, q.sql, q.name)
    release_caches()


def test_stream_lsh_ingest_idempotent_refeed(spark):
    """Re-draining the SAME staged feed into the SAME store must admit
    nothing: every doc now verifies against its own admitted copy (or was
    rejected before and its rejector is still in the store) — the
    restart-safety/idempotence contract the exact-fingerprint upsert sink
    pins, carried over to the near-dup store."""
    import os

    from pyspark.sql import functions as F

    from dask_expr_rapids_spark.scratch import scratch_dir
    from dask_expr_rapids_spark.sources.tables import load_table
    from dask_expr_rapids_spark.streaming.ops import (
        run_lsh_neardup_ingest,
        stage_ordered_feed,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "source", "text")
    stage = scratch_dir("spark_graft_lshfeed_t_")
    stage_ordered_feed(docs, stage, n_batches=4, key="doc_id")
    store = scratch_dir("spark_graft_lshstore_t_")
    audit = os.path.join(scratch_dir("spark_graft_lshaudit_t_"), "audit")
    run_lsh_neardup_ingest(spark, stage, store, audit)
    n_admitted_1 = spark.read.parquet(os.path.join(store, "sketch")).count()
    n_total = docs.count()
    rej = spark.read.schema("source string, doc_id bigint, reason string").parquet(
        audit
    )
    assert n_admitted_1 + rej.count() == n_total
    assert n_admitted_1 > 0

    # second drain: fresh stage dir (fresh checkpoint), same store
    stage2 = scratch_dir("spark_graft_lshfeed_t2_")
    stage_ordered_feed(docs, stage2, n_batches=4, key="doc_id")
    run_lsh_neardup_ingest(spark, stage2, store, audit)
    n_admitted_2 = spark.read.parquet(os.path.join(store, "sketch")).count()
    assert n_admitted_2 == n_admitted_1, "re-feeding the same corpus must admit 0"
    # every re-fed doc is rejected against the store, none within-batch
    # (its admitted twin — possibly itself — is in the store; exact
    # self-jaccard is 1.0 >= 0.2)
    rej2 = (
        spark.read.schema("source string, doc_id bigint, reason string")
        .parquet(audit)
        .count()
    )
    assert rej2 == rej.count() + n_total
