"""Structured Streaming ops vs their batch equivalents: the same operator
applied to a file stream (availableNow drain → memory sink) must produce
exactly the batch result — the streaming analog of the DuckDB differential
oracle."""

from __future__ import annotations

import os
import shutil

import pytest

from dask_expr_rapids_spark.sources.tables import load_table
from dask_expr_rapids_spark.streaming.ops import (
    read_events_stream,
    run_available_now,
    running_user_totals,
    sessionize,
    stream_dedup,
    windowed_counts,
)

from .conftest import SF_DIR, canonical_rows


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    """Events parquet staged into a directory (file streams read dirs)."""
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(os.path.join(SF_DIR, "events.parquet"), d / "part-000.parquet")
    return str(d)


def _assert_same(stream_result, batch_df, name):
    srows = canonical_rows(stream_result.toPandas())
    brows = canonical_rows(batch_df.toPandas())
    assert srows == brows, f"{name}: stream/batch divergence ({len(srows)} vs {len(brows)} rows)"


def test_stream_windowed_counts_matches_batch(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    out = run_available_now(
        windowed_counts(stream), "t_win_counts", output_mode="complete"
    )
    batch = windowed_counts(load_table(spark, SF_DIR, "events"))
    _assert_same(out, batch, "windowed_counts")


def test_stream_sessionize_matches_batch(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    out = run_available_now(sessionize(stream), "t_sessions", output_mode="complete")
    batch = sessionize(load_table(spark, SF_DIR, "events"))
    _assert_same(out, batch, "sessionize")
    # sanity: sessions exist and never overlap per user
    assert out.count() > 0


def test_stream_dedup(spark, events_dir):
    # duplicate the input file → every event appears twice across files;
    # dedup on event_id must restore the original cardinality.
    dup_dir = events_dir + "_dup"
    os.makedirs(dup_dir, exist_ok=True)
    shutil.copy(os.path.join(events_dir, "part-000.parquet"), os.path.join(dup_dir, "a.parquet"))
    shutil.copy(os.path.join(events_dir, "part-000.parquet"), os.path.join(dup_dir, "b.parquet"))
    stream = read_events_stream(spark, dup_dir)
    deduped = stream_dedup(stream, ["event_id"], watermark="365 days")
    out = run_available_now(
        deduped.groupBy("event_type").count(), "t_dedup", output_mode="complete"
    )
    batch = load_table(spark, SF_DIR, "events").groupBy("event_type").count()
    _assert_same(out, batch, "stream_dedup")


def test_running_user_totals_stateful(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    out = run_available_now(
        running_user_totals(stream), "t_running", output_mode="update"
    )
    # update-mode sink may hold several rows per user (one per micro-batch);
    # the LAST state per user must equal the batch totals.
    import pyspark.sql.functions as F
    from pyspark.sql import Window as W

    final = (
        out.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("user_id").orderBy(F.desc("n_events"))
            ),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
    )
    # floats accumulated in Python vs JVM: compare counts exactly, values
    # to 1e-9 relative.
    f = {r["user_id"]: r for r in final.collect()}
    b = {r["user_id"]: r for r in batch.collect()}
    assert set(f) == set(b)
    for uid in b:
        assert f[uid]["n_events"] == b[uid]["n_events"]
        assert abs(f[uid]["total_value"] - b[uid]["total_value"]) <= 1e-6 * max(
            1.0, abs(b[uid]["total_value"])
        )


def test_stream_join_within_batch_parity(spark):
    """stream_join_within on BATCH frames == plain inequality join; the
    streaming path of the same operator is oracle-checked end-to-end by
    the stream_join_click_purchase registry query."""
    from pyspark.sql import functions as F

    from dask_expr_rapids_spark.streaming.ops import stream_join_within

    e = load_table(spark, SF_DIR, "events")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    purchases = e.filter(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
    got = sorted(
        (r.user_id, r.l_event_id, r.r_event_id)
        for r in stream_join_within(clicks, purchases, key="user_id").collect()
    )
    c, p = clicks.alias("c"), purchases.alias("p")
    naive = sorted(
        (r.uid, r.cid, r.pid)
        for r in c.join(
            p,
            (F.col("c.user_id") == F.col("p.user_id"))
            & (F.col("p.ts") >= F.col("c.ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("p.ts") <= F.col("c.ts")),
        )
        .select(
            F.col("c.user_id").alias("uid"),
            F.col("c.event_id").alias("cid"),
            F.col("p.event_id").alias("pid"),
        )
        .collect()
    )
    assert got == naive and len(got) > 0


def test_streaming_checkpoint_recovery_resumes_state(spark, tmp_path):
    """Restart-with-checkpoint contract: drain half the input, then restart
    a NEW streaming query over the same checkpoint after more files arrive.
    The file source must skip already-processed files (exactly-once) and the
    state store must resume the windowed counts — final complete-mode
    output equals one batch pass over everything."""
    import os

    from pyspark.sql import functions as F

    from dask_expr_rapids_spark.sources.tables import load_table
    from dask_expr_rapids_spark.streaming.ops import (
        read_events_stream,
        run_available_now_to_files,
        windowed_counts,
    )

    e = load_table(spark, SF_DIR, "events").select("ts", "event_type")
    pdf = e.toPandas().sort_values("ts").reset_index(drop=True)
    half = len(pdf) // 2
    src = tmp_path / "stream_src"
    os.makedirs(src)
    pdf.iloc[:half].to_parquet(src / "part1.parquet", index=False)

    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    s1 = read_events_stream(spark, str(src))
    run_available_now_to_files(
        windowed_counts(s1, window="1 hour", watermark="2 hours"),
        out,
        output_mode="complete",
        checkpoint=ckpt,
    )
    phase1 = spark.read.parquet(out).count()

    # "later that day": more files land; a NEW query resumes the checkpoint
    pdf.iloc[half:].to_parquet(src / "part2.parquet", index=False)
    s2 = read_events_stream(spark, str(src))
    final = run_available_now_to_files(
        windowed_counts(s2, window="1 hour", watermark="2 hours"),
        out,
        output_mode="complete",
        checkpoint=ckpt,
    )

    want = {
        (r["window_start"], r["event_type"], r["n"])
        for r in windowed_counts(e, window="1 hour", watermark="2 hours").collect()
    }
    got = {(r["window_start"], r["event_type"], r["n"]) for r in final.collect()}
    assert got == want
    assert phase1 > 0  # the first drain really produced partial state


def test_upsert_sink_refeed_is_idempotent(spark):
    """The streaming MERGE store is idempotent by key: draining the SAME
    feed a second time (fresh checkpoint — i.e. a from-scratch replay,
    not a resume) must admit zero new rows and audit every fingerprint
    as a duplicate-vs-store."""
    import os

    from pyspark.sql import functions as F

    from dask_expr_rapids_spark.scratch import scratch_dir
    from dask_expr_rapids_spark.sources.tables import load_table
    from dask_expr_rapids_spark.streaming.ops import (
        run_upsert_dedup,
        stage_ordered_feed,
    )

    docs = load_table(spark, SF_DIR, "documents")
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    tagged = docs.select("doc_id", "source", F.md5(norm).alias("fp"))
    root = scratch_dir("spark_graft_upsert_refeed_")
    stage = stage_ordered_feed(tagged, os.path.join(root, "feed"))
    store = os.path.join(root, "store")

    run_upsert_dedup(spark, stage, store, os.path.join(root, "audit1"))
    n_store_1 = spark.read.parquet(store).count()
    n_distinct_fp = tagged.select("fp").distinct().count()
    assert n_store_1 == n_distinct_fp

    run_upsert_dedup(spark, stage, store, os.path.join(root, "audit2"))
    n_store_2 = spark.read.parquet(store).count()
    assert n_store_2 == n_store_1  # nothing admitted on replay
    n_audit_2 = spark.read.parquet(os.path.join(root, "audit2")).count()
    assert n_audit_2 == tagged.count()  # every incoming row rejected


def test_session_window_exact_gap_boundary(spark):
    """Pin session_window's merge convention at an EXACTLY-gap-sized
    inactivity gap (round-8 ADVICE item): two events 30 minutes apart
    MERGE into one session (a new session starts only when the gap is
    STRICTLY greater than 30 min) — the same `diff > gap` convention the
    batch gaps-and-islands SQL twins use, so the claimed batch/stream
    equivalence holds at the boundary too."""
    import datetime as dt

    from pyspark.sql import Row
    from pyspark.sql import functions as F

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    eps = dt.timedelta(microseconds=1)
    gap = dt.timedelta(minutes=30)

    def n_sessions(ts2):
        df = spark.createDataFrame([Row(user_id=1, ts=t0), Row(user_id=1, ts=ts2)])
        return (
            df.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .count()
        )

    assert n_sessions(t0 + gap) == 1  # exactly 30 min -> MERGES
    assert n_sessions(t0 + gap + eps) == 2  # 30 min + 1 us -> splits


def test_state_partition_pin_reaches_state_store(spark, events_dir):
    """The round-8 ADVICE fix must be PHYSICAL: draining with
    ``shuffle_partitions=N`` pins the stateful operator's state store to
    exactly N partitions (visible in progress metrics), while the session
    conf is restored afterwards.  An upstream repartition cannot do this —
    stateful ops require StatefulOpClusteredDistribution at exactly
    spark.sql.shuffle.partitions."""
    from dask_expr_rapids_spark.streaming import ops

    prior = spark.conf.get("spark.sql.shuffle.partitions")
    stream = read_events_stream(spark, events_dir)
    out = run_available_now(
        windowed_counts(stream),
        "t_pin_probe",
        output_mode="complete",
        shuffle_partitions=7,
    )
    assert out.count() > 0
    prog = ops.LAST_DRAIN_PROGRESS
    assert prog is not None and prog.get("stateOperators"), prog
    n = prog["stateOperators"][0].get("numShufflePartitions")
    assert n == 7, f"state store ran with {n} partitions, expected the pinned 7"
    assert spark.conf.get("spark.sql.shuffle.partitions") == prior
