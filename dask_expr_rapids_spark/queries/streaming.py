"""Registry entries that run REAL Structured Streaming jobs (availableNow
drain → memory sink) and return the final table — oracle-checked against
batch SQL.  This proves the streaming operators' event-time semantics are
exactly the batch semantics (the Structured Streaming guarantee).

The reference has no streaming at all (SURVEY.md §2.12) — this is the
engine extension a 100 TB training-data pipeline needs for continuous
ingest: the same windowed/sessionized aggregations keep running as data
arrives, with watermark-bounded state.
"""

from __future__ import annotations

import itertools
import os

from pyspark.sql import functions as F

from ..streaming.ops import (
    drain_state_partitions,
    read_events_stream,
    run_available_now,
    run_available_now_to_files,
    sessionize,
    windowed_counts,
)
from ..scratch import scratch_dir
from .registry import register

_sink_counter = itertools.count()


def events_state_parts(sf_dir: str) -> int:
    """State partitions for a drain over the events table: file-size
    metadata (driver-side only) through
    :func:`..streaming.ops.drain_state_partitions`."""
    return drain_state_partitions(
        os.path.getsize(os.path.join(sf_dir, "events.parquet"))
    )


# round-8 internal name, kept for the in-module call sites
_state_parts = events_state_parts


def _events_stream(spark, sf_dir: str):
    """Stream events.parquet in place (pathGlobFilter on the data dir) —
    no driver-side staging copy."""
    return read_events_stream(spark, sf_dir, glob_filter="events.parquet")


@register(
    "stream_windowed_event_counts",
    """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_windowed_event_counts(spark, sf_dir):
    """Tumbling 1-hour event-time windows computed BY A STREAMING JOB,
    equal to the batch GROUP BY time-bucket (oracle).  Memory-sink demo
    path — the file-sink production drain is ``stream_sessionize_users``."""
    stream = _events_stream(spark, sf_dir)
    sink = f"stream_win_counts_{next(_sink_counter)}"
    out = run_available_now(
        windowed_counts(stream, window="1 hour", watermark="2 hours"),
        sink,
        output_mode="complete",
        shuffle_partitions=_state_parts(sf_dir),
    )
    return out


@register(
    "stream_sessionize_users",
    """
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       >= INTERVAL '30 minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    numbered AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DOUBLE) AS session_value
    FROM numbered
    GROUP BY user_id, sid
    """,
)
def stream_sessionize_users(spark, sf_dir):
    """Per-user 30-minute-gap sessions computed BY A STREAMING JOB with
    native session windows; oracle = batch gaps-and-islands SQL.

    Production-shaped drain: executors write the result to a parquet sink
    directory via ``foreachBatch`` — no driver-side staging
    or memory-sink accumulation anywhere in the path."""
    stream = _events_stream(spark, sf_dir)
    out_dir = scratch_dir("spark_graft_sessions_")
    # bounded drain → SIZED state fan-out: state-store commit cost is per
    # partition per batch (argues for few partitions at small inputs), but
    # each partition holds its keys' full session state in memory during
    # the drain (8 fixed partitions OOMed the 10M-event sf10 rehearsal).
    # ~4 MB of input parquet per state partition, floor 32 (the session
    # shuffle default every bench budget was measured with), cap 512.
    # Driver-side file metadata only — no data read.  The count is applied
    # by pinning spark.sql.shuffle.partitions for the drain (round-8
    # ADVICE fix): stateful operators take their state-store partition
    # count from that conf at first run and IGNORE upstream repartitions.
    state_partitions = _state_parts(sf_dir)
    return run_available_now_to_files(
        sessionize(stream, gap="30 minutes", watermark="2 hours"),
        out_dir,
        output_mode="complete",
        shuffle_partitions=state_partitions,
    )


@register(
    "stream_trending_event_types",
    """
    WITH counts AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
             event_type,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT window_start, event_type, n,
             ROW_NUMBER() OVER (PARTITION BY window_start
                                ORDER BY n DESC, event_type) AS rk
      FROM counts
    )
    SELECT window_start, event_type, n, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 3
    """,
)
def stream_trending_event_types(spark, sf_dir):
    """Top-3 trending event types per hour: the streaming-pre-agg +
    batch-post-process composition pattern.  The STREAMING job maintains
    the watermark-bounded windowed counts (the only state that must be
    continuous); the rank is a batch window over the drained sink output —
    streaming DataFrames don't support rank/row_number, and they don't
    need to: the post-aggregation relation is windows × event_types,
    thousands of rows where the input was billions.  At 100 TB the same
    split holds — heavy continuous state in the stream, cheap ranking on
    the tiny aggregate.
    """
    from pyspark.sql import Window as W

    stream = _events_stream(spark, sf_dir)
    sink = f"stream_trending_{next(_sink_counter)}"
    counts = run_available_now(
        windowed_counts(stream, window="1 hour", watermark="2 hours"),
        sink,
        output_mode="complete",
        shuffle_partitions=_state_parts(sf_dir),
    )
    w = W.partitionBy("window_start").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        counts.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 3)
        .select("window_start", "event_type", "n", "rk")
    )


@register(
    "stream_binned_quantiles_value",
    """
    WITH b AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
             CAST(floor(value * 4) AS BIGINT) AS bin,
             COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ),
    cum AS (
      SELECT window_start, bin, c,
             SUM(c) OVER (PARTITION BY window_start ORDER BY bin) AS cum,
             SUM(c) OVER (PARTITION BY window_start) AS n
      FROM b
    )
    SELECT window_start, CAST(MAX(n) AS BIGINT) AS n,
           CAST(MIN(CASE WHEN cum >= ceil(0.50 * n) THEN bin + 1 END) AS DOUBLE) / 4.0 AS p50_est,
           CAST(MIN(CASE WHEN cum >= ceil(0.95 * n) THEN bin + 1 END) AS DOUBLE) / 4.0 AS p95_est
    FROM cum GROUP BY window_start
    """,
)
def stream_binned_quantiles_value(spark, sf_dir):
    """Per-hour value quantiles ON A STREAM via the mergeable-bin split:
    the STREAMING job maintains only (window, bin) counts — watermark-
    bounded, exactly mergeable across micro-batches by construction (the
    same property that makes the batch twin binned_quantiles_event_value
    persistable per day at 100 TB); the quantile finalization is a batch
    window over the drained windows×bins relation (thousands of rows
    where the input was billions).  Streaming DataFrames can't run the
    rank/cumsum finalization — and don't need to."""
    from pyspark.sql import Window as W

    stream = _events_stream(spark, sf_dir).withColumn(
        "bin", F.floor(F.col("value") * 4).cast("bigint")
    )
    sink = f"stream_binq_{next(_sink_counter)}"
    counts = run_available_now(
        windowed_counts(stream, window="1 hour", watermark="2 hours", by="bin"),
        sink,
        output_mode="complete",
        shuffle_partitions=_state_parts(sf_dir),
    )
    wc = W.partitionBy("window_start").orderBy("bin")
    wn = W.partitionBy("window_start")
    cum = counts.select(
        "window_start",
        "bin",
        F.sum("n").over(wc).alias("cum"),
        F.sum("n").over(wn).alias("nt"),
    )

    def est(q):
        return (
            F.min(
                F.when(F.col("cum") >= F.ceil(F.lit(q) * F.col("nt")), F.col("bin") + 1)
            ).cast("double")
            / 4.0
        )

    return cum.groupBy("window_start").agg(
        F.max("nt").alias("n"),
        est(0.50).alias("p50_est"),
        est(0.95).alias("p95_est"),
    )


# --------------------------------------------------------------------------
# Streaming upsert (MERGE) sink: continuous ingest dedup where the SINK
# maintains a persistent fingerprint store — each micro-batch dedups
# within itself, anti-joins the store, and appends only first-seen docs
# (the foreachBatch MERGE pattern a Delta/Iceberg sink runs under the
# hood; the batch twin is queries/mutation.py::merge_upsert_orders, the
# stateless-store cousin is dedup_incremental_new_docs).
#
# The doc stream is staged as four files keyed by doc_id % 4 with forced
# mtime order, so availableNow + maxFilesPerTrigger=1 yields four
# deterministic micro-batches — making "arrival order" SQL-expressible:
# the keeper of a fingerprint is MIN BY (batch, doc_id).  The oracle
# replays exactly that rule in one window.
#
# Scale posture: per batch the work is batch×store fp anti-join (fp
# equi-join, one shuffle; store side never broadcast — it scales with
# history) + an executor-written append.  State lives in the store files,
# not executor memory — restart-safe by construction, no growing
# in-memory state at all (unlike dropDuplicates state, which needs a
# watermark to bound).
# --------------------------------------------------------------------------
@register(
    "stream_upsert_dedup_sink",
    r"""
    WITH tagged AS (
      SELECT source, doc_id,
             md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
             doc_id % 4 AS batch
      FROM documents
    ),
    ranked AS (
      SELECT source,
             ROW_NUMBER() OVER (PARTITION BY fp ORDER BY batch, doc_id) AS rn
      FROM tagged
    )
    SELECT source,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted,
           CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_rejected
    FROM ranked GROUP BY source
    """,
)
def stream_upsert_dedup_sink(spark, sf_dir):
    from ..sources.tables import load_table
    from ..streaming.ops import run_upsert_dedup, stage_ordered_feed

    docs = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    tagged = docs.select(
        "doc_id", "source", F.md5(norm).alias("fp")
    )

    stage = scratch_dir("spark_graft_upsert_feed_")
    stage_ordered_feed(tagged, stage, n_batches=4, key="doc_id")
    store_dir = os.path.join(scratch_dir("spark_graft_upsert_store_"), "store")
    audit_dir = os.path.join(scratch_dir("spark_graft_upsert_audit_"), "audit")
    run_upsert_dedup(spark, stage, store_dir, audit_dir)

    admitted = (
        spark.read.parquet(store_dir)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_admitted"))
    )
    rejected = (
        spark.read.parquet(audit_dir)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_rejected"))
    )
    return (
        admitted.join(rejected, "source", "full_outer")
        .select(
            "source",
            F.coalesce("n_admitted", F.lit(0)).alias("n_admitted"),
            F.coalesce("n_rejected", F.lit(0)).alias("n_rejected"),
        )
    )


# --------------------------------------------------------------------------
# Chained stateful operators: streaming DEDUP (distinct (window, user))
# feeding a streaming WINDOWED AGGREGATION — the two-stage state pipeline
# (Spark 3.4+ multiple-stateful-operator support) that computes EXACT
# distinct users per hour, not an approximation.  State posture: the
# dedup state is (window, user) keys within the watermark horizon; the
# downstream agg state is windows × 1 counter — both watermark-evicted.
# --------------------------------------------------------------------------
@register(
    "stream_windowed_distinct_users",
    """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1
    """,
)
def stream_windowed_distinct_users(spark, sf_dir):
    """Exact distinct users per tumbling hour BY A STREAMING JOB:
    dropDuplicates on (window, user) chained into a windowed count —
    oracle = batch COUNT(DISTINCT)."""
    stream = _events_stream(spark, sf_dir).withWatermark("ts", "2 hours")
    dedup = stream.select(
        F.window("ts", "1 hour").alias("w"), "user_id"
    ).dropDuplicates(["w", "user_id"])
    agg = dedup.groupBy("w").agg(F.count(F.lit(1)).alias("n_users"))
    out = run_available_now(
        agg.select(F.col("w.start").alias("window_start"), "n_users"),
        f"stream_distinct_users_{next(_sink_counter)}",
        output_mode="complete",
        shuffle_partitions=_state_parts(sf_dir),
    )
    return out


# --------------------------------------------------------------------------
# The SHARDED exact-distinct variant — the production mitigation the plain
# chained pipeline above documents: (1) the dedup state partition count is
# sized from input bytes (the sessionize lesson — a fixed count either
# OOMs at 100× or wastes per-partition commit cost at 1×), applied by
# pinning spark.sql.shuffle.partitions for the drain — the ONLY lever
# Spark honors: stateful operators require StatefulOpClusteredDistribution
# with exactly that conf's partition count at first run, so an upstream
# repartition(N, keys) with any other N is ignored (round-8 ADVICE fix;
# the previous explicit repartition here was inert); (2) the windowed
# count is computed per (window, user-shard) so no single window key ever
# concentrates one reducer's state, and the windows x shards partials are
# rolled up to exact per-window totals by a trivial batch aggregate over
# the sink.  Same oracle as the unsharded query — sharding must not change
# the answer.
# --------------------------------------------------------------------------
_N_USER_SHARDS = 16


@register(
    "stream_sharded_distinct_users",
    """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1
    """,
)
def stream_sharded_distinct_users(spark, sf_dir):
    """Exact distinct users per tumbling hour by a STREAMING job with
    byte-sized state partitions and user-shard partial counts; oracle =
    batch COUNT(DISTINCT)."""
    state_partitions = _state_parts(sf_dir)
    stream = _events_stream(spark, sf_dir).withWatermark("ts", "2 hours")
    keyed = stream.select(F.window("ts", "1 hour").alias("w"), "user_id")
    dedup = keyed.dropDuplicates(["w", "user_id"])
    partial = dedup.groupBy(
        "w", F.pmod("user_id", F.lit(_N_USER_SHARDS)).alias("shard")
    ).agg(F.count(F.lit(1)).alias("n"))
    out = run_available_now(
        partial.select(F.col("w.start").alias("window_start"), "shard", "n"),
        f"stream_sharded_distinct_{next(_sink_counter)}",
        output_mode="complete",
        shuffle_partitions=state_partitions,
    )
    return out.groupBy("window_start").agg(
        F.sum("n").cast("long").alias("n_users")
    )


# --------------------------------------------------------------------------
# Streaming deterministic HLL: per-hour distinct-user ESTIMATES with
# 256-counter state per window — the sketch alternative to the exact
# pipelines above, whose state is the full distinct (window, user) key
# set (28 s / multi-GB state at the sf10 rehearsal).  HLL registers are
# max-mergeable, so the streaming aggregation is just MAX(rho) per
# (window, bucket): micro-batch order cannot change a max, making the
# streamed estimate BIT-IDENTICAL to the batch HLL — the oracle below is
# the batch computation, and the driver hash-compares the estimates.
# --------------------------------------------------------------------------
from .sketches import _HLL_ALPHA_SQL, _HLL_M, _qln_sql  # noqa: E402
from .text import _md5_uint_sql  # noqa: E402


@register(
    "stream_hll_distinct_users",
    f"""
    WITH rows_ AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
             CAST({_md5_uint_sql("CAST(user_id AS VARCHAR)", 15)} AS BIGINT) AS h
      FROM events
    ),
    regs AS (
      SELECT window_start, h % {_HLL_M} AS bucket,
             MAX(CASE WHEN h // {_HLL_M} = 0 THEN 53
                      ELSE 53 - length(bin(h // {_HLL_M})) END) AS m_raw
      FROM rows_ GROUP BY 1, 2
    ),
    agg AS (
      -- absent buckets (m=0) are folded in arithmetically: each adds
      -- 2^53 to the harmonic sum and 1 to the zero-register count —
      -- no 256-row spine join needed
      SELECT window_start,
             CAST(SUM(CAST(1 AS BIGINT) << (53 - m_raw))
                  + ({_HLL_M} - COUNT(*)) * (CAST(1 AS BIGINT) << 53)
                  AS BIGINT) AS s,
             CAST({_HLL_M} - COUNT(*) AS BIGINT) AS v
      FROM regs GROUP BY window_start
    ),
    est AS (
      SELECT window_start,
             CASE WHEN raw <= 2.5 * {_HLL_M} AND v > 0
                  THEN {_HLL_M}.0 * {_qln_sql(f"{_HLL_M}.0 / CAST(v AS DOUBLE)")}
                  ELSE raw END AS e
      FROM (SELECT window_start, v,
                   {_HLL_ALPHA_SQL} * {_HLL_M}.0 * {_HLL_M}.0
                     * 9007199254740992.0 / CAST(s AS DOUBLE) AS raw
            FROM agg)
    )
    SELECT window_start, {{pround}} AS n_hll FROM est
    """.replace("{pround}", "(CAST(floor(e * 10000.0 + 0.5) AS DOUBLE) / 10000.0)"),
)
def stream_hll_distinct_users(spark, sf_dir):
    """Per-hour distinct-user HLL estimates computed BY A STREAMING JOB
    (max-merged registers, 256-counter state per window); oracle = the
    identical batch HLL — the estimates hash-match because max-merge is
    order-insensitive and every downstream step is integer-exact."""
    stream = _events_stream(spark, sf_dir).withWatermark("ts", "2 hours")
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    keyed = stream.select(
        F.window("ts", "1 hour").alias("w"),
        (h % _HLL_M).alias("bucket"),
        h.alias("h"),
    ).select(
        "w",
        "bucket",
        F.when(F.expr(f"h DIV {_HLL_M}") == 0, 53)
        .otherwise(53 - F.length(F.bin(F.expr(f"h DIV {_HLL_M}"))))
        .alias("rho"),
    )
    regs = keyed.groupBy("w", "bucket").agg(F.max("rho").alias("m_raw"))
    out = run_available_now(
        regs.select(F.col("w.start").alias("window_start"), "bucket", "m_raw"),
        f"stream_hll_{next(_sink_counter)}",
        output_mode="complete",
        shuffle_partitions=_state_parts(sf_dir),
    )
    # Absent buckets (register 0) folded in arithmetically — no spine
    # join (which would also self-join the memory-sink relation).
    agg = out.groupBy("window_start").agg(
        (
            F.sum(F.expr("CAST(1 AS BIGINT) << (53 - m_raw)"))
            + (F.lit(_HLL_M) - F.count("*")) * F.lit(1 << 53)
        )
        .cast("long")
        .alias("s"),
        (F.lit(_HLL_M) - F.count("*")).cast("long").alias("v"),
    )
    alpha = 0.7213 / (1.0 + 1.079 / 256.0)
    raw = (
        F.lit(alpha)
        * F.lit(float(_HLL_M))
        * F.lit(float(_HLL_M))
        * F.lit(9007199254740992.0)
        / F.col("s").cast("double")
    )
    qln = lambda c: F.floor(F.log(c) * 1_000_000_000 + F.lit(0.5)).cast("double") / 1_000_000_000  # noqa: E731
    est = agg.select(
        "window_start",
        F.when(
            (raw <= 2.5 * _HLL_M) & (F.col("v") > 0),
            F.lit(float(_HLL_M)) * qln(F.lit(float(_HLL_M)) / F.col("v").cast("double")),
        )
        .otherwise(raw)
        .alias("e"),
    )
    return est.select(
        "window_start",
        (F.floor(F.col("e") * 10000.0 + F.lit(0.5)).cast("double") / 10000.0).alias(
            "n_hll"
        ),
    )


# --------------------------------------------------------------------------
# Streaming Count-Min heavy hitters: the CMS counters are SUM-mergeable,
# so a streaming complete-mode count over (r, bucket) — a FIXED 4096-row
# state regardless of stream length — reproduces the batch sketch
# bit-identically (addition is order-insensitive).  The exact top-k finish
# runs batch-side against the streamed sketch; oracle = the batch CMS.
# --------------------------------------------------------------------------
from .sketches import (  # noqa: E402
    _CMS_CELLS_EXPR,
    _CMS_D,
    _CMS_FINISH_SQL,
    _cms_hash_sql,
    cms_finish,
)


@register(
    "stream_cms_heavy_hitters",
    f"""
    WITH cells AS (
      SELECT r, {_cms_hash_sql('r')} AS bucket
      FROM events, LATERAL (SELECT unnest(generate_series(0, {_CMS_D - 1})) AS r) t
    ),
    sketch AS (
      SELECT r, bucket, CAST(COUNT(*) AS BIGINT) AS n FROM cells GROUP BY 1, 2
    ),
    {_CMS_FINISH_SQL}
    """,
)
def stream_cms_heavy_hitters(spark, sf_dir):
    """Count-Min sketch built BY A STREAMING JOB (sum-merged 4096-counter
    state — constant memory for any stream length) + batch exact top-k
    finish; estimates bit-identical to the batch CMS."""
    from ..sources.tables import load_table, spread

    stream = _events_stream(spark, sf_dir)
    cells = stream.select(F.posexplode(F.expr(_CMS_CELLS_EXPR)))
    sk = (
        cells.select(
            F.col("pos").cast("long").alias("r"), F.col("col").alias("bucket")
        )
        .groupBy("r", "bucket")
        .count()
    )
    out = run_available_now(
        sk.select("r", "bucket", F.col("count").cast("long").alias("n")),
        f"stream_cms_{next(_sink_counter)}",
        output_mode="complete",
        shuffle_partitions=_state_parts(sf_dir),
    )
    e = spread(load_table(spark, sf_dir, "events"))
    return cms_finish(e, out)


# --------------------------------------------------------------------------
# Streaming Bloom filter: bit_or is idempotent AND order-insensitive, so
# a streaming complete-mode aggregate over (word_idx -> bit_or(word)) —
# a FIXED <=2048-row state for any stream length — builds the identical
# filter the batch build produces; the oracle is that batch computation.
# Build keys: the thin deterministic slice of purchasing users
# (user_id % 97 = 0 — the membership set a runtime filter would ship);
# the batch-side audit probes EVERY event map-side via the one-row
# broadcast word map and reports per-type pass/member/FP/FN counts
# (FN provably 0).
# --------------------------------------------------------------------------
_SBF_M = 65536  # bits (8 KiB)
_SBF_K = 5
_SBF_WORD = 32

_SBF_POS_EXPR = (
    f"transform(sequence(0, {_SBF_K - 1}), i -> "
    f"CAST(conv(substr(md5(concat('sbf', CAST(i AS STRING), ':', key)), 1, 15), "
    f"16, 10) AS BIGINT) % {_SBF_M})"
)


def _sbf_pos_sql(i_expr: str) -> str:
    payload = f"'sbf' || CAST({i_expr} AS VARCHAR) || ':' || key"
    return f"({_md5_uint_sql(payload, 15)} % {_SBF_M})"


@register(
    "stream_bloom_purchaser_filter",
    f"""
    WITH members AS (
      SELECT DISTINCT CAST(user_id AS VARCHAR) AS key FROM events
      WHERE event_type = 'purchase' AND user_id % 97 = 0
    ),
    cells AS (
      SELECT {_sbf_pos_sql('i')} AS pos
      FROM members, LATERAL (SELECT unnest(generate_series(0, {_SBF_K - 1})) AS i) t
    ),
    words AS (
      SELECT pos // {_SBF_WORD} AS word_idx,
             CAST(bit_or(CAST(1 AS BIGINT) << CAST(pos % {_SBF_WORD} AS INT))
                  AS BIGINT) AS w
      FROM cells GROUP BY 1
    ),
    probes AS (
      SELECT event_type, CAST(user_id AS VARCHAR) AS key, {_sbf_pos_sql('i')} AS pos
      FROM events, LATERAL (SELECT unnest(generate_series(0, {_SBF_K - 1})) AS i) t
    ),
    hits AS (
      SELECT p.event_type, p.key, p.pos,
             COALESCE((w.w & (CAST(1 AS BIGINT)
                              << CAST(p.pos % {_SBF_WORD} AS INT))) <> 0,
                      FALSE) AS hit
      FROM probes p LEFT JOIN words w ON p.pos // {_SBF_WORD} = w.word_idx
    ),
    per_row AS (
      -- probes carries k rows per EVENT (not per distinct key); fold the k
      -- probe bits back to one row per event via a synthetic row id — the
      -- (event_type, key) pair is NOT unique per event, so re-group on the
      -- full per-event probe multiset instead: k consecutive rows share
      -- (event_type, key, pos-set); bool_and over each event's k rows ==
      -- bool_and over any k rows with the same (event_type, key), because
      -- the pos set is a pure function of key.
      SELECT event_type, key, bool_and(hit) AS pass, COUNT(*) // {_SBF_K} AS n_ev
      FROM hits GROUP BY event_type, key
    ),
    flagged AS (
      SELECT event_type, n_ev, pass,
             key IN (SELECT key FROM members) AS is_member
      FROM per_row
    )
    SELECT event_type,
           CAST(SUM(n_ev) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN pass THEN n_ev ELSE 0 END) AS BIGINT) AS n_pass,
           CAST(SUM(CASE WHEN is_member THEN n_ev ELSE 0 END) AS BIGINT) AS n_member,
           CAST(SUM(CASE WHEN pass AND NOT is_member THEN n_ev ELSE 0 END)
                AS BIGINT) AS n_false_pos,
           CAST(SUM(CASE WHEN is_member AND NOT pass THEN n_ev ELSE 0 END)
                AS BIGINT) AS n_false_neg
    FROM flagged GROUP BY event_type
    """,
)
def stream_bloom_purchaser_filter(spark, sf_dir):
    """Bloom filter over the thin purchasing-user slice built BY A
    STREAMING JOB (bit_or-merged 2048-word state — constant memory for
    any stream length), then a batch map-side probe of every event with
    per-type pass/member/FP/FN audit counts; filter bit-identical to the
    batch build because bit_or is order-insensitive."""
    from ..sources.tables import load_table, spread

    stream = _events_stream(spark, sf_dir).filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") % 97 == 0)
    )
    cells = stream.select(F.col("user_id").cast("string").alias("key")).select(
        F.explode(F.expr(_SBF_POS_EXPR)).alias("pos")
    )
    words = cells.groupBy(
        F.expr(f"pos DIV {_SBF_WORD}").alias("word_idx")
    ).agg(
        F.bit_or(
            F.expr(f"CAST(1 AS BIGINT) << CAST(pos % {_SBF_WORD} AS INT)")
        ).alias("w")
    )
    out = run_available_now(
        words,
        f"stream_sbf_{next(_sink_counter)}",
        output_mode="complete",
        shuffle_partitions=_state_parts(sf_dir),
    )
    packed = out.agg(
        F.map_from_entries(F.collect_list(F.struct("word_idx", "w"))).alias("bf")
    )
    e = spread(load_table(spark, sf_dir, "events")).select(
        "event_type", F.col("user_id").cast("string").alias("key")
    )
    pass_expr = F.expr(
        f"aggregate({_SBF_POS_EXPR}, true, (acc, p) -> acc AND "
        f"(coalesce(element_at(bf, p DIV {_SBF_WORD}), CAST(0 AS BIGINT)) "
        f"& (CAST(1 AS BIGINT) << CAST(p % {_SBF_WORD} AS INT))) != 0)"
    )
    probed = (
        e.crossJoin(F.broadcast(packed))
        .select("event_type", "key", pass_expr.alias("pass"))
        .groupBy("event_type", "key", "pass")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ev"))
    )
    members = (
        spread(load_table(spark, sf_dir, "events"))
        .filter((F.col("event_type") == "purchase") & (F.col("user_id") % 97 == 0))
        .select(F.col("user_id").cast("string").alias("key"))
        .distinct()
        .withColumn("is_member", F.lit(True))
    )
    flagged = probed.join(F.broadcast(members), "key", "left").select(
        "event_type",
        "n_ev",
        "pass",
        F.coalesce("is_member", F.lit(False)).alias("is_member"),
    )
    return flagged.groupBy("event_type").agg(
        F.sum("n_ev").cast("long").alias("n_events"),
        F.sum(F.when(F.col("pass"), F.col("n_ev")).otherwise(0))
        .cast("long")
        .alias("n_pass"),
        F.sum(F.when(F.col("is_member"), F.col("n_ev")).otherwise(0))
        .cast("long")
        .alias("n_member"),
        F.sum(F.when(F.col("pass") & ~F.col("is_member"), F.col("n_ev")).otherwise(0))
        .cast("long")
        .alias("n_false_pos"),
        F.sum(F.when(F.col("is_member") & ~F.col("pass"), F.col("n_ev")).otherwise(0))
        .cast("long")
        .alias("n_false_neg"),
    )


# --------------------------------------------------------------------------
# Streaming session conversion — the streaming twin of
# session_conversion_daily (queries/analytics.py): native session windows
# (gap-merged, watermark-evicted state) carry the purchase flag and the
# last event time; the daily conversion rollup runs batch-side over the
# drained per-session relation.  The oracle is the BATCH gaps-and-islands
# SQL verbatim — session_window's merge semantics are the same 30-minute
# inactivity gap, session start = first event, and duration uses
# max(ts) - window.start (NOT window.end, which pads the gap), so the
# streamed result hash-matches the batch endpoint.  Boundary convention
# (pinned by tests/test_streaming.py::test_session_window_exact_gap_
# boundary, round-8 ADVICE item): session_window MERGES two events
# exactly 30 minutes apart and splits at 30 min + 1 us — identical to
# the batch SQL's strict `gap > 30 min` new-session predicate, so the
# equivalence holds at the exact-gap boundary too.
# --------------------------------------------------------------------------
_SC_GAP_US = 30 * 60 * 1_000_000
_SC_DAY_US = 86_400_000_000


@register(
    "stream_session_conversion_daily",
    f"""
    WITH e AS (
      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
      FROM events
    ),
    marked AS (
      SELECT user_id, ts_us, is_p,
             CASE WHEN LAG(ts_us) OVER w IS NULL
                    OR ts_us - LAG(ts_us) OVER w > {_SC_GAP_US}
                  THEN 1 ELSE 0 END AS is_start
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
    ),
    sess AS (
      SELECT user_id, ts_us, is_p,
             SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts_us
                                 ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM marked
    ),
    sessions AS (
      SELECT MIN(ts_us) // {_SC_DAY_US} AS d,
             MAX(is_p) AS converted
      FROM sess GROUP BY user_id, session_idx
    )
    SELECT strftime(DATE '1970-01-01' + CAST(d AS INT), '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(converted) AS BIGINT) AS n_converted,
           CAST((SUM(converted) * 1000000) // COUNT(*) AS BIGINT)
             AS conv_rate_micro
    FROM sessions GROUP BY d
    """,
)
def stream_session_conversion_daily(spark, sf_dir):
    """Daily session-conversion rates where the sessions are built BY A
    STREAMING JOB (session_window state, watermark-evicted); the batch
    rollup runs over the drained per-session relation and hash-matches
    the batch sessionizer's endpoint."""
    stream = _events_stream(spark, sf_dir)
    src = stream.select(
        "user_id",
        "ts",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_p"),
    ).withWatermark("ts", "2 hours")
    # State-partition sizing via the shuffle-partition pin (round-8 ADVICE
    # fix — the repartition previously here was inert; see
    # stream_sharded_distinct_users).  Floor 32 = the session default the
    # bench budget was measured with.
    state_partitions = _state_parts(sf_dir)
    sess = (
        src.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.max("is_p").alias("converted"))
        .select(F.col("sw.start").alias("start_ts"), "converted")
    )
    out = run_available_now(
        sess,
        f"stream_sconv_{next(_sink_counter)}",
        output_mode="complete",
        shuffle_partitions=state_partitions,
    )
    sessions = out.select(
        F.expr(f"unix_micros(start_ts) DIV {_SC_DAY_US}").alias("d"), "converted"
    )
    return sessions.groupBy("d").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("converted").cast("long").alias("n_converted"),
        F.expr("CAST((SUM(converted) * 1000000) DIV COUNT(*) AS BIGINT)").alias(
            "conv_rate_micro"
        ),
    ).select(
        F.date_format(
            F.expr("date_add(DATE '1970-01-01', CAST(d AS INT))"), "yyyy-MM-dd"
        ).alias("day"),
        "n_sessions",
        "n_converted",
        "conv_rate_micro",
    )
