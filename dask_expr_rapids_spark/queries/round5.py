"""Round-5 operator queries: as-of join, unpivot, time-spine gap-fill,
histogram binning, and sorted list-aggregation.

The headline is :func:`asof_join_click_purchase` — the as-of join the
reference lacks entirely (no ``merge_asof`` anywhere in
``/root/reference/dask_expr/_collection.py``), implemented with the
single-shuffle union+window strategy in ``operators/asof.py`` and
oracle-checked against DuckDB's native ``ASOF LEFT JOIN``.

Determinism contract: timestamps cross the engine boundary as
microsecond-formatted strings (the established pattern from
``queries/window.py``); float sums go through DECIMAL(30,8); list-agg
output is sorted before concatenation.
"""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from ..operators.asof import merge_asof
from ..sources.tables import load_table
from .registry import register

_DEC = "decimal(30,8)"
_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"
_sink_counter = itertools.count()


# --------------------------------------------------------------------------
# As-of join: each click event picks up the same user's most recent
# at-or-before purchase.  Left rows with no prior purchase keep nulls
# (pandas merge_asof semantics = DuckDB ASOF LEFT JOIN).
# --------------------------------------------------------------------------
@register(
    "asof_join_click_purchase",
    f"""
    SELECT c.event_id,
           c.user_id,
           strftime(c.ts, '{_TS_FMT_DUCK}') AS click_ts,
           strftime(p.ts, '{_TS_FMT_DUCK}') AS purchase_ts,
           p.value AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def asof_join_click_purchase(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = e.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    joined = merge_asof(clicks, purchases, on="ts", by="user_id")
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", _TS_FMT_SPARK).alias("click_ts"),
        F.date_format("asof_ts", _TS_FMT_SPARK).alias("purchase_ts"),
        F.col("asof_value").alias("purchase_value"),
    )


# --------------------------------------------------------------------------
# Unpivot / melt (Spark-native df.unpivot — wide→long without Python):
# three lineitem amount columns become (metric, amount) rows.
# --------------------------------------------------------------------------
@register(
    "unpivot_lineitem_amounts",
    """
    SELECT l_orderkey, l_linenumber, 'l_extendedprice' AS metric,
           l_extendedprice AS amount
    FROM lineitem WHERE l_quantity > 45
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
    FROM lineitem WHERE l_quantity > 45
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
    FROM lineitem WHERE l_quantity > 45
    """,
)
def unpivot_lineitem_amounts(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return l.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_extendedprice", "l_discount", "l_tax"],
        "metric",
        "amount",
    )


# --------------------------------------------------------------------------
# Time-spine gap-fill: hourly event counts with EVERY hour present, empty
# hours zero-filled.  The spine is generated from a scalar min/max agg and
# exploded JVM-side (`sequence`) — no driver loop, no Python; at scale the
# spine is thousands of rows joined broadcast against the hourly agg.
# --------------------------------------------------------------------------
@register(
    "gapfill_hourly_event_counts",
    f"""
    WITH bounds AS (
        SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
        FROM events
    ),
    spine AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds
    ),
    hourly AS (
        SELECT date_trunc('hour', ts) AS hour,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1
    )
    SELECT strftime(s.hour, '{_TS_FMT_DUCK}') AS hour,
           COALESCE(h.n_events, 0) AS n_events,
           COALESCE(h.sum_value, 0.0) AS sum_value
    FROM spine s LEFT JOIN hourly h ON s.hour = h.hour
    """,
)
def gapfill_hourly_event_counts(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour")
    )
    hourly = e.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast(_DEC)).cast("double").alias("sum_value"),
    )
    return (
        spine.join(hourly, "hour", "left")
        .select(
            F.date_format("hour", _TS_FMT_SPARK).alias("hour"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
        )
    )


# --------------------------------------------------------------------------
# Histogram binning: fixed-width buckets over order totals — pure column
# arithmetic (floor-div), partial/final agg, no shuffle beyond the 25-ish
# bucket groupBy.  floor() (not cast) so negative values would bucket down.
# --------------------------------------------------------------------------
@register(
    "histogram_order_totals",
    """
    SELECT CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT) AS bucket,
           COUNT(*) AS n_orders,
           MIN(o_totalprice) AS lo,
           MAX(o_totalprice) AS hi
    FROM orders
    GROUP BY 1
    """,
)
def histogram_order_totals(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / F.lit(25000.0)).cast("bigint").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


# --------------------------------------------------------------------------
# Sorted list-aggregation (listagg / string_agg): nations per region as a
# deterministic comma-joined sorted list — collect_list is unordered by
# contract, so array_sort pins the result.
# --------------------------------------------------------------------------
@register(
    "listagg_nations_by_region",
    """
    SELECT r.r_name,
           string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
           COUNT(*) AS n_nations
    FROM region r JOIN nation n ON r.r_regionkey = n.n_regionkey
    GROUP BY r.r_name
    """,
)
def listagg_nations_by_region(spark, sf_dir):
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return (
        F.broadcast(r)
        .join(n, r["r_regionkey"] == n["n_regionkey"])
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


# --------------------------------------------------------------------------
# Semi-structured extraction: events.props is a JSON string column (the
# shape every log/clickstream pipeline carries).  from_json with an
# EXPLICIT schema keeps extraction JVM-side and lets Catalyst prune — at
# 100 TB, schema-on-read inference or a Python json.loads loop would both
# be disqualifying.  Registered past the 50-query driver window (local
# oracle covers it; rotate into the window next round).
# --------------------------------------------------------------------------
@register(
    "json_props_extract_agg",
    """
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def json_props_extract_agg(spark, sf_dir):
    from ..sources.tables import spread

    # JSON parsing is the CPU cost; a sub-core-count scan (events parquet
    # is one ~40 MB file at rehearsal scale) would serialize it — spread is
    # a no-op once the scan yields ≥cores splits
    e = spread(load_table(spark, sf_dir, "events"))
    k = F.from_json(F.col("props"), "k BIGINT")["k"]
    return (
        e.select((k % 10).alias("k_mod"), "user_id", "value")
        .groupBy("k_mod")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast(_DEC)).cast("double").alias("sum_value"),
        )
    )


# --------------------------------------------------------------------------
# Skew-mitigation operators (operators/skew.py), driver-verified: salting
# is semantics-preserving, so the oracle is the PLAIN join/groupBy SQL —
# the hash match proves the salted plan computes the identical result
# while spreading any hot key over N reducers.
# --------------------------------------------------------------------------
@register(
    "skew_salted_join_revenue",
    """
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE)
             AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def skew_salted_join_revenue(spark, sf_dir):
    from ..operators.skew import salted_join

    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(l, o, on="l_orderkey", buckets=8)
    rev = F.col("l_extendedprice").cast("decimal(18,4)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,4)")
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(rev).cast("double").alias("revenue"),
    )


# --------------------------------------------------------------------------
# Train/val/test split assignment — the canonical first step of a training
# pipeline.  Deterministic md5-uniform on doc_id (same arithmetic as
# operators/sampling.py::hash_uniform): stable under repartition, identical
# across engines, no RNG.  90/5/5.
# --------------------------------------------------------------------------
_U8_DOC_SQL = (
    "("
    + " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), {i + 1}, 1)) - 1)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )
    + ") / 4294967296.0"
)


@register(
    "dataset_split_assign",
    f"""
    WITH rated AS (SELECT doc_id, n_chars, {_U8_DOC_SQL} AS u FROM documents)
    SELECT CASE WHEN u < 0.90 THEN 'train'
                WHEN u < 0.95 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM rated
    GROUP BY 1
    """,
)
def dataset_split_assign(spark, sf_dir):
    from ..operators.sampling import hash_uniform

    d = load_table(spark, sf_dir, "documents")
    u = hash_uniform(F.col("doc_id"))
    split = (
        F.when(u < 0.90, "train").when(u < 0.95, "val").otherwise("test").alias("split")
    )
    return (
        d.select(split, "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


# --------------------------------------------------------------------------
# Benchmark decontamination: find training docs sharing any word-5-gram
# with the eval set (doc_id % 50 == 0 stands in for a benchmark suite).
# Scale shape: the eval gram set is benchmark-sized (MBs, not TBs) →
# DISTINCT then BROADCAST to the training-gram side, so the only shuffle
# is the final per-doc count agg — no O(train × eval) pair explosion.
# --------------------------------------------------------------------------
@register(
    "decontaminate_train_eval",
    r"""
    WITH toks AS (
      SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(ws) - 4),
                                   i -> array_to_string(ws[i:i+4], ' '))) AS gram
      FROM toks
      WHERE len(ws) >= 5
    ),
    ev AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 50 = 0),
    tr AS (SELECT DISTINCT doc_id, gram FROM grams WHERE doc_id % 50 <> 0)
    SELECT tr.doc_id, COUNT(*) AS n_shared_grams
    FROM tr JOIN ev ON tr.gram = ev.gram
    GROUP BY tr.doc_id
    """,
)
def decontaminate_train_eval(spark, sf_dir):
    from ..sources.tables import spread

    # CPU-bound explode downstream: spread a sub-core-count scan across
    # the machine (no-op at production scale where the scan has ≥cores
    # splits) — 2 partitions serialized the sf1 rehearsal onto 2/32 cores
    d = spread(load_table(spark, sf_dir, "documents"))
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    ws = F.split(norm, " ")
    grams_col = F.transform(
        F.sequence(F.lit(1), F.size(ws) - 4),
        lambda i: F.concat_ws(" ", F.slice(ws, i, F.lit(5))),
    )
    grams = (
        d.filter(F.size(ws) >= 5)
        .select("doc_id", F.explode(grams_col).alias("gram"))
    )
    ev = grams.filter(F.col("doc_id") % 50 == 0).select("gram").distinct()
    tr = grams.filter(F.col("doc_id") % 50 != 0)
    # broadcast-join BEFORE any dedup: contaminated grams are rare by
    # construction, so only the matches cross a shuffle.  (A distinct on
    # the full training gram stream first — the obvious formulation —
    # shuffles the whole exploded corpus: measured 36 s vs 3 s at sf1.)
    return (
        tr.join(F.broadcast(ev), "gram")
        .groupBy("doc_id")
        .agg(F.count_distinct(F.col("gram")).alias("n_shared_grams"))
    )


# --------------------------------------------------------------------------
# Range (interval) join via bucketing (operators/rangejoin.py): each user's
# first active hour is an interval; count the events inside it.  The
# bucketed equi-join replaces the nested-loop range join Spark would
# otherwise pick — O(points + intervals·width/bucket), never O(n·m).
# --------------------------------------------------------------------------
@register(
    "range_join_first_hour_events",
    """
    WITH b AS (SELECT user_id, MIN(ts) AS lo FROM events GROUP BY user_id)
    SELECT e.user_id,
           COUNT(*) AS n_first_hour,
           CAST(SUM(CAST(e.value AS DECIMAL(30,8))) AS DOUBLE) AS sum_value
    FROM events e
    JOIN b ON e.user_id = b.user_id
          AND e.ts >= b.lo AND e.ts <= b.lo + INTERVAL 1 HOUR
    GROUP BY e.user_id
    """,
)
def range_join_first_hour_events(spark, sf_dir):
    from ..operators.rangejoin import interval_join

    e = load_table(spark, sf_dir, "events")
    intervals = e.groupBy("user_id").agg(F.min("ts").alias("lo")).withColumn(
        "hi", F.col("lo") + F.expr("INTERVAL 1 HOUR")
    )
    joined = interval_join(
        e.select("user_id", "ts", "value"),
        intervals,
        point_ts="ts",
        lo="lo",
        hi="hi",
        bucket_seconds=3600,
        extra_keys=["user_id"],
    )
    return joined.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_first_hour"),
        F.sum(F.col("value").cast(_DEC)).cast("double").alias("sum_value"),
    )


# --------------------------------------------------------------------------
# Hypertable-style multi-grain rollup: aggregate ONCE at the fine grain,
# derive the coarse grain from the fine aggregate (not from raw data) —
# one scan of the fact table feeds every grain, the re-aggregation input
# is bucket-sized.  count/sum re-aggregate losslessly; decimal sums keep
# the coarse sum bit-exact with a direct daily aggregation.
# --------------------------------------------------------------------------
@register(
    "time_rollup_multigrain",
    f"""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS bucket,
               COUNT(*) AS n_events,
               SUM(CAST(value AS DECIMAL(30,8))) AS sum_dec
        FROM events GROUP BY 1
    )
    SELECT 'hour' AS grain, strftime(bucket, '{_TS_FMT_DUCK}') AS bucket,
           n_events, CAST(sum_dec AS DOUBLE) AS sum_value
    FROM hourly
    UNION ALL
    SELECT 'day', strftime(date_trunc('day', bucket), '{_TS_FMT_DUCK}'),
           CAST(SUM(n_events) AS BIGINT), CAST(SUM(sum_dec) AS DOUBLE)
    FROM hourly GROUP BY 2
    """,
)
def time_rollup_multigrain(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(F.date_trunc("hour", "ts").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast(_DEC)).alias("sum_dec"),
    )
    hour_out = hourly.select(
        F.lit("hour").alias("grain"),
        F.date_format("bucket", _TS_FMT_SPARK).alias("bucket"),
        "n_events",
        F.col("sum_dec").cast("double").alias("sum_value"),
    )
    day_out = (
        hourly.groupBy(F.date_trunc("day", "bucket").alias("b"))
        .agg(F.sum("n_events").alias("n_events"), F.sum("sum_dec").alias("sum_dec"))
        .select(
            F.lit("day").alias("grain"),
            F.date_format("b", _TS_FMT_SPARK).alias("bucket"),
            "n_events",
            F.col("sum_dec").cast("double").alias("sum_value"),
        )
    )
    return hour_out.unionByName(day_out)


# --------------------------------------------------------------------------
# Stream-stream join (streaming/ops.py::stream_join_within): click and
# purchase STREAMS joined on user within a 1-hour lookback, drained and
# compared to the batch inequality join.  The time bound is what lets the
# engine evict buffered rows once both watermarks pass — the difference
# between bounded state and an unbounded-memory join on an infinite
# stream.  Pair set is order-independent, so append-mode drain is exact.
# --------------------------------------------------------------------------
@register(
    "stream_join_click_purchase",
    """
    SELECT c.user_id,
           c.event_id AS l_event_id,
           p.event_id AS r_event_id
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts - INTERVAL 1 HOUR AND p.ts <= c.ts
    """,
)
def stream_join_click_purchase(spark, sf_dir):
    from ..streaming.ops import read_events_stream, run_available_now, stream_join_within

    stream = read_events_stream(spark, sf_dir, glob_filter="events.parquet")
    clicks = stream.filter(F.col("event_type") == "click").select("user_id", "ts", "event_id")
    purchases = stream.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    joined = stream_join_within(
        clicks, purchases, key="user_id", lookback="1 hour", watermark="36500 days"
    )
    sink = f"stream_join_cp_{next(_sink_counter)}"
    from .streaming import events_state_parts as _state_parts

    out = run_available_now(
        joined, sink, output_mode="append", shuffle_partitions=_state_parts(sf_dir)
    )
    return out.select(
        "user_id",
        F.col("l_event_id"),
        F.col("r_event_id"),
    )


@register(
    "skew_salted_groupby_users",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    """,
)
def skew_salted_groupby_users(spark, sf_dir):
    from ..operators.skew import salted_groupby_agg

    e = load_table(spark, sf_dir, "events")
    return salted_groupby_agg(
        e,
        ["event_type"],
        stage1={"n_events": F.count(F.lit(1)), "users": F.collect_set("user_id")},
        stage2={
            "n_events": F.sum("n_events"),
            "n_users": F.size(F.array_distinct(F.flatten(F.collect_list("users")))).cast(
                "bigint"
            ),
        },
        salt_cols=["event_id"],
        buckets=16,
    )
