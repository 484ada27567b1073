"""Ordered / window operator coverage (SURVEY.md §2.10).

The reference implements all ordered ops via ``MapOverlap`` boundary
exchange (``/root/reference/dask_expr/_expr.py:595-794``) and a serial
cumulative carry chain (``_cumulative.py:64-96``).  Spark's Window functions
are the native, shuffle-once equivalent: hash-shuffle by partition key, sort
within partitions, stream the frame — no Python, no boundary tasks.

Determinism: every window is ordered by a unique key (event_id), and all
float accumulations go through exact decimal sums (functions/exact.py), so
the DuckDB oracle matches bit-for-bit.

Cumulatives over a *global* order (reference semantics) are intentionally a
single-partition window — same serial bottleneck as the reference's carry
chain; for scale we demonstrate the partitioned form (per-user) which is the
100 TB-safe pattern.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register

_DEC = "decimal(30,8)"


# --------------------------------------------------------------------------
# Cumulative sum / count per user (reference CumSum _cumulative.py:9-116).
# --------------------------------------------------------------------------
@register(
    "cumsum_user_value",
    """
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(30,8))) OVER w AS DOUBLE) AS cum_value,
           CAST(COUNT(*) OVER w AS BIGINT) AS cum_n
    FROM events
    WHERE user_id < 50
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def cumsum_user_value(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = W.partitionBy("user_id").orderBy("event_id").rowsBetween(W.unboundedPreceding, 0)
    return e.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast(_DEC)).over(w).cast("double").alias("cum_value"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("cum_n"),
    )


# --------------------------------------------------------------------------
# shift / diff (reference Shift _expr.py:2255-2295, Diff _expr.py:2175-2204).
# --------------------------------------------------------------------------
@register(
    "shift_diff_events",
    """
    SELECT event_id, user_id,
           LAG(value, 1) OVER w AS prev_value,
           value - LAG(value, 1) OVER w AS diff_value,
           LEAD(event_type, 1) OVER w AS next_type
    FROM events
    WHERE user_id < 50
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    """,
)
def shift_diff_events(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = W.partitionBy("user_id").orderBy("event_id")
    return e.select(
        "event_id",
        "user_id",
        F.lag("value", 1).over(w).alias("prev_value"),
        (F.col("value") - F.lag("value", 1).over(w)).alias("diff_value"),
        F.lead("event_type", 1).over(w).alias("next_type"),
    )


# --------------------------------------------------------------------------
# ffill (reference FFill _expr.py:2207-2252): last non-null carried forward,
# plus the limit= form (bounded fill distance, round-3 parity close).
# Nulls are manufactured deterministically ('click' rows lose their value).
# --------------------------------------------------------------------------
@register(
    "ffill_user_value",
    """
    SELECT event_id, user_id,
           LAST_VALUE(CASE WHEN event_type = 'click' THEN NULL ELSE value END
                      IGNORE NULLS) OVER w AS filled_value,
           LAST_VALUE(CASE WHEN event_type = 'click' THEN NULL ELSE value END
                      IGNORE NULLS) OVER w2 AS filled_value_limit2
    FROM events
    WHERE user_id < 50
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           w2 AS (PARTITION BY user_id ORDER BY event_id
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
)
def ffill_user_value(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = W.partitionBy("user_id").orderBy("event_id").rowsBetween(W.unboundedPreceding, 0)
    w2 = W.partitionBy("user_id").orderBy("event_id").rowsBetween(-2, 0)
    gapped = F.when(F.col("event_type") == "click", F.lit(None)).otherwise(F.col("value"))
    return e.select(
        "event_id",
        "user_id",
        F.last(gapped, ignorenulls=True).over(w).alias("filled_value"),
        F.last(gapped, ignorenulls=True).over(w2).alias("filled_value_limit2"),
    )


# --------------------------------------------------------------------------
# Integer-window rolling mean/min/max (reference Rolling _rolling.py:38-323,
# window=7 rows).
# --------------------------------------------------------------------------
@register(
    "rolling_mean_7",
    """
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(30,8))) OVER w AS DOUBLE)
             / CAST(COUNT(value) OVER w AS DOUBLE) AS roll_mean,
           MIN(value) OVER w AS roll_min,
           MAX(value) OVER w AS roll_max
    FROM events
    WHERE user_id < 50
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def rolling_mean_7(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = W.partitionBy("user_id").orderBy("event_id").rowsBetween(-6, 0)
    return e.select(
        "event_id",
        "user_id",
        (
            F.sum(F.col("value").cast(_DEC)).over(w).cast("double")
            / F.count("value").over(w).cast("double")
        ).alias("roll_mean"),
        F.min("value").over(w).alias("roll_min"),
        F.max("value").over(w).alias("roll_max"),
    )


# --------------------------------------------------------------------------
# Time-based rolling (reference time-window Rolling _rolling.py:20-35):
# 5-minute trailing sum per user, RANGE frame over epoch-microseconds.
# --------------------------------------------------------------------------
@register(
    "rolling_time_5min",
    """
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(30,8))) OVER w AS DOUBLE) AS roll_sum_5min,
           COUNT(*) OVER w AS roll_n_5min
    FROM (SELECT *, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events) t
    WHERE user_id < 50
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
                 RANGE BETWEEN 300000000 PRECEDING AND CURRENT ROW)
    """,
)
def rolling_time_5min(spark, sf_dir):
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 50)
        .withColumn("ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
    )
    w = W.partitionBy("user_id").orderBy("ts_us").rangeBetween(-300_000_000, 0)
    return e.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast(_DEC)).over(w).cast("double").alias("roll_sum_5min"),
        F.count(F.lit(1)).over(w).alias("roll_n_5min"),
    )


# --------------------------------------------------------------------------
# Ranking windows — absent in the reference (SURVEY.md §2.10 note), free in
# Spark: row_number / rank / dense_rank / ntile.
# --------------------------------------------------------------------------
@register(
    "rank_orders_in_customer",
    """
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER w AS rnk,
           NTILE(4) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS quartile
    FROM orders
    WHERE o_custkey < 100
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def rank_orders_in_customer(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 100)
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    wq = W.partitionBy("o_custkey").orderBy("o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.ntile(4).over(wq).alias("quartile"),
    )


# --------------------------------------------------------------------------
# groupby head (reference GroupByHead _groupby.py:622-633): first 2 orders
# per customer by date, deterministic tie-break on orderkey.
# --------------------------------------------------------------------------
@register(
    "groupby_head_first_orders",
    """
    SELECT o_custkey, o_orderkey,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ) t WHERE rn <= 2
    """,
)
def groupby_head_first_orders(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
    )


# --------------------------------------------------------------------------
# resample: time-bucket aggregation (reference Resample _resample.py:21-269)
# → groupBy(date_trunc) — the shuffle-once Spark form.
# --------------------------------------------------------------------------
@register(
    "resample_hourly_events",
    """
    SELECT STRFTIME(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S')
             AS bucket,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DOUBLE) AS sum_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1
    """,
)
def resample_hourly_events(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(_DEC)).cast("double").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


# --------------------------------------------------------------------------
# resample OHLC (reference ResampleOhlc _resample.py): first/max/min/last per
# bucket, order defined by (ts, event_id) — deterministic via min_by/max_by
# on a unique ordering key.
# --------------------------------------------------------------------------
@register(
    "resample_daily_ohlc",
    """
    SELECT STRFTIME(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS bucket,
           arg_min(value, event_id) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           arg_max(value, event_id) AS close
    FROM events
    GROUP BY 1
    """,
)
def resample_daily_ohlc(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("bucket"))
        .agg(
            F.min_by("value", "event_id").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", "event_id").alias("close"),
        )
    )
