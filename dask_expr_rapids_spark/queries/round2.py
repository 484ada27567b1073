"""Round-2 operator queries: centered rolling windows, resample
quantile/median, timedelta arithmetic, merge ``indicator`` + outer key
coalescing — driver-facing oracle coverage for the operators added after
round 1 (reference ``_rolling.py:120-122`` center, ``_resample.py:21-269``
quantile family, ``_expr.py:1090`` ToTimedelta, ``_merge.py`` indicator).

Determinism contract: decimal sums for float accumulations, exact
micros-resolution interval arithmetic, linear-interpolation percentiles
(identical IEEE arithmetic in Spark ``percentile`` and DuckDB
``quantile_cont``).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..operators.frame import SparkFrame
from ..sources.tables import load_table
from .registry import register

_DEC = "decimal(30,8)"


# --------------------------------------------------------------------------
# Centered rolling mean (reference Rolling center=True, _rolling.py:120-122):
# window 5 → 2 preceding + 2 following; emitted only for full windows
# (pandas min_periods=window default).
# --------------------------------------------------------------------------
@register(
    "rolling_center_mean_5",
    """
    SELECT event_id, user_id,
           CASE WHEN COUNT(value) OVER w = 5
                THEN CAST(SUM(CAST(value AS DECIMAL(30,8))) OVER w AS DOUBLE)
                     / 5.0
           END AS center_mean
    FROM events
    WHERE user_id < 50
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)
    """,
)
def rolling_center_mean_5(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = W.partitionBy("user_id").orderBy("event_id").rowsBetween(-2, 2)
    full = F.count("value").over(w) == 5
    return e.select(
        "event_id",
        "user_id",
        F.when(
            full,
            F.sum(F.col("value").cast(_DEC)).over(w).cast("double") / F.lit(5.0),
        ).alias("center_mean"),
    )


# --------------------------------------------------------------------------
# Resample quantile / median (reference ResampleQuantile/Median,
# _resample.py:21-269): daily buckets, linear-interpolation percentiles.
# --------------------------------------------------------------------------
@register(
    "resample_quantile_daily",
    """
    SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
           quantile_cont(value, 0.25) AS q25,
           quantile_cont(value, 0.5) AS med,
           COUNT(*) AS n
    FROM events
    GROUP BY 1
    """,
)
def resample_quantile_daily(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.expr("percentile(value, 0.25)").alias("q25"),
            F.expr("percentile(value, 0.5)").alias("med"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --------------------------------------------------------------------------
# Timedelta: per-user activity span = max(ts) - min(ts) as a
# DayTimeIntervalType, reduced to exact seconds via the total_seconds
# decomposition (reference ToTimedelta consumers, _expr.py:1090).
# --------------------------------------------------------------------------
@register(
    "timedelta_user_span",
    """
    SELECT user_id,
           (epoch_us(CAST(max(ts) AS TIMESTAMP))
            - epoch_us(CAST(min(ts) AS TIMESTAMP))) / 1000000.0 AS span_seconds,
           COUNT(*) AS n_events
    FROM events
    WHERE user_id < 100
    GROUP BY user_id
    """,
)
def timedelta_user_span(spark, sf_dir):
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    agg = e.groupBy("user_id").agg(
        (F.max("ts") - F.min("ts")).alias("span"),
        F.count(F.lit(1)).alias("n_events"),
    )
    part = lambda f: F.date_part(F.lit(f), F.col("span"))  # noqa: E731
    total = (
        ((part("DAY") * 24 + part("HOUR")) * 60 + part("MINUTE")) * 60
    ).cast("double") + part("SECOND").cast("double")
    return agg.select("user_id", total.alias("span_seconds"), "n_events")


# --------------------------------------------------------------------------
# Merge indicator + outer key coalesce (reference _merge.py indicator
# operand): customer ⟗ distinct order custkeys through the pandas facade —
# right-only rows must carry their (coalesced) key, and _merge labels
# provenance.
# --------------------------------------------------------------------------
@register(
    "merge_indicator_customer_orders",
    """
    WITH o AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders)
    SELECT CASE WHEN c.c_custkey IS NOT NULL AND o.c_custkey IS NOT NULL THEN 'both'
                WHEN c.c_custkey IS NOT NULL THEN 'left_only'
                ELSE 'right_only' END AS _merge,
           COUNT(*) AS n,
           COUNT(DISTINCT COALESCE(c.c_custkey, o.c_custkey)) AS n_keys
    FROM customer c FULL OUTER JOIN o ON c.c_custkey = o.c_custkey
    GROUP BY 1
    """,
)
def merge_indicator_customer_orders(spark, sf_dir):
    c = SparkFrame(load_table(spark, sf_dir, "customer").select("c_custkey", "c_name"))
    o = SparkFrame(
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    m = c.merge(o, on="c_custkey", how="outer", indicator=True)
    return (
        m.to_spark()
        .groupBy("_merge")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("c_custkey").alias("n_keys"),
        )
    )


# --------------------------------------------------------------------------
# Deterministic data-mix sampling (operators/sampling.py): hash-Bernoulli
# per-source rates and exact per-stratum take — the curation ops a
# training-data pipeline runs before tokenization.  Reproducible by
# construction: membership is md5(doc_id) arithmetic both engines share.
# --------------------------------------------------------------------------
_U8_SQL = (
    "("
    + " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), {i + 1}, 1)) - 1)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )
    + ") / 4294967296.0"
)


@register(
    "stratified_sample_documents",
    f"""
    WITH rated AS (
      SELECT doc_id, source,
             {_U8_SQL} AS u,
             CASE CAST(substr(source, 4) AS INT) % 4
                  WHEN 0 THEN 0.1 WHEN 1 THEN 0.25
                  WHEN 2 THEN 0.5 ELSE 0.75 END AS rate
      FROM documents
    )
    SELECT doc_id, source, u FROM rated WHERE u < rate
    """,
)
def stratified_sample_documents(spark, sf_dir):
    """Per-source Bernoulli rates (a data-mix spec) applied by
    deterministic md5 hashing — a pure filter, no shuffle, stable under
    any partitioning (``operators/sampling.py::hash_sample``)."""
    from ..operators.sampling import hash_uniform

    d = load_table(spark, sf_dir, "documents")
    digit = F.substring("source", 4, 10).cast("int") % 4
    rate = (
        F.when(digit == 0, 0.1)
        .when(digit == 1, 0.25)
        .when(digit == 2, 0.5)
        .otherwise(0.75)
    )
    u = hash_uniform(F.col("doc_id"))
    return (
        d.select("doc_id", "source", u.alias("u"), rate.alias("__rate__"))
        .filter(F.col("u") < F.col("__rate__"))
        .drop("__rate__")
    )


@register(
    "stratified_take_documents",
    """
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents
    ) WHERE rk <= 5
    """,
)
def stratified_take_documents(spark, sf_dir):
    """Exactly 5 docs per source by md5 rank — exact stratum sizes,
    unbiased within stratum, reproducible everywhere
    (``operators/sampling.py::stratified_take``)."""
    from ..operators.sampling import stratified_take

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return stratified_take(d, "source", k=5, key="doc_id")
