"""Aggregation / reduction coverage (SURVEY.md §2.5-2.6).

Reference parity: the ApplyConcatApply machinery
(``/root/reference/dask_expr/_reductions.py:353-475``) maps to Spark's
partial/final HashAggregate — expressed here purely via ``groupBy().agg``.
Welford var/std (``_reductions.py:900-963``) is replaced by an explicit
sum-of-squares decimal formula so the DuckDB oracle matches bit-for-bit
(decimal sums are order-independent; see functions/exact.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.exact import davg, davg_expr, dec_to_double, dsum, dsum_expr
from ..sources.tables import load_table
from .registry import register


# --------------------------------------------------------------------------
# Global (full-column) reductions: Sum/Min/Max/Count/Mean/NUnique
# (reference _reductions.py:734-991).
# --------------------------------------------------------------------------
@register(
    "agg_global_stats",
    f"""
    SELECT {dsum_expr('l_quantity')} AS total_qty,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT l_orderkey) AS n_orders,
           {davg_expr('l_discount')} AS avg_disc
    FROM lineitem
    """,
)
def agg_global_stats(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    return l.agg(
        dsum("l_quantity", "total_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        davg("l_discount", "avg_disc"),
    )


# --------------------------------------------------------------------------
# Var/Std via order-independent decimal sums (reference Welford/Chan merge,
# _reductions.py:900-963).  var = (sum_sq - sum^2/n) / (n - ddof); all three
# inputs are exact decimals → identical doubles on both engines.
# --------------------------------------------------------------------------
# Per-row doubles are quantized to integer cents (portable floor) before
# summation: integer→decimal casts are exact in BOTH engines, whereas
# double→decimal casts are not (Spark converts the shortest repr, DuckDB the
# exact binary value — they diverge on product terms).  Variance is then
# cents-exact, rescaled by 100^2.
from ..functions.exact import dec2dbl_expr as _d2d  # noqa: E402

_VAR_SQL = f"""
    WITH s AS (
      SELECT o_orderpriority,
             {_d2d('SUM(CAST(q AS DECIMAL(38,0)))', 0)} AS sm,
             {_d2d('SUM(CAST(q * q AS DECIMAL(38,0)))', 0)} AS sq,
             CAST(COUNT(*) AS DOUBLE) AS n
      FROM (SELECT o_orderpriority,
                   CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS q
            FROM orders) t
      GROUP BY o_orderpriority
    )
    SELECT o_orderpriority,
           (sq - sm * sm / n) / (n - 1) / 10000.0 AS var_price,
           SQRT((sq - sm * sm / n) / (n - 1) / 10000.0) AS std_price
    FROM s
"""


@register("agg_var_std", _VAR_SQL)
def agg_var_std(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    q = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("bigint")
    s = (
        o.select("o_orderpriority", q.alias("q"))
        .groupBy("o_orderpriority")
        .agg(
            dec_to_double(F.sum(F.col("q").cast("decimal(38,0)")), 0).alias("sm"),
            dec_to_double(
                F.sum((F.col("q") * F.col("q")).cast("decimal(38,0)")), 0
            ).alias("sq"),
            F.count(F.lit(1)).cast("double").alias("n"),
        )
    )
    var = (F.col("sq") - F.col("sm") * F.col("sm") / F.col("n")) / (F.col("n") - 1) / 10000.0
    return s.select(
        "o_orderpriority",
        var.alias("var_price"),
        F.sqrt(var).alias("std_price"),
    )


# --------------------------------------------------------------------------
# value_counts (reference _reductions.py:1122-1159): group-count + ordering.
# --------------------------------------------------------------------------
@register(
    "value_counts_event_type",
    """
    SELECT event_type, COUNT(*) AS count,
           CAST(COUNT(*) AS DOUBLE) / CAST((SELECT COUNT(*) FROM events) AS DOUBLE)
             AS proportion
    FROM events GROUP BY event_type
    """,
)
def value_counts_event_type(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    total = e.count()  # scalar action, same as reference's normalize divisor
    return (
        e.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("count"))
        .withColumn(
            "proportion", F.col("count").cast("double") / F.lit(float(total))
        )
    )


# --------------------------------------------------------------------------
# mode (reference _reductions.py:994-1025): pandas keeps EVERY tied mode.
# Per-type counts are capped at 200 via row_number so a genuine multi-way
# tie exists at every SF (3-way at sf0.001, 5-way at sf0.01) — this
# exercises the multi-value path, not just a degenerate single winner.
# --------------------------------------------------------------------------
@register(
    "mode_event_type",
    """
    WITH capped AS (
      SELECT event_type FROM (
        SELECT event_type,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY event_id)
                 AS rn
        FROM events) t
      WHERE rn <= 200
    ), c AS (
      SELECT event_type, COUNT(*) AS c FROM capped GROUP BY event_type
    )
    SELECT event_type AS mode_value FROM c
    WHERE c = (SELECT MAX(c) FROM c)
    ORDER BY mode_value
    """,
)
def mode_event_type(spark, sf_dir):
    from pyspark.sql import Window as W

    from ..operators.frame import SparkFrame

    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("event_id")
    capped = (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 200)
        .select("event_type")
    )
    modes = SparkFrame(capped)["event_type"].mode()  # all tied modes, asc
    return spark.createDataFrame(
        [(m,) for m in modes], "mode_value string"
    )


# --------------------------------------------------------------------------
# idxmax (reference IdxMax _reductions.py:817-839 → max_by with tie-break).
# --------------------------------------------------------------------------
@register(
    "idxmax_order_per_priority",
    """
    SELECT o_orderpriority,
           MAX(o_totalprice) AS max_price,
           MIN(o_orderkey) FILTER (
             WHERE o_totalprice = mp) AS max_orderkey
    FROM (SELECT *, MAX(o_totalprice) OVER (PARTITION BY o_orderpriority) AS mp
          FROM orders) t
    GROUP BY o_orderpriority
    """,
)
def idxmax_order_per_priority(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderpriority")
    return (
        o.withColumn("mp", F.max("o_totalprice").over(w))
        .groupBy("o_orderpriority")
        .agg(
            F.max("o_totalprice").alias("max_price"),
            F.min(F.when(F.col("o_totalprice") == F.col("mp"), F.col("o_orderkey"))).alias(
                "max_orderkey"
            ),
        )
    )


# --------------------------------------------------------------------------
# Exact quantiles (reference SeriesQuantile _quantile.py:14-133).  l_quantity
# holds integer-valued doubles → linear interpolation is exact on both
# engines (Spark `percentile` ≡ DuckDB `quantile_cont`).
# --------------------------------------------------------------------------
@register(
    "quantile_quantity",
    """
    SELECT quantile_cont(l_quantity, 0.25) AS q25,
           quantile_cont(l_quantity, 0.5) AS q50,
           quantile_cont(l_quantity, 0.75) AS q75,
           quantile_cont(l_quantity, 0.9) AS q90
    FROM lineitem
    """,
)
def quantile_quantity(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    return l.agg(
        F.expr("percentile(l_quantity, 0.25)").alias("q25"),
        F.expr("percentile(l_quantity, 0.5)").alias("q50"),
        F.expr("percentile(l_quantity, 0.75)").alias("q75"),
        F.expr("percentile(l_quantity, 0.9)").alias("q90"),
    )


# --------------------------------------------------------------------------
# distinct / drop_duplicates (reference Unique/DropDuplicates
# _reductions.py:478-553) with a deterministic keep-min rule.
# --------------------------------------------------------------------------
@register(
    "distinct_segments",
    "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def distinct_segments(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_mktsegment", "c_nationkey").distinct()


@register(
    "drop_duplicates_keep_min",
    """
    SELECT c_mktsegment, MIN(c_custkey) AS first_custkey
    FROM customer GROUP BY c_mktsegment
    """,
)
def drop_duplicates_keep_min(spark, sf_dir):
    # dropDuplicates keeps an arbitrary row; the deterministic (and
    # cluster-safe) form is min-by-key per group.
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(F.min("c_custkey").alias("first_custkey"))


# --------------------------------------------------------------------------
# pivot_table (reference PivotTable _reductions.py:556-659).
# --------------------------------------------------------------------------
@register(
    "pivot_returnflag_status",
    f"""
    SELECT l_returnflag,
           {dsum_expr("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS F,
           {dsum_expr("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS O
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_returnflag_status(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(30,8)")).cast("double"))
    )


# --------------------------------------------------------------------------
# groupby multi-agg with dict-style spec (reference GroupbyAggregation
# _groupby.py:242-376).
# --------------------------------------------------------------------------
@register(
    "groupby_multi_agg",
    f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           {dsum_expr('o_totalprice')} AS sum_price,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price,
           {davg_expr('o_totalprice')} AS avg_price,
           COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    """,
)
def groupby_multi_agg(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "sum_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        davg("o_totalprice", "avg_price"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


# --------------------------------------------------------------------------
# grouping sets / rollup — absent in the reference (SURVEY.md §2.6 note),
# free in Spark; included as a first-class extension.
# --------------------------------------------------------------------------
@register(
    "rollup_status_priority",
    """
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_status_priority(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
        )
    )


# --------------------------------------------------------------------------
# groupby median (reference GroupByMedian _groupby.py:781-828 — forced
# shuffle + exact per-group median).  Spark: exact `percentile` per group.
# --------------------------------------------------------------------------
@register(
    "groupby_median_quantity",
    """
    SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS median_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def groupby_median_quantity(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty")
    )


# --------------------------------------------------------------------------
# groupby cov/corr (reference _groupby.py:428-455).  Deterministic via the
# same decimal-sum formula: cov = (sum_xy - sum_x*sum_y/n) / (n-1);
# corr = cov / (std_x * std_y).
# --------------------------------------------------------------------------
# Same integer-quantization scheme as agg_var_std: quantity is
# integer-valued (×1), price is quantized to cents (×100); cov rescales by
# 100, corr is scale-invariant.
_COVCORR_SQL = f"""
    WITH s AS (
      SELECT l_returnflag,
             {_d2d('SUM(CAST(qx AS DECIMAL(38,0)))', 0)} AS sx,
             {_d2d('SUM(CAST(qy AS DECIMAL(38,0)))', 0)} AS sy,
             {_d2d('SUM(CAST(qx * qy AS DECIMAL(38,0)))', 0)} AS sxy,
             {_d2d('SUM(CAST(qx * qx AS DECIMAL(38,0)))', 0)} AS sxx,
             {_d2d('SUM(CAST(qy * qy AS DECIMAL(38,0)))', 0)} AS syy,
             CAST(COUNT(*) AS DOUBLE) AS n
      FROM (SELECT l_returnflag,
                   CAST(floor(l_quantity + 0.5) AS BIGINT) AS qx,
                   CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS qy
            FROM lineitem) t
      GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           (sxy - sx * sy / n) / (n - 1) / 100.0 AS cov_qty_price,
           (sxy - sx * sy / n)
                 / SQRT((sxx - sx * sx / n) * (syy - sy * sy / n)) AS corr_qty_price
    FROM s
"""


@register("groupby_cov_corr", _COVCORR_SQL)
def groupby_cov_corr(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    qx = F.floor(F.col("l_quantity") + 0.5).cast("bigint")
    qy = F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("bigint")
    base = l.select("l_returnflag", qx.alias("qx"), qy.alias("qy"))
    x, y = F.col("qx"), F.col("qy")
    s = base.groupBy("l_returnflag").agg(
        dec_to_double(F.sum(x.cast("decimal(38,0)")), 0).alias("sx"),
        dec_to_double(F.sum(y.cast("decimal(38,0)")), 0).alias("sy"),
        dec_to_double(F.sum((x * y).cast("decimal(38,0)")), 0).alias("sxy"),
        dec_to_double(F.sum((x * x).cast("decimal(38,0)")), 0).alias("sxx"),
        dec_to_double(F.sum((y * y).cast("decimal(38,0)")), 0).alias("syy"),
        F.count(F.lit(1)).cast("double").alias("n"),
    )
    cov = (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")) / (F.col("n") - 1) / 100.0
    corr = (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")) / F.sqrt(
        (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n"))
        * (F.col("syy") - F.col("sy") * F.col("sy") / F.col("n"))
    )
    return s.select(
        "l_returnflag",
        cov.alias("cov_qty_price"),
        corr.alias("corr_qty_price"),
    )
