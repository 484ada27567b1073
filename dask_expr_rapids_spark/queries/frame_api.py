"""Oracle-checked queries composed through the pandas-semantics facade
(``operators/frame.py``) rather than raw DataFrame calls — proving the
user-facing collection API (the reference's actual surface,
``/root/reference/dask_expr/_collection.py``) produces plans that
hash-match SQL.

Each builds a SparkFrame pipeline and returns ``.to_spark()`` with the
``__index__`` helper column dropped."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.frame import INDEX, SparkFrame
from ..sources.tables import load_table
from .registry import register


def _frame(spark, sf_dir, table: str, index: str | None = None) -> SparkFrame:
    sdf = load_table(spark, sf_dir, table)
    if index:
        sdf = sdf.withColumnRenamed(index, INDEX)
    return SparkFrame(sdf)


# --------------------------------------------------------------------------
# filter → assign → groupby.agg through the facade (reference E2 lifecycle,
# SURVEY.md §3).
# --------------------------------------------------------------------------
@register(
    "frame_api_groupby_pipeline",
    """
    SELECT o_orderstatus,
           ((CAST(floor(CAST((SUM(CAST(o_totalprice * 0.9 AS DECIMAL(30,8)))) * 100000000 AS DECIMAL(38,0)) / 4294967296) AS DOUBLE) * 4294967296.0 + CAST(CAST((SUM(CAST(o_totalprice * 0.9 AS DECIMAL(30,8)))) * 100000000 AS DECIMAL(38,0)) - floor(CAST((SUM(CAST(o_totalprice * 0.9 AS DECIMAL(30,8)))) * 100000000 AS DECIMAL(38,0)) / 4294967296) * 4294967296 AS DOUBLE)) / 100000000.0) AS disc_sum,
           CAST(COUNT(o_totalprice) AS BIGINT) AS n
    FROM orders
    WHERE o_totalprice > 50000
    GROUP BY o_orderstatus
    """,
)
def frame_api_groupby_pipeline(spark, sf_dir):
    f = _frame(spark, sf_dir, "orders", index="o_orderkey")
    f = f[f["o_totalprice"] > 50000]
    # exact-sum discipline through the facade: cast to fixed-point BEFORE
    # aggregating so the sum is shuffle-order independent (functions/exact.py)
    f = f.assign(disc=(f["o_totalprice"] * 0.9).astype("decimal(30,8)"))
    out = f.groupby("o_orderstatus").agg({"disc": "sum", "o_totalprice": "count"})
    from ..functions.exact import dec_to_double

    sdf = out.to_spark().select(
        "o_orderstatus",
        dec_to_double(F.col("disc"), 8).alias("disc_sum"),
        F.col("o_totalprice").alias("n"),
    )
    return sdf


# --------------------------------------------------------------------------
# merge (suffix handling) + value_counts through the facade.
# --------------------------------------------------------------------------
@register(
    "frame_api_merge_value_counts",
    """
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS count
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY c_mktsegment
    ORDER BY count DESC, c_mktsegment
    """,
)
def frame_api_merge_value_counts(spark, sf_dir):
    orders = _frame(spark, sf_dir, "orders", index="o_orderkey")
    cust = _frame(spark, sf_dir, "customer", index="c_custkey")
    f = orders[orders["o_orderstatus"] == "F"]
    cust2 = SparkFrame(
        load_table(spark, sf_dir, "customer").withColumn(INDEX, F.col("c_custkey"))
    )
    merged = f.merge(cust2, left_on="o_custkey", right_on="c_custkey")
    vc = merged["c_mktsegment"].value_counts()
    return vc.to_spark().select("c_mktsegment", F.col("count").cast("bigint").alias("count"))


# --------------------------------------------------------------------------
# set_index → sort → shift/diff through the facade (index discipline §1.5).
# --------------------------------------------------------------------------
@register(
    "frame_api_shift_diff",
    """
    SELECT event_id,
           value - lag(value) OVER (ORDER BY event_id) AS dv
    FROM events
    WHERE user_id = 7
    """,
)
def frame_api_shift_diff(spark, sf_dir):
    f = _frame(spark, sf_dir, "events", index="event_id")
    f = f[f["user_id"] == 7]
    dv = f["value"].diff()
    out = f.assign(dv=dv)
    return out.to_spark().select(F.col(INDEX).alias("event_id"), "dv")


# --------------------------------------------------------------------------
# rolling mean through the facade (Window rowsBetween path).
# --------------------------------------------------------------------------
@register(
    "frame_api_rolling_mean",
    """
    SELECT event_id,
           CASE WHEN COUNT(value) OVER w >= 4 THEN AVG(value) OVER w END AS r4
    FROM events
    WHERE user_id = 3
    WINDOW w AS (ORDER BY event_id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
)
def frame_api_rolling_mean(spark, sf_dir):
    f = _frame(spark, sf_dir, "events", index="event_id")
    f = f[f["user_id"] == 3]
    r4 = f["value"].rolling(4).mean()
    out = f.assign(r4=r4)
    return out.to_spark().select(F.col(INDEX).alias("event_id"), "r4")
