"""Relational core queries (SURVEY.md §2.1-2.3, §2.7): scan → filter →
project → join → aggregate → sort, expressed declaratively so Catalyst does
pushdown/pruning/join-selection (SURVEY.md §4.1 — no custom rules needed).

Reference parity: ``Filter``/``Projection``/``Assign`` (``/root/reference/
dask_expr/_expr.py:1321-1441``), ``Merge`` strategies (``_merge.py:32-346``),
elementwise ops (``_expr.py:1746-1876``).  Joins against small dims are
explicitly ``F.broadcast``-hinted — the Spark-native upgrade of the
reference's partition-count broadcast heuristic (``_merge.py:172-192``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.exact import davg, davg_expr, dsum, dsum_expr, pround
from ..sources.tables import load_table
from .registry import register


def _ts(s: str):
    return F.lit(s).cast("timestamp")


# --------------------------------------------------------------------------
# q01: TPC-H Q1 — the flagship: scan → pushdown filter → hash agg → sort.
# Reference demo equivalent: README.md:28-50 plan-collapse example.
# --------------------------------------------------------------------------
@register(
    "q01_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_expr('l_quantity')} AS sum_qty,
           {dsum_expr('l_extendedprice')} AS sum_base_price,
           {dsum_expr('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {dsum_expr('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {davg_expr('l_quantity')} AS avg_qty,
           {davg_expr('l_extendedprice')} AS avg_price,
           {davg_expr('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= _ts("1998-09-02 00:00:00"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(disc_price * (1 + F.col("l_tax")), "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------------
# q03: shipping priority — 3-way join, agg, top-k (TakeOrderedAndProject).
# --------------------------------------------------------------------------
@register(
    "q03_shipping_priority",
    f"""
    SELECT l_orderkey,
           {dsum_expr('l_extendedprice * (1 - l_discount)')} AS revenue,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q03_shipping_priority(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < _ts("1998-03-15 00:00:00"))
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > _ts("1998-03-15 00:00:00"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# q05: local supplier volume — 6-way join with two broadcast dims.
# --------------------------------------------------------------------------
@register(
    "q05_local_supplier_volume",
    f"""
    SELECT n_name, {dsum_expr('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q05_local_supplier_volume(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    # The region/nation predicate implies c_nationkey ∈ ASIA nations (the
    # supplier join later pins c_nationkey == s_nationkey and s to ASIA), so
    # semi-filter customer map-side before the big customer⋈orders shuffle —
    # at scale this cuts that exchange's volume by ~|ASIA|/|world| (≈5×).
    asia_nk = n.join(
        F.broadcast(r.filter(F.col("r_name") == "ASIA")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey")
    return (
        c.join(F.broadcast(asia_nk), F.col("c_nationkey") == F.col("n_nationkey"), "left_semi")
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
            & (F.col("o_orderdate") < _ts("1997-01-01 00:00:00"))
        )
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(r.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


# --------------------------------------------------------------------------
# q06: forecast revenue — pure pushdown filter + global agg (no shuffle of
# data rows at all: partial agg → single final row).
# --------------------------------------------------------------------------
@register(
    "q06_forecast_revenue",
    f"""
    SELECT {dsum_expr('l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q06_forecast_revenue(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))
    )


# --------------------------------------------------------------------------
# q10: returned items — join + agg + top-k with deterministic tie-break.
# --------------------------------------------------------------------------
@register(
    "q10_returned_items",
    f"""
    SELECT c_custkey, c_name,
           {dsum_expr('l_extendedprice * (1 - l_discount)')} AS revenue,
           {davg_expr('c_acctbal')} AS acctbal
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    # Join the two big fact tables on orderkey FIRST: the wide customer
    # columns (name, acctbal) then cross exactly one exchange (custkey) —
    # the naive customer-first order drags them through the orderkey
    # shuffle too, tripling shuffled bytes at scale.
    return (
        o.join(
            l.filter(F.col("l_returnflag") == "R"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            davg("c_acctbal", "acctbal"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Join-strategy coverage: semi / anti / full-outer (reference lacks semi and
# anti — free Spark extensions, SURVEY.md §2.7).
# --------------------------------------------------------------------------
@register(
    "join_semi_open_orders",
    """
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
    """,
)
def join_semi_open_orders(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(
        o.filter(F.col("o_orderstatus") == "O"),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_semi",
    ).select("c_custkey", "c_name")


@register(
    "join_anti_no_big_orders",
    """
    SELECT c_custkey, c_nationkey
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def join_anti_no_big_orders(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(
        o.filter(F.col("o_totalprice") > 400000),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_anti",
    ).select("c_custkey", "c_nationkey")


@register(
    "join_outer_nation_customers",
    """
    SELECT n.n_name, COALESCE(cc.n_customers, 0) AS n_customers
    FROM nation n
    LEFT OUTER JOIN (
        SELECT c_nationkey, COUNT(*) AS n_customers FROM customer GROUP BY c_nationkey
    ) cc ON n.n_nationkey = cc.c_nationkey
    """,
)
def join_outer_nation_customers(spark, sf_dir):
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    counts = c.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("n_customers"))
    return (
        F.broadcast(n)
        .join(counts, F.col("n_nationkey") == F.col("c_nationkey"), "left_outer")
        .select("n_name", F.coalesce("n_customers", F.lit(0)).alias("n_customers"))
    )


# --------------------------------------------------------------------------
# Elementwise / projection / predicate coverage: Assign (withColumn), Between,
# Isin, case-when Mask/Where, casts (reference _expr.py:1020-1172).
# --------------------------------------------------------------------------
@register(
    "filter_project_arith",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 + l_tax) * (1 - l_discount) AS charge,
           CAST(l_quantity AS BIGINT) AS qty_int,
           CASE WHEN l_discount > 0.05 THEN 'HIGH' ELSE 'LOW' END AS disc_band,
           ABS(l_extendedprice - 30000.0) AS price_dev,
           (CAST(floor(l_extendedprice * l_discount * 100.0 + 0.5) AS DOUBLE) / 100.0)
             AS disc_amt,
           LEAST(GREATEST(l_quantity, 10.0), 40.0) AS qty_clip
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 12
      AND l_returnflag IN ('A', 'R')
      AND l_orderkey < 3000
    """,
)
def filter_project_arith(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            F.col("l_quantity").between(10, 12)
            & F.col("l_returnflag").isin("A", "R")
            & (F.col("l_orderkey") < 3000)
        )
        .withColumn(
            "charge",
            F.col("l_extendedprice") * (1 + F.col("l_tax")) * (1 - F.col("l_discount")),
        )
        .withColumn("qty_int", F.col("l_quantity").cast("bigint"))
        .withColumn(
            "disc_band",
            F.when(F.col("l_discount") > 0.05, "HIGH").otherwise("LOW"),
        )
        .withColumn("price_dev", F.abs(F.col("l_extendedprice") - 30000.0))
        .withColumn("disc_amt", pround(F.col("l_extendedprice") * F.col("l_discount"), 2))
        .withColumn(
            "qty_clip",
            F.least(F.greatest(F.col("l_quantity"), F.lit(10.0)), F.lit(40.0)),
        )
        .select(
            "l_orderkey", "l_linenumber", "charge", "qty_int", "disc_band",
            "price_dev", "disc_amt", "qty_clip",
        )
    )


# --------------------------------------------------------------------------
# Top-k (NLargest, reference _reductions.py:1074-1119 → TakeOrderedAndProject)
# --------------------------------------------------------------------------
@register(
    "topk_orders_by_price",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 15
    """,
)
def topk_orders_by_price(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(15)
    )


# --------------------------------------------------------------------------
# Set ops: union / intersect / except (reference Concat axis=0,
# _concat.py:21-224; intersect/except are free Spark extensions §2.9).
# --------------------------------------------------------------------------
@register(
    "concat_union_all",
    """
    SELECT * FROM (
      SELECT o_orderkey AS okey, o_totalprice AS price, 'early' AS era
      FROM orders WHERE o_orderdate < TIMESTAMP '1995-06-01 00:00:00'
      UNION ALL
      SELECT o_orderkey AS okey, o_totalprice AS price, 'late' AS era
      FROM orders WHERE o_orderdate >= TIMESTAMP '2001-06-01 00:00:00'
    ) t
    """,
)
def concat_union_all(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    early = (
        o.filter(F.col("o_orderdate") < _ts("1995-06-01 00:00:00"))
        .select(
            F.col("o_orderkey").alias("okey"),
            F.col("o_totalprice").alias("price"),
            F.lit("early").alias("era"),
        )
    )
    late = (
        o.filter(F.col("o_orderdate") >= _ts("2001-06-01 00:00:00"))
        .select(
            F.col("o_orderkey").alias("okey"),
            F.col("o_totalprice").alias("price"),
            F.lit("late").alias("era"),
        )
    )
    return early.unionByName(late)


@register(
    "set_intersect_nations",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect_nations(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "set_except_nations",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_except_nations(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)
