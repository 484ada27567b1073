"""Lakehouse maintenance patterns: incremental aggregate maintenance
(materialized-view refresh from mergeable partials) and Z-order
(Morton-curve) layout for multi-column data skipping.

Not in the reference (pandas algebra only,
``/root/reference/dask_expr/_collection.py``); with compaction
(sources/compaction.py) these round out the table-maintenance surface a
100 TB store needs (SURVEY.md §2.13).

Scale posture:

* incremental agg — the point of the pattern: yesterday's aggregate is
  NEVER recomputed; today's delta produces partials (n, Σx, Σx²) that
  merge associatively.  Exact decimal sums (functions/exact.py) make the
  merge bit-reproducible in any order — the two-phase Spark plan and the
  oracle's single pass provably agree, which IS the mergeability proof.
* Z-order — the Morton code interleaves the bits of two clustering keys
  so a sort by one integer column co-locates rows that are close in
  BOTH dimensions; parquet row-group min/max stats then prune scans
  filtered on either key.  The layout write is one range-partitioned
  sort; the skipping proof (per-file key-range width collapses vs an
  unclustered write) is pinned by tests/test_scale_ops.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.exact import DEC, dec2dbl_expr, dec_to_double, pround, pround_expr
from ..sources.tables import load_table, spread
from .registry import cache_scoped, register

_CUTOFF = "2024-01-20"


def _partials(df):
    """Mergeable moment partials per event_type: n, Σv, Σv² (exact
    decimal — associative, so any merge order is bit-identical)."""
    v = F.col("value").cast(DEC)
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).alias("s"),
        F.sum(v * F.col("value").cast(DEC)).alias("ss"),
    )


@register(
    "incremental_agg_maintenance",
    f"""
    SELECT event_type,
           COUNT(*) AS n_events,
           {pround_expr(dec2dbl_expr("SUM(CAST(value AS DECIMAL(30,8)))") + " / CAST(COUNT(*) AS DOUBLE)", 6)} AS mean_value,
           {pround_expr(
               "(" + dec2dbl_expr("SUM(CAST(value AS DECIMAL(30,8)) * CAST(value AS DECIMAL(30,8)))")
               + " - " + dec2dbl_expr("SUM(CAST(value AS DECIMAL(30,8)))")
               + " * " + dec2dbl_expr("SUM(CAST(value AS DECIMAL(30,8)))")
               + " / CAST(COUNT(*) AS DOUBLE)) / CAST(COUNT(*) - 1 AS DOUBLE)", 6)} AS var_value
    FROM events GROUP BY event_type
    """,
)
def incremental_agg_maintenance(spark, sf_dir):
    """Materialized-view refresh from partials: the 'stored' aggregate
    (events before {_CUTOFF}) merges with the delta batch (events on/after
    it) without touching base rows; the oracle computes the same stats in
    one pass over everything — equality proves the merge exact.
    """
    ev = spread(load_table(spark, sf_dir, "events")).select("event_type", "ts", "value")
    ev = cache_scoped(ev)
    cutoff = F.lit(_CUTOFF).cast("timestamp")
    stored = _partials(ev.filter(F.col("ts") < cutoff))
    delta = _partials(ev.filter(F.col("ts") >= cutoff))
    merged = (
        stored.unionAll(delta)
        .groupBy("event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum("s").alias("s"),
            F.sum("ss").alias("ss"),
        )
    )
    s_d = dec_to_double(F.col("s"), 8)
    ss_d = dec_to_double(F.col("ss"), 8)
    n_d = F.col("n").cast("double")
    return merged.select(
        "event_type",
        F.col("n").alias("n_events"),
        pround(s_d / n_d, 6).alias("mean_value"),
        pround((ss_d - s_d * s_d / n_d) / (n_d - 1), 6).alias("var_value"),
    )


# --------------------------------------------------------------------------
# Z-order (Morton) clustering key: interleave 8 bits of the user bucket
# with 8 bits of the value bucket.  Pure integer bit arithmetic —
# identical in both engines.
# --------------------------------------------------------------------------
_ZBITS = 8


def morton_sql(ub: str, vb: str) -> str:
    terms = []
    for i in range(_ZBITS):
        terms.append(f"((({ub} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({vb} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def morton_col(ub, vb):
    out = F.lit(0)
    for i in range(_ZBITS):
        out = out + F.shiftleft(F.shiftrightunsigned(ub, i).bitwiseAND(1), 2 * i)
        out = out + F.shiftleft(F.shiftrightunsigned(vb, i).bitwiseAND(1), 2 * i + 1)
    return out


def zorder_cols(df, user_col: str = "user_id", value_col: str = "value"):
    """(user_bucket, value_bucket, morton) clustering columns."""
    ub = F.pmod(F.col(user_col), F.lit(256)).cast("int")
    vb = F.pmod(F.floor(F.col(value_col) * 10).cast("int"), F.lit(256))
    return ub, vb, morton_col(ub, vb)


@register(
    "zorder_layout_stats",
    f"""
    WITH z AS (
      SELECT (user_id % 256) AS ub,
             (CAST(floor(value * 10) AS BIGINT) % 256) AS vb
      FROM events
    ),
    m AS (SELECT ub, vb, {morton_sql('ub', 'vb')} AS morton FROM z)
    SELECT CAST(morton // 1024 AS BIGINT) AS z_block,
           COUNT(*) AS n_rows,
           CAST(MIN(ub) AS BIGINT) AS min_ub, CAST(MAX(ub) AS BIGINT) AS max_ub,
           CAST(MIN(vb) AS BIGINT) AS min_vb, CAST(MAX(vb) AS BIGINT) AS max_vb
    FROM m GROUP BY z_block
    """,
)
def zorder_layout_stats(spark, sf_dir):
    """Morton-block locality profile: rows bucketed by the top bits of
    their Z-order code, with per-block bounds of BOTH clustering keys —
    the statistics parquet row-group pruning exploits after a
    Z-order-sorted write (narrow per-block ranges in both dimensions).
    """
    ev = spread(load_table(spark, sf_dir, "events"))
    ub, vb, morton = zorder_cols(ev)
    z = ev.select(ub.alias("ub"), vb.alias("vb"), morton.alias("morton"))
    return z.groupBy(
        F.floor(F.col("morton") / 1024).cast("long").alias("z_block")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("ub").cast("long").alias("min_ub"),
        F.max("ub").cast("long").alias("max_ub"),
        F.min("vb").cast("long").alias("min_vb"),
        F.max("vb").cast("long").alias("max_vb"),
    )


# --------------------------------------------------------------------------
# Data-quality validation suite — the constraint checks (FK integrity,
# key uniqueness, null/domain/range, cross-table temporal consistency) a
# lakehouse runs before promoting a snapshot.  Output: one row per
# check with checked/violation counts, so the report is O(checks)
# regardless of table size.
#
# Scale posture: every check is a single aggregate or one keyed
# anti/equi join — no check materializes violating ROWS (counts only),
# the FK checks are shuffle hash joins on the key (co-partitioned with
# bucketing in production), and the seven checks share scans via the
# cached slim projections.
# --------------------------------------------------------------------------


@register(
    "dq_validation_report",
    """
    WITH o AS (SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate FROM orders),
    l AS (SELECT l_orderkey, l_quantity, l_shipdate FROM lineitem),
    checks AS (
      SELECT 'fk_orders_custkey' AS check_name,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM o) AS n_checked,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM o
              WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)) AS n_bad
      UNION ALL
      SELECT 'fk_lineitem_orderkey',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM l),
             (SELECT CAST(COUNT(*) AS BIGINT) FROM l
              WHERE l_orderkey NOT IN (SELECT o_orderkey FROM o))
      UNION ALL
      SELECT 'unique_o_orderkey',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM o),
             (SELECT CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) FROM o)
      UNION ALL
      SELECT 'positive_o_totalprice',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM o),
             (SELECT CAST(COUNT(*) AS BIGINT) FROM o
              WHERE o_totalprice IS NULL OR o_totalprice <= 0)
      UNION ALL
      SELECT 'range_o_orderdate',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM o),
             (SELECT CAST(COUNT(*) AS BIGINT) FROM o
              WHERE o_orderdate IS NULL
                 OR o_orderdate < DATE '1995-01-01'
                 OR o_orderdate > DATE '2001-12-31')
      UNION ALL
      SELECT 'range_l_quantity',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM l),
             (SELECT CAST(COUNT(*) AS BIGINT) FROM l
              WHERE l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 50)
      UNION ALL
      SELECT 'ship_after_order',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM l JOIN o ON l_orderkey = o_orderkey),
             (SELECT CAST(COUNT(*) AS BIGINT) FROM l JOIN o ON l_orderkey = o_orderkey
              WHERE l_shipdate < o_orderdate)
    )
    SELECT check_name, n_checked, n_bad, n_bad = 0 AS ok FROM checks
    """,
)
def dq_validation_report(spark, sf_dir):
    """Seven-constraint validation report over orders/lineitem/customer:
    FK integrity (anti-join counts), key uniqueness, null/domain/range
    checks, and ship-after-order temporal consistency — one row per
    check, counts only."""
    o = cache_scoped(
        spread(load_table(spark, sf_dir, "orders")).select(
            "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
        )
    )
    li = cache_scoped(
        spread(load_table(spark, sf_dir, "lineitem")).select(
            "l_orderkey", "l_quantity", "l_shipdate"
        )
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")

    def row(name, checked_df, bad_df):
        n = checked_df.agg(F.count(F.lit(1)).cast("long").alias("n_checked"))
        b = bad_df.agg(F.count(F.lit(1)).cast("long").alias("n_bad"))
        return n.crossJoin(b).select(
            F.lit(name).alias("check_name"), "n_checked", "n_bad"
        )

    def agg_row(name, df, n_col, bad_col):
        return df.agg(
            n_col.cast("long").alias("n_checked"),
            bad_col.cast("long").alias("n_bad"),
        ).select(F.lit(name).alias("check_name"), "n_checked", "n_bad")

    fk_o = row(
        "fk_orders_custkey",
        o,
        o.join(cust, o["o_custkey"] == cust["c_custkey"], "left_anti"),
    )
    fk_l = row(
        "fk_lineitem_orderkey",
        li,
        li.join(
            o.select("o_orderkey").hint("shuffle_hash"),
            li["l_orderkey"] == o["o_orderkey"],
            "left_anti",
        ),
    )
    uniq = agg_row(
        "unique_o_orderkey",
        o,
        F.count(F.lit(1)),
        F.count(F.lit(1)) - F.countDistinct("o_orderkey"),
    )
    price = agg_row(
        "positive_o_totalprice",
        o,
        F.count(F.lit(1)),
        F.sum(
            F.when(
                F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0), 1
            ).otherwise(0)
        ),
    )
    dates = agg_row(
        "range_o_orderdate",
        o,
        F.count(F.lit(1)),
        F.sum(
            F.when(
                F.col("o_orderdate").isNull()
                | (F.col("o_orderdate") < F.lit("1995-01-01").cast("date"))
                | (F.col("o_orderdate") > F.lit("2001-12-31").cast("date")),
                1,
            ).otherwise(0)
        ),
    )
    qty = agg_row(
        "range_l_quantity",
        li,
        F.count(F.lit(1)),
        F.sum(
            F.when(
                F.col("l_quantity").isNull()
                | (F.col("l_quantity") < 1)
                | (F.col("l_quantity") > 50),
                1,
            ).otherwise(0)
        ),
    )
    lo = li.join(
        o.select("o_orderkey", "o_orderdate"),
        li["l_orderkey"] == o["o_orderkey"],
    )
    temporal = agg_row(
        "ship_after_order",
        lo,
        F.count(F.lit(1)),
        F.sum(F.when(F.col("l_shipdate") < F.col("o_orderdate"), 1).otherwise(0)),
    )
    report = fk_o
    for part in (fk_l, uniq, price, dates, qty, temporal):
        report = report.unionAll(part)
    return report.select(
        "check_name", "n_checked", "n_bad", (F.col("n_bad") == 0).alias("ok")
    )


# --------------------------------------------------------------------------
# Join-key skew report — the diagnostic behind every "one straggler task"
# incident: per candidate join/shuffle key, the key-count distribution's
# hot end.  Per key it is ONE map-side-combinable count aggregate plus
# O(1) rollups; the skew ratio (hottest key vs mean) is the number that
# predicts whether AQE skew-join splitting or salting is needed BEFORE
# the join is written.  Ratio is one IEEE divide of exact-integer-valued
# doubles; the hottest key ties break on the smallest key.
# --------------------------------------------------------------------------
_SKEW_KEYS = [
    ("orders", "o_custkey"),
    ("lineitem", "l_suppkey"),
    ("events", "user_id"),
]


def _skew_sql(table: str, col: str) -> str:
    return f"""
      SELECT '{table}.{col}' AS key_name,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(c) AS BIGINT) AS n_rows,
             CAST(MAX(c) AS BIGINT) AS max_count,
             CAST(MIN(CASE WHEN c = mc THEN k END) AS VARCHAR) AS top_key,
             {pround_expr(
                 'CAST(MAX(c) AS DOUBLE)'
                 ' / (CAST(SUM(c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))', 6)}
               AS skew_ratio
      FROM (SELECT k, c, MAX(c) OVER () AS mc
            FROM (SELECT {col} AS k, CAST(COUNT(*) AS BIGINT) AS c
                  FROM {table} GROUP BY {col}) t0) t1
    """


@register(
    "key_skew_report",
    " UNION ALL ".join(_skew_sql(t, c) for t, c in _SKEW_KEYS),
)
def key_skew_report(spark, sf_dir):
    """Key-distribution skew diagnostics for three shuffle keys: key
    cardinality, row count, hottest key + its count, and the hot/mean
    skew ratio."""
    parts = []
    for table, col in _SKEW_KEYS:
        t = spread(load_table(spark, sf_dir, table))
        counts = cache_scoped(
            t.groupBy(F.col(col).alias("k")).agg(
                F.count(F.lit(1)).cast("long").alias("c")
            )
        )
        stats = counts.agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum("c").cast("long").alias("n_rows"),
            F.max("c").cast("long").alias("max_count"),
            # deterministic hottest key: max count, then smallest key —
            # a single max_by over a (count, -k) struct, no sort
            F.min_by("k", F.struct((-F.col("c")).alias("nc"), F.col("k").alias("k")))
            .cast("string")
            .alias("top_key"),
        )
        parts.append(
            stats.select(
                F.lit(f"{table}.{col}").alias("key_name"),
                "n_keys",
                "n_rows",
                "max_count",
                "top_key",
                pround(
                    F.col("max_count").cast("double")
                    / (F.col("n_rows").cast("double") / F.col("n_keys").cast("double")),
                    6,
                ).alias("skew_ratio"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out
