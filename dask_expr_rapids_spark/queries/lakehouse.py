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
