"""Deterministic HyperLogLog — the distinct-count sketch re-derived so the
ESTIMATE ITSELF is bit-identical on any cluster size and in the DuckDB
oracle (closing the engine's one rows-only correctness delta:
``nunique_approx`` wraps Spark's native approx_count_distinct, whose
HLL++ internals can't be replayed in another engine).

Flajolet et al. 2007, with every step exact:

* hash: 60-bit md5-derived integer (the MinHash payload discipline) —
  identical arithmetic in Spark (``conv(substr(md5(x),1,15),16,10)``)
  and DuckDB (digit expansion).
* registers: bucket = h % m (m=256), rho = leading-zero-count + 1 of the
  remaining 52-bit word, computed by INTEGER bit-length
  (``53 - length(bin(w))``), never a float log2 (boundary values round
  differently).  Register = MAX(rho) per bucket — a 256-group map-side-
  combinable aggregate: the whole sketch is one tiny-shuffle pass, the
  canonical 100 TB distinct-count plan.
* harmonic mean: sum of 2^(-M_j) computed as the INTEGER sum of
  2^(53-M_j) (exact, <= 256 * 2^53 < 2^63), so no float-sum
  order-dependence exists anywhere; the final alpha*m^2*2^53/S division
  and the small-range linear-counting correction (quantized ln) are
  identical IEEE arithmetic in both engines.

Not in the reference (``nunique_approx`` there delegates to dask's
HLL, ``/root/reference/dask_expr/_reductions.py``); SURVEY.md §2.13.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.exact import pround, pround_expr
from ..sources.tables import load_table, spread
from .registry import register
from .text import _md5_uint_sql

_HLL_M = 256  # 2^8 buckets
_HLL_ALPHA_SQL = "(0.7213 / (1.0 + 1.079 / 256.0))"
_Q = 1_000_000_000


def _qln_sql(expr: str) -> str:
    return f"(CAST(floor(ln({expr}) * {_Q}.0 + 0.5) AS DOUBLE) / {_Q}.0)"


@register(
    "hll_distinct_users",
    f"""
    WITH h AS (
      SELECT CAST({_md5_uint_sql("CAST(user_id AS VARCHAR)", 15)} AS BIGINT) AS h
      FROM (SELECT DISTINCT user_id FROM events)
    ),
    rows_ AS (
      SELECT h % {_HLL_M} AS bucket, h // {_HLL_M} AS w FROM h
    ),
    regs AS (
      SELECT bucket,
             MAX(CASE WHEN w = 0 THEN 53
                      ELSE 53 - length(bin(w)) END) AS m_raw
      FROM rows_ GROUP BY bucket
    ),
    agg AS (
      -- absent buckets (register 0) folded in arithmetically: each adds
      -- 2^53 to the harmonic sum and 1 to the zero-register count
      SELECT CAST(SUM(CAST(1 AS BIGINT) << (53 - m_raw))
                  + ({_HLL_M} - COUNT(*)) * (CAST(1 AS BIGINT) << 53)
                  AS BIGINT) AS s,
             CAST({_HLL_M} - COUNT(*) AS BIGINT) AS v
      FROM regs
    ),
    exact AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact FROM events),
    est AS (
      SELECT n_exact,
             CASE WHEN raw <= 2.5 * {_HLL_M} AND v > 0
                  THEN {_HLL_M}.0 * {_qln_sql(f"{_HLL_M}.0 / CAST(v AS DOUBLE)")}
                  ELSE raw END AS e
      FROM (SELECT n_exact, v,
                   {_HLL_ALPHA_SQL} * {_HLL_M}.0 * {_HLL_M}.0
                     * 9007199254740992.0 / CAST(s AS DOUBLE) AS raw
            FROM agg CROSS JOIN exact)
    )
    SELECT n_exact,
           {pround_expr('e', 4)} AS n_hll,
           {pround_expr('(e - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE)', 6)}
             AS rel_err
    FROM est
    """,
)
def hll_distinct_users(spark, sf_dir):
    """Distinct users by deterministic HLL (m=256) next to the exact
    count and the relative error — the sketch estimate hash-matches the
    oracle, not just the row count."""
    e = spread(load_table(spark, sf_dir, "events"))
    h = (
        e.select("user_id")
        .distinct()
        .select(
            F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
            .cast("long")
            .alias("h")
        )
    )
    rows = h.select(
        (F.col("h") % _HLL_M).alias("bucket"),
        F.expr(f"h DIV {_HLL_M}").alias("w"),
    )
    regs = rows.groupBy("bucket").agg(
        F.max(
            F.when(F.col("w") == 0, 53).otherwise(53 - F.length(F.bin("w")))
        ).alias("m_raw")
    )
    # Absent buckets (register 0) folded in arithmetically — no spine join.
    agg = regs.agg(
        (
            F.sum(F.expr("CAST(1 AS BIGINT) << (53 - m_raw)"))
            + (F.lit(_HLL_M) - F.count("*")) * F.lit(1 << 53)
        )
        .cast("long")
        .alias("s"),
        (F.lit(_HLL_M) - F.count("*")).cast("long").alias("v"),
    )
    exact = e.agg(F.countDistinct("user_id").cast("long").alias("n_exact"))
    alpha = 0.7213 / (1.0 + 1.079 / 256.0)
    raw = (
        F.lit(alpha)
        * F.lit(float(_HLL_M))
        * F.lit(float(_HLL_M))
        * F.lit(9007199254740992.0)  # 2^53
        / F.col("s").cast("double")
    )
    qln = lambda c: F.floor(F.log(c) * _Q + F.lit(0.5)).cast("double") / _Q  # noqa: E731
    est = agg.crossJoin(F.broadcast(exact)).select(
        "n_exact",
        F.when(
            (raw <= 2.5 * _HLL_M) & (F.col("v") > 0),
            F.lit(float(_HLL_M)) * qln(F.lit(float(_HLL_M)) / F.col("v").cast("double")),
        )
        .otherwise(raw)
        .alias("e"),
    )
    return est.select(
        "n_exact",
        pround(F.col("e"), 4).alias("n_hll"),
        pround(
            (F.col("e") - F.col("n_exact").cast("double"))
            / F.col("n_exact").cast("double"),
            6,
        ).alias("rel_err"),
    )


# --------------------------------------------------------------------------
# Deterministic Count-Min sketch — approximate frequency counting with the
# same discipline as the HLL above: md5-derived row hashes, integer-only
# arithmetic, so the ESTIMATES hash-match the DuckDB oracle.  CMS counters
# are SUM-mergeable, making the sketch a 4096-group map-side-combinable
# aggregate: at 100 TB each partition collapses to <= d*w rows before the
# shuffle, the canonical bounded-memory frequency plan (Cormode &
# Muthukrishnan 2005).  Guarantee surfaced in the output: estimate >=
# exact always (overcount >= 0), within eps*N with probability 1-delta.
# --------------------------------------------------------------------------
_CMS_D = 4  # hash rows
_CMS_W = 1024  # buckets per row
_CMS_TOPK = 20

#: Spark-side array of the _CMS_D cell coordinates for one user_id.
_CMS_CELLS_EXPR = (
    f"transform(sequence(0, {_CMS_D - 1}), r -> "
    f"CAST(conv(substr(md5(concat('cms', CAST(r AS STRING), ':', "
    f"CAST(user_id AS STRING))), 1, 15), 16, 10) AS BIGINT) % {_CMS_W})"
)


def _cms_hash_sql(r_expr: str) -> str:
    """DuckDB twin of one CMS row hash (row index expression ``r_expr``)."""
    payload = (
        f"'cms' || CAST({r_expr} AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)"
    )
    return f"({_md5_uint_sql(payload, 15)} % {_CMS_W})"


_CMS_FINISH_SQL = f"""
    top AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_n
      FROM events GROUP BY user_id
      ORDER BY exact_n DESC, user_id ASC LIMIT {_CMS_TOPK}
    ),
    probes AS (
      SELECT user_id, exact_n, r, {_cms_hash_sql('r')} AS bucket
      FROM top, LATERAL (SELECT unnest(generate_series(0, {_CMS_D - 1})) AS r) t
    )
    SELECT p.user_id, p.exact_n,
           CAST(MIN(COALESCE(s.n, 0)) AS BIGINT) AS cms_n,
           CAST(MIN(COALESCE(s.n, 0)) - p.exact_n AS BIGINT) AS overcount
    FROM probes p LEFT JOIN sketch s ON p.r = s.r AND p.bucket = s.bucket
    GROUP BY p.user_id, p.exact_n
"""


def cms_sketch(events):
    """events -> the (r, bucket, n) Count-Min table (d*w rows max)."""
    cells = events.select(F.posexplode(F.expr(_CMS_CELLS_EXPR)))
    return (
        cells.select(F.col("pos").cast("long").alias("r"), F.col("col").alias("bucket"))
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def cms_finish(events, sketch):
    """Join the exact top-k users against the sketch estimates."""
    top = (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_n"))
        .orderBy(F.desc("exact_n"), F.asc("user_id"))
        .limit(_CMS_TOPK)
    )
    probes = top.select("user_id", "exact_n", F.posexplode(F.expr(_CMS_CELLS_EXPR)))
    probes = probes.select(
        "user_id",
        "exact_n",
        F.col("pos").cast("long").alias("r"),
        F.col("col").alias("bucket"),
    )
    est = (
        probes.join(F.broadcast(sketch), ["r", "bucket"], "left")
        .groupBy("user_id", "exact_n")
        .agg(F.min(F.coalesce("n", F.lit(0))).cast("long").alias("cms_n"))
    )
    return est.select(
        "user_id",
        "exact_n",
        "cms_n",
        (F.col("cms_n") - F.col("exact_n")).cast("long").alias("overcount"),
    )


@register(
    "cms_user_frequency",
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
def cms_user_frequency(spark, sf_dir):
    """Count-Min frequency estimates for the exact top-{_CMS_TOPK} users:
    (user, exact count, CMS estimate, overcount >= 0).  The sketch is one
    bounded 4096-group aggregate regardless of stream size."""
    e = spread(load_table(spark, sf_dir, "events"))
    return cms_finish(e, cms_sketch(e))
