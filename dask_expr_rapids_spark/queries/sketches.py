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


# --------------------------------------------------------------------------
# Deterministic Bloom filter — the MEMBERSHIP sketch, completing the
# family (HLL = cardinality, CMS = frequency): m = _BF_M = 1024 bits
# packed as 32 x 32-bit words (32 bits per BIGINT word keeps every
# shift sign-safe in both engines), k = 5 md5-derived probes per key
# (Bloom 1970).  The streaming twin (_SBF_M, queries/streaming.py)
# uses 65536 bits / 2048 words — same layout, production-sized.
#
# The 100 TB story is the semi-join reduction Spark itself applies as a
# runtime filter: instead of shuffling the fact table against a
# corpus-sized key set, the build side collapses to a FIXED 128-byte
# bit array (bit_or is idempotent and merge-associative — one map-side
# combinable aggregate), which rides along as a one-row broadcast map;
# the probe is then pure map-side — NO shuffle touches the fact table
# until the final per-priority rollup.  The exact-membership join in
# this query exists only to AUDIT the sketch (count false positives and
# prove zero false negatives); production probes drop it.
# --------------------------------------------------------------------------
_BF_M = 1024  # bits — deliberately tight (~63% fill at the build size
# below) so the ~10% false-positive rate the sketch trades for its 128-byte
# footprint is VISIBLE in the audit columns; production sizes m ~ 1.44 n k
# for a target rate, same plan.
_BF_K = 5  # probes per key
_BF_WORD = 32  # bits per packed word

#: Spark-side array of the _BF_K bit positions for one key column `key`.
_BF_POS_EXPR = (
    f"transform(sequence(0, {_BF_K - 1}), i -> "
    f"CAST(conv(substr(md5(concat('bf', CAST(i AS STRING), ':', "
    f"CAST(key AS STRING))), 1, 15), 16, 10) AS BIGINT) % {_BF_M})"
)


def _bf_pos_sql(i_expr: str) -> str:
    payload = f"'bf' || CAST({i_expr} AS VARCHAR) || ':' || CAST(key AS VARCHAR)"
    return f"({_md5_uint_sql(payload, 15)} % {_BF_M})"


@register(
    "bloom_semijoin_orders",
    f"""
    WITH members AS (
      SELECT DISTINCT c_custkey AS key FROM customer
      WHERE c_mktsegment = 'AUTOMOBILE' AND c_custkey <= 1000
    ),
    cells AS (
      SELECT {_bf_pos_sql('i')} AS pos
      FROM members, LATERAL (SELECT unnest(generate_series(0, {_BF_K - 1})) AS i) t
    ),
    words AS (
      SELECT pos // {_BF_WORD} AS word_idx,
             CAST(bit_or(CAST(1 AS BIGINT) << CAST(pos % {_BF_WORD} AS INT))
                  AS BIGINT) AS w
      FROM cells GROUP BY 1
    ),
    probes AS (
      SELECT o_orderkey, o_orderpriority, o_custkey AS key, {_bf_pos_sql('i')} AS pos
      FROM orders, LATERAL (SELECT unnest(generate_series(0, {_BF_K - 1})) AS i) t
    ),
    hits AS (
      SELECT p.o_orderkey, p.o_orderpriority, p.key,
             COALESCE((w.w & (CAST(1 AS BIGINT)
                              << CAST(p.pos % {_BF_WORD} AS INT))) <> 0,
                      FALSE) AS hit
      FROM probes p LEFT JOIN words w ON p.pos // {_BF_WORD} = w.word_idx
    ),
    per_order AS (
      SELECT o_orderkey, o_orderpriority, key, bool_and(hit) AS pass
      FROM hits GROUP BY o_orderkey, o_orderpriority, key
    ),
    flagged AS (
      SELECT o_orderpriority, pass,
             key IN (SELECT key FROM members) AS is_member
      FROM per_order
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
           CAST(SUM(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT) AS n_member,
           CAST(SUM(CASE WHEN pass AND NOT is_member THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_pos,
           CAST(SUM(CASE WHEN is_member AND NOT pass THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_neg
    FROM flagged GROUP BY o_orderpriority
    """,
)
def bloom_semijoin_orders(spark, sf_dir):
    """Bloom-filter semi-join audit: build a 128-byte filter over a
    fixed dimension subset, probe every order map-side via a one-row
    broadcast word map, then count per-priority passes / members /
    false positives (false negatives provably 0; the FP rate is the
    deliberate m-vs-n tradeoff, surfaced per priority)."""
    c = load_table(spark, sf_dir, "customer")
    # fixed-size build side (the dimension filter), scaling probe side —
    # the classic runtime-filter shape
    members = (
        c.filter(
            (F.col("c_mktsegment") == "AUTOMOBILE") & (F.col("c_custkey") <= 1000)
        )
        .select(F.col("c_custkey").alias("key"))
        .distinct()
    )
    cells = members.select(F.explode(F.expr(_BF_POS_EXPR)).alias("pos"))
    words = cells.groupBy(
        F.expr(f"pos DIV {_BF_WORD}").alias("word_idx")
    ).agg(
        F.bit_or(
            F.expr(f"CAST(1 AS BIGINT) << CAST(pos % {_BF_WORD} AS INT)")
        ).alias("w")
    )
    # the whole filter as ONE row: map word_idx -> word (<= 16 KiB)
    packed = words.agg(
        F.map_from_entries(F.collect_list(F.struct("word_idx", "w"))).alias("bf")
    )
    o = spread(load_table(spark, sf_dir, "orders")).select(
        "o_orderkey", "o_orderpriority", F.col("o_custkey").alias("key")
    )
    # map-side probe: all k positions checked in one expression, no shuffle
    pass_expr = F.expr(
        f"aggregate({_BF_POS_EXPR}, true, (acc, p) -> acc AND "
        f"(coalesce(element_at(bf, p DIV {_BF_WORD}), CAST(0 AS BIGINT)) "
        f"& (CAST(1 AS BIGINT) << CAST(p % {_BF_WORD} AS INT))) != 0)"
    )
    probed = o.crossJoin(F.broadcast(packed)).select(
        "o_orderpriority", "key", pass_expr.alias("pass")
    )
    flagged = probed.join(
        members.withColumn("is_member", F.lit(True)), "key", "left"
    ).select(
        "o_orderpriority", "pass", F.coalesce("is_member", F.lit(False)).alias("is_member")
    )
    return flagged.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.when(F.col("pass"), 1).otherwise(0)).cast("long").alias("n_pass"),
        F.sum(F.when(F.col("is_member"), 1).otherwise(0)).cast("long").alias("n_member"),
        F.sum(F.when(F.col("pass") & ~F.col("is_member"), 1).otherwise(0))
        .cast("long")
        .alias("n_false_pos"),
        F.sum(F.when(F.col("is_member") & ~F.col("pass"), 1).otherwise(0))
        .cast("long")
        .alias("n_false_neg"),
    )


# --------------------------------------------------------------------------
# HLL set algebra — the property that makes cardinality sketches useful
# at 100 TB: registers MAX-MERGE, so |A ∪ B| needs no re-scan of either
# input (union the 256-register vectors), and |A ∩ B| follows by
# inclusion-exclusion on three estimates.  Same deterministic HLL as
# hll_distinct_users (md5 hash, integer rho, exact integer harmonic
# sum), applied per set: the whole computation past the per-set distinct
# is O(sets x 256) rows.
# --------------------------------------------------------------------------


@register(
    "hll_set_ops_users",
    f"""
    WITH keyed AS (
      SELECT DISTINCT event_type AS grp,
             CAST(user_id AS VARCHAR) || ':'
               || strftime(CAST(ts AS TIMESTAMP), '%d') AS k
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    h AS (
      SELECT grp, CAST({_md5_uint_sql("k", 15)} AS BIGINT) AS h
      FROM keyed
    ),
    rows_ AS (
      SELECT grp, h % {_HLL_M} AS bucket, h // {_HLL_M} AS w FROM h
    ),
    regs AS (
      SELECT grp, bucket,
             MAX(CASE WHEN w = 0 THEN 53 ELSE 53 - length(bin(w)) END) AS m_raw
      FROM rows_ GROUP BY grp, bucket
    ),
    regs_all AS (
      SELECT grp, bucket, m_raw FROM regs
      UNION ALL
      SELECT 'union' AS grp, bucket, MAX(m_raw) AS m_raw FROM regs GROUP BY bucket
    ),
    agg AS (
      SELECT grp,
             CAST(SUM(CAST(1 AS BIGINT) << (53 - m_raw))
                  + ({_HLL_M} - COUNT(*)) * (CAST(1 AS BIGINT) << 53)
                  AS BIGINT) AS s,
             CAST({_HLL_M} - COUNT(*) AS BIGINT) AS v
      FROM regs_all GROUP BY grp
    ),
    est AS (
      SELECT grp,
             CASE WHEN raw <= 2.5 * {_HLL_M} AND v > 0
                  THEN {_HLL_M}.0 * {_qln_sql(f"{_HLL_M}.0 / CAST(v AS DOUBLE)")}
                  ELSE raw END AS e
      FROM (SELECT grp, v,
                   {_HLL_ALPHA_SQL} * {_HLL_M}.0 * {_HLL_M}.0
                     * 9007199254740992.0 / CAST(s AS DOUBLE) AS raw
            FROM agg)
    ),
    exact AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_exact FROM keyed GROUP BY grp
      UNION ALL
      SELECT 'union', CAST(COUNT(DISTINCT k) AS BIGINT) FROM keyed
    ),
    piv AS (
      SELECT CAST(SUM(CASE WHEN x.grp = 'click' THEN x.n_exact END) AS BIGINT) AS xa,
             CAST(SUM(CASE WHEN x.grp = 'purchase' THEN x.n_exact END) AS BIGINT) AS xb,
             CAST(SUM(CASE WHEN x.grp = 'union' THEN x.n_exact END) AS BIGINT) AS xu,
             SUM(CASE WHEN x.grp = 'click' THEN x.e END) AS ea,
             SUM(CASE WHEN x.grp = 'purchase' THEN x.e END) AS eb,
             SUM(CASE WHEN x.grp = 'union' THEN x.e END) AS eu
      FROM (SELECT est.grp, exact.n_exact, est.e
            FROM est JOIN exact ON est.grp = exact.grp) x
    ),
    out AS (
      SELECT 'click' AS set_name, xa AS n_exact, ea AS e FROM piv
      UNION ALL SELECT 'purchase', xb, eb FROM piv
      UNION ALL SELECT 'union', xu, eu FROM piv
      UNION ALL SELECT 'intersection', xa + xb - xu, ea + eb - eu FROM piv
    )
    SELECT set_name, n_exact, {pround_expr('e', 4)} AS n_est,
           CASE WHEN n_exact > 0 THEN
             {pround_expr('(e - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE)', 6)}
           END AS rel_err
    FROM out
    """,
)
def hll_set_ops_users(spark, sf_dir):
    """|A|, |B|, |A∪B| (register max-merge, no re-scan), |A∩B|
    (inclusion-exclusion) for click vs purchase (user, day) activity
    sets — exact count, deterministic-HLL estimate, relative error."""
    from .registry import cache_scoped

    e = spread(load_table(spark, sf_dir, "events"))
    keyed = cache_scoped(
        e.filter(F.col("event_type").isin("click", "purchase"))
        .select(
            F.col("event_type").alias("grp"),
            F.concat_ws(
                ":", F.col("user_id").cast("string"), F.date_format("ts", "dd")
            ).alias("k"),
        )
        .distinct()
    )
    h = keyed.select(
        "grp",
        F.conv(F.substring(F.md5("k"), 1, 15), 16, 10).cast("long").alias("h"),
    )
    rows = h.select(
        "grp",
        (F.col("h") % _HLL_M).alias("bucket"),
        F.expr(f"h DIV {_HLL_M}").alias("w"),
    )
    regs = rows.groupBy("grp", "bucket").agg(
        F.max(
            F.when(F.col("w") == 0, 53).otherwise(53 - F.length(F.bin("w")))
        ).alias("m_raw")
    )
    regs = cache_scoped(regs)
    regs_all = regs.unionAll(
        regs.groupBy("bucket")
        .agg(F.max("m_raw").alias("m_raw"))
        .select(F.lit("union").alias("grp"), "bucket", "m_raw")
    )
    agg = regs_all.groupBy("grp").agg(
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
    qln = lambda c: F.floor(F.log(c) * _Q + F.lit(0.5)).cast("double") / _Q  # noqa: E731
    est = agg.select(
        "grp",
        F.when(
            (raw <= 2.5 * _HLL_M) & (F.col("v") > 0),
            F.lit(float(_HLL_M))
            * qln(F.lit(float(_HLL_M)) / F.col("v").cast("double")),
        )
        .otherwise(raw)
        .alias("e"),
    )
    exact = keyed.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact")
    ).unionAll(
        keyed.agg(F.countDistinct("k").cast("long").alias("n_exact")).select(
            F.lit("union").alias("grp"), "n_exact"
        )
    )
    x = est.join(exact, "grp")
    cs = lambda g, c: F.sum(F.when(F.col("grp") == g, F.col(c)))  # noqa: E731
    piv = x.agg(
        cs("click", "n_exact").cast("long").alias("xa"),
        cs("purchase", "n_exact").cast("long").alias("xb"),
        cs("union", "n_exact").cast("long").alias("xu"),
        cs("click", "e").alias("ea"),
        cs("purchase", "e").alias("eb"),
        cs("union", "e").alias("eu"),
    )
    out = (
        piv.select(F.lit("click").alias("set_name"), F.col("xa").alias("n_exact"), F.col("ea").alias("e"))
        .unionAll(piv.select(F.lit("purchase"), "xb", "eb"))
        .unionAll(piv.select(F.lit("union"), "xu", "eu"))
        .unionAll(
            piv.select(
                F.lit("intersection"),
                (F.col("xa") + F.col("xb") - F.col("xu")).alias("n_exact"),
                (F.col("ea") + F.col("eb") - F.col("eu")).alias("e"),
            )
        )
    )
    return out.select(
        "set_name",
        "n_exact",
        pround(F.col("e"), 4).alias("n_est"),
        F.when(
            F.col("n_exact") > 0,
            pround(
                (F.col("e") - F.col("n_exact").cast("double"))
                / F.col("n_exact").cast("double"),
                6,
            ),
        ).alias("rel_err"),
    )
