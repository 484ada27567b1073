"""Table-mutation semantics as pure relational plans: MERGE INTO (upsert)
and slowly-changing-dimension type-2 history building.

The reference has no mutation surface (its collections are immutable,
``/root/reference/dask_expr/_collection.py``); warehouse engines express
these as DML.  On Spark-without-a-lakehouse-format the same semantics are
a union + keyed window — which is exactly how Delta/Iceberg execute the
matched/not-matched branches under the hood (shuffle on the merge key),
so the plan shape below IS the 100 TB plan:

* upsert: base ∪ updates ∪ inserts, one row_number window partitioned by
  the merge key (single shuffle).  No driver-side key set, no broadcast
  of a corpus-scaling side; update/insert branches are computed
  column-wise from the scan.
* SCD2: the change-log union shuffles once on (key), then one window
  (ORDER BY version) derives valid_from/valid_to/is_current with lead();
  Exchange reuse keeps the union's shuffle as the window's input.

Determinism: prices quantized with pround; version ordering is total
(key, version) so lead() is unambiguous.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.exact import dsum_expr, pround, pround_expr
from ..sources.tables import load_table, spread
from .registry import register


@register(
    "merge_upsert_orders",
    f"""
    WITH base AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice,
             'base' AS src, 0 AS priority
      FROM orders
    ),
    updates AS (
      SELECT o_orderkey, 'U' AS o_orderstatus,
             o_totalprice * 1.1 AS o_totalprice,
             'update' AS src, 1 AS priority
      FROM orders WHERE o_orderkey % 7 = 0
    ),
    inserts AS (
      SELECT -o_orderkey AS o_orderkey, 'I' AS o_orderstatus, o_totalprice,
             'insert' AS src, 1 AS priority
      FROM orders WHERE o_orderkey % 13 = 0
    ),
    unioned AS (
      SELECT * FROM base UNION ALL
      SELECT * FROM updates UNION ALL
      SELECT * FROM inserts
    ),
    merged AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice, src,
             ROW_NUMBER() OVER (PARTITION BY o_orderkey
                                ORDER BY priority DESC, src) AS rn
      FROM unioned
    )
    SELECT o_orderkey, o_orderstatus, src,
           {pround_expr('o_totalprice', 2)} AS o_totalprice
    FROM merged WHERE rn = 1
    """,
)
def merge_upsert_orders(spark, sf_dir):
    """MERGE INTO orders: matched keys (k%7=0) take the update branch,
    unmatched update-side keys (synthesized as negative keys, k%13=0)
    insert, everything else keeps the base row.

    Plan: three scans of one cached orders relation union'd, one
    row_number window on the merge key — the single-shuffle upsert.
    """
    o = spread(load_table(spark, sf_dir, "orders"))
    from .registry import cache_scoped

    o = cache_scoped(o.select("o_orderkey", "o_orderstatus", "o_totalprice"))
    base = o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.lit("base").alias("src"),
        F.lit(0).alias("priority"),
    )
    updates = o.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") * 1.1).alias("o_totalprice"),
        F.lit("update").alias("src"),
        F.lit(1).alias("priority"),
    )
    inserts = o.filter(F.col("o_orderkey") % 13 == 0).select(
        (-F.col("o_orderkey")).alias("o_orderkey"),
        F.lit("I").alias("o_orderstatus"),
        "o_totalprice",
        F.lit("insert").alias("src"),
        F.lit(1).alias("priority"),
    )
    unioned = base.unionAll(updates).unionAll(inserts)
    win = W.partitionBy("o_orderkey").orderBy(F.desc("priority"), F.asc("src"))
    return (
        unioned.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderkey",
            "o_orderstatus",
            "src",
            pround(F.col("o_totalprice"), 2).alias("o_totalprice"),
        )
    )


@register(
    "scd2_customer_history",
    f"""
    WITH changes AS (
      SELECT c_custkey, 1 AS version, c_acctbal FROM customer
      UNION ALL
      SELECT c_custkey, 2 AS version, c_acctbal + 100.0
      FROM customer WHERE c_custkey % 5 = 0
      UNION ALL
      SELECT c_custkey, 3 AS version, c_acctbal + 250.0
      FROM customer WHERE c_custkey % 15 = 0
    )
    SELECT c_custkey,
           version AS valid_from,
           lead(version) OVER (PARTITION BY c_custkey ORDER BY version)
             AS valid_to,
           {pround_expr('c_acctbal', 2)} AS acctbal,
           (lead(version) OVER (PARTITION BY c_custkey ORDER BY version)
              IS NULL) AS is_current
    FROM changes
    """,
)
def scd2_customer_history(spark, sf_dir):
    """SCD type-2 dimension history from a three-snapshot change-log:
    valid_from/valid_to interval per (key, version), open interval =
    current row.

    Plan: snapshot union (three filters over one cached scan) → one
    shuffle on c_custkey for the lead() window.
    """
    c = spread(load_table(spark, sf_dir, "customer"))
    from .registry import cache_scoped

    c = cache_scoped(c.select("c_custkey", "c_acctbal"))
    changes = (
        c.select("c_custkey", F.lit(1).alias("version"), F.col("c_acctbal"))
        .unionAll(
            c.filter(F.col("c_custkey") % 5 == 0).select(
                "c_custkey",
                F.lit(2).alias("version"),
                (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
            )
        )
        .unionAll(
            c.filter(F.col("c_custkey") % 15 == 0).select(
                "c_custkey",
                F.lit(3).alias("version"),
                (F.col("c_acctbal") + 250.0).alias("c_acctbal"),
            )
        )
    )
    win = W.partitionBy("c_custkey").orderBy("version")
    nxt = F.lead("version").over(win)
    return changes.select(
        "c_custkey",
        F.col("version").alias("valid_from"),
        nxt.alias("valid_to"),
        pround(F.col("c_acctbal"), 2).alias("acctbal"),
        nxt.isNull().alias("is_current"),
    )


# --------------------------------------------------------------------------
# Point-in-time (temporal) dimension join: each fact row joins the SCD2
# dimension version that was valid AT FACT TIME — the lookup every
# warehouse does against a type-2 dimension, and the reason SCD2 exists.
# Composes the mutation layer's history build with the as-of operator
# (operators/asof.py: union + one window = single shuffle, no range
# explosion, no per-fact subquery).
# --------------------------------------------------------------------------
_SCD2_DATES = {1: "1992-01-01", 2: "1996-01-01", 3: "1997-06-01"}


@register(
    "pointintime_dim_join_orders",
    f"""
    WITH dim AS (
      SELECT c_custkey, CAST('{_SCD2_DATES[1]}' AS DATE) AS valid_from,
             c_acctbal AS acctbal FROM customer
      UNION ALL
      SELECT c_custkey, CAST('{_SCD2_DATES[2]}' AS DATE), c_acctbal + 100.0
      FROM customer WHERE c_custkey % 5 = 0
      UNION ALL
      SELECT c_custkey, CAST('{_SCD2_DATES[3]}' AS DATE), c_acctbal + 250.0
      FROM customer WHERE c_custkey % 15 = 0
    ),
    matched AS (
      SELECT o.o_orderkey, o.o_custkey, o.o_orderdate, o.o_totalprice,
             (SELECT MAX(d.valid_from) FROM dim d
              WHERE d.c_custkey = o.o_custkey
                AND d.valid_from <= o.o_orderdate) AS v
      FROM orders o
    )
    SELECT m.o_orderkey,
           STRFTIME(m.o_orderdate, '%Y-%m-%d') AS order_date,
           STRFTIME(m.v, '%Y-%m-%d') AS dim_valid_from,
           {pround_expr('d.acctbal', 2)} AS acctbal_at_order,
           {pround_expr('m.o_totalprice + d.acctbal', 2)} AS price_plus_balance
    FROM matched m
    JOIN dim d ON d.c_custkey = m.o_custkey AND d.valid_from = m.v
    """,
)
def pointintime_dim_join_orders(spark, sf_dir):
    """Orders joined to the customer-dimension version valid at order
    date (SCD2 point-in-time lookup) via the single-shuffle as-of join.

    Every order matches: version 1 predates the earliest TPC-H order.
    The oracle uses the textbook correlated-subquery formulation; this
    plan replaces it with union+window (operators/asof.py) — same rows,
    no per-fact subquery, one shuffle on the customer key.
    """
    from ..operators.asof import merge_asof

    c = spread(load_table(spark, sf_dir, "customer"))
    from .registry import cache_scoped

    c = cache_scoped(c.select("c_custkey", "c_acctbal"))
    dim = (
        c.select(
            "c_custkey",
            F.lit(_SCD2_DATES[1]).cast("date").alias("valid_from"),
            F.col("c_acctbal").alias("acctbal"),
        )
        .unionAll(
            c.filter(F.col("c_custkey") % 5 == 0).select(
                "c_custkey",
                F.lit(_SCD2_DATES[2]).cast("date").alias("valid_from"),
                (F.col("c_acctbal") + 100.0).alias("acctbal"),
            )
        )
        .unionAll(
            c.filter(F.col("c_custkey") % 15 == 0).select(
                "c_custkey",
                F.lit(_SCD2_DATES[3]).cast("date").alias("valid_from"),
                (F.col("c_acctbal") + 250.0).alias("acctbal"),
            )
        )
    )
    o = spread(load_table(spark, sf_dir, "orders")).select(
        F.col("o_orderkey"),
        F.col("o_custkey").alias("c_custkey"),
        F.col("o_orderdate").alias("valid_from"),
        F.col("o_totalprice"),
    )
    j = merge_asof(o, dim, on="valid_from", by="c_custkey", direction="backward")
    return j.select(
        "o_orderkey",
        F.date_format("valid_from", "yyyy-MM-dd").alias("order_date"),
        F.date_format("asof_valid_from", "yyyy-MM-dd").alias("dim_valid_from"),
        pround(F.col("asof_acctbal"), 2).alias("acctbal_at_order"),
        pround(F.col("o_totalprice") + F.col("asof_acctbal"), 2).alias(
            "price_plus_balance"
        ),
    )


# --------------------------------------------------------------------------
# Snapshot diff: classify every key across two table versions as
# added / removed / changed / unchanged — the audit primitive behind
# lakehouse time travel, CDC reconciliation, and incremental-ingest
# validation.  v2 is derived deterministically from v1 (update branch
# k%7=0, delete branch k%11=5 with delete-wins, inserts as negative
# k%13=0 keys), so the diff exercises all four classes.
#
# Plan shape: both versions project from ONE cached scan; the diff is a
# single full-outer hash join on the key (both sides shuffle-partitioned
# by o_orderkey — at 100 TB this is the canonical co-partitioned diff,
# and with both versions bucketed on the key it would be exchange-free).
# Aggregation to per-class counts + an exact decimal price delta keeps
# the output O(1).
# --------------------------------------------------------------------------


@register(
    "snapshot_diff_orders",
    f"""
    WITH v1 AS (
      SELECT o_orderkey AS k, o_orderstatus AS st, o_totalprice AS pr
      FROM orders
    ),
    v2 AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 7 = 0 THEN 'U' ELSE o_orderstatus END AS st,
             CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 1.1
                  ELSE o_totalprice END AS pr
      FROM orders WHERE o_orderkey % 11 <> 5
      UNION ALL
      SELECT -o_orderkey AS k, 'I' AS st, o_totalprice AS pr
      FROM orders WHERE o_orderkey % 13 = 0
    ),
    diff AS (
      SELECT COALESCE(a.k, b.k) AS k,
             CASE WHEN a.k IS NULL THEN 'added'
                  WHEN b.k IS NULL THEN 'removed'
                  WHEN a.st <> b.st OR a.pr <> b.pr THEN 'changed'
                  ELSE 'unchanged' END AS status,
             COALESCE(b.pr, 0.0) - COALESCE(a.pr, 0.0) AS delta
      FROM v1 a FULL OUTER JOIN v2 b ON a.k = b.k
    )
    SELECT status, CAST(COUNT(*) AS BIGINT) AS n,
           {pround_expr(dsum_expr('delta'), 2)} AS net_price_delta
    FROM diff GROUP BY status
    """,
)
def snapshot_diff_orders(spark, sf_dir):
    """Diff two deterministic versions of orders: per-class row counts
    (added/removed/changed/unchanged) and the exact net price delta, via
    one full-outer key join over a single cached scan."""
    from ..functions.exact import dsum
    from .registry import cache_scoped

    o = cache_scoped(
        spread(load_table(spark, sf_dir, "orders")).select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        )
    )
    v1 = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        F.col("o_totalprice").alias("pr"),
    )
    upd = F.col("o_orderkey") % 7 == 0
    v2 = (
        o.filter(F.col("o_orderkey") % 11 != 5)
        .select(
            F.col("o_orderkey").alias("k"),
            F.when(upd, "U").otherwise(F.col("o_orderstatus")).alias("st"),
            F.when(upd, F.col("o_totalprice") * 1.1)
            .otherwise(F.col("o_totalprice"))
            .alias("pr"),
        )
        .unionAll(
            o.filter(F.col("o_orderkey") % 13 == 0).select(
                (-F.col("o_orderkey")).alias("k"),
                F.lit("I").alias("st"),
                F.col("o_totalprice").alias("pr"),
            )
        )
    )
    a, b = v1.alias("a"), v2.alias("b")
    joined = a.join(b, F.col("a.k") == F.col("b.k"), "full_outer")
    status = (
        F.when(F.col("a.k").isNull(), "added")
        .when(F.col("b.k").isNull(), "removed")
        .when(
            (F.col("a.st") != F.col("b.st")) | (F.col("a.pr") != F.col("b.pr")),
            "changed",
        )
        .otherwise("unchanged")
    )
    diff = joined.select(
        status.alias("status"),
        (
            F.coalesce(F.col("b.pr"), F.lit(0.0))
            - F.coalesce(F.col("a.pr"), F.lit(0.0))
        ).alias("delta"),
    )
    return diff.groupBy("status").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        pround(dsum("delta"), 2).alias("net_price_delta"),
    )


# --------------------------------------------------------------------------
# Partition checksum reconciliation — the scale-first companion to
# snapshot_diff: before diffing two 100 TB table versions row-by-row,
# compare ONE bounded relation of per-bucket (count, xor-of-row-
# fingerprints) checksums and diff only the buckets that diverge.  XOR is
# commutative/associative/self-inverse, so the bucket checksum is
# shuffle-order-independent and map-side combinable, and two buckets with
# equal (count, xor) match except with ~2^-60 collision probability.
# The synthetic v2 localizes its edits (price bump in every 37th bucket,
# partial delete in bucket 999) so divergence is sparse — the situation
# the pattern exists for.  Output is diverged buckets only (bounded by
# the fixed bucket count), classified as count vs content drift.
# --------------------------------------------------------------------------
from .text import _md5_uint_sql  # noqa: E402

_CKS_BUCKETS = 1024


def _cks_fp_spark():
    """60-bit row fingerprint: md5 over key:status:price-cents."""
    cents = F.floor(F.col("pr") * 100 + F.lit(0.5)).cast("long")
    s = F.concat_ws(":", F.col("k").cast("string"), F.col("st"), cents.cast("string"))
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


_CKS_FP_SQL = _md5_uint_sql(
    "CAST(k AS VARCHAR) || ':' || st || ':' || "
    "CAST(CAST(floor(pr * 100 + 0.5) AS BIGINT) AS VARCHAR)",
    15,
)


@register(
    "partition_checksum_diff_orders",
    f"""
    WITH v1 AS (
      SELECT o_orderkey AS k, o_orderstatus AS st,
             CAST(o_totalprice AS DOUBLE) AS pr,
             o_orderkey % {_CKS_BUCKETS} AS bucket
      FROM orders
    ),
    v2 AS (
      SELECT k, st,
             CASE WHEN bucket % 37 = 5 THEN pr * 1.1 ELSE pr END AS pr,
             bucket
      FROM v1
      WHERE NOT (bucket = 999 AND k % 3 = 0)
    ),
    c1 AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n1,
             CAST(bit_xor({_CKS_FP_SQL}) AS BIGINT) AS x1
      FROM v1 GROUP BY bucket
    ),
    c2 AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n2,
             CAST(bit_xor({_CKS_FP_SQL}) AS BIGINT) AS x2
      FROM v2 GROUP BY bucket
    )
    SELECT COALESCE(c1.bucket, c2.bucket) AS bucket,
           COALESCE(n1, 0) AS n_v1, COALESCE(n2, 0) AS n_v2,
           CASE WHEN COALESCE(n1, 0) <> COALESCE(n2, 0) THEN 'count_drift'
                ELSE 'content_drift' END AS reason
    FROM c1 FULL OUTER JOIN c2 ON c1.bucket = c2.bucket
    WHERE COALESCE(n1, 0) <> COALESCE(n2, 0)
       OR COALESCE(x1, 0) <> COALESCE(x2, 0)
    """,
)
def partition_checksum_diff_orders(spark, sf_dir):
    """Bucket-level checksum reconciliation of two table versions:
    per-bucket (count, xor-of-60-bit-row-fingerprints), full-outer
    compared, diverged buckets only — the bounded pre-filter that makes
    a 100 TB snapshot diff touch only changed key ranges."""
    o = spread(load_table(spark, sf_dir, "orders"))
    v1 = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("st"),
        F.col("o_totalprice").cast("double").alias("pr"),
        (F.col("o_orderkey") % _CKS_BUCKETS).alias("bucket"),
    )
    v2 = v1.filter(~((F.col("bucket") == 999) & (F.col("k") % 3 == 0))).select(
        "k",
        "st",
        F.when(F.col("bucket") % 37 == 5, F.col("pr") * 1.1)
        .otherwise(F.col("pr"))
        .alias("pr"),
        "bucket",
    )

    def checksums(v, n, x):
        return v.withColumn("fp", _cks_fp_spark()).groupBy("bucket").agg(
            F.count(F.lit(1)).cast("long").alias(n),
            F.bit_xor("fp").cast("long").alias(x),
        )

    c1 = checksums(v1, "n1", "x1")
    c2 = checksums(v2, "n2", "x2")
    j = c1.join(c2, "bucket", "full")
    return j.filter(
        (F.coalesce("n1", F.lit(0)) != F.coalesce("n2", F.lit(0)))
        | (F.coalesce("x1", F.lit(0)) != F.coalesce("x2", F.lit(0)))
    ).select(
        "bucket",
        F.coalesce("n1", F.lit(0)).alias("n_v1"),
        F.coalesce("n2", F.lit(0)).alias("n_v2"),
        F.when(
            F.coalesce("n1", F.lit(0)) != F.coalesce("n2", F.lit(0)), "count_drift"
        )
        .otherwise("content_drift")
        .alias("reason"),
    )
