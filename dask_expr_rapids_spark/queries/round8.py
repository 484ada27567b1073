"""Round-8 curation operators: URL canonicalization dedup (the 9th
dedup strategy — the CCNet/RefinedWeb pre-text step) and a LEARNED
linear quality scorer (closed-form normal equations over hashed-free
integer text features).

Not in the reference (its surface is the pandas algebra,
``/root/reference/dask_expr/_collection.py``); these extend the LLM-data
pipeline layer (SURVEY.md §7 phase 4).

Scale notes (100 TB posture):

* URL dedup — canonicalization is PURE map-side string work (JVM
  regex/split/sort, no UDF, no shuffle); the only corpus-wide shuffle is
  the (source, canonical-url) count, map-side combinable.  At 100 TB
  this is the cheapest dedup strategy in the family — it needs no
  content at all, which is exactly why CCNet runs it before any text
  pass.
* learned scorer — training IS one aggregation: nine exact integer
  moments over the train slice (map-side combinable, any cluster size),
  Cramer's rule on the driver-free 3×3 normal equations entirely inside
  the projection, scoring map-side against the broadcast one-row model.
  The same shape as ml.py's OLS/NB family: no iterations, no
  ``collect()``, bit-identical at any parallelism.

The documents table carries no URL column, so the messy URLs are DERIVED
deterministically from (doc_id, source) — six realistic variant shapes
(scheme/host case, tracking params, param order, trailing slash, default
port, fragment, www) that the canonicalizer must collapse; both engines
build the identical column, so the oracle hash-checks the whole
canonicalize→cluster→survivor pipeline (same pattern as the pHash fake
pixels in queries/multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.exact import dec_to_double, pround, pround_expr
from ..sources.tables import load_table, spread
from .registry import register

# --------------------------------------------------------------------------
# 9th dedup strategy: URL/metadata canonicalization.
#
# Canonical form (CCNet/RefinedWeb conventions):
#   * scheme dropped (http/https/case variants never split a document),
#   * host lowercased, default ports (:80/:443) and a leading ``www.``
#     stripped,
#   * fragment dropped,
#   * path: duplicate slashes collapsed, trailing slash stripped,
#   * query: tracking params removed (utm_*, ref, fbclid, gclid),
#     the survivors SORTED so param order cannot split a URL.
# Survivor per canonical cluster = MIN(doc_id) (stable, engine-free).
# --------------------------------------------------------------------------

_TRACKING_RE = "^utm_|^ref=|^fbclid=|^gclid="

_URL_BUILD_SQL = """
      CASE doc_id % 6
        WHEN 0 THEN 'http://' || source || '.example.com/docs/'
                    || CAST(doc_id % 23 AS VARCHAR)
        WHEN 1 THEN 'HTTP://WWW.' || upper(source) || '.EXAMPLE.COM/docs/'
                    || CAST(doc_id % 23 AS VARCHAR) || '/'
        WHEN 2 THEN 'http://' || source || '.example.com:80/docs/'
                    || CAST(doc_id % 23 AS VARCHAR)
                    || '?utm_source=feed&utm_campaign=x'
        WHEN 3 THEN 'http://' || source || '.example.com/docs/'
                    || CAST(doc_id % 23 AS VARCHAR) || '?b=2&a=1#frag'
        WHEN 4 THEN 'http://www.' || source || '.example.com/docs/'
                    || CAST(doc_id % 23 AS VARCHAR) || '?a=1&b=2&ref=tw'
        ELSE 'https://' || source || '.example.com/docs/'
             || CAST(doc_id % 23 AS VARCHAR)
      END
"""


@register(
    "dedup_url_canonical",
    f"""
    WITH u AS (
      SELECT doc_id, source, {_URL_BUILD_SQL} AS url FROM documents
    ),
    c1 AS (
      SELECT doc_id, source,
             regexp_replace(regexp_replace(url, '^[A-Za-z]+://', ''),
                            '#.*$', '') AS s
      FROM u
    ),
    c2 AS (
      SELECT doc_id, source,
             split_part(s, '?', 1) AS hostpath,
             split_part(s, '?', 2) AS query
      FROM c1
    ),
    c3 AS (
      SELECT doc_id, source,
             regexp_replace(regexp_replace(
                 lower(split_part(hostpath, '/', 1)), ':(80|443)$', ''),
                 '^www\\.', '') AS host,
             regexp_replace(regexp_replace(regexp_replace(
                 hostpath, '^[^/]*', ''), '//+', '/'), '/$', '') AS path,
             array_to_string(list_sort(list_filter(string_split(query, '&'),
                 p -> p <> '' AND NOT regexp_matches(p, '{_TRACKING_RE}'))),
                 '&') AS q
      FROM c2
    ),
    canon AS (
      SELECT doc_id, source,
             host || path
             || CASE WHEN q <> '' THEN '?' || q ELSE '' END AS curl
      FROM c3
    ),
    clusters AS (
      SELECT source, curl, COUNT(*) AS n, MIN(doc_id) AS survivor
      FROM canon GROUP BY 1, 2
    )
    SELECT source,
           CAST(SUM(n) AS BIGINT) AS n_urls,
           COUNT(*) AS n_canonical,
           CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_dup_urls,
           CAST(MAX(n) AS BIGINT) AS max_cluster_size,
           CAST(SUM(survivor) AS BIGINT) AS survivor_doc_sum
    FROM clusters GROUP BY source
    """,
)
def dedup_url_canonical(spark, sf_dir):
    """URL canonicalization dedup: collapse scheme/case/port/www/
    tracking-param/param-order/trailing-slash/fragment variants onto one
    canonical URL per document, cluster by it, keep the min-doc_id
    survivor; per-source rollup (url count, canonical count, dup count,
    largest cluster, survivor checksum)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    pid = F.pmod("doc_id", F.lit(23)).cast("string")
    b = F.pmod("doc_id", F.lit(6))
    base = F.concat(F.col("source"), F.lit(".example.com"))
    url = (
        F.when(b == 0, F.concat(F.lit("http://"), base, F.lit("/docs/"), pid))
        .when(
            b == 1,
            F.concat(
                F.lit("HTTP://WWW."), F.upper(base), F.lit("/docs/"), pid, F.lit("/")
            ),
        )
        .when(
            b == 2,
            F.concat(
                F.lit("http://"),
                base,
                F.lit(":80/docs/"),
                pid,
                F.lit("?utm_source=feed&utm_campaign=x"),
            ),
        )
        .when(
            b == 3,
            F.concat(F.lit("http://"), base, F.lit("/docs/"), pid, F.lit("?b=2&a=1#frag")),
        )
        .when(
            b == 4,
            F.concat(
                F.lit("http://www."), base, F.lit("/docs/"), pid, F.lit("?a=1&b=2&ref=tw")
            ),
        )
        .otherwise(F.concat(F.lit("https://"), base, F.lit("/docs/"), pid))
    )
    u = d.select("doc_id", "source", url.alias("url"))
    s = F.regexp_replace(F.regexp_replace("url", r"^[A-Za-z]+://", ""), r"#.*$", "")
    c1 = u.select("doc_id", "source", s.alias("s"))
    c2 = c1.select(
        "doc_id",
        "source",
        F.split_part(F.col("s"), F.lit("?"), F.lit(1)).alias("hostpath"),
        F.split_part(F.col("s"), F.lit("?"), F.lit(2)).alias("query"),
    )
    host = F.regexp_replace(
        F.regexp_replace(
            F.lower(F.split_part(F.col("hostpath"), F.lit("/"), F.lit(1))),
            r":(80|443)$",
            "",
        ),
        r"^www\.",
        "",
    )
    path = F.regexp_replace(
        F.regexp_replace(F.regexp_replace("hostpath", r"^[^/]*", ""), r"//+", "/"),
        r"/$",
        "",
    )
    q = F.array_join(
        F.array_sort(
            F.filter(
                F.split("query", "&"),
                lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
            )
        ),
        "&",
    )
    canon = c2.select(
        "doc_id",
        "source",
        F.concat(
            host, path, F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit(""))
        ).alias("curl"),
    )
    clusters = canon.groupBy("source", "curl").agg(
        F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("survivor")
    )
    return clusters.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_urls"),
        F.count(F.lit(1)).alias("n_canonical"),
        (F.sum("n") - F.count(F.lit(1))).cast("long").alias("n_dup_urls"),
        F.max("n").cast("long").alias("max_cluster_size"),
        F.sum("survivor").cast("long").alias("survivor_doc_sum"),
    )


# --------------------------------------------------------------------------
# Learned quality scorer — a TRAINED linear model as one aggregation
# (the round-7 verdict's item #7: complete the curation gate with a
# scorer whose weights come from data, not hand-set thresholds).
#
# Model: ordinary least squares  y ~ w0 + w1·x1 + w2·x2  where
#   x1 = mean token length (milli units, exact integer DIV),
#   x2 = stopword ratio    (milli units, exact integer DIV),
#   y  = the curation label (n_chars >= 300) on the TRAIN slice
#        (doc_id % 10 < 8; the 20% holdout is scored but never trained
#        on — the leakage-safe split convention).
#
# Exactness: the nine normal-equation moments (n, Σx1, Σx2, Σx1², Σx1x2,
# Σx2², Σy, Σx1y, Σx2y) are exact DECIMAL(38,0) sums of integer products
# — map-side combinable, order-independent, any cluster size.  Each
# moment converts to double via the modulo split (exact to 2^85 ≈ 3.9e25,
# i.e. ~1e13 train docs at milli features), and Cramer's rule on the
# centered 2×2 system runs in IEEE doubles with THE SAME expression
# order in both engines — bit-identical weights, hence a hash-checkable
# model.  Scoring is one broadcast of the one-row model; per-doc scores
# are quantized to integer micro units before the per-source sums, so
# the rollup is again exact-integer.  Differential test vs numpy lstsq:
# tests/test_round8_ops.py.
# --------------------------------------------------------------------------

_QS_NORM_SQL = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"

_QS_FEAT_SQL = f"""
    feats AS (
      SELECT doc_id, source,
             (1000 * length(norm)) // nw AS x1,
             (1000 * nstop) // nw AS x2,
             CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS y,
             CASE WHEN doc_id % 10 < 8 THEN 1 ELSE 0 END AS is_train
      FROM (
        SELECT doc_id, source, n_chars, norm,
               len(string_split(norm, ' ')) AS nw,
               len(list_filter(string_split(norm, ' '),
                               w -> w IN ('a', 'the'))) AS nstop
        FROM (SELECT doc_id, source, n_chars, {_QS_NORM_SQL} AS norm
              FROM documents WHERE trim(text) <> '') t
      ) f
    )
"""

_QS_MODEL_SQL = """
    m AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             {S1} AS s1, {S2} AS s2, {S11} AS s11,
             {S12} AS s12, {S22} AS s22,
             {Sy} AS sy, {S1y} AS s1y, {S2y} AS s2y
      FROM feats WHERE is_train = 1
    ),
    w AS (
      SELECT
        ((n * s11) - (s1 * s1)) AS c11,
        ((n * s12) - (s1 * s2)) AS c12,
        ((n * s22) - (s2 * s2)) AS c22,
        ((n * s1y) - (s1 * sy)) AS c1y,
        ((n * s2y) - (s2 * sy)) AS c2y,
        n, s1, s2, sy
      FROM m
    ),
    model AS (
      SELECT
        (((c1y * c22) - (c2y * c12)) / ((c11 * c22) - (c12 * c12))) AS w1,
        (((c2y * c11) - (c1y * c12)) / ((c11 * c22) - (c12 * c12))) AS w2,
        n, s1, s2, sy
      FROM w
    ),
    model2 AS (
      SELECT w1, w2,
             ((sy - (w1 * s1)) - (w2 * s2)) / n AS w0
      FROM model
    )
"""


def _qs_moment_sql(expr: str) -> str:
    from ..functions.exact import dec2dbl_expr

    return dec2dbl_expr(f"SUM(CAST(({expr}) AS DECIMAL(38,0)))", 0)


@register(
    "quality_scorer_linear",
    f"""
    WITH {_QS_FEAT_SQL},
    {_QS_MODEL_SQL.format(
        S1=_qs_moment_sql('x1'), S2=_qs_moment_sql('x2'),
        S11=_qs_moment_sql('x1 * x1'), S12=_qs_moment_sql('x1 * x2'),
        S22=_qs_moment_sql('x2 * x2'), Sy=_qs_moment_sql('y'),
        S1y=_qs_moment_sql('x1 * y'), S2y=_qs_moment_sql('x2 * y'))},
    scored AS (
      SELECT f.source, f.is_train,
             CAST(floor((m.w0 + (m.w1 * f.x1) + (m.w2 * f.x2)) * 1000000.0
                        + 0.5) AS BIGINT) AS score_micro,
             m.w0, m.w1, m.w2
      FROM feats f, model2 m
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(score_micro) AS BIGINT) AS sum_score_micro,
           CAST(SUM(CASE WHEN score_micro >= 500000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pass,
           CAST(SUM(CASE WHEN is_train = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_holdout,
           CAST(MIN(floor(w0 * 1000000000.0 + 0.5)) AS BIGINT) AS w0_nano,
           CAST(MIN(floor(w1 * 1000000000.0 + 0.5)) AS BIGINT) AS w1_nano,
           CAST(MIN(floor(w2 * 1000000000.0 + 0.5)) AS BIGINT) AS w2_nano
    FROM scored GROUP BY source
    """,
)
def quality_scorer_linear(spark, sf_dir):
    """Closed-form OLS quality scorer: train on the 80% slice, score all
    docs map-side against the broadcast one-row model, roll up per
    source (plus the learned weights, hash-pinned as nano-unit ints)."""
    d = spread(load_table(spark, sf_dir, "documents")).filter(F.trim("text") != "")
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    words = F.split(norm, " ")
    nstop = F.size(F.filter(words, lambda w: w.isin("a", "the")))
    feats = d.select(
        "doc_id",
        "source",
        (F.lit(1000) * F.length(norm)).alias("__numc__"),
        F.size(words).alias("__nw__"),
        (F.lit(1000) * nstop).alias("__nums__"),
        F.when(F.col("n_chars") >= 300, 1).otherwise(0).alias("y"),
        F.when(F.pmod("doc_id", F.lit(10)) < 8, 1).otherwise(0).alias("is_train"),
    ).select(
        "doc_id",
        "source",
        F.expr("__numc__ DIV __nw__").alias("x1"),
        F.expr("__nums__ DIV __nw__").alias("x2"),
        "y",
        "is_train",
    )
    from .registry import cache_scoped

    feats = cache_scoped(feats)
    DEC = "decimal(38,0)"
    train = feats.filter(F.col("is_train") == 1)
    m = train.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dec_to_double(F.sum(F.col("x1").cast(DEC)), 0).alias("s1"),
        dec_to_double(F.sum(F.col("x2").cast(DEC)), 0).alias("s2"),
        dec_to_double(F.sum((F.col("x1") * F.col("x1")).cast(DEC)), 0).alias("s11"),
        dec_to_double(F.sum((F.col("x1") * F.col("x2")).cast(DEC)), 0).alias("s12"),
        dec_to_double(F.sum((F.col("x2") * F.col("x2")).cast(DEC)), 0).alias("s22"),
        dec_to_double(F.sum(F.col("y").cast(DEC)), 0).alias("sy"),
        dec_to_double(F.sum((F.col("x1") * F.col("y")).cast(DEC)), 0).alias("s1y"),
        dec_to_double(F.sum((F.col("x2") * F.col("y")).cast(DEC)), 0).alias("s2y"),
    )
    c = m.select(
        ((F.col("n") * F.col("s11")) - (F.col("s1") * F.col("s1"))).alias("c11"),
        ((F.col("n") * F.col("s12")) - (F.col("s1") * F.col("s2"))).alias("c12"),
        ((F.col("n") * F.col("s22")) - (F.col("s2") * F.col("s2"))).alias("c22"),
        ((F.col("n") * F.col("s1y")) - (F.col("s1") * F.col("sy"))).alias("c1y"),
        ((F.col("n") * F.col("s2y")) - (F.col("s2") * F.col("sy"))).alias("c2y"),
        "n",
        "s1",
        "s2",
        "sy",
    )
    det = (F.col("c11") * F.col("c22")) - (F.col("c12") * F.col("c12"))
    model = c.select(
        (((F.col("c1y") * F.col("c22")) - (F.col("c2y") * F.col("c12"))) / det).alias(
            "w1"
        ),
        (((F.col("c2y") * F.col("c11")) - (F.col("c1y") * F.col("c12"))) / det).alias(
            "w2"
        ),
        "n",
        "s1",
        "s2",
        "sy",
    ).select(
        "w1",
        "w2",
        (
            ((F.col("sy") - (F.col("w1") * F.col("s1"))) - (F.col("w2") * F.col("s2")))
            / F.col("n")
        ).alias("w0"),
    )
    scored = feats.crossJoin(F.broadcast(model)).select(
        "source",
        "is_train",
        F.floor(
            (F.col("w0") + (F.col("w1") * F.col("x1")) + (F.col("w2") * F.col("x2")))
            * 1_000_000.0
            + 0.5
        )
        .cast("long")
        .alias("score_micro"),
        "w0",
        "w1",
        "w2",
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("score_micro").cast("long").alias("sum_score_micro"),
        F.sum(F.when(F.col("score_micro") >= 500_000, 1).otherwise(0))
        .cast("long")
        .alias("n_pass"),
        F.sum(F.when(F.col("is_train") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_holdout"),
        F.floor(F.min("w0") * 1_000_000_000.0 + 0.5).cast("long").alias("w0_nano"),
        F.floor(F.min("w1") * 1_000_000_000.0 + 0.5).cast("long").alias("w1_nano"),
        F.floor(F.min("w2") * 1_000_000_000.0 + 0.5).cast("long").alias("w2_nano"),
    )
