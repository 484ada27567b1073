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

from ..functions.exact import dec2dbl_expr, dec_to_double, pround, pround_expr
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
                 hostpath, '^[^/]*', ''), '//+', '/', 'g'), '/$', '') AS path,
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
             least((1000 * length(norm)) // nw, 2147483647) AS x1,
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
      -- + 0.001·n ridge on the diagonal: a constant (zero-variance)
      -- feature otherwise zeroes the determinant (hit at the sf1
      -- rehearsal, whose digit-suffixed vocabulary contains no bare
      -- stopwords).  Scale-free (lambda fixed in original units; the
      -- n-scaled system multiplies X'X by n) and negligible for any
      -- non-degenerate feature; the numpy differential solves the SAME
      -- ridge system, so agreement stays exact.
      SELECT
        (((n * s11) - (s1 * s1)) + (0.001 * n)) AS c11,
        ((n * s12) - (s1 * s2)) AS c12,
        (((n * s22) - (s2 * s2)) + (0.001 * n)) AS c22,
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


#: both milli features packed into ONE bigint (x1 * 2^31 + x2, x1 < 2^32
#: for docs up to ~4M chars, x2 <= 1000): the normalize regex and the
#: split are let-bound (multimodal.py's element_at(transform(array(..)))
#: trick) and evaluated ONCE per row during the cache fill — three
#: independent feature expressions would re-run the regex 3x and the
#: split 2x on the interpreted HOF path (round-8 review finding)
#: Binding the WORDS array once and deriving the normalized length from
#: it (sum of token lengths + (n-1) separators - exact, norm is
#: single-spaced) keeps one regex + one split per row.  ESCAPE TRAP
#: (cost a debugging session): inside F.expr/SQL string literals Spark
#: parses backslash escapes, so '\s+' in THIS file (one backslash after
#: Python) would reach the regex engine as 's+' - silently replacing
#: letter-s runs with spaces (length-preserving for single s, so probes
#: comparing lengths miss it).  SQL literals need the doubled form
#: below; DuckDB twins do NOT parse backslash escapes, so their '\s+'
#: stays single-backslash - the two engines' SQL literals differ.
#: Pack-overflow guard (round-8 ADVICE): x1 = 1000*len/nw is bounded only
#: by doc shape — a ~4.3M-char one-word doc pushes x1 to 2^32, putting
#: x1 * 2^31 at the bigint overflow boundary.  x1 is clamped to 2^31 - 1
#: (needs a >=2.1M-char single-word doc to trigger; IDENTICAL clamp in
#: the DuckDB feats twin below, so the engines agree even on pathological
#: docs), capping the packed value below 2^62.
_QS_PK_EXPR = r"""
element_at(transform(array(split(regexp_replace(lower(trim(text)), '\\s+', ' '), ' ')),
  ws ->
    least(((1000 * (aggregate(ws, 0, (acc, w) -> acc + length(w)) + size(ws) - 1))
       DIV size(ws)), CAST(2147483647 AS BIGINT)) * CAST(2147483648 AS BIGINT)
      + ((1000 * size(filter(ws, w -> w IN ('a', 'the')))) DIV size(ws))
  ), 1)
"""


def _qs_feats(spark, sf_dir):
    """(doc_id, source, x1, x2, y, is_train) integer feature frame.

    The CACHED column is the packed bigint, so the expensive text pass
    runs once per row at fill time; x1/x2 unpack post-cache with two
    long ops."""
    d = spread(load_table(spark, sf_dir, "documents")).filter(F.trim("text") != "")
    packed = d.select(
        "doc_id",
        "source",
        F.expr(_QS_PK_EXPR).alias("__pk__"),
        F.when(F.col("n_chars") >= 300, 1).otherwise(0).alias("y"),
        F.when(F.pmod("doc_id", F.lit(10)) < 8, 1).otherwise(0).alias("is_train"),
    )
    from .registry import cache_scoped

    packed = cache_scoped(packed)
    return packed.select(
        "doc_id",
        "source",
        F.expr("__pk__ DIV CAST(2147483648 AS BIGINT)").alias("x1"),
        F.expr("__pk__ % CAST(2147483648 AS BIGINT)").alias("x2"),
        "y",
        "is_train",
    )


def _qs_scored(feats):
    """Per-doc integer micro scores against the trained broadcast model:
    (doc_id, source, is_train, y, score_micro, w0, w1, w2)."""
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
    # ridge diagonal (see the SQL twin's comment): identical expression
    # order in both engines keeps the weights bit-equal
    c = m.select(
        (
            ((F.col("n") * F.col("s11")) - (F.col("s1") * F.col("s1")))
            + (F.lit(0.001) * F.col("n"))
        ).alias("c11"),
        ((F.col("n") * F.col("s12")) - (F.col("s1") * F.col("s2"))).alias("c12"),
        (
            ((F.col("n") * F.col("s22")) - (F.col("s2") * F.col("s2")))
            + (F.lit(0.001) * F.col("n"))
        ).alias("c22"),
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
    return feats.crossJoin(F.broadcast(model)).select(
        "doc_id",
        "source",
        "is_train",
        "y",
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
    scored = _qs_scored(_qs_feats(spark, sf_dir))
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


# --------------------------------------------------------------------------
# Scorer calibration on the HOLDOUT: decile the held-out docs by model
# score and report the actual label rate per decile — the standard
# calibration curve that tells a curation pipeline whether "score 0.8"
# means 80%.  Computed ONLY on the 20% slice the model never trained on.
#
# Scale shape: deciles are VALUE-BINNED — each distinct score lands
# wholly in one decile, assigned from the cumulative row count of the
# (score → n, n_pos) aggregate.  That aggregate is map-side combinable
# and its cardinality is bounded by the FEATURE GRID (distinct (x1, x2)
# pairs — thousands), not by corpus rows, so the one ordering window
# runs over a tiny relation; a row-level NTILE would instead sort the
# whole holdout on one task (the no-partition-window trap).  Bins can be
# mildly uneven when a heavy score value straddles a boundary — inherent
# to value-binned quantiles, and irrelevant to calibration reading.
#
# Determinism: integer counts, integer-DIV rates, and a cumulative sum
# over a unique total order (score_micro) — engine-free.
# --------------------------------------------------------------------------
@register(
    "scorer_calibration_deciles",
    f"""
    WITH {_QS_FEAT_SQL},
    {_QS_MODEL_SQL.format(
        S1=_qs_moment_sql('x1'), S2=_qs_moment_sql('x2'),
        S11=_qs_moment_sql('x1 * x1'), S12=_qs_moment_sql('x1 * x2'),
        S22=_qs_moment_sql('x2 * x2'), Sy=_qs_moment_sql('y'),
        S1y=_qs_moment_sql('x1 * y'), S2y=_qs_moment_sql('x2 * y'))},
    scored AS (
      SELECT f.doc_id, f.y,
             CAST(floor((m.w0 + (m.w1 * f.x1) + (m.w2 * f.x2)) * 1000000.0
                        + 0.5) AS BIGINT) AS score_micro
      FROM feats f, model2 m
      WHERE f.is_train = 0
    ),
    vc AS (
      SELECT score_micro, COUNT(*) AS c, SUM(y) AS cp
      FROM scored GROUP BY score_micro
    ),
    cum AS (
      SELECT score_micro, c, cp,
             SUM(c) OVER (ORDER BY score_micro) AS cum,
             SUM(c) OVER () AS total
      FROM vc
    )
    SELECT CAST(((cum - 1) * 10) // total + 1 AS BIGINT) AS decile,
           CAST(SUM(c) AS BIGINT) AS n,
           CAST(SUM(cp) AS BIGINT) AS n_pos,
           CAST((SUM(cp) * 1000000) // SUM(c) AS BIGINT) AS pos_rate_micro,
           CAST(MIN(score_micro) AS BIGINT) AS min_score_micro,
           CAST(MAX(score_micro) AS BIGINT) AS max_score_micro
    FROM cum GROUP BY 1
    """,
)
def scorer_calibration_deciles(spark, sf_dir):
    """Calibration curve of the learned quality scorer on the 20%
    holdout: value-binned score deciles vs observed label rate (see the
    block comment for the scale rationale)."""
    from pyspark.sql import Window as W

    scored = _qs_scored(_qs_feats(spark, sf_dir)).filter(F.col("is_train") == 0)
    vc = scored.groupBy("score_micro").agg(
        F.count(F.lit(1)).alias("c"), F.sum("y").alias("cp")
    )
    w = W.orderBy("score_micro").rowsBetween(W.unboundedPreceding, 0)
    wt = W.partitionBy()
    cum = vc.select(
        "score_micro",
        "c",
        "cp",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(wt).alias("total"),
    )
    binned = cum.select(
        "score_micro",
        "c",
        "cp",
        F.expr("((cum - 1) * 10) DIV total + 1").cast("long").alias("decile"),
    )
    return binned.groupBy("decile").agg(
        F.sum("c").cast("long").alias("n"),
        F.sum("cp").cast("long").alias("n_pos"),
        F.expr("CAST((SUM(cp) * 1000000) DIV SUM(c) AS BIGINT)").alias(
            "pos_rate_micro"
        ),
        F.min("score_micro").cast("long").alias("min_score_micro"),
        F.max("score_micro").cast("long").alias("max_score_micro"),
    )


# --------------------------------------------------------------------------
# CDC latest-wins apply — the Debezium/OGG-shaped change-feed
# materialization a lakehouse ingests continuously: a stream of
# (key, seq, op I/U/D, payload) rows collapses to the CURRENT state by
# keeping each key's highest-sequence row and dropping keys whose final
# op is a delete.  Complements MERGE (one batch vs a base table) and
# SCD2 (history retention): this is the "replica table" materializer.
#
# The change feed is DERIVED deterministically from orders (no CDC
# column in the testdata): every key inserts at seq 1; keys %5==0
# update at seq 2 (+100); keys %15==0 update again at seq 3 (+200);
# keys %7==0 delete at seq 4.  Both engines build the identical feed,
# so the oracle hash-checks feed construction AND apply semantics.
#
# Scale shape: the feed is ONE scan (per-row conditional struct array →
# explode — no 4× self-union scans); latest-wins is one hash shuffle on
# the key + row_number over (key, seq DESC); the rollup reuses nothing
# heavier.  Money sums in cents as DECIMAL(38,0) → modulo-split double.
# --------------------------------------------------------------------------
@register(
    "cdc_apply_orders",
    f"""
    WITH feed AS (
      SELECT o_orderkey AS k, c.seq AS seq, c.op AS op, c.price AS price
      FROM orders, LATERAL (
        SELECT unnest(list_filter([
          {{'seq': 1, 'op': 'I', 'price': o_totalprice}},
          CASE WHEN o_orderkey % 5 = 0 THEN
            {{'seq': 2, 'op': 'U', 'price': o_totalprice + 100.0}} END,
          CASE WHEN o_orderkey % 15 = 0 THEN
            {{'seq': 3, 'op': 'U', 'price': o_totalprice + 200.0}} END,
          CASE WHEN o_orderkey % 7 = 0 THEN
            {{'seq': 4, 'op': 'D', 'price': NULL}} END
        ], x -> x IS NOT NULL)) AS c
      ) t
    ),
    latest AS (
      SELECT k, seq, op, price FROM (
        SELECT k, seq, op, price,
               ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC) AS rn
        FROM feed) f
      WHERE rn = 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(CASE WHEN op <> 'D' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_live,
           CAST(SUM(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_deleted,
           CAST(SUM(CASE WHEN op = 'U' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_live_updated,
           {dec2dbl_expr(
               "SUM(CASE WHEN op <> 'D' THEN "
               "CAST(round(price * 100, 0) AS DECIMAL(38,0)) "
               "ELSE CAST(0 AS DECIMAL(38,0)) END)", 2)} AS sum_live_price
    FROM latest
    """,
)
def cdc_apply_orders(spark, sf_dir):
    """Materialize the current state of a CDC change feed (latest seq
    wins, delete drops the key); report live/deleted/updated counts and
    the exact live money total."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    ev = lambda seq, op, price: F.struct(  # noqa: E731
        F.lit(seq).alias("seq"), F.lit(op).alias("op"), price.alias("price")
    )
    null_ev = F.lit(None).cast("struct<seq:int,op:string,price:double>")
    changes = F.array_compact(
        F.array(
            ev(1, "I", F.col("o_totalprice")),
            F.when(F.col("o_orderkey") % 5 == 0, ev(2, "U", F.col("o_totalprice") + 100.0)).otherwise(null_ev),
            F.when(F.col("o_orderkey") % 15 == 0, ev(3, "U", F.col("o_totalprice") + 200.0)).otherwise(null_ev),
            F.when(F.col("o_orderkey") % 7 == 0, ev(4, "D", F.lit(None).cast("double"))).otherwise(null_ev),
        )
    )
    # generator in its OWN select (the ExtractGenerator struct-name trap)
    feed = (
        o.select(F.col("o_orderkey").alias("k"), changes.alias("__cs__"))
        .select("k", F.explode("__cs__").alias("c"))
        .select("k", F.col("c.seq").alias("seq"), F.col("c.op").alias("op"), F.col("c.price").alias("price"))
    )
    w = W.partitionBy("k").orderBy(F.desc("seq"))
    latest = (
        feed.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    )
    cents = F.round(F.col("price") * 100, 0).cast("decimal(38,0)")
    return latest.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum(F.when(F.col("op") != "D", 1).otherwise(0)).cast("long").alias("n_live"),
        F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).cast("long").alias("n_deleted"),
        F.sum(F.when(F.col("op") == "U", 1).otherwise(0)).cast("long").alias("n_live_updated"),
        dec_to_double(
            F.sum(
                F.when(F.col("op") != "D", cents).otherwise(
                    F.lit(0).cast("decimal(38,0)")
                )
            ),
            2,
        ).alias("sum_live_price"),
    )


# --------------------------------------------------------------------------
# Last-touch attribution — the marketing-analytics join every event
# pipeline ends up needing: attribute each purchase to the user's most
# recent click within a 1-hour lookback, then roll attribution up by
# purchase day.  Built with the engine's single-shuffle as-of pattern
# (union clicks + purchases, one per-user ordered window carrying the
# last click timestamp forward) — NOT a range join, whose candidate set
# is purchases × clicks-in-window.
#
# Determinism: the union orders by (ts_us, kind) with clicks BEFORE a
# same-instant purchase (a click at the purchase instant attributes);
# the carried value is the click timestamp itself, so same-ts click
# ties cannot diverge.  Money/lag sums are quantized-integer decimals.
# --------------------------------------------------------------------------
_ATTR_LOOKBACK_US = 3_600_000_000


@register(
    "attribution_last_click_daily",
    f"""
    WITH ev AS (
      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
             CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS kind,
             CASE WHEN event_type = 'click'
                  THEN epoch_us(CAST(ts AS TIMESTAMP)) END AS click_us,
             value
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    carried AS (
      SELECT user_id, ts_us, kind, value,
             MAX(click_us) OVER (PARTITION BY user_id ORDER BY ts_us, kind
                                 ROWS UNBOUNDED PRECEDING) AS last_click_us
      FROM ev
    ),
    purchases AS (
      SELECT ts_us, value,
             CASE WHEN last_click_us IS NOT NULL
                   AND ts_us - last_click_us <= {_ATTR_LOOKBACK_US}
                  THEN 1 ELSE 0 END AS attributed,
             CASE WHEN last_click_us IS NOT NULL
                   AND ts_us - last_click_us <= {_ATTR_LOOKBACK_US}
                  THEN ts_us - last_click_us END AS lag_us
      FROM carried WHERE kind = 1
    )
    SELECT strftime(CAST(make_timestamp(ts_us) AS DATE), '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(attributed) AS BIGINT) AS n_attributed,
           CAST(SUM(CASE WHEN attributed = 1
                         THEN CAST(round(value * 1000000, 0) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS attributed_value_micro,
           CAST(SUM(COALESCE(lag_us, 0)) AS BIGINT) AS lag_us_sum
    FROM purchases GROUP BY 1
    """,
)
def attribution_last_click_daily(spark, sf_dir):
    """Per-day purchase attribution to the last click within 1 hour
    (single-shuffle as-of carry); counts, attributed money, lag sum."""
    from pyspark.sql import Window as W

    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    ev = e.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.when(F.col("event_type") == "click", 0).otherwise(1).alias("kind"),
        F.when(
            F.col("event_type") == "click",
            F.unix_micros(F.col("ts").cast("timestamp")),
        ).alias("click_us"),
        "value",
    )
    w = W.partitionBy("user_id").orderBy("ts_us", "kind").rowsBetween(
        W.unboundedPreceding, 0
    )
    carried = ev.select(
        "ts_us", "kind", "value", F.max("click_us").over(w).alias("last_click_us")
    )
    attributed = F.when(
        F.col("last_click_us").isNotNull()
        & (F.col("ts_us") - F.col("last_click_us") <= _ATTR_LOOKBACK_US),
        1,
    ).otherwise(0)
    lag = F.when(attributed == 1, F.col("ts_us") - F.col("last_click_us"))
    p = carried.filter(F.col("kind") == 1).select(
        "ts_us",
        "value",
        attributed.alias("attributed"),
        lag.alias("lag_us"),
    )
    return p.groupBy(
        F.date_format(F.timestamp_micros(F.col("ts_us")), "yyyy-MM-dd").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_purchases"),
        F.sum("attributed").cast("long").alias("n_attributed"),
        F.sum(
            F.when(
                F.col("attributed") == 1,
                F.round(F.col("value") * 1_000_000, 0).cast("long"),
            ).otherwise(0)
        )
        .cast("long")
        .alias("attributed_value_micro"),
        F.sum(F.coalesce(F.col("lag_us"), F.lit(0))).cast("long").alias("lag_us_sum"),
    )


# --------------------------------------------------------------------------
# Parquet schema-evolution roundtrip — the source-level capability every
# long-lived lakehouse table needs: batch 2 ships a column batch 1
# doesn't have, and a ``mergeSchema`` read must union the files with
# NULL backfill (the Delta/Iceberg "add column" path, expressed on raw
# parquet).  The oracle reproduces the same split + backfill relationally
# from the original table, so the hash proves write→evolve→read fidelity
# (row counts, money totals, NULL placement), not just schema shape.
#
# Scale note: mergeSchema=true footer-merges ALL file schemas at
# planning time — fine for a handful of schema generations (the real
# pattern), not for per-file drift; production pins the merged schema in
# a catalog.  Stated here because the 100 TB cost is PLANNING-side.
# --------------------------------------------------------------------------
@register(
    "schema_evolution_roundtrip",
    """
    WITH unioned AS (
      SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
      FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT o_orderkey, o_totalprice, o_orderpriority
      FROM orders WHERE o_orderkey % 2 = 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_legacy_rows,
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities,
           CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
             AS sum_price_cents
    FROM unioned
    """,
)
def schema_evolution_roundtrip(spark, sf_dir):
    """Write two parquet batches with EVOLVED schemas (batch 2 adds
    o_orderpriority), read them back with mergeSchema, and aggregate —
    proving NULL backfill and value fidelity against the relational
    oracle."""
    from ..scratch import scratch_dir

    o = load_table(spark, sf_dir, "orders")
    base = scratch_dir("spark_graft_evolve_")
    o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    ).write.mode("overwrite").parquet(base + "/gen=1")
    o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    ).write.mode("overwrite").parquet(base + "/gen=2")
    back = spark.read.option("mergeSchema", "true").parquet(
        base + "/gen=1", base + "/gen=2"
    )
    return back.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.when(F.col("o_orderpriority").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_legacy_rows"),
        F.countDistinct("o_orderpriority").cast("long").alias("n_priorities"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long"))
        .cast("long")
        .alias("sum_price_cents"),
    )


# --------------------------------------------------------------------------
# 5-fold cross-validation of the linear scorer — GROUPED model training
# as ONE aggregation.  The classic distributed-CV trick: leave-fold-out
# training moments are TOTAL − fold (exact decimal subtraction), so all
# five models train from a single per-fold moment aggregate — no 5×
# re-scan, no iteration, any cluster size.  Each fold's held-out rows
# are then scored against THEIR fold's weights (5-row broadcast) and
# report accuracy at the 0.5 threshold.
#
# Determinism: per-fold moments are exact DECIMAL(38,0) sums; totals are
# window sums over the 5-row aggregate (decimal adds, exact); the same
# ridge-Cramer as quality_scorer_linear in identical IEEE order; the
# accuracy rollup is integer counts and integer-DIV rates.
# --------------------------------------------------------------------------
_QS_CV_MOM_SQL = """
    fm AS (
      SELECT doc_id % 5 AS fold,
             CAST(COUNT(*) AS DECIMAL(38,0)) AS n_,
             SUM(CAST(x1 AS DECIMAL(38,0))) AS s1_,
             SUM(CAST(x2 AS DECIMAL(38,0))) AS s2_,
             SUM(CAST(x1 * x1 AS DECIMAL(38,0))) AS s11_,
             SUM(CAST(x1 * x2 AS DECIMAL(38,0))) AS s12_,
             SUM(CAST(x2 * x2 AS DECIMAL(38,0))) AS s22_,
             SUM(CAST(y AS DECIMAL(38,0))) AS sy_,
             SUM(CAST(x1 * y AS DECIMAL(38,0))) AS s1y_,
             SUM(CAST(x2 * y AS DECIMAL(38,0))) AS s2y_
      FROM feats GROUP BY 1
    ),
    tm AS (
      SELECT fold,
             {n} AS n, {s1} AS s1, {s2} AS s2, {s11} AS s11,
             {s12} AS s12, {s22} AS s22, {sy} AS sy,
             {s1y} AS s1y, {s2y} AS s2y
      FROM fm
    )
"""


def _qs_cv_diff_sql(col: str) -> str:
    """total-minus-fold moment, converted exactly to double."""
    from ..functions.exact import dec2dbl_expr

    return dec2dbl_expr(f"(SUM({col}_) OVER () - {col}_)", 0)


@register(
    "cv_scorer_fold_metrics",
    f"""
    WITH {_QS_FEAT_SQL},
    {_QS_CV_MOM_SQL.format(
        n=_qs_cv_diff_sql('n'), s1=_qs_cv_diff_sql('s1'),
        s2=_qs_cv_diff_sql('s2'), s11=_qs_cv_diff_sql('s11'),
        s12=_qs_cv_diff_sql('s12'), s22=_qs_cv_diff_sql('s22'),
        sy=_qs_cv_diff_sql('sy'), s1y=_qs_cv_diff_sql('s1y'),
        s2y=_qs_cv_diff_sql('s2y'))},
    w AS (
      SELECT fold,
        (((n * s11) - (s1 * s1)) + (0.001 * n)) AS c11,
        ((n * s12) - (s1 * s2)) AS c12,
        (((n * s22) - (s2 * s2)) + (0.001 * n)) AS c22,
        ((n * s1y) - (s1 * sy)) AS c1y,
        ((n * s2y) - (s2 * sy)) AS c2y,
        n, s1, s2, sy
      FROM tm
    ),
    model AS (
      SELECT fold,
        (((c1y * c22) - (c2y * c12)) / ((c11 * c22) - (c12 * c12))) AS w1,
        (((c2y * c11) - (c1y * c12)) / ((c11 * c22) - (c12 * c12))) AS w2,
        n, s1, s2, sy
      FROM w
    ),
    model2 AS (
      SELECT fold, w1, w2,
             ((sy - (w1 * s1)) - (w2 * s2)) / n AS w0
      FROM model
    ),
    scored AS (
      SELECT f.doc_id % 5 AS fold, f.y,
             CAST(floor((m.w0 + (m.w1 * f.x1) + (m.w2 * f.x2)) * 1000000.0
                        + 0.5) AS BIGINT) AS score_micro,
             m.w0, m.w1, m.w2
      FROM feats f JOIN model2 m ON f.doc_id % 5 = m.fold
    )
    SELECT CAST(fold AS BIGINT) AS fold,
           CAST(COUNT(*) AS BIGINT) AS n_eval,
           CAST(SUM(CASE WHEN (score_micro >= 500000) = (y = 1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           CAST((SUM(CASE WHEN (score_micro >= 500000) = (y = 1)
                          THEN 1 ELSE 0 END) * 1000000) // COUNT(*)
                AS BIGINT) AS accuracy_micro,
           CAST(MIN(floor(w0 * 1000000000.0 + 0.5)) AS BIGINT) AS w0_nano,
           CAST(MIN(floor(w1 * 1000000000.0 + 0.5)) AS BIGINT) AS w1_nano,
           CAST(MIN(floor(w2 * 1000000000.0 + 0.5)) AS BIGINT) AS w2_nano
    FROM scored GROUP BY fold
    """,
)
def cv_scorer_fold_metrics(spark, sf_dir):
    """Leave-fold-out 5-fold CV of the linear scorer from ONE moment
    aggregate (train moments = total − fold, exact decimal), scoring
    each fold's holdout against its own broadcast model."""
    from pyspark.sql import Window as W

    feats = _qs_feats(spark, sf_dir).withColumn(
        "fold", F.pmod("doc_id", F.lit(5))
    )
    DEC = "decimal(38,0)"
    fm = feats.groupBy("fold").agg(
        F.count(F.lit(1)).cast(DEC).alias("n_"),
        F.sum(F.col("x1").cast(DEC)).alias("s1_"),
        F.sum(F.col("x2").cast(DEC)).alias("s2_"),
        F.sum((F.col("x1") * F.col("x1")).cast(DEC)).alias("s11_"),
        F.sum((F.col("x1") * F.col("x2")).cast(DEC)).alias("s12_"),
        F.sum((F.col("x2") * F.col("x2")).cast(DEC)).alias("s22_"),
        F.sum(F.col("y").cast(DEC)).alias("sy_"),
        F.sum((F.col("x1") * F.col("y")).cast(DEC)).alias("s1y_"),
        F.sum((F.col("x2") * F.col("y")).cast(DEC)).alias("s2y_"),
    )
    wall = W.partitionBy()

    def diff(col):
        return dec_to_double(F.sum(F.col(col)).over(wall) - F.col(col), 0)

    tm = fm.select(
        "fold",
        diff("n_").alias("n"),
        diff("s1_").alias("s1"),
        diff("s2_").alias("s2"),
        diff("s11_").alias("s11"),
        diff("s12_").alias("s12"),
        diff("s22_").alias("s22"),
        diff("sy_").alias("sy"),
        diff("s1y_").alias("s1y"),
        diff("s2y_").alias("s2y"),
    )
    c = tm.select(
        "fold",
        (
            ((F.col("n") * F.col("s11")) - (F.col("s1") * F.col("s1")))
            + (F.lit(0.001) * F.col("n"))
        ).alias("c11"),
        ((F.col("n") * F.col("s12")) - (F.col("s1") * F.col("s2"))).alias("c12"),
        (
            ((F.col("n") * F.col("s22")) - (F.col("s2") * F.col("s2")))
            + (F.lit(0.001) * F.col("n"))
        ).alias("c22"),
        ((F.col("n") * F.col("s1y")) - (F.col("s1") * F.col("sy"))).alias("c1y"),
        ((F.col("n") * F.col("s2y")) - (F.col("s2") * F.col("sy"))).alias("c2y"),
        "n",
        "s1",
        "s2",
        "sy",
    )
    det = (F.col("c11") * F.col("c22")) - (F.col("c12") * F.col("c12"))
    model = c.select(
        "fold",
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
        "fold",
        "w1",
        "w2",
        (
            ((F.col("sy") - (F.col("w1") * F.col("s1"))) - (F.col("w2") * F.col("s2")))
            / F.col("n")
        ).alias("w0"),
    )
    scored = feats.join(F.broadcast(model), "fold").select(
        "fold",
        "y",
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
    correct = F.when(
        (F.col("score_micro") >= 500_000) == (F.col("y") == 1), 1
    ).otherwise(0)
    return scored.groupBy("fold").agg(
        F.count(F.lit(1)).cast("long").alias("n_eval"),
        F.sum(correct).cast("long").alias("n_correct"),
        F.expr(
            "CAST((SUM(CASE WHEN (score_micro >= 500000) = (y = 1) THEN 1 ELSE 0 END)"
            " * 1000000) DIV COUNT(*) AS BIGINT)"
        ).alias("accuracy_micro"),
        F.floor(F.min("w0") * 1_000_000_000.0 + 0.5).cast("long").alias("w0_nano"),
        F.floor(F.min("w1") * 1_000_000_000.0 + 0.5).cast("long").alias("w1_nano"),
        F.floor(F.min("w2") * 1_000_000_000.0 + 0.5).cast("long").alias("w2_nano"),
    ).select(
        F.col("fold").cast("long").alias("fold"),
        "n_eval",
        "n_correct",
        "accuracy_micro",
        "w0_nano",
        "w1_nano",
        "w2_nano",
    )


# --------------------------------------------------------------------------
# Johnson–Lindenstrauss random projection quality — the dimensionality-
# reduction pre-step a 100 TB ANN pipeline runs before indexing: project
# the 64-dim embeddings onto K=16 dims with a DETERMINISTIC ±1 sign
# matrix (md5-derived — no RNG state, any executor regenerates the same
# matrix) and report, for every probe pair, how well squared distances
# survive (ratio = d2_proj / (K · d2_orig) ≈ 1 by the JL lemma for ±1
# matrices, E[(Σ±x_j)²] = ‖x‖²).
#
# Exactness: quantized integer vectors, integer sign sums, integer
# squared distances — the only double is the final ratio division,
# identical IEEE in both engines.  Scale shape: the projection is one
# map-side HOF per row (16×64 adds); the pair stage here is probes-only
# (45 pairs) — at scale the projected table IS the output, written once.
# --------------------------------------------------------------------------
_JL_K = 16
_JL_DIM = 64
_JL_NPROBE = 10

_JL_QELEM = (
    "CAST(round(CAST(embedding[CAST(j AS INT) + 1] AS DOUBLE) * 1000000, 0)"
    " AS BIGINT)"
)


def _jl_sign_sql(k: str, j: str) -> str:
    """±1 from the first md5 hex digit's parity of 'jl<k>_<j>' — DuckDB
    form (Spark uses conv(); both hash the identical string)."""
    from .text import _md5_uint_sql

    key = f"'jl' || CAST({k} AS VARCHAR) || '_' || CAST({j} AS VARCHAR)"
    return f"(CASE WHEN ({_md5_uint_sql(key, 1)}) % 2 = 0 THEN 1 ELSE -1 END)"


_JL_PROJ_SQL = f"""
    WITH qv AS (
      SELECT vec_id AS id, CAST(j AS INT) AS j, {_JL_QELEM} AS x
      FROM (SELECT vec_id, embedding, unnest(range({_JL_DIM})) AS j
            FROM embeddings WHERE vec_id < {_JL_NPROBE}) e
    ),
    proj AS (
      SELECT q.id, CAST(k AS INT) AS k,
             SUM({_jl_sign_sql('k', 'q.j')} * q.x) AS p
      FROM qv q, LATERAL (SELECT unnest(range({_JL_K})) AS k) t
      GROUP BY 1, 2
    ),
    d2o AS (
      SELECT a.id AS i, b.id AS j2, CAST(SUM((a.x - b.x) * (a.x - b.x)) AS BIGINT) AS d2_orig
      FROM qv a JOIN qv b ON a.j = b.j AND a.id < b.id
      GROUP BY 1, 2
    ),
    d2p AS (
      SELECT a.id AS i, b.id AS j2, CAST(SUM((a.p - b.p) * (a.p - b.p)) AS BIGINT) AS d2_proj
      FROM proj a JOIN proj b ON a.k = b.k AND a.id < b.id
      GROUP BY 1, 2
    )
    SELECT o.i, o.j2 AS j, o.d2_orig, p.d2_proj,
           (CAST(floor((CAST(p.d2_proj AS DOUBLE)
                        / (CAST({_JL_K} AS DOUBLE) * CAST(o.d2_orig AS DOUBLE)))
                       * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0) AS ratio
    FROM d2o o JOIN d2p p ON o.i = p.i AND o.j2 = p.j2
    """


@register("jl_projection_quality", _JL_PROJ_SQL)
def jl_projection_quality(spark, sf_dir):
    """Project the probe embeddings 64→16 dims with the deterministic
    md5-sign JL matrix; report per-pair squared-distance preservation
    (ratio ≈ 1)."""
    e = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < _JL_NPROBE
    )
    qv = e.select(
        F.col("vec_id").alias("id"),
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * 1_000_000, 0).cast("long"),
        ).alias("qv"),
    )
    sign = lambda k, j: F.when(  # noqa: E731
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("jl"),
                        k.cast("string"),
                        F.lit("_"),
                        j.cast("string"),
                    )
                ),
                1,
                1,
            ),
            16,
            10,
        ).cast("long")
        % 2
        == 0,
        F.lit(1).cast("long"),
    ).otherwise(F.lit(-1).cast("long"))
    # p_k = sum_j sign(k,j) * qv[j] — one HOF per row (16 x 64 adds)
    proj = qv.select(
        "id",
        "qv",
        F.transform(
            F.sequence(F.lit(0), F.lit(_JL_K - 1)),
            lambda k: F.aggregate(
                F.zip_with(
                    F.col("qv"),
                    F.sequence(F.lit(0), F.lit(_JL_DIM - 1)),
                    lambda x, j: sign(k, j) * x,
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ),
        ).alias("p"),
    )
    a = proj.select(
        F.col("id").alias("i"), F.col("qv").alias("qa"), F.col("p").alias("pa")
    )
    b = proj.select(
        F.col("id").alias("j"), F.col("qv").alias("qb"), F.col("p").alias("pb")
    )
    pairs = a.join(b, F.col("i") < F.col("j"))
    d2 = lambda u, v: F.aggregate(  # noqa: E731
        F.zip_with(u, v, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, w: acc + w,
    )
    out = pairs.select(
        "i",
        "j",
        d2(F.col("qa"), F.col("qb")).alias("d2_orig"),
        d2(F.col("pa"), F.col("pb")).alias("d2_proj"),
    )
    ratio = F.col("d2_proj").cast("double") / (
        F.lit(float(_JL_K)) * F.col("d2_orig").cast("double")
    )
    return out.select(
        "i", "j", "d2_orig", "d2_proj", pround(ratio, 6).alias("ratio")
    )
