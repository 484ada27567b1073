"""ML-as-aggregation: model fitting expressed as exact distributed
aggregates — closed-form OLS regression and a multinomial Naive Bayes
classifier.

Not in the reference (pandas algebra only,
``/root/reference/dask_expr/_collection.py``); SURVEY.md §2.13.  The
point these make for the engine: a large family of classical ML fits
(anything with sufficient statistics) is ONE partial/final aggregation
pass at 100 TB — no parameter servers, no iteration, and with the
decimal/quantized arithmetic of functions/exact.py the fitted model is
bit-identical on any cluster size.

Scale posture:

* OLS — six sufficient statistics (n, Σx, Σx², Σy, Σxy, Σy²) in one
  map-side-combinable aggregate; the solve is O(1) arithmetic on the
  1-row result.  Determinism: integer sums exact; double sums in
  decimal; the final IEEE arithmetic is identical in both engines.
* Naive Bayes — training IS the (class, word) count table (one corpus
  shuffle); scoring fans each doc word out to at most n_classes rows
  (the per-class posting join), and absent-word smoothing folds into a
  per-(doc, class) closed form, so the absent (class, word) pairs never
  materialize: score = Σ cnt·ln(c_sw+1) − len_d·ln(n_s+V) + ln prior.
  Every ln is quantized (1e-9) before the exact-decimal sum (the BM25
  ulp rule).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.exact import DEC, dec2dbl_expr, dec_to_double, pround, pround_expr
from ..sources.tables import load_table, spread
from .registry import cache_scoped, register

_EPOCH = "1992-01-01"

_OLS_STATS_SQL = f"""
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             {dec2dbl_expr("SUM(CAST(y AS DECIMAL(30,8)))")} AS sy,
             {dec2dbl_expr("SUM(CAST(x * y AS DECIMAL(30,8)))")} AS sxy,
             {dec2dbl_expr("SUM(CAST(y * y AS DECIMAL(30,8)))")} AS syy
      FROM (SELECT CAST(date_diff('day', CAST('{_EPOCH}' AS DATE), o_orderdate)
                        AS BIGINT) AS x,
                   o_totalprice AS y
            FROM orders)
"""


@register(
    "ols_price_trend",
    f"""
    WITH s AS ({_OLS_STATS_SQL})
    SELECT n,
           {pround_expr(
               "(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
               " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
               "    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))", 8)} AS slope,
           {pround_expr(
               "(sy - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
               "       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
               "          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))"
               "  * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)", 4)} AS intercept,
           {pround_expr(
               "((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
               " * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy))"
               " / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
               "     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
               "    * (CAST(n AS DOUBLE) * syy - sy * sy))", 6)} AS r2
    FROM s
    """,
)
def ols_price_trend(spark, sf_dir):
    """Closed-form OLS of order totalprice on order date (days since
    epoch): one aggregation pass for the sufficient statistics, O(1)
    solve.  (TPC-H prices have no real trend — r² ≈ 0 is the correct
    answer; the point is the exact single-pass fit.)"""
    o = spread(load_table(spark, sf_dir, "orders"))
    x = F.datediff("o_orderdate", F.lit(_EPOCH).cast("date")).cast("long")
    y = F.col("o_totalprice")
    base = o.select(x.alias("x"), y.alias("y"))
    s = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        dec_to_double(F.sum(F.col("y").cast(DEC)), 8).alias("sy"),
        dec_to_double(F.sum((F.col("x") * F.col("y")).cast(DEC)), 8).alias("sxy"),
        dec_to_double(F.sum((F.col("y") * F.col("y")).cast(DEC)), 8).alias("syy"),
    )
    n_d = F.col("n").cast("double")
    sx_d = F.col("sx").cast("double")
    sxx_d = F.col("sxx").cast("double")
    num = n_d * F.col("sxy") - sx_d * F.col("sy")
    den = n_d * sxx_d - sx_d * sx_d
    slope = num / den
    intercept = (F.col("sy") - slope * sx_d) / n_d
    r2 = (num * num) / (den * (n_d * F.col("syy") - F.col("sy") * F.col("sy")))
    return s.select(
        "n",
        pround(slope, 8).alias("slope"),
        pround(intercept, 4).alias("intercept"),
        pround(r2, 6).alias("r2"),
    )


_NB_Q = 1_000_000_000
_NORM_SQL = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"


def _qln(expr: str) -> str:
    """SQL: ln(expr) quantized at 1e-9 (both engines bit-agree)."""
    return f"(CAST(floor(ln({expr}) * {_NB_Q}.0 + 0.5) AS DOUBLE) / {_NB_Q}.0)"


@register(
    "naive_bayes_source_classifier",
    f"""
    WITH dw AS (
      SELECT doc_id, source, w, COUNT(*) AS cnt FROM (
        SELECT doc_id, source,
               unnest(string_split({_NORM_SQL}, ' ')) AS w
        FROM documents WHERE trim(text) <> ''
      ) GROUP BY doc_id, source, w
    ),
    dlen AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS len FROM dw GROUP BY doc_id),
    csw AS (SELECT source AS s, w, CAST(SUM(cnt) AS BIGINT) AS c
            FROM dw GROUP BY source, w),
    ns AS (SELECT s, CAST(SUM(c) AS BIGINT) AS nwords FROM csw GROUP BY s),
    vocab AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM csw),
    prior AS (
      SELECT source AS s, CAST(COUNT(*) AS BIGINT) AS nd
      FROM documents WHERE trim(text) <> '' GROUP BY source
    ),
    ntot AS (SELECT CAST(SUM(nd) AS BIGINT) AS n FROM prior),
    present AS (
      SELECT dw.doc_id, csw.s,
             {dec2dbl_expr(f"SUM(CAST(dw.cnt * {_qln('CAST(csw.c AS DOUBLE) + 1.0')} AS DECIMAL(30,8)))")}
               AS present_sum
      FROM dw JOIN csw ON dw.w = csw.w
      GROUP BY dw.doc_id, csw.s
    ),
    scored AS (
      SELECT p.doc_id, p.s,
             p.present_sum
               - CAST(d.len AS DOUBLE)
                 * {_qln('CAST(ns.nwords AS DOUBLE) + CAST(vocab.v AS DOUBLE)')}
               + {_qln('CAST(prior.nd AS DOUBLE) / CAST(ntot.n AS DOUBLE)')} AS score
      FROM present p
      JOIN dlen d ON p.doc_id = d.doc_id
      JOIN ns ON p.s = ns.s
      JOIN prior ON p.s = prior.s
      CROSS JOIN vocab CROSS JOIN ntot
    ),
    pred AS (
      SELECT doc_id, s AS predicted FROM (
        SELECT doc_id, s,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, s DESC) AS rn
        FROM scored
      ) WHERE rn = 1
    )
    SELECT d.source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN p.predicted = d.source THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct
    FROM (SELECT DISTINCT doc_id, source FROM dw) d
    JOIN pred p ON d.doc_id = p.doc_id
    GROUP BY d.source
    """,
)
def naive_bayes_source_classifier(spark, sf_dir):
    """Multinomial Naive Bayes (Laplace-smoothed) trained on the corpus'
    (source, word) counts and evaluated in-sample: per-source doc count
    and correct-prediction count.

    Plan: training = ONE (source, word) aggregation; scoring joins doc
    words to the class-conditional table (fan-out ≤ n_classes per word)
    with absent-word smoothing folded into the per-(doc, class) closed
    form — no dense doc×class×vocab relation ever exists.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    words = d.filter(F.trim("text") != "").select(
        "doc_id", "source", F.explode(F.split(norm, " ")).alias("w")
    )
    dw = cache_scoped(
        words.groupBy("doc_id", "source", "w").agg(F.count(F.lit(1)).alias("cnt"))
    )
    dlen = dw.groupBy("doc_id").agg(F.sum("cnt").cast("long").alias("len"))
    csw = dw.groupBy(F.col("source").alias("s"), "w").agg(
        F.sum("cnt").cast("long").alias("c")
    )
    csw = cache_scoped(csw)
    ns = csw.groupBy("s").agg(F.sum("c").cast("long").alias("nwords"))
    vocab = csw.agg(F.countDistinct("w").cast("long").alias("v"))
    prior = (
        d.filter(F.trim("text") != "")
        .groupBy(F.col("source").alias("s"))
        .agg(F.count(F.lit(1)).cast("long").alias("nd"))
    )
    ntot = prior.agg(F.sum("nd").cast("long").alias("n"))

    def qln(col):
        return F.floor(F.log(col) * _NB_Q + F.lit(0.5)).cast("double") / _NB_Q

    present = (
        dw.join(csw.hint("shuffle_hash"), "w")
        .select(
            "doc_id",
            "s",
            (F.col("cnt") * qln(F.col("c").cast("double") + 1.0)).cast(DEC).alias("t"),
        )
        .groupBy("doc_id", "s")
        .agg(dec_to_double(F.sum("t"), 8).alias("present_sum"))
    )
    scored = (
        present.join(dlen.hint("shuffle_hash"), "doc_id")
        .join(F.broadcast(ns), "s")
        .join(F.broadcast(prior), "s")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(ntot))
        .select(
            "doc_id",
            "s",
            (
                F.col("present_sum")
                - F.col("len").cast("double")
                * qln(F.col("nwords").cast("double") + F.col("v").cast("double"))
                + qln(F.col("nd").cast("double") / F.col("n").cast("double"))
            ).alias("score"),
        )
    )
    # Per-doc argmax as ONE hash aggregate (max_by over a (score, s)
    # struct — ties break toward the lexicographically LAST class, mirrored
    # in the oracle's ORDER BY score DESC, s DESC).  The previous
    # row_number() window shuffled AND sorted the (docs x classes)
    # relation; max_by gets map-side partial aggregation and no sort.
    pred = scored.groupBy("doc_id").agg(
        F.max_by("s", F.struct(F.col("score"), F.col("s"))).alias("predicted")
    )
    actual = dw.select("doc_id", "source").distinct()
    return (
        actual.join(pred, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("predicted") == F.col("source"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_correct"),
        )
    )


@register(
    "ols_value_trend_by_type",
    f"""
    WITH s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             {dec2dbl_expr("SUM(CAST(y AS DECIMAL(30,8)))")} AS sy,
             {dec2dbl_expr("SUM(CAST(x * y AS DECIMAL(30,8)))")} AS sxy
      FROM (SELECT event_type,
                   CAST(date_part('hour', ts) AS BIGINT) AS x,
                   value AS y
            FROM events)
      GROUP BY event_type
    )
    SELECT event_type, n,
           {pround_expr(
               "(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
               " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
               "    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))", 8)} AS slope,
           {pround_expr(
               "(sy - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
               "       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
               "          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))"
               "  * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)", 4)} AS intercept
    FROM s
    """,
)
def ols_value_trend_by_type(spark, sf_dir):
    """GROUPED closed-form OLS — one model per event_type (value vs
    hour-of-day) from per-group sufficient statistics in a single
    aggregation pass: fitting a million segment models at 100 TB costs
    exactly one shuffle, the same plan as any grouped aggregate."""
    e = spread(load_table(spark, sf_dir, "events"))
    base = e.select(
        "event_type",
        F.hour("ts").cast("long").alias("x"),
        F.col("value").alias("y"),
    )
    s = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        dec_to_double(F.sum(F.col("y").cast(DEC)), 8).alias("sy"),
        dec_to_double(F.sum((F.col("x") * F.col("y")).cast(DEC)), 8).alias("sxy"),
    )
    n_d = F.col("n").cast("double")
    sx_d = F.col("sx").cast("double")
    sxx_d = F.col("sxx").cast("double")
    num = n_d * F.col("sxy") - sx_d * F.col("sy")
    den = n_d * sxx_d - sx_d * sx_d
    slope = num / den
    intercept = (F.col("sy") - slope * sx_d) / n_d
    return s.select(
        "event_type",
        "n",
        pround(slope, 8).alias("slope"),
        pround(intercept, 4).alias("intercept"),
    )
