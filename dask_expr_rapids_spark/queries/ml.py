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

    # The word join fans out to ~(doc-words x classes) rows — at 10x bench
    # scale ~1.4e9 through the session-global 32 partitions, which spills
    # both the join and the (doc, class) aggregate (the defect-#10 spans
    # lesson).  Size both shuffles from input bytes (~2 MB/partition).
    import os as _os

    size_bytes = _os.path.getsize(_os.path.join(sf_dir, "documents.parquet"))
    nb_parts = max(32, min(2048, size_bytes // (2 << 20)))
    # gate on scale: at bench size the extra exchanges are pure overhead
    probe = dw.repartition(nb_parts, "w") if nb_parts > 32 else dw
    joined = probe.join(csw.hint("shuffle_hash"), "w").select(
        "doc_id",
        "s",
        (F.col("cnt") * qln(F.col("c").cast("double") + 1.0)).cast(DEC).alias("t"),
    )
    if nb_parts > 32:
        joined = joined.repartition(nb_parts, "doc_id", "s")
    present = joined.groupBy("doc_id", "s").agg(
        dec_to_double(F.sum("t"), 8).alias("present_sum")
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


# --------------------------------------------------------------------------
# K-means clustering as aggregation — Lloyd's algorithm with every
# arithmetic step integer-exact, so the fitted clustering is bit-identical
# on any cluster size AND in the DuckDB oracle:
#
# * vectors are quantized to 1e-6 integers and SHIFTED non-negative
#   (+2e6), so the centroid update's truncating integer division IS floor
#   division in both engines (the shift cancels in every distance).
# * assignment packs (dist, cid) into ONE bigint — dist * K + cid — so
#   argmin-with-deterministic-tiebreak is a single array_min and the
#   packed value is computed ONCE per row (two separate dist/cid columns
#   would each re-evaluate the k x dim HOF after CollapseProject
#   re-inlines the alias).
#
# Scale posture: per iteration the corpus is scanned once; assignment is
# MAP-ONLY (centroids ride in as a broadcast 1-row packed relation — never
# a collect); the centroid update shuffles only the partial-aggregated
# (cid, dim) sums — k x dim rows per task — and re-assembles k arrays.
# Fixed 2 update rounds + final assignment = 3 corpus passes, the textbook
# distributed k-means plan.  The per-row k x dim distance loop runs on
# Spark's interpreted HOF path, fine at 64 dims x k=4; a 1000-dim
# production store would swap the assignment expression for an
# Arrow-batched matmul UDF (same contract; quantized ints < 2^53 keep
# float64 matmul exact).
# --------------------------------------------------------------------------
_KM_K = 4
_KM_DIM = 64
_KM_B = 2_000_000  # shift: q = round(x * 1e6) + B >= 0 for |x| <= 2

_KM_QR_SQL = f"""
    qr AS (
      SELECT vec_id, u,
             CAST(round(CAST(embedding[CAST(u AS INT) + 1] AS DOUBLE)
                        * 1000000, 0) AS BIGINT) + {_KM_B} AS q
      FROM embeddings CROSS JOIN (SELECT unnest(range({_KM_DIM})) AS u) u
    )
"""


def _km_assign_sql(c: str, a: str) -> str:
    return f"""
    {a}_d AS (
      SELECT qr.vec_id, c.cid, SUM((qr.q - c.cq) * (qr.q - c.cq)) AS dist
      FROM qr JOIN {c} c ON qr.u = c.u
      GROUP BY qr.vec_id, c.cid
    ),
    {a} AS (
      SELECT vec_id, cid, dist FROM (
        SELECT vec_id, cid, dist,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY dist, cid) AS rn
        FROM {a}_d)
      WHERE rn = 1
    )"""


def _km_update_sql(a: str, c: str) -> str:
    # trunc-div == floor-div: q >= 0 by the +B shift
    return f"""
    {c} AS (
      SELECT a.cid, qr.u, CAST(SUM(qr.q) // COUNT(*) AS BIGINT) AS cq
      FROM {a} a JOIN qr ON a.vec_id = qr.vec_id
      GROUP BY a.cid, qr.u
    )"""


@register(
    "kmeans_embedding_clusters",
    f"""
    WITH {_KM_QR_SQL},
    c0 AS (SELECT vec_id AS cid, u, q AS cq FROM qr WHERE vec_id < {_KM_K}),
    {_km_assign_sql('c0', 'a1')},
    {_km_update_sql('a1', 'c1')},
    {_km_assign_sql('c1', 'a2')},
    {_km_update_sql('a2', 'c2')},
    {_km_assign_sql('c2', 'a3')}
    SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_members,
           {pround_expr(
               dec2dbl_expr("SUM(CAST(dist AS DECIMAL(30,8)))")
               + " / 1000000000000.0", 6)} AS inertia
    FROM a3 GROUP BY cid
    """,
)
def kmeans_embedding_clusters(spark, sf_dir):
    """K-means (k=4, 2 Lloyd updates + final assignment) over the
    embeddings table; returns per-cluster size and inertia (sum of squared
    distances, in original float units).  Seeds = the k smallest vec_ids.
    """
    e = spread(load_table(spark, sf_dir, "embeddings"))
    qv = F.expr(
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000, 0)"
        f" AS BIGINT) + {_KM_B})"
    )
    vecs = cache_scoped(e.select("vec_id", qv.alias("qv")))
    cents = vecs.filter(F.col("vec_id") < _KM_K).select(
        F.col("vec_id").alias("cid"), F.col("qv").alias("carr")
    )

    # packed argmin: min over dist*K + cid  ==  (min dist, tie -> min cid);
    # every term is non-negative so the packing preserves order
    best_expr = F.expr(
        "array_min(transform(cents, c -> aggregate("
        "zip_with(qv, c.carr, (a, b) -> (a - b) * (a - b)),"
        f" CAST(0 AS BIGINT), (acc, x) -> acc + x) * {_KM_K} + c.cid))"
    )

    def assign(centroids):
        packed = centroids.agg(
            F.collect_list(F.struct("cid", "carr")).alias("cents")
        )
        return vecs.crossJoin(F.broadcast(packed)).select(
            "vec_id", "qv", best_expr.alias("best")
        )

    for _ in range(2):
        assigned = assign(cents)
        # generator in its own select (struct-name-loss gotcha)
        keyed = assigned.select(
            (F.col("best") % _KM_K).alias("cid"), "qv"
        )
        per_dim = keyed.select("cid", F.posexplode("qv").alias("u", "q"))
        sums = per_dim.groupBy("cid", "u").agg(
            F.sum("q").alias("s"), F.count(F.lit(1)).alias("n")
        )
        cents = (
            sums.select("cid", "u", F.expr("s DIV n").alias("cq"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("u", "cq"))),
                    lambda st: st["cq"],
                ).alias("carr")
            )
            .localCheckpoint()  # k tiny rows; truncates the iteration lineage
        )
    final = assign(cents)
    return final.groupBy((F.col("best") % _KM_K).alias("cid")).agg(
        F.count(F.lit(1)).alias("n_members"),
        pround(
            dec_to_double(F.sum((F.col("best") / F.lit(_KM_K)).cast("long").cast(DEC)), 8)
            / F.lit(1_000_000_000_000.0),
            6,
        ).alias("inertia"),
    )


# --------------------------------------------------------------------------
# Bigram language-model quality scoring (the CCNet-style LM filter as
# aggregation): train a Laplace-smoothed bigram LM on the corpus — which
# IS the (w1, w2) count table, one shuffle — then score every document's
# per-bigram negative log-likelihood in-sample and roll it up by source.
# High avg NLL = rare-transition-heavy (noisy) text; low = boilerplate.
#
# Same determinism contract as Naive Bayes: every ln is quantized at 1e-9
# before the exact-decimal per-doc sum; per-doc NLL is quantized at 1e-9
# before the exact-decimal per-source mean.  exp() is deliberately never
# taken (perplexity = exp(nll) is monotone in nll, and libm exp differs
# across engines in the last ulp).
#
# Scale posture: bigrams never materialize per-position rows in Spark —
# they are zip_with'd from the token array and pre-aggregated per doc
# BEFORE any join; scoring joins the doc's distinct bigrams to the model
# (fan-out 1) + the left-context counts (fan-out 1) with the vocab scalar
# as a broadcast relation.  Nothing is ever doc x vocab.
# --------------------------------------------------------------------------
@register(
    "bigram_lm_nll_by_source",
    f"""
    WITH d AS (
      SELECT doc_id, source, string_split({_NORM_SQL}, ' ') AS l
      FROM documents WHERE trim(text) <> ''
    ),
    bg AS (
      SELECT doc_id, source, l[pos] AS w1, l[pos + 1] AS w2
      FROM d, LATERAL (SELECT unnest(generate_series(1, len(l) - 1)) AS pos) t
    ),
    docbg AS (
      SELECT doc_id, source, w1, w2, COUNT(*) AS n_occ
      FROM bg GROUP BY doc_id, source, w1, w2
    ),
    c12 AS (SELECT w1, w2, CAST(SUM(n_occ) AS BIGINT) AS c12
            FROM docbg GROUP BY w1, w2),
    c1 AS (SELECT w1, CAST(SUM(n_occ) AS BIGINT) AS c1
           FROM docbg GROUP BY w1),
    vocab AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v
              FROM (SELECT unnest(l) AS w FROM d)),
    terms AS (
      SELECT b.doc_id, b.source,
             SUM(CAST(b.n_occ * ({_qln('CAST(c12.c12 AS DOUBLE) + 1.0')}
                                 - {_qln('CAST(c1.c1 AS DOUBLE) + CAST(vocab.v AS DOUBLE)')})
                      AS DECIMAL(30,8))) AS s,
             CAST(SUM(b.n_occ) AS BIGINT) AS n_bg
      FROM docbg b
      JOIN c12 ON b.w1 = c12.w1 AND b.w2 = c12.w2
      JOIN c1 ON b.w1 = c1.w1
      CROSS JOIN vocab
      GROUP BY b.doc_id, b.source
    ),
    doc_nll AS (
      SELECT doc_id, source,
             {pround_expr(f"-({dec2dbl_expr('s')}) / CAST(n_bg AS DOUBLE)", 9)} AS nll
      FROM terms
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           {pround_expr(
               dec2dbl_expr("SUM(CAST(nll AS DECIMAL(30,8)))")
               + " / CAST(COUNT(*) AS DOUBLE)", 6)} AS avg_nll
    FROM doc_nll GROUP BY source
    """,
)
def bigram_lm_nll_by_source(spark, sf_dir):
    """Laplace-smoothed bigram LM trained on the corpus, scored in-sample:
    per-source doc count and mean per-bigram negative log-likelihood."""
    d = spread(load_table(spark, sf_dir, "documents"))
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    docs = d.filter(F.trim("text") != "").select(
        "doc_id", "source", F.split(norm, " ").alias("ws")
    )
    bg_arr = F.expr(
        "zip_with(slice(ws, 1, size(ws) - 1), slice(ws, 2, size(ws) - 1),"
        " (a, b) -> struct(a AS w1, b AS w2))"
    )
    with_bg = docs.select("doc_id", "source", bg_arr.alias("bg"))
    # generator in its own select (struct-name-loss gotcha)
    exploded = with_bg.select("doc_id", "source", F.explode("bg").alias("p"))
    docbg = cache_scoped(
        exploded.select("doc_id", "source", "p.w1", "p.w2")
        .groupBy("doc_id", "source", "w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )
    c12 = docbg.groupBy("w1", "w2").agg(F.sum("n_occ").cast("long").alias("c12"))
    c1 = docbg.groupBy("w1").agg(F.sum("n_occ").cast("long").alias("c1"))
    vocab = (
        docs.select(F.explode("ws").alias("w"))
        .agg(F.countDistinct("w").cast("long").alias("v"))
    )

    def qln(col):
        return F.floor(F.log(col) * _NB_Q + F.lit(0.5)).cast("double") / _NB_Q

    terms = (
        docbg.join(c12.hint("shuffle_hash"), ["w1", "w2"])
        .join(c1.hint("shuffle_hash"), "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            "source",
            (
                F.col("n_occ")
                * (
                    qln(F.col("c12").cast("double") + 1.0)
                    - qln(F.col("c1").cast("double") + F.col("v").cast("double"))
                )
            ).cast(DEC).alias("t"),
            "n_occ",
        )
        .groupBy("doc_id", "source")
        .agg(
            dec_to_double(F.sum("t"), 8).alias("s"),
            F.sum("n_occ").cast("long").alias("n_bg"),
        )
    )
    doc_nll = terms.select(
        "doc_id",
        "source",
        pround(-F.col("s") / F.col("n_bg").cast("double"), 9).alias("nll"),
    )
    return doc_nll.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        pround(
            dec_to_double(F.sum(F.col("nll").cast(DEC)), 8)
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("avg_nll"),
    )


# --------------------------------------------------------------------------
# Zipf-law fit of the corpus vocabulary: OLS of ln(frequency) on ln(rank)
# over the top-R words — the corpus-health diagnostic (natural text fits
# slope ≈ -1; template/generated text bends the curve).  Composition of
# the engine's own primitives: one (word) count shuffle -> top-R by
# TakeOrdered (never a global sort of the full vocabulary) -> rank window
# over R rows -> the closed-form OLS aggregate.  ln values quantized at
# 1e-9 before the exact-decimal sufficient-statistic sums (the NB rule).
# --------------------------------------------------------------------------
_ZIPF_R = 1000


@register(
    "zipf_fit_vocabulary",
    f"""
    WITH freq AS (
      SELECT w, COUNT(*) AS c FROM (
        SELECT unnest(string_split({_NORM_SQL}, ' ')) AS w
        FROM documents WHERE trim(text) <> ''
      ) GROUP BY w
    ),
    top AS (SELECT w, c FROM freq ORDER BY c DESC, w LIMIT {_ZIPF_R}),
    xy AS (
      SELECT {_qln('CAST(ROW_NUMBER() OVER (ORDER BY c DESC, w) AS DOUBLE)')} AS x,
             {_qln('CAST(c AS DOUBLE)')} AS y
      FROM top
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             {dec2dbl_expr(f"SUM(CAST({pround_expr('x', 8)} AS DECIMAL(30,8)))")} AS sx,
             {dec2dbl_expr(f"SUM(CAST({pround_expr('x * x', 8)} AS DECIMAL(30,8)))")} AS sxx,
             {dec2dbl_expr(f"SUM(CAST({pround_expr('y', 8)} AS DECIMAL(30,8)))")} AS sy,
             {dec2dbl_expr(f"SUM(CAST({pround_expr('x * y', 8)} AS DECIMAL(30,8)))")} AS sxy,
             {dec2dbl_expr(f"SUM(CAST({pround_expr('y * y', 8)} AS DECIMAL(30,8)))")} AS syy
      FROM xy
    )
    SELECT n,
           {pround_expr(
               "(CAST(n AS DOUBLE) * sxy - sx * sy)"
               " / (CAST(n AS DOUBLE) * sxx - sx * sx)", 8)} AS slope,
           {pround_expr(
               "(sy - ((CAST(n AS DOUBLE) * sxy - sx * sy)"
               "       / (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx)"
               " / CAST(n AS DOUBLE)", 6)} AS intercept,
           {pround_expr(
               "((CAST(n AS DOUBLE) * sxy - sx * sy)"
               " * (CAST(n AS DOUBLE) * sxy - sx * sy))"
               " / ((CAST(n AS DOUBLE) * sxx - sx * sx)"
               "    * (CAST(n AS DOUBLE) * syy - sy * sy))", 6)} AS r2
    FROM s
    """,
)
def zipf_fit_vocabulary(spark, sf_dir):
    """OLS fit of ln(freq) ~ ln(rank) over the top-1000 vocabulary words:
    returns (n, slope, intercept, r2) — one corpus shuffle + a 1000-row
    rank window + a single-row closed-form solve."""
    from pyspark.sql import Window as W

    d = spread(load_table(spark, sf_dir, "documents"))
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    freq = (
        d.filter(F.trim("text") != "")
        .select(F.explode(F.split(norm, " ")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top = freq.orderBy(F.desc("c"), "w").limit(_ZIPF_R)

    def qln(col):
        return F.floor(F.log(col) * _NB_Q + F.lit(0.5)).cast("double") / _NB_Q

    rank = F.row_number().over(W.orderBy(F.desc("c"), "w"))
    xy = top.select(
        qln(rank.cast("double")).alias("x"), qln(F.col("c").cast("double")).alias("y")
    )
    # every sufficient-statistic term is re-quantized onto the 1e-8 grid
    # BEFORE the decimal cast: a raw double at a decimal half-way point
    # rounds differently in Spark (BigDecimal) vs DuckDB (scaled multiply)
    # — observed here as a last-digit slope mismatch
    s = xy.agg(
        F.count(F.lit(1)).alias("n"),
        dec_to_double(F.sum(pround(F.col("x"), 8).cast(DEC)), 8).alias("sx"),
        dec_to_double(F.sum(pround(F.col("x") * F.col("x"), 8).cast(DEC)), 8).alias("sxx"),
        dec_to_double(F.sum(pround(F.col("y"), 8).cast(DEC)), 8).alias("sy"),
        dec_to_double(F.sum(pround(F.col("x") * F.col("y"), 8).cast(DEC)), 8).alias("sxy"),
        dec_to_double(F.sum(pround(F.col("y") * F.col("y"), 8).cast(DEC)), 8).alias("syy"),
    )
    n_d = F.col("n").cast("double")
    num = n_d * F.col("sxy") - F.col("sx") * F.col("sy")
    den = n_d * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = num / den
    intercept = (F.col("sy") - slope * F.col("sx")) / n_d
    r2 = (num * num) / (den * (n_d * F.col("syy") - F.col("sy") * F.col("sy")))
    return s.select(
        "n",
        pround(slope, 8).alias("slope"),
        pround(intercept, 6).alias("intercept"),
        pround(r2, 6).alias("r2"),
    )
