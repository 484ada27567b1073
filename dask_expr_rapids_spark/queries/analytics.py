"""Product-analytics operators over the events stream and the corpus:
conversion funnels, cohort retention, and Apriori-pruned co-occurrence
mining.

Not in the reference (pandas algebra only,
``/root/reference/dask_expr/_collection.py``); these are the standard
warehouse analytics a clickstream/corpus team runs daily, expressed as
single-pass shuffles (SURVEY.md §2.13).

Scale posture (100 TB):

* funnel — the event stream is filtered to the three funnel types AT THE
  SCAN (predicate pushdown), then every stage is a user_id-keyed
  aggregate/join: one partitioning, reused across stages (Exchange
  reuse), no window over the full stream.
* cohort retention — two aggregates over the same (user_id) key + one
  join; activity is pre-collapsed to distinct (user, day) before the
  join so the fan-in is days-per-user, not events-per-user.
* co-occurrence — the Apriori prune: only words whose document frequency
  clears the support threshold enter the pair self-join, bounding
  per-doc fan-out by frequent-words²; the pair count is map-side
  combinable.  This is the classic market-basket plan (Agrawal &
  Srikant '94) on the inverted corpus.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.exact import pround, pround_expr
from ..sources.tables import load_table, spread
from .registry import cache_scoped, register

_FUNNEL = ("view", "click", "purchase")


@register(
    "funnel_view_click_purchase",
    f"""
    WITH e AS (
      SELECT user_id, event_type, ts FROM events
      WHERE event_type IN ('view', 'click', 'purchase')
    ),
    v AS (SELECT user_id, MIN(ts) AS t1 FROM e
          WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS t2
          FROM e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts > v.t1
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS t3
          FROM e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.t2
          GROUP BY e.user_id)
    SELECT (SELECT COUNT(*) FROM v) AS n_viewed,
           (SELECT COUNT(*) FROM c) AS n_clicked_after_view,
           (SELECT COUNT(*) FROM p) AS n_purchased_after_click,
           {pround_expr('CAST((SELECT COUNT(*) FROM c) AS DOUBLE)'
                        ' / CAST((SELECT COUNT(*) FROM v) AS DOUBLE)', 6)}
             AS view_to_click,
           {pround_expr('CAST((SELECT COUNT(*) FROM p) AS DOUBLE)'
                        ' / CAST((SELECT COUNT(*) FROM c) AS DOUBLE)', 6)}
             AS click_to_purchase
    """,
)
def funnel_view_click_purchase(spark, sf_dir):
    """Ordered conversion funnel: first view → first later click → first
    later purchase, per user; reports stage populations and rates.

    Plan: scan filtered to the three types (pushed filter), cached once;
    each stage is a user_id groupBy + equi-join — same key throughout,
    so the shuffle partitioning is laid down once and reused.
    """
    e = spread(load_table(spark, sf_dir, "events")).filter(
        F.col("event_type").isin(*_FUNNEL)
    )
    e = cache_scoped(e.select("user_id", "event_type", "ts"))
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    counts = (
        v.agg(F.count(F.lit(1)).alias("n_viewed"))
        .crossJoin(F.broadcast(c.agg(F.count(F.lit(1)).alias("n_clicked_after_view"))))
        .crossJoin(
            F.broadcast(p.agg(F.count(F.lit(1)).alias("n_purchased_after_click")))
        )
    )
    return counts.select(
        "n_viewed",
        "n_clicked_after_view",
        "n_purchased_after_click",
        pround(
            F.col("n_clicked_after_view").cast("double")
            / F.col("n_viewed").cast("double"),
            6,
        ).alias("view_to_click"),
        pround(
            F.col("n_purchased_after_click").cast("double")
            / F.col("n_clicked_after_view").cast("double"),
            6,
        ).alias("click_to_purchase"),
    )


@register(
    "cohort_retention_daily",
    """
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events
      GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    )
    SELECT STRFTIME(f.cohort_day, '%Y-%m-%d') AS cohort_day,
           CAST(a.day - f.cohort_day AS BIGINT) AS day_offset,
           COUNT(*) AS n_active_users
    FROM activity a JOIN firsts f ON a.user_id = f.user_id
    WHERE a.day - f.cohort_day BETWEEN 0 AND 7
    GROUP BY f.cohort_day, day_offset
    """,
)
def cohort_retention_daily(spark, sf_dir):
    """Daily cohort retention (offsets 0..7): users grouped by first-seen
    day, activity counted on distinct (user, day).

    Plan: both aggregates key on user_id (one partitioning), activity is
    collapsed to distinct days BEFORE the join, final rollup is
    cohort×offset-sized.  (user, day) is unique post-distinct, so the
    final count needs no countDistinct.
    """
    ev = spread(load_table(spark, sf_dir, "events")).select(
        "user_id", F.to_date("ts").alias("day")
    )
    ev = cache_scoped(ev)
    firsts = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    activity = ev.distinct()
    j = activity.join(firsts, "user_id").withColumn(
        "day_offset", F.datediff("day", "cohort_day").cast("long")
    )
    return (
        j.filter(F.col("day_offset").between(0, 7))
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            "day_offset",
        )
        .agg(F.count(F.lit(1)).alias("n_active_users"))
    )


_COOC_MINSUP = 0.3  # relative document-frequency support threshold
_COOC_TOPK = 20

_NORM_SQL = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"


@register(
    "cooccurrence_word_pairs",
    f"""
    WITH dw AS (
      SELECT DISTINCT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS w
      FROM documents WHERE trim(text) <> ''
    ),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM dw),
    df AS (SELECT w, COUNT(*) AS dfc FROM dw GROUP BY w),
    freq AS (
      SELECT w, dfc FROM df, n WHERE dfc >= {_COOC_MINSUP} * n.n_docs
    ),
    fdw AS (SELECT dw.doc_id, dw.w FROM dw JOIN freq ON dw.w = freq.w),
    pairs AS (
      SELECT a.w AS w1, b.w AS w2, COUNT(*) AS n_both
      FROM fdw a JOIN fdw b ON a.doc_id = b.doc_id AND a.w < b.w
      GROUP BY a.w, b.w
    )
    SELECT w1, w2, n_both,
           {pround_expr('CAST(n.n_docs AS DOUBLE) * CAST(n_both AS DOUBLE)'
                        ' / (CAST(f1.dfc AS DOUBLE) * CAST(f2.dfc AS DOUBLE))', 6)}
             AS lift
    FROM pairs
    JOIN freq f1 ON pairs.w1 = f1.w
    JOIN freq f2 ON pairs.w2 = f2.w
    CROSS JOIN n
    ORDER BY n_both DESC, w1, w2
    LIMIT {_COOC_TOPK}
    """,
)
def cooccurrence_word_pairs(spark, sf_dir):
    """Top-20 co-occurring word pairs with lift, support-pruned Apriori
    style: only words with document frequency ≥ 30% of the corpus enter
    the pair join (fan-out ≤ frequent-words² per doc, never vocabulary²).
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    dw = (
        d.filter(F.trim("text") != "")
        .select("doc_id", F.explode(F.split(norm, " ")).alias("w"))
        .distinct()
    )
    dw = cache_scoped(dw)
    n_docs_df = dw.agg(F.countDistinct("doc_id").alias("n_docs"))
    df_counts = dw.groupBy("w").agg(F.count(F.lit(1)).alias("dfc"))
    freq = (
        df_counts.crossJoin(F.broadcast(n_docs_df))
        .filter(F.col("dfc") >= _COOC_MINSUP * F.col("n_docs"))
        .select("w", "dfc")
    )
    freq = cache_scoped(freq)
    # frequent vocab is threshold-bounded (≤ 1/minsup × avg doc length in
    # expectation) — broadcast is the right call here, it prunes the
    # corpus stream map-side
    fdw = dw.join(F.broadcast(freq.select("w")), "w").select("doc_id", "w")
    a = fdw.select("doc_id", F.col("w").alias("w1"))
    b = fdw.select("doc_id", F.col("w").alias("w2"))
    pairs = (
        a.join(b.hint("shuffle_hash"), "doc_id")
        .filter(F.col("w1") < F.col("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    out = (
        pairs.join(F.broadcast(freq.select(F.col("w").alias("w1"), F.col("dfc").alias("df1"))), "w1")
        .join(F.broadcast(freq.select(F.col("w").alias("w2"), F.col("dfc").alias("df2"))), "w2")
        .crossJoin(F.broadcast(n_docs_df))
        .select(
            "w1",
            "w2",
            "n_both",
            pround(
                F.col("n_docs").cast("double")
                * F.col("n_both").cast("double")
                / (F.col("df1").cast("double") * F.col("df2").cast("double")),
                6,
            ).alias("lift"),
        )
    )
    return out.orderBy(F.desc("n_both"), "w1", "w2").limit(_COOC_TOPK)


# --------------------------------------------------------------------------
# Robust outlier detection per group: median/MAD z-scores (the modified
# z-score of Iglewicz & Hoaglin) — the data-quality screen that, unlike
# mean/std, is not itself corrupted by the outliers it hunts.
#
# Determinism: the median is the LOWER median — the element at rank
# ceil(n/2) — selected by integer rank, so there is NO float interpolation
# anywhere (interpolated medians differ between engines in the last ulp
# and a last-ulp median shifts boundary outliers).  The outlier test
# multiplies through instead of dividing: 0.6745 * |x - med| > 3.5 * MAD,
# identical IEEE ops in both engines.
#
# Scale posture: each median is one window sort over the events relation,
# partitioned by group — sort-based, no per-group in-memory percentile
# collection (Spark's percentile() buffers a group's values; a hot group
# at 100 TB OOMs it).  Two sorted passes (median, then MAD) + one final
# aggregate = three shuffles total, all on the same group key.
# --------------------------------------------------------------------------
_RANKED_SQL = """
    ranked AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ),
    med AS (
      SELECT event_type, MIN(value) AS med FROM ranked
      WHERE rn = (n + 1) // 2 GROUP BY event_type
    ),
    adev AS (
      SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS ad
      FROM events e JOIN med m ON e.event_type = m.event_type
    ),
    adev_ranked AS (
      SELECT event_type, ad,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ad) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM adev
    ),
    mad AS (
      SELECT event_type, MIN(ad) AS mad FROM adev_ranked
      WHERE rn = (n + 1) // 2 GROUP BY event_type
    )
"""


@register(
    "robust_outliers_by_type",
    f"""
    WITH {_RANKED_SQL}
    SELECT a.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           {pround_expr('MIN(a.med)', 6)} AS median,
           {pround_expr('MIN(d.mad)', 6)} AS mad,
           CAST(SUM(CASE WHEN 0.6745 * a.ad > 3.5 * d.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM adev a JOIN mad d ON a.event_type = d.event_type
    GROUP BY a.event_type
    """,
)
def robust_outliers_by_type(spark, sf_dir):
    """Per-event-type robust outlier counts via median/MAD modified
    z-scores; see the block comment for the determinism and scale
    contract."""
    from pyspark.sql import Window as W

    e = spread(load_table(spark, sf_dir, "events")).select("event_type", "value")

    def lower_median(df, col, out):
        w = W.partitionBy("event_type").orderBy(col)
        wn = W.partitionBy("event_type")
        ranked = df.select(
            "event_type",
            F.col(col),
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        return (
            ranked.filter(F.col("rn") == F.expr("(n + 1) DIV 2"))
            .groupBy("event_type")
            .agg(F.min(col).alias(out))
        )

    med = lower_median(e, "value", "med")
    a = e.join(F.broadcast(med), "event_type").select(
        "event_type", "value", "med", F.abs(F.col("value") - F.col("med")).alias("ad")
    )
    a = cache_scoped(a)
    mad = lower_median(a, "ad", "mad")
    return (
        a.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            pround(F.min("med"), 6).alias("median"),
            pround(F.min("mad"), 6).alias("mad"),
            F.sum(
                F.when(0.6745 * F.col("ad") > 3.5 * F.col("mad"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
    )
