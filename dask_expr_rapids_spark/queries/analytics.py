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

from ..functions.exact import (
    davg,
    davg_expr,
    dec2dbl_expr,
    dec_to_double,
    pround,
    pround_expr,
)
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
    contract.

    Scale path (round 8): the lower medians come from
    ``operators.selection.grouped_lower_median`` — a per-type window sort
    at bench scale, a histogram-bucketed exact selection above 64 MB of
    input, because a ``PARTITION BY event_type`` sort caps parallelism at
    n_types tasks (the sf1→sf10 scan's 7-10× growth)."""
    import os as _os

    from ..operators.selection import grouped_lower_median

    nbytes = _os.path.getsize(_os.path.join(sf_dir, "events.parquet"))
    e = spread(load_table(spark, sf_dir, "events")).select("event_type", "value")

    def lower_median(df, col, out):
        return grouped_lower_median(
            df, "event_type", col, out, input_bytes=nbytes
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


# --------------------------------------------------------------------------
# Batch sessionization — the batch twin of stream_sessionize_users
# (streaming/ops.py session_window): 30-minute inactivity-gap sessions via
# lag + running sum, the classic warehouse formulation.
#
# Scale posture: ONE shuffle (hash on user_id for the window); the
# per-session aggregate reuses the same partitioning (HashPartitioning on
# user_id satisfies the (user_id, session_idx) clustered distribution —
# no second exchange).  Determinism under ts ties: equal timestamps have
# gap 0, so any tie order yields identical session boundaries and
# identical per-session aggregates.
# --------------------------------------------------------------------------
_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity gap


@register(
    "sessionize_users_batch",
    f"""
    WITH e AS (
      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events
    ),
    marked AS (
      SELECT user_id, ts_us,
             CASE WHEN LAG(ts_us) OVER w IS NULL
                    OR ts_us - LAG(ts_us) OVER w > {_SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS is_start
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
    ),
    sess AS (
      SELECT user_id, ts_us,
             SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts_us
                                 ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM marked
    )
    SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MIN(ts_us) AS BIGINT) AS start_us,
           CAST(MAX(ts_us) - MIN(ts_us) AS BIGINT) AS dur_us
    FROM sess GROUP BY user_id, session_idx
    """,
)
def sessionize_users_batch(spark, sf_dir):
    """Gap-based (30 min) sessions per user: lag -> is_start -> running
    sum -> per-session count/start/duration, all on one user_id shuffle."""
    from pyspark.sql import Window as W

    e = spread(load_table(spark, sf_dir, "events")).select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us")
    )
    w = W.partitionBy("user_id").orderBy("ts_us")
    lagged = F.lag("ts_us").over(w)
    marked = e.withColumn(
        "is_start",
        F.when(
            lagged.isNull() | (F.col("ts_us") - lagged > _SESSION_GAP_US), 1
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "session_idx",
        F.sum("is_start").over(w.rowsBetween(W.unboundedPreceding, 0)).cast("long"),
    )
    return sess.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min("ts_us").cast("long").alias("start_us"),
        (F.max("ts_us") - F.min("ts_us")).cast("long").alias("dur_us"),
    )


# --------------------------------------------------------------------------
# Peak concurrency by day — the sweep-line pattern (capacity planning:
# "how many sessions were open at the worst moment?").  Sessions become
# +1/-1 delta events; concurrency is the running sum.
#
# The naive formulation needs ONE GLOBAL SORT of all deltas — a scale
# killer.  This plan is day-partitioned: each day sweeps only its own
# deltas in parallel, and sessions that straddle midnight enter as an
# O(days) per-day carry count (computed from a bounded day-span explode),
# so no window ever crosses a partition.  Determinism under ts ties:
# deltas are collapsed to net-per-timestamp BEFORE the running sum, so
# tie order cannot exist.  A session is open through its last event's
# microsecond (half-open [s, t+1)): the end delta lands at t+1, so a
# single-event session still peaks at 1 and a start delta can never be
# cancelled by the same session's end in the collapse.  The day axis is
# the UNION of sweep days and carry days — a day crossed by a multi-day
# session but holding no delta of its own still reports peak = carry.
# --------------------------------------------------------------------------
_DAY_US = 86_400_000_000


@register(
    "peak_concurrency_daily",
    f"""
    WITH e AS (
      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events
    ),
    marked AS (
      SELECT user_id, ts_us,
             CASE WHEN LAG(ts_us) OVER w IS NULL
                    OR ts_us - LAG(ts_us) OVER w > {_SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS is_start
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
    ),
    sess AS (
      SELECT user_id, ts_us,
             SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts_us
                                 ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM marked
    ),
    sessions AS (
      SELECT MIN(ts_us) AS s, MAX(ts_us) + 1 AS t
      FROM sess GROUP BY user_id, session_idx
    ),
    sd AS (
      SELECT s, t, s // {_DAY_US} AS sday, t // {_DAY_US} AS eday FROM sessions
    ),
    spans AS (
      SELECT sd.sday, d FROM sd,
             LATERAL (SELECT unnest(generate_series(sd.sday, sd.eday)) AS d) x
    ),
    carry AS (
      SELECT d, CAST(COUNT(*) AS BIGINT) AS n_carry
      FROM spans WHERE d > sday GROUP BY d
    ),
    starts AS (
      SELECT sday AS d, CAST(COUNT(*) AS BIGINT) AS n_started FROM sd GROUP BY sday
    ),
    deltas AS (
      SELECT sday AS d, s AS ts_us, 1 AS delta FROM sd
      UNION ALL
      SELECT eday AS d, t AS ts_us, -1 AS delta FROM sd
    ),
    collapsed AS (
      SELECT d, ts_us, SUM(delta) AS net FROM deltas GROUP BY d, ts_us
    ),
    swept AS (
      SELECT d, SUM(net) OVER (PARTITION BY d ORDER BY ts_us
                               ROWS UNBOUNDED PRECEDING) AS run
      FROM collapsed
    ),
    per_day AS (SELECT d, MAX(run) AS max_run FROM swept GROUP BY d),
    days AS (SELECT d FROM per_day UNION SELECT d FROM carry)
    SELECT strftime(DATE '1970-01-01' + CAST(days.d AS INT), '%Y-%m-%d') AS day,
           COALESCE(c.n_carry, 0) AS n_carry,
           COALESCE(st.n_started, 0) AS n_started,
           CAST(COALESCE(c.n_carry, 0)
                + GREATEST(COALESCE(p.max_run, 0), 0) AS BIGINT)
             AS peak_concurrency
    FROM days
    LEFT JOIN per_day p ON days.d = p.d
    LEFT JOIN carry c ON days.d = c.d
    LEFT JOIN starts st ON days.d = st.d
    """,
)
def peak_concurrency_daily(spark, sf_dir):
    """Per-day peak concurrent sessions via a day-partitioned sweep line:
    +1/-1 deltas collapsed per timestamp, parallel per-day running sums,
    midnight-straddling sessions as an O(days) carry — no global sort."""
    from pyspark.sql import Window as W

    e = spread(load_table(spark, sf_dir, "events")).select(
        "user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us")
    )
    w = W.partitionBy("user_id").orderBy("ts_us")
    lagged = F.lag("ts_us").over(w)
    marked = e.withColumn(
        "is_start",
        F.when(
            lagged.isNull() | (F.col("ts_us") - lagged > _SESSION_GAP_US), 1
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "session_idx", F.sum("is_start").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    sessions = sess.groupBy("user_id", "session_idx").agg(
        F.min("ts_us").alias("s"), (F.max("ts_us") + F.lit(1)).alias("t")
    )
    sd = cache_scoped(
        sessions.select(
            "s",
            "t",
            F.expr(f"s DIV {_DAY_US}").alias("sday"),
            F.expr(f"t DIV {_DAY_US}").alias("eday"),
        )
    )
    spans = sd.select("sday", F.explode(F.expr("sequence(sday, eday)")).alias("d"))
    carry = (
        spans.filter(F.col("d") > F.col("sday"))
        .groupBy("d")
        .agg(F.count(F.lit(1)).cast("long").alias("n_carry"))
    )
    starts = sd.groupBy(F.col("sday").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("n_started")
    )
    deltas = sd.select(
        F.col("sday").alias("d"), F.col("s").alias("ts_us"), F.lit(1).alias("delta")
    ).unionAll(
        sd.select(F.col("eday"), F.col("t"), F.lit(-1))
    )
    collapsed = deltas.groupBy("d", "ts_us").agg(F.sum("delta").alias("net"))
    run = F.sum("net").over(
        W.partitionBy("d").orderBy("ts_us").rowsBetween(W.unboundedPreceding, 0)
    )
    per_day = (
        collapsed.withColumn("run", run)
        .groupBy("d")
        .agg(F.max("run").alias("max_run"))
    )
    # day axis = sweep days ∪ carry days (a day crossed by a long session
    # may hold no delta of its own); tiny relation, the union is cheap.
    days = per_day.select("d").union(carry.select("d")).distinct()
    out = (
        days.join(per_day, "d", "left")
        .join(carry, "d", "left")
        .join(starts, "d", "left")
        .select(
            F.date_format(
                F.expr("date_add(DATE '1970-01-01', CAST(d AS INT))"), "yyyy-MM-dd"
            ).alias("day"),
            F.coalesce("n_carry", F.lit(0)).cast("long").alias("n_carry"),
            F.coalesce("n_started", F.lit(0)).cast("long").alias("n_started"),
            (
                F.coalesce("n_carry", F.lit(0))
                + F.greatest(F.coalesce("max_run", F.lit(0)), F.lit(0))
            )
            .cast("long")
            .alias("peak_concurrency"),
        )
    )
    return out


# --------------------------------------------------------------------------
# Time-weighted average — the telemetry/finance aggregate the plain mean
# gets wrong: a value HOLDS until the next observation (LOCF), so each
# reading is weighted by how long it was in force.  Contract: weights are
# within-day (the last reading of a day holds until midnight; no carry
# across days), duplicate timestamps collapse to their floor-mean BEFORE
# the LOCF sequence is formed, so tie order cannot exist.
#
# Determinism: values quantized to 1e-6 integers; the v*w products are
# summed as DECIMAL(38,0) (v_q <= 5e8, w_us <= 8.64e10 — the product
# overflows int64, the ADVICE.md lexical_rarity lesson: cast operands to
# decimal BEFORE multiplying); the exact decimal sum crosses to double
# via the 3-part modulo split, then one IEEE divide — bit-identical in
# both engines.  Scale: one (event_type, ts_us) aggregate + one
# (event_type, day) window + one final aggregate; nothing holds more
# than a day of one event type in a single window partition.
# --------------------------------------------------------------------------
_TWA_Q = 1_000_000


@register(
    "time_weighted_avg_daily",
    f"""
    WITH e AS (
      SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
             CAST(round(CAST(value AS DOUBLE) * {_TWA_Q}, 0) AS BIGINT) AS vq
      FROM events
    ),
    collapsed AS (
      SELECT event_type, ts_us,
             SUM(vq) // COUNT(*) AS v,
             CAST(COUNT(*) AS BIGINT) AS n,
             ts_us // {_DAY_US} AS d
      FROM e GROUP BY event_type, ts_us
    ),
    seg AS (
      SELECT event_type, d, v, n,
             COALESCE(LEAD(ts_us) OVER (PARTITION BY event_type, d
                                        ORDER BY ts_us),
                      (d + 1) * {_DAY_US}) - ts_us AS w
      FROM collapsed
    )
    SELECT event_type,
           strftime(DATE '1970-01-01' + CAST(d AS INT), '%Y-%m-%d') AS day,
           CAST(SUM(n) AS BIGINT) AS n_events,
           {{twa}} AS twa
    FROM seg GROUP BY event_type, d
    """.replace(
        "{twa}",
        pround_expr(
            dec2dbl_expr(
                "SUM(CAST(v AS DECIMAL(28,0)) * CAST(w AS DECIMAL(28,0)))", 0
            )
            + f" / CAST(SUM(w) AS DOUBLE) / {float(_TWA_Q)!r}",
            6,
        ),
    ),
)
def time_weighted_avg_daily(spark, sf_dir):
    """Per-(event_type, day) time-weighted average of `value`: LOCF
    segments weighted by their holding time in microseconds, the last
    segment of a day extended to midnight.  Integer-quantized values,
    decimal-exact accumulation, portable double conversion."""
    from pyspark.sql import Window as W

    e = spread(load_table(spark, sf_dir, "events")).select(
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.round(F.col("value").cast("double") * _TWA_Q, 0).cast("long").alias("vq"),
    )
    collapsed = (
        e.groupBy("event_type", "ts_us")
        .agg(F.sum("vq").alias("sv"), F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            "event_type",
            "ts_us",
            F.expr("sv DIV n").alias("v"),
            "n",
            F.expr(f"ts_us DIV {_DAY_US}").alias("d"),
        )
    )
    w_next = F.lead("ts_us").over(
        W.partitionBy("event_type", "d").orderBy("ts_us")
    )
    seg = collapsed.select(
        "event_type",
        "d",
        "v",
        "n",
        (F.coalesce(w_next, (F.col("d") + 1) * _DAY_US) - F.col("ts_us")).alias("w"),
    )
    s = F.sum(
        F.col("v").cast("decimal(28,0)") * F.col("w").cast("decimal(28,0)")
    )
    return seg.groupBy("event_type", "d").agg(
        F.sum("n").cast("long").alias("n_events"),
        pround(dec_to_double(s, 0) / F.sum("w").cast("double") / float(_TWA_Q), 6).alias("twa"),
    ).select(
        "event_type",
        F.date_format(
            F.expr("date_add(DATE '1970-01-01', CAST(d AS INT))"), "yyyy-MM-dd"
        ).alias("day"),
        "n_events",
        "twa",
    )


# --------------------------------------------------------------------------
# Markov transition matrix over per-user event sequences — the behavioral
# model behind next-event prediction and anomaly scoring.  One user_id
# window shuffle forms the (cur -> next) pairs; everything after is a
# 25-row aggregate.  Determinism: the sequence order is the total order
# (ts_us, event_type) — rows tying on both are interchangeable, so the
# pair multiset is a function of the data; probabilities are integer
# per-1e6 floor quotients (the PageRank discipline).
# --------------------------------------------------------------------------


@register(
    "markov_event_transitions",
    """
    WITH e AS (
      SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      FROM events
    ),
    seq AS (
      SELECT event_type AS cur,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts_us, event_type) AS nxt
      FROM e
    ),
    c AS (
      SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS c
      FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ),
    tot AS (SELECT cur, CAST(SUM(c) AS BIGINT) AS t FROM c GROUP BY cur)
    SELECT c.cur AS cur_type, c.nxt AS next_type, c.c AS n_transitions,
           CAST((c.c * 1000000) // tot.t AS BIGINT) AS p_micro
    FROM c JOIN tot ON c.cur = tot.cur
    """,
)
def markov_event_transitions(spark, sf_dir):
    """First-order Markov transition counts and per-1e6 integer
    probabilities over per-user event-type sequences."""
    from pyspark.sql import Window as W

    e = spread(load_table(spark, sf_dir, "events")).select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    nxt = F.lead("event_type").over(
        W.partitionBy("user_id").orderBy("ts_us", "event_type")
    )
    seq = e.select(F.col("event_type").alias("cur"), nxt.alias("nxt"))
    # c is types²-sized but feeds BOTH sides of the probability join —
    # without the scope cache the user_id window shuffle would run twice
    c = cache_scoped(
        seq.filter(F.col("nxt").isNotNull())
        .groupBy("cur", "nxt")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    tot = c.groupBy("cur").agg(F.sum("c").cast("long").alias("t"))
    return c.join(tot, "cur").select(
        F.col("cur").alias("cur_type"),
        F.col("nxt").alias("next_type"),
        F.col("c").alias("n_transitions"),
        F.expr("CAST((c * 1000000) DIV t AS BIGINT)").alias("p_micro"),
    )


# --------------------------------------------------------------------------
# Hopping (sliding) window rates — the batch twin of streaming hopping
# windows: 1-hour windows advancing every 15 minutes, so each event lands
# in exactly 4 windows.  The explode factor is the constant window/hop
# ratio (4), never data-dependent, and the aggregate output is bounded by
# (windows x types), not by event count — at 100 TB this is one linear
# scan + one map-side-combinable aggregate.
# --------------------------------------------------------------------------
_HOP_US = 900 * 1_000_000  # 15 min
_HOP_FACTOR = 4  # window length / hop = 1 h / 15 min


@register(
    "hopping_window_event_rates",
    f"""
    WITH e AS (
      SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
             CAST(value AS DOUBLE) AS value
      FROM events
    ),
    hopped AS (
      SELECT event_type, value,
             (ts_us // {_HOP_US} - i) * {_HOP_US} AS ws
      FROM e, LATERAL (SELECT unnest(generate_series(0, {_HOP_FACTOR - 1})) AS i) t
    )
    SELECT strftime(make_timestamp(ws), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {pround_expr(davg_expr('value'), 6)} AS avg_value
    FROM hopped GROUP BY ws, event_type
    """,
)
def hopping_window_event_rates(spark, sf_dir):
    """Per-(1-hour window hopping every 15 min, event_type) counts and
    exact-decimal mean value; constant 4x explode, aggregate-bounded
    output."""
    e = spread(load_table(spark, sf_dir, "events")).select(
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.col("value").cast("double").alias("value"),
    )
    hopped = e.select(
        "event_type",
        "value",
        F.explode(F.expr(f"sequence(0, {_HOP_FACTOR - 1})")).alias("i"),
        F.col("ts_us"),
    ).select(
        "event_type",
        "value",
        ((F.expr(f"ts_us DIV {_HOP_US}") - F.col("i")) * _HOP_US).alias("ws"),
    )
    return hopped.groupBy("ws", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        pround(davg(F.col("value")), 6).alias("avg_value"),
    ).select(
        F.date_format(F.timestamp_micros(F.col("ws")), "yyyy-MM-dd HH:mm:ss").alias(
            "window_start"
        ),
        "event_type",
        "n_events",
        "avg_value",
    )


# --------------------------------------------------------------------------
# Session conversion — the business endpoint the sessionizer feeds:
# per day of session start, how many sessions, how many converted
# (contain a purchase), the conversion rate, and the mean session
# duration.  Same single user_id shuffle as sessionize_users_batch
# (the is_purchase flag rides along for free); the daily rollup is
# days-sized.  Rates are integer per-1e6 floor quotients; durations sum
# exactly in decimal and cross to double via the modulo split.
# --------------------------------------------------------------------------


@register(
    "session_conversion_daily",
    f"""
    WITH e AS (
      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
      FROM events
    ),
    marked AS (
      SELECT user_id, ts_us, is_p,
             CASE WHEN LAG(ts_us) OVER w IS NULL
                    OR ts_us - LAG(ts_us) OVER w > {_SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS is_start
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
    ),
    sess AS (
      SELECT user_id, ts_us, is_p,
             SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts_us
                                 ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM marked
    ),
    sessions AS (
      SELECT MIN(ts_us) // {_DAY_US} AS d,
             MAX(ts_us) - MIN(ts_us) AS dur_us,
             MAX(is_p) AS converted
      FROM sess GROUP BY user_id, session_idx
    )
    SELECT strftime(DATE '1970-01-01' + CAST(d AS INT), '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(converted) AS BIGINT) AS n_converted,
           CAST((SUM(converted) * 1000000) // COUNT(*) AS BIGINT)
             AS conv_rate_micro,
           {pround_expr(
               dec2dbl_expr("SUM(CAST(dur_us AS DECIMAL(38,0)))", 0)
               + " / CAST(COUNT(*) AS DOUBLE) / 1000000.0",
               3,
           )} AS avg_dur_s
    FROM sessions GROUP BY d
    """,
)
def session_conversion_daily(spark, sf_dir):
    """Per-day session counts, purchase-conversion rate (per-1e6 integer)
    and mean session duration in seconds, on the same single user_id
    shuffle as the batch sessionizer."""
    from pyspark.sql import Window as W

    e = spread(load_table(spark, sf_dir, "events")).select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_p"),
    )
    w = W.partitionBy("user_id").orderBy("ts_us")
    lagged = F.lag("ts_us").over(w)
    marked = e.withColumn(
        "is_start",
        F.when(
            lagged.isNull() | (F.col("ts_us") - lagged > _SESSION_GAP_US), 1
        ).otherwise(0),
    )
    sess = marked.withColumn(
        "session_idx",
        F.sum("is_start").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    sessions = sess.groupBy("user_id", "session_idx").agg(
        F.expr(f"MIN(ts_us) DIV {_DAY_US}").alias("d"),
        (F.max("ts_us") - F.min("ts_us")).alias("dur_us"),
        F.max("is_p").alias("converted"),
    )
    return sessions.groupBy("d").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("converted").cast("long").alias("n_converted"),
        F.expr("CAST((SUM(converted) * 1000000) DIV COUNT(*) AS BIGINT)").alias(
            "conv_rate_micro"
        ),
        pround(
            dec_to_double(F.sum(F.col("dur_us").cast("decimal(38,0)")), 0)
            / F.count(F.lit(1)).cast("double")
            / 1_000_000.0,
            3,
        ).alias("avg_dur_s"),
    ).select(
        F.date_format(
            F.expr("date_add(DATE '1970-01-01', CAST(d AS INT))"), "yyyy-MM-dd"
        ).alias("day"),
        "n_sessions",
        "n_converted",
        "conv_rate_micro",
        "avg_dur_s",
    )


# --------------------------------------------------------------------------
# Daily anomaly flagging — the operational use of the robust
# (median/MAD) screen above: score every event against its TYPE's
# modified z-score and report anomaly counts per (type, day).  Same
# determinism contract as robust_outliers_by_type (lower medians by
# integer rank, multiply-through test 0.6745*|x-med| > 3.5*MAD — pure
# IEEE, no division); the med/MAD relation is types-sized and broadcast,
# so the flagging pass is map-side over one scan.
# --------------------------------------------------------------------------
_ANOM_RANKED_SQL = """
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
      SELECT e.event_type, abs(e.value - m.med) AS ad
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
    "robust_anomaly_flags_daily",
    f"""
    WITH {_ANOM_RANKED_SQL}
    SELECT e.event_type,
           strftime(CAST(e.ts AS DATE), '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN 0.6745 * abs(e.value - m.med) > 3.5 * d.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
    FROM events e
    JOIN med m ON e.event_type = m.event_type
    JOIN mad d ON e.event_type = d.event_type
    GROUP BY e.event_type, day
    """,
)
def robust_anomaly_flags_daily(spark, sf_dir):
    """Per-(event_type, day) counts of modified-z-score anomalies
    (0.6745·|x−med| > 3.5·MAD with the type's lower median/MAD).

    Scale path (round 8): lower medians via
    ``operators.selection.grouped_lower_median`` — windowed at bench
    scale, histogram-bucketed exact selection above 64 MB (a per-type
    window sort runs on n_types tasks regardless of cluster size; this
    query was the sf1→sf10 scan's 9.9× outlier)."""
    import os as _os

    from ..operators.selection import grouped_lower_median

    nbytes = _os.path.getsize(_os.path.join(sf_dir, "events.parquet"))
    e = spread(load_table(spark, sf_dir, "events")).select(
        "event_type", "value", F.to_date("ts").alias("dday")
    )
    e = cache_scoped(e)

    def lower_median(df, col, out):
        return grouped_lower_median(
            df, "event_type", col, out, input_bytes=nbytes
        )

    med = lower_median(e, "value", "med")
    withmed = e.join(F.broadcast(med), "event_type")
    mad = lower_median(
        withmed.select(
            "event_type", F.abs(F.col("value") - F.col("med")).alias("ad")
        ),
        "ad",
        "mad",
    )
    flagged = withmed.join(F.broadcast(mad), "event_type")
    return flagged.groupBy(
        "event_type", F.date_format("dday", "yyyy-MM-dd").alias("day")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(
            F.when(
                0.6745 * F.abs(F.col("value") - F.col("med")) > 3.5 * F.col("mad"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_anomalies"),
    )


# --------------------------------------------------------------------------
# Gini coefficient of customer spend per market segment — the inequality
# statistic behind "do 1% of customers drive 90% of revenue here".
# Rank form: G = Σ(2i − n − 1)·x_(i) / (n·Σx) over the segment's sorted
# per-customer totals.  Determinism: spend is exact integer cents; equal
# spends make the weighted sum invariant to tie order (the weights over a
# tied block sum identically), so no tiebreak can leak; the weighted sum
# and denominator accumulate as DECIMAL(38,0) (rank×cents overflows
# int64 at scale) and cross to double via the modulo split for ONE IEEE
# divide.  Scale posture: one custkey aggregate + one per-segment window
# sort (sort-based ranking, no percentile buffering) + one final
# aggregate.
# --------------------------------------------------------------------------


@register(
    "gini_spend_by_segment",
    f"""
    WITH spend AS (
      SELECT c.c_mktsegment AS segment, o.o_custkey AS k,
             CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT segment, cents,
             ROW_NUMBER() OVER (PARTITION BY segment
                                ORDER BY cents, k) AS i,
             COUNT(*) OVER (PARTITION BY segment) AS n
      FROM spend
    )
    SELECT segment,
           CAST(MAX(n) AS BIGINT) AS n_customers,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           {pround_expr(
               dec2dbl_expr(
                   "SUM(CAST(2 * i - n - 1 AS DECIMAL(28,0))"
                   " * CAST(cents AS DECIMAL(28,0)))", 0)
               + " / ("
               + dec2dbl_expr(
                   "SUM(CAST(n AS DECIMAL(28,0)) * CAST(cents AS DECIMAL(28,0)))"
                   , 0)
               + ")",
               6,
           )} AS gini
    FROM ranked GROUP BY segment
    """,
)
def gini_spend_by_segment(spark, sf_dir):
    """Per-segment Gini coefficient of per-customer spend (rank form,
    exact-cents totals, decimal-exact weighted sums, one IEEE divide)."""
    from pyspark.sql import Window as W

    o = spread(load_table(spark, sf_dir, "orders")).select(
        F.col("o_custkey").alias("k"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"), F.col("c_mktsegment").alias("segment")
    )
    spend = (
        o.join(c, "k")
        .groupBy("segment", "k")
        .agg(F.sum("cents").cast("long").alias("cents"))
    )
    wr = W.partitionBy("segment").orderBy("cents", "k")
    wn = W.partitionBy("segment")
    ranked = spend.select(
        "segment",
        "cents",
        F.row_number().over(wr).alias("i"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    num = F.sum(
        (2 * F.col("i") - F.col("n") - 1).cast("decimal(28,0)")
        * F.col("cents").cast("decimal(28,0)")
    )
    den = F.sum(
        F.col("n").cast("decimal(28,0)") * F.col("cents").cast("decimal(28,0)")
    )
    return ranked.groupBy("segment").agg(
        F.max("n").cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("total_cents"),
        pround(dec_to_double(num, 0) / dec_to_double(den, 0), 6).alias("gini"),
    )


# --------------------------------------------------------------------------
# Time-to-convert — the funnel's latency dimension: per first-view day,
# how long converting users took from first view to first later
# purchase.  Deltas are exact integer microseconds; the median is the
# LOWER median by integer rank (the robust-outliers discipline — no
# float interpolation), the mean goes through an exact decimal sum.
# Both user-level aggregates key on user_id (one partitioning); the
# median window partitions by day.
# --------------------------------------------------------------------------


@register(
    "funnel_time_to_convert_daily",
    f"""
    WITH e AS (
      SELECT user_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      FROM events WHERE event_type IN ('view', 'purchase')
    ),
    v AS (SELECT user_id, MIN(ts_us) AS t1 FROM e
          WHERE event_type = 'view' GROUP BY user_id),
    p AS (SELECT e.user_id, MIN(e.ts_us) AS t2, MIN(v.t1) AS t1
          FROM e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'purchase' AND e.ts_us > v.t1
          GROUP BY e.user_id),
    deltas AS (
      SELECT t1 // {_DAY_US} AS d, t2 - t1 AS delta_us FROM p
    ),
    ranked AS (
      SELECT d, delta_us,
             ROW_NUMBER() OVER (PARTITION BY d ORDER BY delta_us) AS rn,
             COUNT(*) OVER (PARTITION BY d) AS n
      FROM deltas
    )
    SELECT strftime(DATE '1970-01-01' + CAST(d AS INT), '%Y-%m-%d') AS day,
           CAST(MAX(n) AS BIGINT) AS n_converted,
           CAST(MIN(CASE WHEN rn = (n + 1) // 2 THEN delta_us END) AS BIGINT)
             AS median_delta_us,
           {pround_expr(
               dec2dbl_expr("SUM(CAST(delta_us AS DECIMAL(38,0)))", 0)
               + " / CAST(COUNT(*) AS DOUBLE) / 1000000.0",
               3,
           )} AS avg_delta_s
    FROM ranked GROUP BY d
    """,
)
def funnel_time_to_convert_daily(spark, sf_dir):
    """Per first-view day: converting-user count, LOWER-median and exact
    mean of first-view→first-later-purchase latency."""
    from pyspark.sql import Window as W

    e = spread(load_table(spark, sf_dir, "events")).filter(
        F.col("event_type").isin("view", "purchase")
    ).select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    e = cache_scoped(e)
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t1"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts_us") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t2"), F.min("t1").alias("t1"))
    )
    deltas = p.select(
        F.expr(f"t1 DIV {_DAY_US}").alias("d"),
        (F.col("t2") - F.col("t1")).alias("delta_us"),
    )
    wr = W.partitionBy("d").orderBy("delta_us")
    wn = W.partitionBy("d")
    ranked = deltas.select(
        "d",
        "delta_us",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return ranked.groupBy("d").agg(
        F.max("n").cast("long").alias("n_converted"),
        F.min(
            F.when(F.col("rn") == F.expr("(n + 1) DIV 2"), F.col("delta_us"))
        )
        .cast("long")
        .alias("median_delta_us"),
        pround(
            dec_to_double(F.sum(F.col("delta_us").cast("decimal(38,0)")), 0)
            / F.count(F.lit(1)).cast("double")
            / 1_000_000.0,
            3,
        ).alias("avg_delta_s"),
    ).select(
        F.date_format(
            F.expr("date_add(DATE '1970-01-01', CAST(d AS INT))"), "yyyy-MM-dd"
        ).alias("day"),
        "n_converted",
        "median_delta_us",
        "avg_delta_s",
    )
