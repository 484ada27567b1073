"""Full-text retrieval over the documents corpus: BM25 ranked search and
exact phrase (adjacency) search.

Not in the reference (pandas algebra only,
``/root/reference/dask_expr/_collection.py``); these extend the
LLM-curation layer (SURVEY.md §2.13) with the standard lexical-retrieval
primitives a training-data pipeline uses for targeted corpus probes
(eval-set leakage hunts, boilerplate hunts, topic audits).

Scale posture (100 TB):

* BM25: the term-frequency relation ``tf(doc, term)`` is the only
  corpus-scaling shuffle (map-side combinable groupBy).  The query-term
  set is broadcast, so the scoring join prunes the tf stream map-side —
  only postings of queried terms flow further.  Corpus constants
  (N, avgdl) ride a broadcast 1-row relation (the q11 scalar-threshold
  pattern) — no driver collect in the plan.
* Phrase search is fully map-side until the (phrase, doc) count: bigrams
  are formed per-row from the split array (no explode-then-window
  shuffle), filtered against the phrase list BEFORE any exchange, so
  only matching bigrams shuffle.

Determinism: scores mix ``ln`` (the one libm call that can differ by an
ulp across engines) into double arithmetic, so each per-term score is
quantized (pround 6) and summed in exact decimal (functions/exact.py);
ranking ties break on doc_id.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.exact import dec_to_double, dec2dbl_expr, DEC, pround_expr
from ..sources.tables import load_table, spread
from .registry import register

_NORM_SQL = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"

_K1 = 1.2
_B = 0.75
_TOPK = 10

#: fixed query workload: common-term queries plus one rare-term query
#: ("dup" — ~26 corpus occurrences vs ~900 for common words) so the idf
#: term actually discriminates.
_BM25_QUERIES: list[tuple[int, tuple[str, ...]]] = [
    (1, ("hash", "join", "spark")),
    (2, ("window", "agg", "stream")),
    (3, ("dup", "customer")),
]

_PHRASES = ("hash join", "sort merge", "group agg")


def _qterms_sql() -> str:
    rows = ", ".join(
        f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES for t in terms
    )
    return f"(VALUES {rows}) AS qt(query_id, term)"


@register(
    "bm25_search_topk",
    f"""
    WITH words AS (
      SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS w
      FROM documents WHERE trim(text) <> ''
    ),
    tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM words GROUP BY doc_id, w),
    dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
    consts AS (
      SELECT COUNT(*) AS n_docs,
             {dec2dbl_expr("SUM(CAST(dl AS DECIMAL(30,8)))")}
               / CAST(COUNT(*) AS DOUBLE) AS avgdl
      FROM dl
    ),
    qt AS (SELECT * FROM {_qterms_sql()}),
    tfq AS (
      SELECT qt.query_id, tf.doc_id, tf.w, tf.tf
      FROM tf JOIN qt ON tf.w = qt.term
    ),
    dfc AS (SELECT w, COUNT(DISTINCT doc_id) AS df FROM tfq GROUP BY w),
    scored AS (
      SELECT t.query_id, t.doc_id,
             {pround_expr(
                 "ln(1.0 + (CAST(c.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5)"
                 "          / (CAST(d.df AS DOUBLE) + 0.5))"
                 f" * (CAST(t.tf AS DOUBLE) * {_K1 + 1.0!r})"
                 f" / (CAST(t.tf AS DOUBLE) + {_K1!r} * (1.0 - {_B!r}"
                 f"    + {_B!r} * CAST(l.dl AS DOUBLE) / c.avgdl))", 6)} AS s
      FROM tfq t
      JOIN dfc d ON t.w = d.w
      JOIN dl l ON t.doc_id = l.doc_id
      CROSS JOIN consts c
    ),
    ranked AS (
      SELECT query_id, doc_id,
             {dec2dbl_expr("SUM(CAST(s AS DECIMAL(30,8)))")} AS score
      FROM scored GROUP BY query_id, doc_id
    )
    SELECT query_id, rank, doc_id, score FROM (
      SELECT query_id, doc_id, score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, doc_id) AS rank
      FROM ranked
    ) WHERE rank <= {_TOPK}
    """,
)
def bm25_search_topk(spark, sf_dir):
    """BM25 (k1=1.2, b=0.75) top-10 docs per query over the word corpus.

    Plan: one corpus shuffle to tf(doc, term); broadcast query terms prune
    the postings map-side; df/N/avgdl are term- and scalar-sized broadcast
    relations; per-term scores quantized then exact-decimal summed.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    words = d.filter(F.trim("text") != "").select(
        "doc_id", F.explode(F.split(norm, " ")).alias("w")
    )
    tf = words.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    from .registry import cache_scoped

    tf = cache_scoped(tf)
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    dl = cache_scoped(dl)
    consts = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            dec_to_double(F.sum(F.col("dl").cast(DEC)), 8)
            / F.count(F.lit(1)).cast("double")
        ).alias("avgdl"),
    )
    qt = spark.createDataFrame(
        [(qid, t) for qid, terms in _BM25_QUERIES for t in terms],
        "query_id int, term string",
    )
    tfq = tf.join(F.broadcast(qt), tf.w == qt.term).select(
        "query_id", "doc_id", "w", "tf"
    )
    dfc = tfq.groupBy("w").agg(F.countDistinct("doc_id").alias("df"))
    k1, b = _K1, _B
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs").cast("double") - F.col("df").cast("double") + 0.5)
        / (F.col("df").cast("double") + 0.5)
    )
    tf_d = F.col("tf").cast("double")
    denom = tf_d + k1 * (1.0 - b + b * F.col("dl").cast("double") / F.col("avgdl"))
    term_score = idf * (tf_d * (k1 + 1.0)) / denom
    # per-term quantization before the exact-decimal sum (ln ulp hygiene)
    quant = (F.floor(term_score * 1e6 + F.lit(0.5)).cast("double") / 1e6).alias("s")
    scored = (
        tfq.join(F.broadcast(dfc), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(consts))
        .select("query_id", "doc_id", quant)
    )
    ranked = scored.groupBy("query_id", "doc_id").agg(
        dec_to_double(F.sum(F.col("s").cast(DEC)), 8).alias("score")
    )
    win = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        ranked.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= _TOPK)
        .select("query_id", "rank", "doc_id", "score")
    )


@register(
    "phrase_search_topk",
    f"""
    WITH arrs AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS s
      FROM documents WHERE trim(text) <> ''
    ),
    bigrams AS (
      SELECT doc_id, s[CAST(p AS INT)] || ' ' || s[CAST(p AS INT) + 1] AS bg
      FROM arrs, unnest(range(1, len(s))) AS t(p)
    ),
    hits AS (
      SELECT bg AS phrase, doc_id, COUNT(*) AS n_occurrences
      FROM bigrams
      WHERE bg IN ({", ".join(f"'{p}'" for p in _PHRASES)})
      GROUP BY bg, doc_id
    )
    SELECT phrase, rank, doc_id, n_occurrences FROM (
      SELECT phrase, doc_id, n_occurrences,
             ROW_NUMBER() OVER (PARTITION BY phrase
                                ORDER BY n_occurrences DESC, doc_id) AS rank
      FROM hits
    ) WHERE rank <= {_TOPK}
    """,
)
def phrase_search_topk(spark, sf_dir):
    """Exact adjacent-bigram phrase search, top-10 docs per phrase.

    Plan: bigrams are built per-row with zip_with over the shifted split
    array (map-side, no positional explode+window shuffle), filtered to
    the phrase list BEFORE the only shuffle (the (phrase, doc) count).
    HOF note: zip_with runs interpreted, but over ~word-count-sized
    arrays (one lambda eval per word) — the measured trap is per-CHAR
    lambda loops, not per-word (memory: interpreted-HOF costs).
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    arrs = d.filter(F.trim("text") != "").select("doc_id", F.split(norm, " ").alias("s"))
    n = F.size("s")
    bigrams = arrs.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice("s", 1, n - 1),
                F.slice("s", 2, n - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("bg"),
    )
    hits = (
        bigrams.filter(F.col("bg").isin(*_PHRASES))
        .groupBy(F.col("bg").alias("phrase"), "doc_id")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    win = W.partitionBy("phrase").orderBy(F.desc("n_occurrences"), F.asc("doc_id"))
    return (
        hits.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= _TOPK)
        .select("phrase", "rank", "doc_id", "n_occurrences")
    )
