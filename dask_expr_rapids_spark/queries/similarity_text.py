"""String-similarity join (edit distance) and information-theoretic
source divergence — the last two corpus-diagnostic primitives of the
curation layer.

Not in the reference (pandas algebra only,
``/root/reference/dask_expr/_collection.py``); SURVEY.md §2.13.

Scale posture:

* edit-distance join — the Ed-Join family (Xiao et al. '08): candidates
  come from an equi-join on a cheap blocking key (the normalized
  12-char prefix), never from an all-pairs comparison; every block is
  capped to a deterministic md5-ranked subset (the same bounded-bucket
  guarantee as the embedding-LSH cap: join work ≤ blocks × cap²
  under ANY skew), and the O(len²) Levenshtein DP runs only on
  candidate pairs' 40-char prefixes, inline in the join's codegen
  stage.
* KL divergence — one corpus-wide shuffle to (source, word) counts;
  everything after is vocabulary-sized (the lexical_rarity plan shape).
  Each ln-bearing term is quantized before the exact-decimal sum (the
  BM25 ulp rule), so both engines agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.exact import DEC, dec2dbl_expr, dec_to_double, pround, pround_expr
from ..sources.tables import load_table, spread
from .registry import cache_scoped, register

_NORM_SQL = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"

_ED_BLOCK = 12  # blocking-prefix chars
_ED_PREFIX = 40  # compared-prefix chars
_ED_MAX = 6  # max edit distance emitted
_ED_CAP = 64  # per-block membership cap


@register(
    "editdistance_join_prefixes",
    f"""
    WITH norm AS (
      SELECT doc_id, {_NORM_SQL} AS t FROM documents
      WHERE len({_NORM_SQL}) >= {_ED_BLOCK}
    ),
    keyed AS (
      SELECT doc_id, substr(t, 1, {_ED_BLOCK}) AS blk,
             substr(t, 1, {_ED_PREFIX}) AS pfx
      FROM norm
    ),
    capped AS (
      SELECT doc_id, blk, pfx FROM (
        SELECT doc_id, blk, pfx,
               row_number() OVER (PARTITION BY blk
                                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM keyed) WHERE rn <= {_ED_CAP}
    )
    SELECT a.doc_id AS id1, b.doc_id AS id2,
           CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS edit_distance
    FROM capped a JOIN capped b ON a.blk = b.blk AND a.doc_id < b.doc_id
    WHERE levenshtein(a.pfx, b.pfx) <= {_ED_MAX}
    """,
)
def editdistance_join_prefixes(spark, sf_dir):
    """Ed-Join-style string-similarity self-join: 12-char-prefix blocks
    (md5-capped at 64 members) → in-block Levenshtein over 40-char
    prefixes, pairs within distance 6.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    keyed = (
        d.select("doc_id", norm.alias("t"))
        .filter(F.length("t") >= _ED_BLOCK)
        .select(
            "doc_id",
            F.substring("t", 1, _ED_BLOCK).alias("blk"),
            F.substring("t", 1, _ED_PREFIX).alias("pfx"),
        )
    )
    w = W.partitionBy("blk").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    capped = cache_scoped(
        keyed.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= _ED_CAP)
        .drop("__rn__")
    )
    a = capped.select(F.col("doc_id").alias("id1"), "blk", F.col("pfx").alias("p1"))
    b = capped.select(F.col("doc_id").alias("id2"), "blk", F.col("pfx").alias("p2"))
    # both sides scale with the corpus — shuffle join, verification inline
    dist = F.levenshtein("p1", "p2")
    return (
        a.join(b.hint("shuffle_hash"), "blk")
        .filter(F.col("id1") < F.col("id2"))
        .filter(dist <= _ED_MAX)
        .select("id1", "id2", dist.cast("long").alias("edit_distance"))
    )


_KL_Q = 1_000_000_000  # per-term quantization (1e-9) before the exact sum


@register(
    "source_divergence_stats",
    f"""
    WITH words AS (
      SELECT source, unnest(string_split({_NORM_SQL}, ' ')) AS w
      FROM documents WHERE trim(text) <> ''
    ),
    csw AS (SELECT source, w, COUNT(*) AS c FROM words GROUP BY source, w),
    ns AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM csw GROUP BY source),
    cw AS (SELECT w, CAST(SUM(c) AS BIGINT) AS cwt FROM csw GROUP BY w),
    nt AS (SELECT CAST(SUM(cwt) AS BIGINT) AS total FROM cw),
    terms AS (
      SELECT csw.source,
             (CAST(floor(
                (CAST(csw.c AS DOUBLE) / CAST(ns.n AS DOUBLE))
                * ln((CAST(csw.c AS DOUBLE) / CAST(ns.n AS DOUBLE))
                     / (CAST(cw.cwt AS DOUBLE) / CAST(nt.total AS DOUBLE)))
                * {_KL_Q}.0 + 0.5) AS DOUBLE) / {_KL_Q}.0) AS term
      FROM csw
      JOIN ns ON csw.source = ns.source
      JOIN cw ON csw.w = cw.w
      CROSS JOIN nt
    )
    SELECT source,
           COUNT(*) AS vocab_size,
           {pround_expr(dec2dbl_expr("SUM(CAST(term AS DECIMAL(30,8)))"), 6)}
             AS kl_vs_corpus
    FROM terms GROUP BY source
    """,
)
def source_divergence_stats(spark, sf_dir):
    """KL(source word distribution ‖ corpus word distribution) per source
    — the data-mixture redundancy/skew diagnostic (a source with near-zero
    KL adds no distributional novelty).

    Plan: one corpus shuffle to (source, word) counts; the ratio joins
    run on vocabulary-sized relations; ln terms quantized (1e-9) then
    exact-decimal summed.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    words = d.filter(F.trim("text") != "").select(
        "source", F.explode(F.split(norm, " ")).alias("w")
    )
    csw = cache_scoped(
        words.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    )
    ns = csw.groupBy("source").agg(F.sum("c").cast("long").alias("n"))
    cw = csw.groupBy("w").agg(F.sum("c").cast("long").alias("cwt"))
    nt = cw.agg(F.sum("cwt").cast("long").alias("total"))
    p = F.col("c").cast("double") / F.col("n").cast("double")
    q = F.col("cwt").cast("double") / F.col("total").cast("double")
    term_raw = p * F.log(p / q)
    term = F.floor(term_raw * _KL_Q + F.lit(0.5)).cast("double") / _KL_Q
    terms = (
        csw.join(F.broadcast(ns), "source")
        # per-word totals scale with the corpus vocabulary — never broadcast
        .join(cw.hint("shuffle_hash"), "w")
        .crossJoin(F.broadcast(nt))
        .select("source", term.alias("term"))
    )
    return terms.groupBy("source").agg(
        F.count(F.lit(1)).alias("vocab_size"),
        pround(dec_to_double(F.sum(F.col("term").cast(DEC)), 8), 6).alias(
            "kl_vs_corpus"
        ),
    )
