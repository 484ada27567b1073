"""The curation DECISION TABLE: the end-to-end endpoint a training-data
pipeline actually ships — one row per document with every signal and the
final keep/drop verdict + split assignment.

Composes the engine's curation signals in a single plan (SURVEY.md
§2.13): exact-dup canonicalization (md5 fingerprint window),
benchmark decontamination (5-gram overlap vs the eval slice, broadcast
eval grams), the deterministic quality heuristic (functions/text.py),
and the RNG-free md5-uniform split (operators/sampling.py).

Scale posture: one fp-keyed window (shuffle 1), the decontaminate
broadcast-gram join (only matching grams shuffle — the 36 s vs 3 s sf1
lesson from decontaminate_train_eval), a doc_id-keyed flag join pinned
off broadcast (contaminated ids are corpus-derived — rare in healthy
corpora, unbounded in adversarial ones), and map-side quality/split
arithmetic.  No collect, no corpus broadcast, ~3 shuffles total for the
whole decision.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.text import quality_score
from ..operators.sampling import hash_uniform, hash_uniform_sql
from ..sources.tables import load_table, spread
from .registry import register
from .text import _ALPHA_SQL, _PUNCT_SQL

_Q_MIN = 0.65
_NORM_SQL = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"

_QUALITY_SQL = f"""(CAST(floor(greatest(0.0, least(1.0,
      CASE WHEN length(text) = 0 THEN 0.0
           ELSE CAST({_ALPHA_SQL} AS DOUBLE) / CAST(length(text) AS DOUBLE) END * 0.7
      + least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.3
      - CASE WHEN length(text) = 0 THEN 0.0
             ELSE CAST({_PUNCT_SQL} AS DOUBLE) / CAST(length(text) AS DOUBLE) END
    )) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0)"""


@register(
    "curation_decision_table",
    f"""
    WITH base AS (
      SELECT doc_id, source, text, md5({_NORM_SQL}) AS fp,
             {_QUALITY_SQL} AS quality,
             ({hash_uniform_sql('doc_id')}) AS u
      FROM documents
    ),
    canon AS (
      SELECT *, MIN(doc_id) OVER (PARTITION BY fp) AS canonical FROM base
    ),
    toks AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS ws FROM documents
    ),
    grams AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(ws) - 4),
                                   i -> array_to_string(ws[i:i+4], ' '))) AS gram
      FROM toks WHERE len(ws) >= 5
    ),
    ev AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 50 = 0),
    contam AS (
      SELECT DISTINCT g.doc_id FROM grams g JOIN ev ON g.gram = ev.gram
      WHERE g.doc_id % 50 <> 0
    )
    SELECT c.doc_id, c.source,
           CASE WHEN c.doc_id % 50 = 0 THEN 'eval' ELSE 'train' END AS role,
           (c.doc_id <> c.canonical) AS is_dup_extra,
           (ct.doc_id IS NOT NULL) AS is_contaminated,
           c.quality,
           CASE WHEN c.doc_id % 50 = 0 THEN 'eval_holdout'
                WHEN c.doc_id <> c.canonical THEN 'drop_dup'
                WHEN ct.doc_id IS NOT NULL THEN 'drop_contaminated'
                WHEN c.quality < {_Q_MIN} THEN 'drop_quality'
                ELSE 'keep' END AS decision,
           CASE WHEN c.doc_id % 50 <> 0 AND c.doc_id = c.canonical
                     AND ct.doc_id IS NULL AND c.quality >= {_Q_MIN}
                THEN CASE WHEN c.u < 0.90 THEN 'train'
                          WHEN c.u < 0.95 THEN 'val' ELSE 'test' END
           END AS split
    FROM canon c LEFT JOIN contam ct ON c.doc_id = ct.doc_id
    """,
)
def curation_decision_table(spark, sf_dir):
    """Per-document keep/drop verdict with reasons: dedup canonicals,
    decontamination, quality gate, and split assignment in one plan.
    Drop precedence: dup > contaminated > quality."""
    d = spread(load_table(spark, sf_dir, "documents"))
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    base = d.select(
        "doc_id",
        "source",
        F.md5(norm).alias("fp"),
        quality_score(F.col("text")).alias("quality"),
        hash_uniform(F.col("doc_id")).alias("u"),
    )
    canon = base.withColumn("canonical", F.min("doc_id").over(W.partitionBy("fp")))

    ws = F.split(norm, " ")
    grams_col = F.transform(
        F.sequence(F.lit(1), F.size(ws) - 4),
        lambda i: F.concat_ws(" ", F.slice(ws, i, F.lit(5))),
    )
    grams = d.filter(F.size(ws) >= 5).select("doc_id", F.explode(grams_col).alias("gram"))
    ev = grams.filter(F.col("doc_id") % 50 == 0).select("gram").distinct()
    contam = (
        grams.filter(F.col("doc_id") % 50 != 0)
        .join(F.broadcast(ev), "gram")
        .select("doc_id")
        .distinct()
        .withColumn("__contam__", F.lit(1))
    )
    j = canon.join(contam.hint("shuffle_hash"), "doc_id", "left")

    is_eval = F.col("doc_id") % 50 == 0
    is_dup = F.col("doc_id") != F.col("canonical")
    is_contam = F.col("__contam__").isNotNull()
    q_bad = F.col("quality") < _Q_MIN
    decision = (
        F.when(is_eval, "eval_holdout")
        .when(is_dup, "drop_dup")
        .when(is_contam, "drop_contaminated")
        .when(q_bad, "drop_quality")
        .otherwise("keep")
    )
    split = F.when(
        ~is_eval & ~is_dup & ~is_contam & ~q_bad,
        F.when(F.col("u") < 0.90, "train").when(F.col("u") < 0.95, "val").otherwise("test"),
    )
    return j.select(
        "doc_id",
        "source",
        F.when(is_eval, "eval").otherwise("train").alias("role"),
        is_dup.alias("is_dup_extra"),
        is_contam.alias("is_contaminated"),
        "quality",
        decision.alias("decision"),
        split.alias("split"),
    )
