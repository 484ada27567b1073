"""Exact duplicated-substring span detection — the distributed analog of
suffix-array substring dedup (Lee et al. 2022, "Deduplicating Training
Data Makes Language Models Better"; github.com/google-research/
deduplicate-text-datasets).

Not in the reference (its surface is the pandas algebra,
``/root/reference/dask_expr/_collection.py``); this completes the dedup
family (exact / MinHash / SimHash / n-gram Jaccard / embedding / winnowing
/ **substring spans**) for the LLM-curation layer (SURVEY.md §2.13).

Semantics (exact, well-defined): a character position of a document is
*duplicated* iff it is covered by some length-``L`` character gram whose
rolling hash also occurs in at least one OTHER document.  Overlapping /
adjacent duplicated grams merge into maximal spans (the classic
gaps-and-islands construction), and the query reports per-document span
count, duplicated-char volume, and duplicated-char ratio — exactly the
statistics the suffix-array tool emits per document before cutting the
spans out.

Scale posture (100 TB):

* The gram stream is the ONLY corpus-scaling shuffle: (doc_id, pos, h)
  at stride 1 is ~``len`` rows/doc.  At production scale you raise the
  stride: sampling every ``s``-th position still detects every duplicated
  region of length ≥ ``L + s - 1`` that is *identically aligned*, and the
  winnowing query (``dedup_winnowing_fingerprints``) covers the
  alignment-free candidate story — this operator is the exact-span
  finisher.  The hashes are computed in ONE Arrow batch pass per
  partition (numpy sliding-window dot — the measured ~20× win over both
  the O(len²) ``substr`` loop and the interpreted-HOF rewrite, see
  ``breadth._min_fingerprints_udf``); no Python appears after the map
  stage.
* Duplicated-hash detection is a map-side-combinable groupBy(h) — hot
  boilerplate grams (the skew case) collapse in the partial aggregate,
  and no doc×doc pair join exists anywhere: work is linear in gram
  count, never quadratic in duplicate-cluster size (the posting-list
  lesson from the winnowing rehearsal, BENCH_PROTOCOL defect #8, does
  not arise because hashes are never self-joined).
* The dup-hash relation scales with the corpus vocabulary → pinned off
  broadcast (``hint("shuffle_hash")``, the AQE size-estimate hazard from
  the sf10 rehearsal, tests/test_plans.py).
* Span merging is one window per doc_id over only the DUPLICATED
  positions (already a small subset), then a doc-level aggregate — both
  partition by doc_id, so Exchange reuse keeps it at one shuffle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.exact import pround, pround_expr
from ..sources.tables import load_table, spread
from .registry import register

#: gram length (chars) — spans shorter than this are not detectable, the
#: same contract as the suffix-array tool's minimum match length.
_SPAN_L = 24
_SPAN_B = 257
_SPAN_M = 1_000_000_007

#: positional powers B^(L-1-i) mod M — max term 255*(M-1) ≈ 2.6e11, the
#: 24-term sum < 2^63: exact int64 in numpy AND in both SQL engines.
_SPAN_POWS = [pow(_SPAN_B, _SPAN_L - 1 - i, _SPAN_M) for i in range(_SPAN_L)]

_NORM_SQL = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"


def _span_gram_hash_sql(g: str) -> str:
    terms = " + ".join(
        f"CAST(ord(substr({g}, {i + 1}, 1)) % 256 AS BIGINT) * {_SPAN_POWS[i]}"
        for i in range(_SPAN_L)
    )
    return f"(({terms}) % {_SPAN_M})"


def _all_gram_hashes_udf():
    """Rolling hash of EVERY length-L char gram, one int64 matmul per doc
    (Arrow-batched; identical arithmetic to the oracle's positional sum:
    codepoint % 256, power-weighted, mod M)."""
    import numpy as np
    from numpy.lib.stride_tricks import sliding_window_view

    pows = np.array(_SPAN_POWS, dtype=np.int64)

    @F.pandas_udf("array<long>")
    def hashes(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            codes = np.fromiter((ord(c) % 256 for c in t), np.int64, count=len(t))
            if len(codes) < _SPAN_L:
                out.append([])
                continue
            h = (sliding_window_view(codes, _SPAN_L) @ pows) % _SPAN_M
            out.append(h.tolist())
        return pd.Series(out)

    return hashes


@register(
    "dedup_substring_spans",
    f"""
    WITH norm AS (
      SELECT doc_id, {_NORM_SQL} AS t
      FROM documents WHERE len({_NORM_SQL}) >= {_SPAN_L}
    ),
    grams AS (
      SELECT doc_id, CAST(u AS BIGINT) AS p,
             {_span_gram_hash_sql(f"substr(t, CAST(u AS INT), {_SPAN_L})")} AS h
      FROM (SELECT doc_id, t, unnest(range(1, len(t) - {_SPAN_L} + 2)) AS u
            FROM norm)
    ),
    dup AS (SELECT h FROM grams GROUP BY h HAVING MIN(doc_id) <> MAX(doc_id)),
    marked AS (SELECT g.doc_id, g.p FROM grams g JOIN dup USING (h)),
    flagged AS (
      SELECT doc_id, p,
             MAX(p + {_SPAN_L - 1}) OVER (
               PARTITION BY doc_id ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
      FROM marked
    ),
    perdoc AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN prev_end IS NULL OR p > prev_end + 1
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_spans,
             CAST(SUM(CASE WHEN prev_end IS NULL THEN {_SPAN_L}
                           ELSE GREATEST(0, LEAST({_SPAN_L},
                                p + {_SPAN_L - 1} - prev_end)) END)
                  AS BIGINT) AS dup_chars
      FROM flagged GROUP BY doc_id
    )
    SELECT p.doc_id, p.n_spans, p.dup_chars,
           CAST(len(n.t) AS BIGINT) AS doc_len,
           {pround_expr('CAST(p.dup_chars AS DOUBLE) / CAST(len(n.t) AS DOUBLE)', 4)}
             AS dup_ratio
    FROM perdoc p JOIN norm n USING (doc_id)
    """,
)
def dedup_substring_spans(spark, sf_dir):
    """Per-document maximal duplicated-substring spans (L=24 char grams).

    Plan: Arrow-UDF rolling hashes (map-side, no shuffle) → posexplode →
    one corpus shuffle to count distinct docs per hash → shuffle-pinned
    semi join back → per-doc window merge of overlapping grams into
    spans → doc-level stats.  No pair join anywhere: linear in grams.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    base = d.select("doc_id", norm.alias("t")).filter(F.length("t") >= _SPAN_L)
    from .registry import cache_scoped

    # cache BEFORE the explode: the Arrow UDF runs exactly once into the
    # cache (doc-level rows, ~len longs each); the gram stream, the
    # doc-length lookup, and the dup-hash count all read it back without
    # re-running Python (an uncached `lens` branch was re-running the
    # whole scan+UDF pass — visible as a second ArrowEvalPython subtree).
    hashed = cache_scoped(
        base.select(
            "doc_id",
            F.length("t").cast("long").alias("doc_len"),
            _all_gram_hashes_udf()("t").alias("hs"),
        )
    )
    # generator in its own select (struct-name-loss gotcha)
    grams = hashed.select("doc_id", F.posexplode("hs").alias("p0", "h")).select(
        "doc_id", (F.col("p0") + 1).alias("p"), "h"
    )
    # The gram stream is ~len rows/doc: at 10× bench scale it is ~1e9 rows
    # and the session-global 32 shuffle partitions force the hash
    # aggregate to spill (measured 20× instead of 10× sf1→sf10 before
    # this fix — scale defect #10).  Partition the h-shuffle from input
    # bytes (~2 MB of source parquet per partition, floor 32, cap 2048);
    # the dup aggregate AND the probe join both reuse this partitioning
    # (same key → ReuseExchange), so the repartition is the only h-shuffle.
    import os as _os

    size_bytes = _os.path.getsize(_os.path.join(sf_dir, "documents.parquet"))
    gram_parts = max(32, min(2048, size_bytes // (2 << 20)))
    grams = grams.repartition(gram_parts, "h")
    # "appears in ≥2 distinct docs" == min(doc) != max(doc): one ordinary
    # partial-aggregable pass — countDistinct planned as a double-shuffle
    # expand-distinct aggregate over the full gram stream (the other half
    # of defect #10).
    dup = (
        grams.groupBy("h")
        .agg(F.min("doc_id").alias("dmin"), F.max("doc_id").alias("dmax"))
        .filter(F.col("dmin") != F.col("dmax"))
        .select("h")
    )
    # dup scales with the corpus vocabulary — never let AQE broadcast it
    marked = grams.join(dup.hint("shuffle_hash"), "h").select("doc_id", "p")
    wseq = W.partitionBy("doc_id").orderBy("p")
    prev_end = F.max(F.col("p") + (_SPAN_L - 1)).over(
        wseq.rowsBetween(W.unboundedPreceding, -1)
    )
    flagged = marked.withColumn("prev_end", prev_end)
    # per-position incremental coverage: a gap restarts a span (L fresh
    # chars), an overlap contributes only the chars past the running max
    # end — so ONE groupBy(doc_id) replaces the (doc,island) + (doc)
    # two-agg cascade, and it reuses the window's doc_id partitioning
    # (no extra Exchange).
    new_span = F.when(
        F.col("prev_end").isNull() | (F.col("p") > F.col("prev_end") + 1), 1
    ).otherwise(0)
    contrib = F.when(F.col("prev_end").isNull(), F.lit(_SPAN_L)).otherwise(
        F.greatest(
            F.lit(0),
            F.least(F.lit(_SPAN_L), F.col("p") + (_SPAN_L - 1) - F.col("prev_end")),
        )
    )
    perdoc = flagged.groupBy("doc_id").agg(
        F.sum(new_span).cast("long").alias("n_spans"),
        F.sum(contrib).cast("long").alias("dup_chars"),
    )
    # both sides are doc-level and scale with the corpus — never broadcast
    lens = hashed.select("doc_id", "doc_len")
    return perdoc.join(lens.hint("shuffle_hash"), "doc_id").select(
        "doc_id",
        "n_spans",
        "dup_chars",
        "doc_len",
        pround(
            F.col("dup_chars").cast("double") / F.col("doc_len").cast("double"), 4
        ).alias("dup_ratio"),
    )
