"""Text analysis + deduplication queries over `documents` — the LLM-data
pipeline extensions (beyond the reference surface, which has only a pandas
str accessor ``/root/reference/dask_expr/_str_accessor.py``).

All Spark-side logic is pure ``pyspark.sql.functions`` (JVM codegen, no
UDFs).  Hash functions are MD5 so the DuckDB oracle reproduces them exactly.

Scale notes (100 TB posture):
* exact dedup = hash-groupBy on a fingerprint — one shuffle of (fp, id).
* near-dup = MinHash + LSH banding: k=12 min-hashes, 3 bands x 4 rows.
  Candidate generation is a self-join on band keys (bucket join, tiny
  buckets); only candidates get the exact jaccard verification join.
  This is the standard sub-quadratic pipeline (Broder '97); the naive
  all-pairs gram join would be O(n^2) and is deliberately avoided.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.text import (
    EN_STOPWORDS,
    english_score,
    fingerprint,
    punct_chars,
    quality_score,
    token_count,
    word_chars,
)
from ..sources.tables import load_table, spread
from .registry import register

_STOPLIST_SQL = "[" + ", ".join(f"'{w}'" for w in EN_STOPWORDS) + "]"

# SQL fragments mirroring functions/text.py exactly.
_TOKN_SQL = r"""CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\s+')) END"""
_HITS_SQL = (
    r"len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), "
    f"x -> list_contains({_STOPLIST_SQL}, x)))"
)
_ALPHA_SQL = "len(regexp_replace(text, '[^A-Za-z]', '', 'g'))"
_PUNCT_SQL = """len(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g'))"""
_NORM_SQL = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"


# --------------------------------------------------------------------------
# Per-document stats: token counting + character classes.
# --------------------------------------------------------------------------
@register(
    "text_stats",
    f"""
    SELECT doc_id,
           length(text) AS n_chars_actual,
           {_TOKN_SQL} AS n_tokens,
           {_ALPHA_SQL} AS n_alpha,
           {_PUNCT_SQL} AS n_punct,
           upper(source) AS source_uc,
           substr(text, 1, 20) AS preview
    FROM documents
    """,
)
def text_stats(spark, sf_dir):
    d = spread(load_table(spark, sf_dir, "documents"))
    t = F.col("text")
    return d.select(
        "doc_id",
        F.length(t).alias("n_chars_actual"),
        token_count(t).alias("n_tokens"),
        word_chars(t).alias("n_alpha"),
        punct_chars(t).alias("n_punct"),
        F.upper("source").alias("source_uc"),
        F.substring(t, 1, 20).alias("preview"),
    )


# --------------------------------------------------------------------------
# Language ID (stopword-ratio heuristic) — confusion matrix vs the labeled
# `lang` column.
# --------------------------------------------------------------------------
@register(
    "lang_id_confusion",
    f"""
    SELECT lang,
           CASE WHEN CASE WHEN {_TOKN_SQL} = 0 THEN 0.0
                     ELSE CAST({_HITS_SQL} AS DOUBLE) / CAST({_TOKN_SQL} AS DOUBLE) END
                     >= 0.04
                THEN 'en' ELSE 'other' END AS pred,
           COUNT(*) AS n
    FROM documents
    GROUP BY 1, 2
    """,
)
def lang_id_confusion(spark, sf_dir):
    d = spread(load_table(spark, sf_dir, "documents"))
    pred = F.when(english_score(F.col("text")) >= 0.04, "en").otherwise("other")
    return d.groupBy("lang", pred.alias("pred")).agg(F.count(F.lit(1)).alias("n"))


# --------------------------------------------------------------------------
# Quality scoring: alphabetic density + length factor - punctuation spam.
# --------------------------------------------------------------------------
@register(
    "text_quality_by_source",
    f"""
    WITH scored AS (
      SELECT source,
             (CAST(floor(greatest(0.0, least(1.0,
               CASE WHEN length(text) = 0 THEN 0.0
                    ELSE CAST({_ALPHA_SQL} AS DOUBLE) / CAST(length(text) AS DOUBLE) END
                 * 0.7
               + least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) * 0.3
               - CASE WHEN length(text) = 0 THEN 0.0
                      ELSE CAST({_PUNCT_SQL} AS DOUBLE) / CAST(length(text) AS DOUBLE) END
             )) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0) AS q
      FROM documents
    )
    SELECT source,
           CAST(SUM(CAST(q AS DECIMAL(30,8))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS avg_quality,
           MIN(q) AS min_quality,
           MAX(q) AS max_quality,
           COUNT(*) AS n_docs
    FROM scored
    GROUP BY source
    """,
)
def text_quality_by_source(spark, sf_dir):
    d = spread(load_table(spark, sf_dir, "documents"))
    scored = d.select("source", quality_score(F.col("text")).alias("q"))
    return scored.groupBy("source").agg(
        (
            F.sum(F.col("q").cast("decimal(30,8)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_quality"),
        F.min("q").alias("min_quality"),
        F.max("q").alias("max_quality"),
        F.count(F.lit(1)).alias("n_docs"),
    )


# --------------------------------------------------------------------------
# Exact dedup: MD5 fingerprint of normalized text, keep-min-id per cluster.
# --------------------------------------------------------------------------
@register(
    "dedup_exact_clusters",
    f"""
    SELECT md5({_NORM_SQL}) AS fp,
           MIN(doc_id) AS keeper_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact_clusters(spark, sf_dir):
    d = spread(load_table(spark, sf_dir, "documents"))
    return d.groupBy(fingerprint(F.col("text")).alias("fp")).agg(
        F.min("doc_id").alias("keeper_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


@register(
    "dedup_exact_survivors",
    f"""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN doc_id = mn THEN 1 ELSE 0 END) AS BIGINT)
             AS n_survivors
    FROM (SELECT source, doc_id,
                 MIN(doc_id) OVER (PARTITION BY md5({_NORM_SQL})) AS mn
          FROM documents)
    GROUP BY source
    """,
)
def dedup_exact_survivors(spark, sf_dir):
    """Per-source retention after exact dedup (keep min doc_id per
    fingerprint cluster) — the exact-dedup twin of
    ``dedup_minhash_survivors``.  One window keyed by the fingerprint
    (clusters may span sources, so the canonical doc is global), then a
    tiny per-source agg; a single shuffle end-to-end."""
    from pyspark.sql import Window as W

    d = spread(load_table(spark, sf_dir, "documents"))
    w = W.partitionBy(fingerprint(F.col("text")))
    return (
        d.select("source", "doc_id", F.min("doc_id").over(w).alias("mn"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("doc_id") == F.col("mn")).cast("int"))
            .cast("bigint")
            .alias("n_survivors"),
        )
    )


@register(
    "dedup_exact_summary",
    f"""
    SELECT COUNT(*) AS n_docs,
           COUNT(DISTINCT md5({_NORM_SQL})) AS n_unique,
           COUNT(*) - COUNT(DISTINCT md5({_NORM_SQL})) AS n_exact_dups
    FROM documents
    """,
)
def dedup_exact_summary(spark, sf_dir):
    d = spread(load_table(spark, sf_dir, "documents"))
    fp = fingerprint(F.col("text"))
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(fp).alias("n_unique"),
        (F.count(F.lit(1)) - F.countDistinct(fp)).alias("n_exact_dups"),
    )


# --------------------------------------------------------------------------
# MinHash + LSH near-dup detection, exact-jaccard verification on candidates.
#
# Shingles: distinct char 5-grams of normalized text.  Hash family:
# h_j(g) = md5(j || '|' || g) compared lexicographically (a uniform hash
# family; MD5 makes both engines agree).  Signature = 12 min-hashes; bands
# of 4 rows -> 3 band keys; docs sharing any band key are candidates.
# --------------------------------------------------------------------------
_K = 12
_ROWS_PER_BAND = 4
_NGRAM = 5

# MinHash family: ONE md5 per shingle (first 8 hex digits → uint32 g32),
# then h_j = min((A_j·g32 + B_j) mod P) with fixed constants — the sf1
# rehearsal showed the per-(j, gram) md5 scheme spends 12× the hashing
# (12·md5 per shingle); integer mixing gives the same LSH guarantees at
# one digest per shingle.  Products stay < 2^56, exact in BIGINT/double in
# both engines.
_MH_P = 4_294_967_311  # prime > 2^32
_MH_A = [1_000_003 * (j + 1) + 12_345 for j in range(_K)]
_MH_B = [999_983 * (j + 1) * (j + 1) + 54_321 for j in range(_K)]


def _md5_uint_sql(expr: str, nchars: int = 8) -> str:
    """DuckDB arithmetic for Spark's conv(substr(md5(expr),1,nchars),16,10)
    (DuckDB has no conv; nchars ≤ 15 keeps the value < 2⁶⁰, exact BIGINT)."""
    return (
        "("
        + " + ".join(
            f"(strpos('0123456789abcdef', substr(md5({expr}), {i + 1}, 1)) - 1)"
            f" * {16 ** (nchars - 1 - i)}"
            for i in range(nchars)
        )
        + ")"
    )


# Verification-payload hash: 60 bits (first 15 md5 hex chars, ONE conv per
# shingle — same digest count as the r5 fast path).  32-bit payloads could
# collide cross-doc and inflate the exact-jaccard intersection near the
# 0.2 threshold identically in both engines (round-5 advice); at 60 bits a
# pair of length-bounded docs collides with probability ~n²/2⁶⁰ —
# negligible.  The minhash SIGNATURE keeps the published 32-bit mixing
# configuration: its word is the TOP 32 bits, g32 = g60 >> 28 — bit-equal
# to conv(substr(md5,1,8)) in both engines (integer floor division in
# SQL), so signatures are unchanged from every prior round.
_G60_SQL = _md5_uint_sql("g", 15)

_GRAMS_SQL = f"""
  norm AS (SELECT doc_id, {_NORM_SQL} AS t FROM documents),
  grams AS (
    SELECT DISTINCT doc_id, g, g60, (g60 // 268435456) AS g32
    FROM (SELECT doc_id, g, {_G60_SQL} AS g60
          FROM (SELECT doc_id, substr(t, CAST(u AS INT), {_NGRAM}) AS g
                FROM (SELECT doc_id, t,
                             unnest(range(1, greatest(len(t) - {_NGRAM - 1}, 1) + 1)) AS u
                      FROM norm)))
  )
"""

_MINHASH_COLS_SQL = ",\n           ".join(
    f"MIN((g32 * {_MH_A[j]} + {_MH_B[j]}) % {_MH_P}) AS h{j}" for j in range(_K)
)
_BAND_KEYS_SQL = ", ".join(
    "md5('{b}|' || {parts})".format(
        b=b,
        parts=" || '|' || ".join(
            f"CAST(h{j} AS VARCHAR)"
            for j in range(b * _ROWS_PER_BAND, (b + 1) * _ROWS_PER_BAND)
        ),
    )
    + f" AS band{b}"
    for b in range(_K // _ROWS_PER_BAND)
)
_BAND_UNION_SQL = "\n      UNION ALL\n".join(
    f"      SELECT doc_id, band{b} AS bkey FROM sigs" for b in range(_K // _ROWS_PER_BAND)
)

_NEARDUP_SQL = f"""
    WITH {_GRAMS_SQL},
    mh AS (
      SELECT doc_id,
           {_MINHASH_COLS_SQL},
           COUNT(DISTINCT g60) AS n,
           list(DISTINCT g60) AS gset
      FROM grams GROUP BY doc_id
    ),
    sigs AS (SELECT doc_id, {_BAND_KEYS_SQL} FROM mh),
    bands AS (
{_BAND_UNION_SQL}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
      FROM bands a JOIN bands b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
    ),
    verified AS (
      SELECT c.id1, c.id2,
             len(list_intersect(m1.gset, m2.gset)) AS shared,
             m1.n AS n1, m2.n AS n2
      FROM cand c
      JOIN mh m1 ON c.id1 = m1.doc_id
      JOIN mh m2 ON c.id2 = m2.doc_id
    )
    SELECT id1, id2,
           (CAST(floor(CAST(shared AS DOUBLE)
                 / CAST(n1 + n2 - shared AS DOUBLE) * 1000000.0 + 0.5) AS DOUBLE)
             / 1000000.0) AS jaccard
    FROM verified
    WHERE CAST(shared AS DOUBLE) / CAST(n1 + n2 - shared AS DOUBLE) >= 0.2
"""


def minhash_sketch(d):
    """(doc_id, h0..h{k-1}, gset, n) MinHash sketch of a (doc_id, text)
    frame — the shared signature pipeline of the LSH dedup family (batch
    ``dedup_neardup_minhash_lsh`` and the round-9 incremental ingest).

    One explode to distinct-within-doc grams, one groupBy(doc) computing
    all 12 min-hashes map-side (partial agg) plus the 60-bit gram-hash
    verification set.  See the inline notes for the g60/g32 derivation.
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    grams = (
        d.select("doc_id", norm.alias("t"))
        .select(
            "doc_id",
            F.explode(
                F.when(
                    F.length("t") < _NGRAM, F.array(F.col("t"))
                ).otherwise(
                    F.transform(
                        F.sequence(F.lit(1), F.length("t") - (_NGRAM - 1)),
                        lambda i: F.col("t").substr(i, F.lit(_NGRAM)),
                    )
                )
            ).alias("g"),
        )
    )
    # One shuffle computes the signature, the gram-hash set (for candidate
    # verification) and its size — min/collect_set are duplicate-insensitive
    # so no separate distinct() shuffle is needed, and downstream joins are
    # all on n_docs-sized relations, never on exploded gram rows.  The
    # verification set holds 60-bit gram hashes (first 15 md5 hex chars,
    # see the _G60_SQL note), not the gram strings: both engines derive
    # g60 from the same single md5, so exact-jaccard-over-hashes is
    # engine-agreed, collision inflation is ~n²/2⁶⁰ (negligible, vs real
    # at 32 bits), and the cached/shuffled payload stays a slim long array
    # with array_intersect on longs.  The signature word g32 = g60 >> 28
    # (top 32 bits = the historical conv(substr(md5,1,8)) — one conv per
    # shingle total, signatures unchanged).  Docs are length-bounded, so
    # collect_set stays small; for unbounded docs cap the shingle count
    # upstream.  Persisted: three consumers (bands self-join, both sides
    # of verification) would otherwise recompute the lineage.
    g60 = F.conv(F.substring(F.md5("g"), 1, 15), 16, 10).cast("long")
    mh = (
        grams.withColumn("g60", g60)
        .withColumn("g32", F.shiftright("g60", 28))
        .groupBy("doc_id")
        .agg(
            *[
                F.min((F.col("g32") * F.lit(_MH_A[j]) + F.lit(_MH_B[j])) % F.lit(_MH_P)).alias(
                    f"h{j}"
                )
                for j in range(_K)
            ],
            F.collect_set("g60").alias("gset"),
        )
        .withColumn("n", F.size("gset"))
    )
    return mh


def band_rows(mh):
    """Long-form (doc_id, bkey) band table from a sketch frame — docs
    sharing any bkey are LSH candidates.  Band key = md5 over the band's
    4 signature words (engine-agreed string hashing)."""
    n_bands = _K // _ROWS_PER_BAND
    sigs = mh.select(
        "doc_id",
        *[
            F.md5(
                F.concat_ws(
                    "|",
                    F.lit(str(b)),
                    *[
                        F.col(f"h{j}").cast("string")
                        for j in range(b * _ROWS_PER_BAND, (b + 1) * _ROWS_PER_BAND)
                    ],
                )
            ).alias(f"band{b}")
            for b in range(n_bands)
        ],
    )
    bands = None
    for b in range(n_bands):
        part = sigs.select("doc_id", F.col(f"band{b}").alias("bkey"))
        bands = part if bands is None else bands.unionByName(part)
    return bands


@register("dedup_neardup_minhash_lsh", _NEARDUP_SQL)
def dedup_neardup_minhash_lsh(spark, sf_dir):
    """MinHash-LSH near-duplicate pairs with exact-jaccard verification.

    Plan shape at scale: one explode to grams (distinct within doc), one
    groupBy(doc) computing all 12 min-hashes map-side (partial agg), a
    narrow bands table, a bucket self-join on band key (tiny buckets), and
    an exact verification join restricted to candidates.  No O(n^2) stage.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    from .registry import cache_scoped

    mh = cache_scoped(minhash_sketch(d))
    bands = band_rows(mh)
    a, bb = bands.alias("a"), bands.alias("b")
    # every relation below scales with the corpus — pin shuffle joins so
    # AQE can never promote one to broadcast (its estimate comes from
    # compressed columnar bytes; the in-memory row build of a gset-carrying
    # side is ~20× larger and killed an 8 GB driver at the sf10 rehearsal)
    cand = (
        a.join(
            bb.hint("shuffle_hash"),
            (F.col("a.bkey") == F.col("b.bkey")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id1"), F.col("b.doc_id").alias("id2"))
        .distinct()
    )
    m1 = mh.select(
        F.col("doc_id").alias("id1"), F.col("n").alias("n1"), F.col("gset").alias("gset1")
    )
    m2 = mh.select(
        F.col("doc_id").alias("id2"), F.col("n").alias("n2"), F.col("gset").alias("gset2")
    )
    verified = (
        cand.join(m1.hint("shuffle_hash"), "id1")
        .join(m2.hint("shuffle_hash"), "id2")
        .withColumn("shared", F.size(F.array_intersect("gset1", "gset2")))
    )
    jac = F.col("shared").cast("double") / (
        F.col("n1") + F.col("n2") - F.col("shared")
    ).cast("double")
    from ..functions.exact import pround

    return verified.filter(jac >= 0.2).select(
        "id1", "id2", pround(jac, 6).alias("jaccard")
    )


# --------------------------------------------------------------------------
# Cluster labeling + survivor retention over the MinHash pair graph — the
# two pipeline-level deliverables downstream of pair detection: "which docs
# form one duplicate cluster" (O(k) per cluster, vs O(k²) pairs) and "keep
# one canonical doc per cluster", reported per source.  Oracle = recursive
# CTE reachability over the identical pair SQL (same pattern as
# dedup_simhash_components).
# --------------------------------------------------------------------------
_MINHASH_LABELS_SQL = f"""
    WITH RECURSIVE pairs AS ({_NEARDUP_SQL}),
    edges AS (SELECT id1 AS a, id2 AS b FROM pairs
              UNION ALL SELECT id2, id1 FROM pairs),
    cc_nodes AS (SELECT DISTINCT a AS node FROM edges),
    reach(node, comp) AS (
      SELECT node, node FROM cc_nodes
      UNION
      SELECT e.a, r.comp FROM edges e JOIN reach r ON e.b = r.node
    ),
    labels AS (SELECT node, MIN(comp) AS component FROM reach GROUP BY node)
"""

_MINHASH_CC_SQL = (
    _MINHASH_LABELS_SQL
    + """
    SELECT component, COUNT(*) AS n_members
    FROM labels GROUP BY component
"""
)


@register("dedup_minhash_components", _MINHASH_CC_SQL)
def dedup_minhash_components(spark, sf_dir):
    """Near-dup CLUSTERS from the MinHash-LSH pair graph via distributed
    min-label propagation (``operators/graph.py``) — O(cluster size)
    output where pair enumeration is O(k²)."""
    from ..operators.graph import connected_components

    pairs = dedup_neardup_minhash_lsh(spark, sf_dir)
    labels = connected_components(pairs, src="id1", dst="id2")
    return labels.groupBy(F.col("comp").alias("component")).agg(
        F.count(F.lit(1)).alias("n_members")
    )


_MINHASH_SURVIVOR_SQL = (
    _MINHASH_LABELS_SQL
    + """
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN l.node IS NULL OR l.component = d.doc_id
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors
    FROM documents d LEFT JOIN labels l ON d.doc_id = l.node
    GROUP BY source
"""
)


@register("dedup_minhash_survivors", _MINHASH_SURVIVOR_SQL)
def dedup_minhash_survivors(spark, sf_dir):
    """The dedup ACTION: per-source corpus retention after keeping one
    canonical document (the min doc_id) per MinHash duplicate cluster.

    Scale posture: the labels relation holds only docs that appear in some
    duplicate pair — far smaller than the corpus but corpus-scaling, so the
    docs⋈labels join is pinned to shuffle (AQE's compressed-bytes estimate
    under-counts the in-memory build side; see the sf10 rehearsal note in
    dedup_neardup_minhash_lsh).  The join key is doc_id on both sides; the
    final per-source agg is a tiny partial/final hash agg.
    """
    from ..operators.graph import connected_components

    pairs = dedup_neardup_minhash_lsh(spark, sf_dir)
    labels = connected_components(pairs, src="id1", dst="id2")
    d = spread(load_table(spark, sf_dir, "documents")).select("doc_id", "source")
    joined = d.join(
        labels.hint("shuffle_hash"), F.col("doc_id") == F.col("node"), "left"
    )
    survivor = F.when(
        F.col("node").isNull() | (F.col("comp") == F.col("doc_id")), 1
    ).otherwise(0)
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(survivor).alias("n_survivors"),
    )


# --------------------------------------------------------------------------
# MD5 band-key format is shared by the SQL twin above; the SQL uses
# concat with '|' separators via md5('b|' || h0 || '|' || h1 ...), while the
# Spark side uses concat_ws('|', 'b', h0, ...).  Both produce 'b|h0|h1|h2|h3'.
# --------------------------------------------------------------------------
