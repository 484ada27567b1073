"""Round-6 training-data curation operators: repetition-quality signals,
BPE-ish token pieces, PII scrubbing, sequence packing, semantic prototype
pruning, domain mixing, and length-decile bucketing.

None of these exist in the reference (its surface is the pandas algebra,
``/root/reference/dask_expr/_collection.py``); they are the curation steps
a 100 TB training-data pipeline runs between raw ingest and tokenization —
quality filtering (Gopher-style repetition signals), privacy scrubbing,
data-mix resampling, redundancy pruning over embeddings (SemDeDup-style),
and packing into fixed-token training sequences.

Every query is pure ``pyspark.sql.functions`` (JVM codegen, no Python
UDFs) with a DuckDB oracle twin.  Float determinism follows the repo
conventions: integer/bigint arithmetic wherever possible, ``pround`` before
any double crosses an aggregation, ``dsum``/``davg`` fixed-point sums.

Scale notes (100 TB posture), per query:

* repetition signals — the per-doc gram count is the wordcount shape:
  explode → two-level hash agg keyed by (doc_id, gram); no joins, no
  windows, fully map-side-combinable.
* PII scrub — a pure per-row projection (regexp), zero shuffles beyond
  the final per-source agg.
* packing — windows partitioned by source: parallel across shards, no
  global sort (operators/packing.py).
* semantic pruning — centroid relation is nclusters×dim (broadcast); the
  corpus is scanned once; the only wide op is the per-cluster ntile
  window, keyed by cluster.
* domain mix — per-source counts (20 rows) drive the rates; membership is
  a pure md5 filter (operators/sampling.py): repartition-stable, no RNG.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.exact import davg, davg_expr, pround, pround_expr
from ..functions.text import token_count
from ..operators.packing import pack_sequences
from ..operators.sampling import hash_uniform, hash_uniform_sql
from ..operators.similarity import cluster_sums, cosine_q, norm2_q, quantize, dot_q
from ..sources.tables import load_table, spread
from .registry import register

_NORM_SQL = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"
_TOKN_SQL = r"""CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\s+')) END"""


# --------------------------------------------------------------------------
# Gopher-style repetition signals: fraction of 2-gram occurrences taken by
# the single most frequent 2-gram (top2_frac) and the fraction that are
# repeats of an earlier gram (dup_frac).  High values mark boilerplate /
# degenerate text that quality filters drop before training.
# --------------------------------------------------------------------------
@register(
    "quality_repetition_signals",
    f"""
    WITH toks AS (
      SELECT source, doc_id,
             string_split({_NORM_SQL}, ' ') AS ws
      FROM documents
    ),
    bi AS (
      SELECT source, doc_id,
             unnest(list_transform(generate_series(1, len(ws) - 1),
                                   i -> ws[i] || ' ' || ws[i+1])) AS gram
      FROM toks WHERE len(ws) >= 2
    ),
    cnt AS (SELECT source, doc_id, gram, COUNT(*) AS c FROM bi GROUP BY 1, 2, 3),
    perdoc AS (
      SELECT source, doc_id,
             {pround_expr('CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)', 6)}
               AS top2_frac,
             {pround_expr('(CAST(SUM(c) AS DOUBLE) - CAST(COUNT(*) AS DOUBLE))'
                          ' / CAST(SUM(c) AS DOUBLE)', 6)} AS dup_frac
      FROM cnt GROUP BY 1, 2
    )
    SELECT source,
           COUNT(*) AS n_docs,
           {davg_expr('top2_frac')} AS avg_top2_frac,
           {davg_expr('dup_frac')} AS avg_dup_frac,
           CAST(SUM(CASE WHEN top2_frac > 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
    FROM perdoc GROUP BY source
    """,
)
def quality_repetition_signals(spark, sf_dir):
    d = spread(load_table(spark, sf_dir, "documents"))
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    ws = F.split(norm, " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(ws) - 1),
        lambda i: F.concat_ws(" ", F.slice(ws, i, F.lit(2))),
    )
    bi = (
        d.filter(F.size(ws) >= 2)
        .select("source", "doc_id", F.explode(grams).alias("gram"))
    )
    cnt = bi.groupBy("source", "doc_id", "gram").agg(F.count(F.lit(1)).alias("c"))
    perdoc = cnt.groupBy("source", "doc_id").agg(
        pround(
            F.max("c").cast("double") / F.sum("c").cast("double"), 6
        ).alias("top2_frac"),
        pround(
            (F.sum("c").cast("double") - F.count(F.lit(1)).cast("double"))
            / F.sum("c").cast("double"),
            6,
        ).alias("dup_frac"),
    )
    return perdoc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        davg("top2_frac", "avg_top2_frac"),
        davg("dup_frac", "avg_dup_frac"),
        F.sum(F.when(F.col("top2_frac") > 0.2, 1).otherwise(0)).alias("n_flagged"),
    )


# --------------------------------------------------------------------------
# BPE-ish token pieces: a GPT-style pre-tokenizer regex (letter runs, digit
# runs, single non-alnum marks) — the token-count estimate a data pipeline
# uses before the real tokenizer exists.  Vocabulary size per language is
# the classic wordcount aggregation.
# --------------------------------------------------------------------------
_PIECE_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


@register(
    "token_piece_stats",
    f"""
    WITH p AS (
      SELECT lang, doc_id, regexp_extract_all(lower(text), '{_PIECE_RE}') AS pcs
      FROM documents
    ),
    base AS (
      SELECT lang, COUNT(*) AS n_docs, CAST(SUM(len(pcs)) AS BIGINT) AS total_pieces
      FROM p GROUP BY lang
    ),
    vocab AS (
      SELECT lang, COUNT(DISTINCT piece) AS vocab_size
      FROM (SELECT lang, unnest(pcs) AS piece FROM p) GROUP BY lang
    )
    SELECT b.lang, b.n_docs, b.total_pieces, v.vocab_size,
           {pround_expr('CAST(b.total_pieces AS DOUBLE) / CAST(b.n_docs AS DOUBLE)', 6)}
             AS avg_pieces_per_doc
    FROM base b JOIN vocab v ON b.lang = v.lang
    """,
)
def token_piece_stats(spark, sf_dir):
    d = spread(load_table(spark, sf_dir, "documents"))
    pcs = F.regexp_extract_all(F.lower("text"), F.lit(_PIECE_RE), 0)
    p = d.select("lang", "doc_id", pcs.alias("pcs"))
    base = p.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("pcs")).cast("bigint").alias("total_pieces"),
    )
    vocab = (
        p.select("lang", F.explode("pcs").alias("piece"))
        .groupBy("lang")
        .agg(F.countDistinct("piece").alias("vocab_size"))
    )
    return base.join(vocab, "lang").select(
        "lang",
        "n_docs",
        "total_pieces",
        "vocab_size",
        pround(
            F.col("total_pieces").cast("double") / F.col("n_docs").cast("double"), 6
        ).alias("avg_pieces_per_doc"),
    )


# --------------------------------------------------------------------------
# PII scrubbing: inject deterministic synthetic PII (the corpus is clean by
# construction), then detect + redact it with the regexes a real scrubber
# runs, and prove removal by before/after accounting.  Pure per-row regexp
# projection — the 100 TB cost is one codegen'd scan, no shuffle.
# --------------------------------------------------------------------------
_EMAIL_RE = r"[a-z0-9._]+@[a-z]+\.[a-z]+"
_PHONE_RE = r"\b\d{3}-\d{4}\b"


@register(
    "pii_scrub_stats",
    f"""
    WITH inj AS (
      SELECT source,
             text
               || CASE WHEN doc_id % 7 = 0
                       THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                       ELSE '' END
               || CASE WHEN doc_id % 11 = 0
                       THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                       ELSE '' END AS itext
      FROM documents
    ),
    det AS (
      SELECT source, itext,
             len(regexp_extract_all(itext, '{_EMAIL_RE}')) AS n_emails,
             len(regexp_extract_all(itext, '{_PHONE_RE}')) AS n_phones,
             regexp_replace(regexp_replace(itext, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                            '{_PHONE_RE}', '[PHONE]', 'g') AS stext
      FROM inj
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN n_emails + n_phones > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_docs_pii,
           CAST(SUM(n_emails) AS BIGINT) AS total_emails,
           CAST(SUM(n_phones) AS BIGINT) AS total_phones,
           CAST(SUM(len(itext) - len(stext)) AS BIGINT) AS chars_removed
    FROM det GROUP BY source
    """,
)
def pii_scrub_stats(spark, sf_dir):
    d = spread(load_table(spark, sf_dir, "documents"))
    doc_id = F.col("doc_id")
    itext = F.concat(
        F.col("text"),
        F.when(
            doc_id % 7 == 0,
            F.concat(F.lit(" contact user"), doc_id.cast("string"), F.lit("@example.com")),
        ).otherwise(F.lit("")),
        F.when(
            doc_id % 11 == 0,
            F.concat(F.lit(" call 555-"), F.lpad((doc_id % 10000).cast("string"), 4, "0")),
        ).otherwise(F.lit("")),
    )
    det = d.select(
        "source",
        itext.alias("itext"),
        F.regexp_count(itext, F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(itext, F.lit(_PHONE_RE)).alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace(itext, _EMAIL_RE, "[EMAIL]"), _PHONE_RE, "[PHONE]"
        ).alias("stext"),
    )
    return det.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(F.col("n_emails") + F.col("n_phones") > 0, 1).otherwise(0)
        ).alias("n_docs_pii"),
        F.sum("n_emails").cast("bigint").alias("total_emails"),
        F.sum("n_phones").cast("bigint").alias("total_phones"),
        F.sum(F.length("itext") - F.length("stext")).cast("bigint").alias("chars_removed"),
    )


# --------------------------------------------------------------------------
# Sequence packing (operators/packing.py): documents → fixed-budget
# training sequences by contiguous block packing, parallel per source.
# --------------------------------------------------------------------------
_SEQ_CAPACITY = 512


@register(
    "pack_sequences_greedy",
    f"""
    WITH t AS (
      SELECT source, doc_id, CAST({_TOKN_SQL} AS BIGINT) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT source, doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
      FROM t
    )
    SELECT source,
           CAST(FLOOR(CAST(cb AS DOUBLE) / {_SEQ_CAPACITY}.0) AS BIGINT) AS seq_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens
    FROM c GROUP BY 1, 2
    """,
)
def pack_sequences_greedy(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    t = d.select("source", "doc_id", token_count(F.col("text")).cast("bigint").alias("n_tokens"))
    packed = pack_sequences(
        t, "n_tokens", _SEQ_CAPACITY, group_cols=["source"], order_col="doc_id"
    )
    return packed.groupBy("source", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("seq_tokens"),
    )


# --------------------------------------------------------------------------
# SemDeDup-style semantic pruning: rank each vector by cosine to its
# cluster's integer-mean centroid (operators/similarity.py::cluster_sums);
# the top quartile (most prototypical = most redundant) is the prune set.
# Output: per-(cluster, quartile) population + cosine range.
# --------------------------------------------------------------------------
_DIM = 64
_QELEM = "CAST(round(CAST({v}.embedding[CAST(u AS INT) + 1] AS DOUBLE) * 1000000, 0) AS BIGINT)"


@register(
    "semantic_prune_prototypes",
    f"""
    WITH sums AS (
      SELECT label, CAST(u AS INT) AS u,
             CAST(FLOOR(CAST(SUM({_QELEM.format(v='e')}) AS DOUBLE)
                        / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS s
      FROM (SELECT label, embedding, unnest(range({_DIM})) AS u
            FROM embeddings) e
      GROUP BY 1, 2
    ),
    snorm AS (SELECT label, SUM(s * s) AS sn2 FROM sums GROUP BY label),
    vex AS (
      SELECT vec_id, label, CAST(u AS INT) AS u, {_QELEM.format(v='e')} AS x
      FROM (SELECT vec_id, label, embedding, unnest(range({_DIM})) AS u
            FROM embeddings) e
    ),
    vnorm AS (SELECT vec_id, SUM(x * x) AS n2 FROM vex GROUP BY vec_id),
    dots AS (
      SELECT v.vec_id, v.label, SUM(v.x * s.s) AS dot
      FROM vex v JOIN sums s ON v.label = s.label AND v.u = s.u
      GROUP BY 1, 2
    ),
    scored AS (
      SELECT d.label, d.vec_id,
             CAST(d.dot AS DOUBLE) / (sqrt(CAST(sn.sn2 AS DOUBLE))
                                      * sqrt(CAST(vn.n2 AS DOUBLE))) AS cos
      FROM dots d
      JOIN snorm sn ON d.label = sn.label
      JOIN vnorm vn ON d.vec_id = vn.vec_id
    ),
    ranked AS (
      SELECT label, cos,
             NTILE(4) OVER (PARTITION BY label ORDER BY cos DESC, vec_id) AS quartile
      FROM scored
    )
    SELECT label, quartile,
           COUNT(*) AS n_vecs,
           {pround_expr('MIN(cos)', 6)} AS min_cos,
           {pround_expr('MAX(cos)', 6)} AS max_cos
    FROM ranked GROUP BY 1, 2
    """,
)
def semantic_prune_prototypes(spark, sf_dir):
    e = spread(load_table(spark, sf_dir, "embeddings"))
    sums = cluster_sums(e, "label")  # (label, sv, sn2) — nclusters rows
    q = e.select("label", "vec_id", quantize(F.col("embedding")).alias("qv"))
    scored = q.join(F.broadcast(sums), "label").select(
        "label",
        "vec_id",
        (
            dot_q(F.col("qv"), F.col("sv")).cast("double")
            / (
                F.sqrt(F.col("sn2").cast("double"))
                * F.sqrt(norm2_q(F.col("qv")).cast("double"))
            )
        ).alias("cos"),
    )
    w = W.partitionBy("label").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("quartile", F.ntile(4).over(w))
        .groupBy("label", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            pround(F.min("cos"), 6).alias("min_cos"),
            pround(F.max("cos"), 6).alias("max_cos"),
        )
    )


# --------------------------------------------------------------------------
# Domain mixing: target weights per source → per-source acceptance rates
# (capped at 1), membership by deterministic md5 — the data-mix resample
# that turns a raw crawl into the training distribution.
# --------------------------------------------------------------------------
_MIX_W_SQL = "CASE WHEN source = 'src0' THEN 3.0 WHEN source = 'src1' THEN 0.5 ELSE 1.0 END"


@register(
    "domain_mix_resample",
    f"""
    WITH counts AS (
      SELECT source, {_MIX_W_SQL} AS w, COUNT(*) AS n,
             CAST(SUM(n_chars) AS BIGINT) AS src_chars
      FROM documents GROUP BY 1
    ),
    rates AS (
      SELECT source, n,
             least(1.0, (w * CAST(SUM(n) OVER () AS DOUBLE) / SUM(w) OVER ())
                        / CAST(n AS DOUBLE)) AS rate
      FROM counts
    ),
    kept AS (
      SELECT d.source, COUNT(*) AS n_kept, CAST(SUM(d.n_chars) AS BIGINT) AS kept_chars
      FROM documents d JOIN rates r ON d.source = r.source
      WHERE {hash_uniform_sql('d.doc_id')} < r.rate
      GROUP BY d.source
    )
    SELECT r.source, r.n AS n_total,
           {pround_expr('r.rate', 6)} AS rate,
           COALESCE(k.n_kept, 0) AS n_kept,
           COALESCE(k.kept_chars, 0) AS kept_chars
    FROM rates r LEFT JOIN kept k ON r.source = k.source
    """,
)
def domain_mix_resample(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    w_col = (
        F.when(F.col("source") == "src0", 3.0)
        .when(F.col("source") == "src1", 0.5)
        .otherwise(1.0)
    )
    counts = d.groupBy("source").agg(
        F.first(w_col).alias("w"),
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").cast("bigint").alias("src_chars"),
    )
    # 20-row relation: the empty-frame window is fine (single partition of
    # nsources rows), and the result is broadcast back to the corpus scan
    wall = W.partitionBy()
    rates = counts.select(
        "source",
        "n",
        F.least(
            F.lit(1.0),
            (F.col("w") * F.sum("n").over(wall).cast("double") / F.sum("w").over(wall))
            / F.col("n").cast("double"),
        ).alias("rate"),
    )
    kept = (
        d.join(F.broadcast(rates.select("source", "rate")), "source")
        .filter(hash_uniform(F.col("doc_id")) < F.col("rate"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").cast("bigint").alias("kept_chars"),
        )
    )
    return (
        rates.join(kept, "source", "left")
        .select(
            "source",
            F.col("n").alias("n_total"),
            pround(F.col("rate"), 6).alias("rate"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("kept_chars", F.lit(0).cast("bigint")).alias("kept_chars"),
        )
    )


# --------------------------------------------------------------------------
# Length-decile bucketing: ntile(10) by document length per source — the
# curriculum / length-bucketing view of the corpus.  One window shuffle
# keyed by source; deterministic tie-break on doc_id.
# --------------------------------------------------------------------------
@register(
    "length_decile_stats",
    """
    WITH ranked AS (
      SELECT source, n_chars,
             NTILE(10) OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS decile
      FROM documents
    )
    SELECT source, decile,
           COUNT(*) AS n_docs,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM ranked GROUP BY 1, 2
    """,
)
def length_decile_stats(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(F.asc("n_chars"), F.asc("doc_id"))
    return (
        d.withColumn("decile", F.ntile(10).over(w))
        .groupBy("source", "decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


# --------------------------------------------------------------------------
# ORC source/sink roundtrip — completes the columnar-format matrix
# (parquet_roundtrip_supplier / csv_roundtrip_nation / json_roundtrip_region
# cover the other three).  The oracle aggregates the ORIGINAL parquet
# table, so a hash match proves write→read fidelity of values and types
# through the ORC path end-to-end.
# --------------------------------------------------------------------------
@register(
    "orc_roundtrip_nation",
    """
    SELECT COUNT(*) AS n_nations,
           CAST(SUM(n_nationkey) AS BIGINT) AS key_sum,
           MIN(n_name) AS first_name,
           MAX(n_name) AS last_name
    FROM nation
    """,
)
def orc_roundtrip_nation(spark, sf_dir):
    import os

    from ..scratch import scratch_dir
    from ..sources.tables import read_orc, to_orc

    n = load_table(spark, sf_dir, "nation")
    d = scratch_dir("spark_graft_orc_")
    path = os.path.join(d, "nation_orc")
    to_orc(n, path)
    back = read_orc(spark, path)
    return back.agg(
        F.count(F.lit(1)).alias("n_nations"),
        F.sum("n_nationkey").cast("bigint").alias("key_sum"),
        F.min("n_name").alias("first_name"),
        F.max("n_name").alias("last_name"),
    )


# --------------------------------------------------------------------------
# Cross-document boilerplate detection (RefinedWeb/CCNet-style segment
# dedup signal): a word 8-gram that appears in >= 2 DISTINCT documents of
# the same source is "boilerplate" (with a ~50-word vocabulary an 8-gram
# recurs across docs only through real duplication/templating, not
# chance).  Reported per source: distinct-gram counts, boilerplate-gram
# counts, and the occurrence share boilerplate would remove.
#
# Scale posture: wordcount shape — explode 8-grams once, one partial/final
# agg keyed by (source, gram) [the only big shuffle], then a tiny
# per-source rollup.  No joins, no windows; the doc text never crosses a
# shuffle.  The within-doc repetition twin is quality_repetition_signals;
# this one is CROSS-doc.
# --------------------------------------------------------------------------
@register(
    "boilerplate_gram_stats",
    f"""
    WITH norm AS (
      SELECT doc_id, source, {_NORM_SQL} AS t FROM documents
      WHERE trim(text) <> ''
    ),
    words AS (SELECT doc_id, source, string_split(t, ' ') AS w FROM norm),
    grams AS (
      SELECT doc_id, source,
             array_to_string(list_slice(w, CAST(u AS INT), CAST(u AS INT) + 7), ' ') AS g
      FROM (SELECT doc_id, source, w,
                   unnest(range(1, greatest(len(w) - 7, 1) + 1)) AS u
            FROM words)
    ),
    per_sg AS (
      SELECT source, g,
             COUNT(DISTINCT doc_id) AS ndocs,
             COUNT(*) AS nocc
      FROM grams GROUP BY source, g
    )
    SELECT source,
           COUNT(*) AS n_distinct_grams,
           CAST(SUM(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_boilerplate_grams,
           {pround_expr('CAST(SUM(CASE WHEN ndocs >= 2 THEN nocc ELSE 0 END) AS DOUBLE)'
                        ' / CAST(SUM(nocc) AS DOUBLE)', 6)} AS boilerplate_share
    FROM per_sg GROUP BY source
    """,
)
def boilerplate_gram_stats(spark, sf_dir):
    d = spread(load_table(spark, sf_dir, "documents")).filter(F.trim("text") != "")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    w = F.split(norm, " ")
    grams = d.select(
        "doc_id",
        "source",
        F.explode(
            F.transform(
                # greatest(..., 1): a doc shorter than 8 words contributes
                # its whole text as one gram on BOTH engines (Spark's
                # sequence(1, 0) would be the descending [1, 0], DuckDB's
                # range(1, 1) empty — clamping avoids both edge semantics)
                F.sequence(F.lit(1), F.greatest(F.size(w) - 7, F.lit(1))),
                lambda i: F.array_join(F.slice(w, i, 8), " "),
            )
        ).alias("g"),
    )
    per_sg = grams.groupBy("source", "g").agg(
        F.countDistinct("doc_id").alias("ndocs"),
        F.count(F.lit(1)).alias("nocc"),
    )
    boiler = (F.col("ndocs") >= 2).cast("int")
    share = F.sum(F.col("nocc") * boiler).cast("double") / F.sum("nocc").cast(
        "double"
    )
    return per_sg.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_distinct_grams"),
        F.sum(boiler).alias("n_boilerplate_grams"),
        pround(share, 6).alias("boilerplate_share"),
    )


# --------------------------------------------------------------------------
# Document chunking for embedding/indexing: fixed 50-word windows with a
# 10-word overlap (stride 40), the standard pre-embedding segmentation.
# Pure built-in array ops (sequence → slice), no Python anywhere — at
# 100 TB the chunker is a map-only stage that pipelines into the scan.
# --------------------------------------------------------------------------
@register(
    "chunk_documents_stats",
    """
    WITH words AS (
      SELECT doc_id, source, string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS w
      FROM documents WHERE trim(text) <> ''
    ),
    chunks AS (
      SELECT doc_id, source,
             len(list_slice(w, CAST(u AS INT), CAST(u AS INT) + 49)) AS chunk_words
      FROM (SELECT doc_id, source, w,
                   unnest(range(1, greatest(len(w), 1) + 1, 40)) AS u
            FROM words)
    )
    SELECT source,
           COUNT(*) AS n_chunks,
           CAST(SUM(chunk_words) AS BIGINT) AS total_chunk_words,
           MIN(chunk_words) AS min_chunk_words,
           MAX(chunk_words) AS max_chunk_words
    FROM chunks GROUP BY source
    """,
)
def chunk_documents_stats(spark, sf_dir):
    d = spread(load_table(spark, sf_dir, "documents")).filter(F.trim("text") != "")
    w = F.split(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")), " ")
    chunks = d.select(
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size(w), F.lit(1)), F.lit(40)),
                lambda i: F.size(F.slice(w, i, 50)),
            )
        ).alias("chunk_words"),
    )
    return chunks.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("chunk_words").cast("bigint").alias("total_chunk_words"),
        F.min("chunk_words").alias("min_chunk_words"),
        F.max("chunk_words").alias("max_chunk_words"),
    )


# --------------------------------------------------------------------------
# Table profiling (the ANALYZE/SUMMARIZE shape): one pass over the fact
# table computing row count, null counts, distinct cardinalities, and
# min/max bounds — the statistics a catalog or data-quality monitor
# maintains.  Multiple COUNT(DISTINCT) in one agg lowers to Catalyst's
# Expand + two-level agg: still a single scan, no joins.
# --------------------------------------------------------------------------
@register(
    "profile_lineitem_columns",
    """
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS null_quantity,
           COUNT(DISTINCT l_orderkey) AS n_orderkeys,
           COUNT(DISTINCT l_partkey) AS n_partkeys,
           COUNT(DISTINCT l_returnflag) AS n_returnflags,
           MIN(l_quantity) AS min_quantity,
           MAX(l_quantity) AS max_quantity,
           strftime(MIN(l_shipdate), '%Y-%m-%d %H:%M:%S') AS min_shipdate,
           strftime(MAX(l_shipdate), '%Y-%m-%d %H:%M:%S') AS max_shipdate
    FROM lineitem
    """,
)
def profile_lineitem_columns(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    return l.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").isNull().cast("int")).cast("bigint").alias(
            "null_quantity"
        ),
        F.countDistinct("l_orderkey").alias("n_orderkeys"),
        F.countDistinct("l_partkey").alias("n_partkeys"),
        F.countDistinct("l_returnflag").alias("n_returnflags"),
        F.min("l_quantity").alias("min_quantity"),
        F.max("l_quantity").alias("max_quantity"),
        F.date_format(F.min("l_shipdate"), "yyyy-MM-dd HH:mm:ss").alias(
            "min_shipdate"
        ),
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd HH:mm:ss").alias(
            "max_shipdate"
        ),
    )
