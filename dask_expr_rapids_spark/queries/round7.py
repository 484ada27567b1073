"""Round-7 curation operators: corpus-frequency lexical scoring,
cross-source vocabulary overlap, raw-text source/sink fidelity, and
product-quantization ANN.

Not in the reference (its surface is the pandas algebra,
``/root/reference/dask_expr/_collection.py``); these extend the LLM-data
pipeline layer (SURVEY.md §7 phase 4).

Scale notes (100 TB posture), per query:

* lexical rarity — the naive plan joins the exploded word stream against
  per-word counts: corpus-scaling on BOTH join sides, stopword-skewed.
  This plan aggregates to (source, word) counts FIRST (map-side
  combinable, the only corpus-wide shuffle), so the frequency join runs
  on two vocabulary-sized relations — sublinear in the corpus.
* vocab overlap — all joins are on the distinct (source, word) relation;
  per-word fan-out is bounded by n_sources², never by corpus rows.
* text roundtrip — write/scan are executor-parallel; fidelity is proven
  by an order-independent checksum (sum of per-line md5 prefixes), no
  driver-side content staging.
* PQ ANN — the encoded corpus is id + m codes + one bigint (the ~30×
  compressed index you'd persist at 100 TB); scoring is m integer
  lookups per candidate; no corpus shuffle (operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.exact import dec2dbl_expr, pround, pround_expr
from ..sources.tables import load_table, read_text, spread, to_text
from .registry import register
from .text import _md5_uint_sql

_NORM_SQL = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"

_WORDS_SQL = f"""
  words AS (
    SELECT source, unnest(string_split({_NORM_SQL}, ' ')) AS w
    FROM documents WHERE trim(text) <> ''
  )
"""


# --------------------------------------------------------------------------
# Lexical rarity scoring: mean corpus-frequency of a source's word
# occurrences — the RNG-free cousin of unigram log-prob quality filters
# (rare-word-heavy sources score low, boilerplate-heavy sources score
# high).  Exact integer accumulation end-to-end: counts are ints, the
# weight sum is an exact decimal/hugeint, and only the final mean becomes
# a (pround-quantized) double.
# --------------------------------------------------------------------------
@register(
    "lexical_rarity_by_source",
    f"""
    WITH {_WORDS_SQL},
    csw AS (SELECT source, w, COUNT(*) AS c FROM words GROUP BY source, w),
    cw AS (SELECT w, CAST(SUM(c) AS BIGINT) AS cw FROM csw GROUP BY w)
    SELECT csw.source,
           CAST(SUM(csw.c) AS BIGINT) AS n_words,
           COUNT(*) AS vocab_size,
           {pround_expr(
               'CAST(SUM(CAST(csw.c AS DECIMAL(18,0)) * CAST(cw.cw AS DECIMAL(18,0)))'
               ' AS DOUBLE) / CAST(SUM(csw.c) AS DOUBLE)', 4)}
             AS avg_word_corpus_count
    FROM csw JOIN cw ON csw.w = cw.w
    GROUP BY csw.source
    """,
)
def lexical_rarity_by_source(spark, sf_dir):
    d = spread(load_table(spark, sf_dir, "documents"))
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    words = d.filter(F.trim("text") != "").select(
        "source", F.explode(F.split(norm, " ")).alias("w")
    )
    # the ONLY corpus-wide shuffle: (source, word) counts, partial-agg'd
    # map-side; everything downstream is vocabulary-sized
    csw = words.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    from .registry import cache_scoped

    csw = cache_scoped(csw)
    cw = csw.groupBy("w").agg(F.sum("c").alias("cw"))
    j = csw.join(cw, "w")
    return j.groupBy("source").agg(
        F.sum("c").alias("n_words"),
        F.count(F.lit(1)).alias("vocab_size"),
        # cast BEFORE multiplying: c * cw in int64 silently wraps in
        # non-ANSI Spark once cw reaches ~1e12 at corpus scale (the
        # cluster_sums overflow lesson); decimal(19,0) x decimal(19,0)
        # promotes to decimal(38,0), exact for any two bigint counts
        pround(
            F.sum(
                F.col("c").cast("decimal(19,0)") * F.col("cw").cast("decimal(19,0)")
            ).cast("double")
            / F.sum("c").cast("double"),
            4,
        ).alias("avg_word_corpus_count"),
    )


# --------------------------------------------------------------------------
# Cross-source vocabulary overlap: pairwise jaccard between the word
# vocabularies of every source pair — the corpus-composition diagnostic a
# data-mix designer reads before setting sampling rates (two sources with
# jaccard ≈ 1 are redundant; ≈ 0 add coverage).
# --------------------------------------------------------------------------
@register(
    "cross_source_vocab_overlap",
    f"""
    WITH {_WORDS_SQL},
    vocab AS (SELECT DISTINCT source, w FROM words),
    sizes AS (SELECT source, COUNT(*) AS v FROM vocab GROUP BY source),
    shared AS (
      SELECT a.source AS s1, b.source AS s2, COUNT(*) AS n_shared
      FROM vocab a JOIN vocab b ON a.w = b.w AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT s1, s2, n_shared,
           sa.v AS v1, sb.v AS v2,
           {pround_expr('CAST(n_shared AS DOUBLE) / CAST(sa.v + sb.v - n_shared AS DOUBLE)', 6)}
             AS jaccard
    FROM shared JOIN sizes sa ON s1 = sa.source JOIN sizes sb ON s2 = sb.source
    """,
)
def cross_source_vocab_overlap(spark, sf_dir):
    d = spread(load_table(spark, sf_dir, "documents"))
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    vocab = (
        d.filter(F.trim("text") != "")
        .select("source", F.explode(F.split(norm, " ")).alias("w"))
        .distinct()
    )
    from .registry import cache_scoped

    vocab = cache_scoped(vocab)
    sizes = vocab.groupBy("source").agg(F.count(F.lit(1)).alias("v"))
    a = vocab.select(F.col("source").alias("s1"), "w")
    b = vocab.select(F.col("source").alias("s2"), "w")
    shared = (
        a.join(b, ["w"])
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    out = (
        shared.join(sizes.select(F.col("source").alias("s1"), F.col("v").alias("v1")), "s1")
        .join(sizes.select(F.col("source").alias("s2"), F.col("v").alias("v2")), "s2")
    )
    jac = F.col("n_shared").cast("double") / (
        F.col("v1") + F.col("v2") - F.col("n_shared")
    ).cast("double")
    return out.select(
        "s1", "s2", "n_shared", "v1", "v2", pround(jac, 6).alias("jaccard")
    )


# --------------------------------------------------------------------------
# Raw-text source/sink roundtrip — the ingest format of an LLM corpus
# (one document per line).  The oracle aggregates the ORIGINAL documents
# table with the identical newline normalization, so a hash match proves
# write→read fidelity including an order-independent CONTENT checksum
# (sum of per-line md5 prefixes), not just counts.
# --------------------------------------------------------------------------
@register(
    "text_roundtrip_documents",
    f"""
    WITH lines AS (
      SELECT regexp_replace(text, '[\\n\\r]+', ' ', 'g') AS value FROM documents
    )
    SELECT COUNT(*) AS n_lines,
           CAST(SUM(len(value)) AS BIGINT) AS total_chars,
           CAST(SUM({_md5_uint_sql('value', 8)}) AS BIGINT) AS content_checksum
    FROM lines
    """,
)
def text_roundtrip_documents(spark, sf_dir):
    from ..scratch import scratch_dir

    d = load_table(spark, sf_dir, "documents")
    lines = d.select(
        F.regexp_replace("text", "[\\n\\r]+", " ").alias("value")
    )
    path = scratch_dir("spark_graft_txt_")
    to_text(lines, path + "/docs_txt")
    back = read_text(spark, path + "/docs_txt")
    checksum = F.conv(F.substring(F.md5("value"), 1, 8), 16, 10).cast("long")
    return back.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.length("value")).alias("total_chars"),
        F.sum(checksum).alias("content_checksum"),
    )


# --------------------------------------------------------------------------
# PQ ANN: asymmetric-distance cosine top-k over product-quantized codes —
# the memory-scale path of the ANN family (brute = exact baseline, IVF =
# scan pruning, LSH = candidate bucketing, PQ = index compression).
#
# ORACLE (round-8, closing the registry's last rows-only row): the PQ
# trainer is integer-exact end to end (quantized inputs, exact BIGINT
# squared distances, decimal-sum + floor-division centroid updates, ties
# to the lowest code), and it runs a FIXED iters=2 Lloyd loop — so the
# "iterative" quantizer is just two unrolled relational passes, exactly
# the technique kmeans_embedding_clusters proved.  The SQL twin below
# mirrors every stage: seeds = the ksub lowest-id vectors' subvectors,
# b0→(assign,update)→b1→(assign,update)→b2 codebooks (empty codes keep
# the previous centroid via COALESCE), final codes under b2, reconstructed
# norms from codebook entries, per-(probe,candidate) ADC dot as one exact
# integer sum, double cosine with the identical sqrt·sqrt denominator,
# k*rerank=40 shortlist by (score DESC, id), and the exact quantized-
# cosine re-rank of the shortlist.  Every accumulation is an exact
# integer; the only doubles are the final IEEE divisions both engines
# perform identically — hence hash equality, not approximate agreement.
# Recall >= 0.6 vs brute force stays pinned in tests/test_scale_ops.py.
# --------------------------------------------------------------------------
_PQ_M = 8
_PQ_KSUB = 16
_PQ_DS = _DIM_PQ = 64 // _PQ_M  # ds = 8 dims per subspace
_PQ_SHORT = 5 * 8  # k * rerank

_PQ_ASSIGN_SQL = """
    d{it} AS (
      SELECT q.id, q.j, b.c, SUM((q.x - b.v) * (q.x - b.v)) AS d2
      FROM qsub q JOIN b{prev} b ON b.j = q.j AND b.i = q.i
      GROUP BY 1, 2, 3
    ),
    a{it} AS (
      SELECT id, j, c FROM (
        SELECT id, j, c,
               ROW_NUMBER() OVER (PARTITION BY id, j ORDER BY d2, c) AS rn
        FROM d{it}) t
      WHERE rn = 1
    )"""

#: Centroid-update exactness envelope (round-8 ADVICE): DuckDB sums the
#: bigint coords on its int128 path then casts once to double; Spark sums
#: on decimal then casts.  Those two SUM->double roundings agree only
#: while every per-(sub,code,dim) sum stays < 2^53 (doubles exact there).
#: Quantized coords are |x| <= ~1e6 (tests/test_scale_ops.py pins the
#: quantizer range), so the envelope holds up to ~2^33 rows PER CENTROID
#: CELL — far beyond any corpus the trainer would see un-sampled.
_PQ_UPDATE_SQL = """
    m{it} AS (
      SELECT a.j, a.c, q.i,
             CAST(FLOOR(CAST(SUM(q.x) AS DOUBLE)
                        / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS v
      FROM a{it} a JOIN qsub q ON q.id = a.id AND q.j = a.j
      GROUP BY 1, 2, 3
    ),
    b{it} AS (
      SELECT b{prev}.j, b{prev}.c, b{prev}.i, COALESCE(m{it}.v, b{prev}.v) AS v
      FROM b{prev} LEFT JOIN m{it}
        ON m{it}.j = b{prev}.j AND m{it}.c = b{prev}.c AND m{it}.i = b{prev}.i
    )"""

_PQ_SQL = f"""
    WITH qv AS (
      SELECT vec_id AS id, CAST(u AS INT) AS u,
             CAST(round(CAST(embedding[CAST(u AS INT) + 1] AS DOUBLE)
                        * 1000000, 0) AS BIGINT) AS x
      FROM (SELECT vec_id, embedding, unnest(range(64)) AS u FROM embeddings) e
    ),
    qsub AS (
      SELECT id, u // {_PQ_DS} AS j, u % {_PQ_DS} AS i, x FROM qv
    ),
    seeds AS (
      SELECT id, ROW_NUMBER() OVER (ORDER BY id) - 1 AS c
      FROM (SELECT DISTINCT id FROM qv ORDER BY id LIMIT {_PQ_KSUB}) s
    ),
    b0 AS (
      SELECT q.j, s.c, q.i, q.x AS v
      FROM seeds s JOIN qsub q ON q.id = s.id
    ),
    {_PQ_ASSIGN_SQL.format(it=1, prev=0)},
    {_PQ_UPDATE_SQL.format(it=1, prev=0)},
    {_PQ_ASSIGN_SQL.format(it=2, prev=1)},
    {_PQ_UPDATE_SQL.format(it=2, prev=1)},
    {_PQ_ASSIGN_SQL.format(it=3, prev=2)},
    rn2 AS (
      SELECT a.id, SUM(b.v * b.v) AS rn2
      FROM a3 a JOIN b2 b ON b.j = a.j AND b.c = a.c
      GROUP BY a.id
    ),
    norms AS (SELECT id, SUM(x * x) AS n2 FROM qv GROUP BY id),
    adc AS (
      SELECT p.id AS qid, a.id AS nid, SUM(p.x * b.v) AS dot
      FROM (SELECT * FROM qsub WHERE id < 5) p
      JOIN a3 a ON a.id <> p.id AND a.j = p.j
      JOIN b2 b ON b.j = a.j AND b.c = a.c AND b.i = p.i
      GROUP BY 1, 2
    ),
    adcscore AS (
      SELECT adc.qid, adc.nid,
             CAST(adc.dot AS DOUBLE) / (sqrt(CAST(np.n2 AS DOUBLE))
                                        * sqrt(CAST(r.rn2 AS DOUBLE))) AS s
      FROM adc JOIN norms np ON np.id = adc.qid
      JOIN rn2 r ON r.id = adc.nid
    ),
    short AS (
      SELECT qid, nid FROM (
        SELECT qid, nid,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY s DESC, nid) AS rn
        FROM adcscore) t
      WHERE rn <= {_PQ_SHORT}
    ),
    ed AS (
      SELECT s.qid, s.nid, SUM(pq.x * cq.x) AS dot
      FROM short s
      JOIN qv pq ON pq.id = s.qid
      JOIN qv cq ON cq.id = s.nid AND cq.u = pq.u
      GROUP BY 1, 2
    ),
    ex AS (
      SELECT e.qid, e.nid,
             CAST(e.dot AS DOUBLE) / (sqrt(CAST(np.n2 AS DOUBLE))
                                      * sqrt(CAST(nc.n2 AS DOUBLE))) AS pq_cosine
      FROM ed e JOIN norms np ON np.id = e.qid JOIN norms nc ON nc.id = e.nid
    )
    SELECT qid, nid AS vec_id, CAST(rank AS BIGINT) AS rank,
           (CAST(floor(pq_cosine * 1000000.0 + 0.5) AS DOUBLE)
            / 1000000.0) AS pq_cosine
    FROM (SELECT qid, nid, pq_cosine,
                 ROW_NUMBER() OVER (PARTITION BY qid
                                    ORDER BY pq_cosine DESC, nid) AS rank
          FROM ex) t
    WHERE rank <= 5
    """


@register("ann_pq_cosine_topk", _PQ_SQL)
def ann_pq_cosine_topk(spark, sf_dir):
    import os as _os

    from ..operators.similarity import pq_topk

    e = spread(load_table(spark, sf_dir, "embeddings"))
    probes = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    # encode path: interpreted HOFs are fine below ~100k vectors; above,
    # the ~1024 lambda-node-per-row cost dominates, and the Arrow twin
    # computes bit-identical codes vectorized.  Measured same-mode
    # (merge-run, cold JVM, median of 3): sf10 49 -> 21 s (-57%,
    # decisive); sf1 statistically indistinguishable (consecutive runs
    # 16.2 Arrow / 18.1 HOF / 20.0 Arrow — python-worker fan-up eats the
    # win at 20k vectors and run-to-run drift swamps the rest).  Gate at
    # 8 MB keeps driver/bench-scale plans pure-JVM (sf0.1 = 2 MB)
    arrow = _os.path.getsize(_os.path.join(sf_dir, "embeddings.parquet")) > (8 << 20)
    out = pq_topk(e, probes, k=5, m=8, ksub=16, iters=2, rerank=8, arrow_encode=arrow)
    w = W.partitionBy("qid").orderBy(F.desc("pq_cosine"), F.asc("vec_id"))
    return out.select(
        "qid", "vec_id", F.row_number().over(w).alias("rank"),
        pround(F.col("pq_cosine"), 6).alias("pq_cosine"),
    )


# --------------------------------------------------------------------------
# Mergeable binned quantiles: fixed-width histogram counts → cumulative
# ranks → per-quantile bin upper edges.  The deterministic, mergeable
# cousin of t-digest/percentile_approx for 100 TB telemetry: bin counts
# are a map-side-combinable agg you can persist per file/partition/day and
# MERGE exactly (sums), unlike engine-specific sketch internals — and two
# engines agree bit-for-bit, which percentile_approx never does.  Error is
# bounded by the bin width (0.25 here) instead of a sketch guarantee.
# --------------------------------------------------------------------------
@register(
    "binned_quantiles_event_value",
    """
    WITH b AS (
      SELECT event_type, CAST(floor(value * 4) AS BIGINT) AS bin, COUNT(*) AS c
      FROM events GROUP BY event_type, CAST(floor(value * 4) AS BIGINT)
    ),
    cum AS (
      SELECT event_type, bin, c,
             SUM(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
             SUM(c) OVER (PARTITION BY event_type) AS n
      FROM b
    )
    SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
           CAST(MIN(CASE WHEN cum >= ceil(0.50 * n) THEN bin + 1 END) AS DOUBLE) / 4.0 AS p50_est,
           CAST(MIN(CASE WHEN cum >= ceil(0.95 * n) THEN bin + 1 END) AS DOUBLE) / 4.0 AS p95_est,
           CAST(MIN(CASE WHEN cum >= ceil(0.99 * n) THEN bin + 1 END) AS DOUBLE) / 4.0 AS p99_est
    FROM cum GROUP BY event_type
    """,
)
def binned_quantiles_event_value(spark, sf_dir):
    e = spread(load_table(spark, sf_dir, "events"))
    b = (
        e.select("event_type", F.floor(F.col("value") * 4).cast("bigint").alias("bin"))
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wc = W.partitionBy("event_type").orderBy("bin")
    wn = W.partitionBy("event_type")
    cum = b.select(
        "event_type",
        "bin",
        F.sum("c").over(wc).alias("cum"),
        F.sum("c").over(wn).alias("n"),
    )

    def est(q):
        return (
            F.min(
                F.when(F.col("cum") >= F.ceil(F.lit(q) * F.col("n")), F.col("bin") + 1)
            ).cast("double")
            / 4.0
        )

    return cum.groupBy("event_type").agg(
        F.max("n").alias("n"),
        est(0.50).alias("p50_est"),
        est(0.95).alias("p95_est"),
        est(0.99).alias("p99_est"),
    )


# --------------------------------------------------------------------------
# Incremental ingest dedup: the production shape where a fingerprint STORE
# already exists and only the incoming batch is checked against it — a
# left-anti join on fingerprints, never a full-corpus re-dedup.  Here the
# store/incoming split is the md5-uniform 90/10 assignment (RNG-free,
# repartition-stable), so both engines derive the identical partition.
# Per source: incoming volume, exact duplicates of the store, duplicates
# within the batch itself, and the net-new unique docs you would admit.
# --------------------------------------------------------------------------
from ..operators.sampling import hash_uniform, hash_uniform_sql  # noqa: E402

_FP_SQL = f"md5({_NORM_SQL})"


@register(
    "dedup_incremental_new_docs",
    f"""
    WITH tagged AS (
      SELECT source, doc_id, {_FP_SQL} AS fp,
             ({hash_uniform_sql('doc_id')}) < 0.9 AS in_store
      FROM documents
    ),
    store_fp AS (SELECT DISTINCT fp FROM tagged WHERE in_store),
    incoming AS (
      SELECT t.source, t.doc_id, t.fp,
             (s.fp IS NOT NULL) AS dup_store,
             MIN(t.doc_id) OVER (PARTITION BY t.fp) AS first_in_batch
      FROM tagged t LEFT JOIN store_fp s ON t.fp = s.fp
      WHERE NOT t.in_store
    )
    SELECT source,
           COUNT(*) AS n_incoming,
           CAST(SUM(CASE WHEN dup_store THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_vs_store,
           CAST(SUM(CASE WHEN NOT dup_store AND doc_id <> first_in_batch
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_within_batch,
           CAST(SUM(CASE WHEN NOT dup_store AND doc_id = first_in_batch
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_new_unique
    FROM incoming GROUP BY source
    """,
)
def dedup_incremental_new_docs(spark, sf_dir):
    d = spread(load_table(spark, sf_dir, "documents"))
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    tagged = d.select(
        "source",
        "doc_id",
        F.md5(norm).alias("fp"),
        (hash_uniform(F.col("doc_id")) < 0.9).alias("in_store"),
    )
    from .registry import cache_scoped

    tagged = cache_scoped(tagged)
    store_fp = tagged.filter("in_store").select("fp").distinct()
    incoming = tagged.filter(~F.col("in_store"))
    # both sides scale with the corpus — left join (not anti) so dup-vs-store
    # and within-batch stats come from ONE pass; fp equi-join, one shuffle
    j = incoming.join(
        store_fp.withColumn("__hit__", F.lit(1)), "fp", "left"
    ).withColumn(
        "first_in_batch", F.min("doc_id").over(W.partitionBy("fp"))
    )
    dup_store = F.col("__hit__").isNotNull()
    return j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_incoming"),
        F.sum(F.when(dup_store, 1).otherwise(0)).alias("n_dup_vs_store"),
        F.sum(
            F.when(~dup_store & (F.col("doc_id") != F.col("first_in_batch")), 1).otherwise(0)
        ).alias("n_dup_within_batch"),
        F.sum(
            F.when(~dup_store & (F.col("doc_id") == F.col("first_in_batch")), 1).otherwise(0)
        ).alias("n_new_unique"),
    )


# --------------------------------------------------------------------------
# Small-files compaction fidelity: fragment the documents table into 64
# tiny files (the streaming-sink / per-partition-writer failure mode),
# compact to size-targeted files (sources/compaction.py), and prove the
# rewrite byte-exact via row count + char volume + an order-independent
# content checksum against the ORIGINAL table.  File-count mechanics
# (before ≫ after, after = ceil(bytes/target)) are pinned by
# tests/test_sources.py-style assertions in tests/test_scale_ops.py.
# --------------------------------------------------------------------------
@register(
    "compaction_roundtrip_documents",
    f"""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM({_md5_uint_sql('text', 8)}) AS BIGINT) AS content_checksum
    FROM documents
    """,
)
def compaction_roundtrip_documents(spark, sf_dir):
    import os

    from ..scratch import scratch_dir
    from ..sources.compaction import compact_parquet

    d = load_table(spark, sf_dir, "documents")
    root = scratch_dir("spark_graft_compact_")
    frag = os.path.join(root, "fragmented")
    d.repartition(64).write.mode("overwrite").parquet(frag)
    back = compact_parquet(spark, frag, os.path.join(root, "compacted"))
    checksum = F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("long")
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(checksum).alias("content_checksum"),
    )


# --------------------------------------------------------------------------
# Weighted sampling (A-Res, Efraimidis-Spirakis): k docs per source with
# probability ∝ n_chars, RNG-free via the md5-uniform key.  The Spark plan
# is the SALTED two-phase top-k (operators/sampling.py::weighted_take —
# stratum cardinality is tiny, so an unsalted window would funnel the
# corpus through n_sources tasks); the oracle runs the unsalted
# single-window SQL, proving the salted plan exact.
# --------------------------------------------------------------------------
from ..operators.sampling import ares_key_sql, weighted_take  # noqa: E402


@register(
    "weighted_sample_by_source",
    f"""
    SELECT source, rank, doc_id, n_chars FROM (
      SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY {ares_key_sql('doc_id', 'n_chars')} DESC, doc_id
             ) AS rank
      FROM documents WHERE n_chars > 0
    ) WHERE rank <= 5
    """,
)
def weighted_sample_by_source(spark, sf_dir):
    d = spread(load_table(spark, sf_dir, "documents")).filter(F.col("n_chars") > 0)
    return weighted_take(
        d.select("source", "doc_id", "n_chars"),
        strata="source",
        k=5,
        key="doc_id",
        weight="n_chars",
    ).select("source", "rank", "doc_id", "n_chars")


# --------------------------------------------------------------------------
# Leakage-safe train/val/test split: the split key is the exact-dedup
# CLUSTER canonical (min doc_id per text fingerprint), not the doc — so
# verbatim copies can never land on both sides of a train/eval boundary
# (the classic contamination leak a doc-keyed split permits).  One
# fingerprint window + the md5-uniform split arithmetic of
# dataset_split_assign; leakage-safety is structural (every member of a
# cluster hashes the same canonical), not checked after the fact.
# --------------------------------------------------------------------------
_U8_CANON_SQL = (
    "("
    + " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(CAST(canon AS VARCHAR)), {i + 1}, 1)) - 1)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )
    + ") / 4294967296.0"
)


@register(
    "leakage_safe_split_stats",
    f"""
    WITH canon AS (
      SELECT doc_id, n_chars,
             MIN(doc_id) OVER (PARTITION BY md5({_NORM_SQL})) AS canon
      FROM documents
    ),
    rated AS (SELECT doc_id, n_chars, canon, {_U8_CANON_SQL} AS u FROM canon)
    SELECT CASE WHEN u < 0.90 THEN 'train'
                WHEN u < 0.95 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(COUNT(DISTINCT canon) AS BIGINT) AS n_clusters,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM rated
    GROUP BY 1
    """,
)
def leakage_safe_split_stats(spark, sf_dir):
    """Cluster-keyed 90/5/5 split: per split, docs, distinct dedup
    clusters, and chars.  A cluster is never divided across splits."""
    from ..functions.text import fingerprint
    from ..operators.sampling import hash_uniform

    d = spread(load_table(spark, sf_dir, "documents"))
    w = W.partitionBy(fingerprint(F.col("text")))
    canon = d.select(
        "doc_id", "n_chars", F.min("doc_id").over(w).alias("canon")
    )
    u = hash_uniform(F.col("canon"))
    split = (
        F.when(u < 0.90, "train").when(u < 0.95, "val").otherwise("test")
    ).alias("split")
    return (
        canon.select(split, "n_chars", "canon")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("canon").cast("long").alias("n_clusters"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


# --------------------------------------------------------------------------
# Shannon entropy per categorical column — the profiling signal behind
# "is this column a key, a category, or junk" and the information-gain
# denominator.  One map-side-combinable count per column, every later
# relation is cardinality-sized.  Determinism: p = c/n is an exact double
# ratio (both < 2^53), the p*log2(p) term is quantized to 1e-9 BEFORE the
# exact decimal sum (the source-KL discipline — libm ln agreement is
# beyond the quantization grid).
# --------------------------------------------------------------------------
_ENT_Q = 1_000_000_000
_INV_LN2 = 1.4426950408889634  # 1/ln(2), exact double literal both engines


def _entropy_sql(table: str, col: str) -> str:
    term = (
        f"(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))"
        f" * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * {_INV_LN2!r}"
    )
    from ..functions.exact import dec2dbl_expr, pround_expr

    qterm = f"(CAST(floor(({term}) * {_ENT_Q}.0 + 0.5) AS DOUBLE) / {_ENT_Q}.0)"
    ent = pround_expr("-(" + dec2dbl_expr(f"SUM(CAST({qterm} AS DECIMAL(30,8)))") + ")", 6)
    return f"""
      SELECT '{table}.{col}' AS column_name,
             CAST(SUM(c) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS BIGINT) AS n_distinct,
             {ent} AS entropy_bits
      FROM (SELECT {col} AS v, CAST(COUNT(*) AS BIGINT) AS c
            FROM {table} GROUP BY {col}) t
      CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM {table}) nn
    """


_ENT_COLUMNS = [
    ("events", "event_type"),
    ("orders", "o_orderstatus"),
    ("orders", "o_orderpriority"),
    ("customer", "c_mktsegment"),
]


@register(
    "column_entropy_profile",
    " UNION ALL ".join(_entropy_sql(t, c) for t, c in _ENT_COLUMNS),
)
def column_entropy_profile(spark, sf_dir):
    """Shannon entropy (bits) + cardinality for four categorical columns
    across three tables; one count-aggregate per column, quantized
    p*log2(p) terms, exact decimal accumulation."""
    from ..functions.exact import dec_to_double

    parts = []
    for table, col in _ENT_COLUMNS:
        t = spread(load_table(spark, sf_dir, table))
        counts = t.groupBy(F.col(col).alias("v")).agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
        n = t.agg(F.count(F.lit(1)).cast("long").alias("n"))
        p = F.col("c").cast("double") / F.col("n").cast("double")
        term = p * F.log(p) * _INV_LN2
        qterm = F.floor(term * _ENT_Q + F.lit(0.5)).cast("double") / _ENT_Q
        parts.append(
            counts.crossJoin(F.broadcast(n))
            .select(F.col("c"), qterm.alias("qt"))
            .agg(
                F.sum("c").cast("long").alias("n_rows"),
                F.count(F.lit(1)).cast("long").alias("n_distinct"),
                pround(-dec_to_double(F.sum(F.col("qt").cast("decimal(30,8)"))), 6).alias(
                    "entropy_bits"
                ),
            )
            .select(
                F.lit(f"{table}.{col}").alias("column_name"),
                "n_rows",
                "n_distinct",
                "entropy_bits",
            )
        )
    out = parts[0]
    for part in parts[1:]:
        out = out.unionAll(part)
    return out


# --------------------------------------------------------------------------
# TF-IDF keyword extraction per source — the human-readable complement to
# the hashed TF-IDF vectorizer: the actual top words that characterize
# each source.  One corpus shuffle to (source, word) tf counts, one to
# per-word document frequency; everything after is vocabulary-sized.
# Determinism: idf is quantized to an integer (1e-6 ln units) BEFORE the
# score multiply; the score is one IEEE multiply + divide of exact
# doubles — identical in both engines — and the per-source top-5 ranks on
# (score DESC, word).  Boilerplate is excluded by the Apriori-style
# document-frequency gate (df/D >= 0.3 -> not a keyword), an integer
# compare.
# --------------------------------------------------------------------------
_KW_TOPK = 5
_KW_Q = 1_000_000


@register(
    "keyword_extraction_by_source",
    f"""
    WITH words AS (
      SELECT source, doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS w
      FROM documents WHERE trim(text) <> ''
    ),
    tf AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS tf
           FROM words GROUP BY source, w),
    df AS (SELECT w, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM words GROUP BY w),
    dd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS d FROM words),
    idf AS (
      SELECT w, df,
             CAST(floor(ln((CAST(d AS DOUBLE) + 1.0) / (CAST(df AS DOUBLE) + 1.0))
                        * {_KW_Q}.0 + 0.5) AS BIGINT) AS idf_micro
      FROM df CROSS JOIN dd
      WHERE df * 10 < d * 3
    ),
    scored AS (
      SELECT tf.source, tf.w AS word, tf.tf, idf.idf_micro,
             (CAST(tf.tf AS DOUBLE) * CAST(idf.idf_micro AS DOUBLE))
               / {_KW_Q}.0 AS score
      FROM tf JOIN idf ON tf.w = idf.w
    )
    SELECT source, word, tf, idf_micro,
           {pround_expr('score', 4)} AS score
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                       ORDER BY score DESC, word) AS rn
          FROM scored) t
    WHERE rn <= {_KW_TOPK}
    """,
)
def keyword_extraction_by_source(spark, sf_dir):
    """Top-5 TF-IDF keywords per source (quantized-integer idf, pure-IEEE
    score, df-gated boilerplate exclusion)."""
    from .registry import cache_scoped

    d = spread(load_table(spark, sf_dir, "documents"))
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    words = d.filter(F.trim("text") != "").select(
        "source", "doc_id", F.explode(F.split(norm, " ")).alias("w")
    )
    words = cache_scoped(words)
    tf = words.groupBy("source", "w").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    df = words.groupBy("w").agg(F.countDistinct("doc_id").cast("long").alias("df"))
    dd = words.agg(F.countDistinct("doc_id").cast("long").alias("d"))
    idf = (
        df.crossJoin(F.broadcast(dd))
        .filter(F.col("df") * 10 < F.col("d") * 3)
        .select(
            "w",
            "df",
            F.floor(
                F.log((F.col("d").cast("double") + 1.0) / (F.col("df").cast("double") + 1.0))
                * _KW_Q
                + F.lit(0.5)
            )
            .cast("long")
            .alias("idf_micro"),
        )
    )
    # per-word idf scales with vocabulary — pin it off broadcast
    scored = tf.join(idf.hint("shuffle_hash"), tf["w"] == idf["w"]).select(
        "source",
        tf["w"].alias("word"),
        "tf",
        "idf_micro",
        (
            (F.col("tf").cast("double") * F.col("idf_micro").cast("double")) / _KW_Q
        ).alias("score"),
    )
    wk = W.partitionBy("source").orderBy(F.desc("score"), F.asc("word"))
    return (
        scored.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= _KW_TOPK)
        .select("source", "word", "tf", "idf_micro", pround(F.col("score"), 4).alias("score"))
    )


# --------------------------------------------------------------------------
# Mutual information between two categorical columns — the dependence
# screen entropy profiling builds toward: MI(event_type; day-of-week)
# says whether traffic composition shifts by weekday.  One joint-count
# aggregate (map-side combinable); marginals derive from the joint
# (types- and dows-sized); MI terms quantized to 1e-9 before the exact
# decimal sum (the KL discipline).  The day-of-week VALUE never appears
# in the output — only the partition matters, so the Spark-vs-DuckDB
# weekday-numbering delta (PARITY.md) cannot leak into the hash.
# --------------------------------------------------------------------------


@register(
    "mutual_information_event_dow",
    f"""
    WITH j AS (
      SELECT event_type AS x, dayofweek(CAST(ts AS TIMESTAMP)) AS y,
             CAST(COUNT(*) AS BIGINT) AS cxy
      FROM events GROUP BY 1, 2
    ),
    mx AS (SELECT x, CAST(SUM(cxy) AS BIGINT) AS cx FROM j GROUP BY x),
    my AS (SELECT y, CAST(SUM(cxy) AS BIGINT) AS cy FROM j GROUP BY y),
    nn AS (SELECT CAST(SUM(cxy) AS BIGINT) AS n FROM j),
    terms AS (
      SELECT (CAST(floor(
                (CAST(cxy AS DOUBLE) / CAST(n AS DOUBLE))
                * ln(CAST(cxy AS DOUBLE) * CAST(n AS DOUBLE)
                     / (CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE)))
                * {_INV_LN2!r} * {_ENT_Q}.0 + 0.5) AS DOUBLE) / {_ENT_Q}.0) AS t,
             n
      FROM j JOIN mx ON j.x = mx.x JOIN my ON j.y = my.y CROSS JOIN nn
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           {pround_expr(dec2dbl_expr("SUM(CAST(t AS DECIMAL(30,8)))"), 6)}
             AS mi_bits
    FROM terms
    """,
)
def mutual_information_event_dow(spark, sf_dir):
    """MI(event_type; day-of-week) in bits over the events table: joint
    counts once, marginals from the joint, quantized terms, exact
    decimal accumulation."""
    from ..functions.exact import dec_to_double
    from .registry import cache_scoped

    e = spread(load_table(spark, sf_dir, "events"))
    j = cache_scoped(
        e.select(
            F.col("event_type").alias("x"),
            F.dayofweek(F.col("ts").cast("timestamp")).alias("y"),
        )
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("cxy"))
    )
    mx = j.groupBy("x").agg(F.sum("cxy").cast("long").alias("cx"))
    my = j.groupBy("y").agg(F.sum("cxy").cast("long").alias("cy"))
    nn = j.agg(F.sum("cxy").cast("long").alias("n"))
    terms = (
        j.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(nn))
    )
    t_raw = (
        (F.col("cxy").cast("double") / F.col("n").cast("double"))
        * F.log(
            F.col("cxy").cast("double")
            * F.col("n").cast("double")
            / (F.col("cx").cast("double") * F.col("cy").cast("double"))
        )
        * _INV_LN2
    )
    qt = F.floor(t_raw * _ENT_Q + F.lit(0.5)).cast("double") / _ENT_Q
    return terms.select(qt.alias("t"), "n").agg(
        F.max("n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        pround(dec_to_double(F.sum(F.col("t").cast("decimal(30,8)"))), 6).alias(
            "mi_bits"
        ),
    )
