"""Round-9 curation operators: incremental NEAR-dup ingest — the 10th
dedup strategy, closing the pipeline gap between
``dedup_incremental_new_docs`` (exact fingerprints only, round7.py) and
the MinHash-LSH family (full-corpus re-dedup only, text.py).

Not in the reference (its surface is the pandas algebra,
``/root/reference/dask_expr/_collection.py``); this extends the LLM-data
pipeline layer (SURVEY.md §7 phase 4) with the shape a 100 TB corpus
actually ingests: a PERSISTENT band-bucket + sketch store already exists,
and only the incoming batch computes signatures and probes it.

Scale notes (100 TB posture):

* The store is REAL in the plan: the query first materializes the store
  side's sketches to parquet (the one-time ETL a real pipeline runs
  once, not per batch), then the probe stage reads ONLY that parquet —
  the store's *text* is never touched again.  Band rows are DERIVED at
  probe time (a pure projection; parquet column pruning keeps the scan
  on doc_id + signature words).
* The probe never shuffles or broadcasts the store.  Batch bands (slim
  (doc_id, bkey) rows, bounded by the ingest batch size) broadcast
  against the store's band table — one streamed pass, zero store
  shuffle.  Verification gsets for the (few) candidate store docs are
  fetched by a broadcast-semi reduction on candidate ids — the
  DPP-style pattern — so the store's gram-hash sets are read-filtered,
  never shuffled (the gset-carrying-side broadcast ban from
  ``dedup_neardup_minhash_lsh`` applies here too).
* Candidate volume is pairs TOUCHING THE INCREMENT only: batch×store
  via band buckets plus batch×batch — never store×store.  At a 0.1%
  increment that is ~1000× less work than the batch family's full
  re-dedup, which is the whole point of the strategy.

Within-batch semantics: a batch doc is near-dup-within-batch if it
verifies (exact jaccard >= 0.2 over 60-bit gram hashes, same threshold
and payload as the LSH family) against ANY smaller-doc_id batch doc —
the min-id-survivor convention every dedup query in the repo uses; a
chained "admitted-only" rule would be order-dependent on ingestion
sequencing that a set-oriented batch has no business inventing.  Store
near-dups take precedence in the counts (a doc counted against the
store is not re-counted within-batch).

Oracle: batch LSH over the full tagged corpus, restricted to candidate
pairs touching the increment — identical signatures, identical band
keys, identical jaccard arithmetic (DuckDB twin of the text.py family).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ..operators.sampling import hash_uniform, hash_uniform_sql
from ..scratch import scratch_dir
from ..sources.tables import load_table, spread
from .registry import cache_scoped, register
from .text import _GRAMS_SQL, _MINHASH_COLS_SQL, _BAND_KEYS_SQL, band_rows, minhash_sketch

#: store/batch split — the md5-uniform 90/10 assignment shared with the
#: exact-fingerprint incremental query (RNG-free, repartition-stable,
#: identical in both engines)
_STORE_FRAC = 0.9

_N_BANDS = 3

_BAND_UNION_ALL_SQL = "\n      UNION ALL\n".join(
    f"      SELECT doc_id, band{b} AS bkey FROM sigs" for b in range(_N_BANDS)
)

_INC_NEARDUP_SQL = f"""
    WITH {_GRAMS_SQL},
    tagged AS (
      SELECT doc_id, source,
             ({hash_uniform_sql('doc_id')}) < {_STORE_FRAC} AS in_store
      FROM documents
    ),
    mh AS (
      SELECT doc_id,
           {_MINHASH_COLS_SQL},
           COUNT(DISTINCT g60) AS n,
           list(DISTINCT g60) AS gset
      FROM grams GROUP BY doc_id
    ),
    sigs AS (SELECT doc_id, {_BAND_KEYS_SQL} FROM mh),
    bands AS (
{_BAND_UNION_ALL_SQL}
    ),
    bt AS (
      SELECT b.doc_id, b.bkey, t.in_store
      FROM bands b JOIN tagged t ON b.doc_id = t.doc_id
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_in, b.doc_id AS id_ot, b.in_store AS ot_store
      FROM bt a JOIN bt b ON a.bkey = b.bkey
      WHERE NOT a.in_store AND a.doc_id <> b.doc_id
        AND (b.in_store OR b.doc_id < a.doc_id)
    ),
    verified AS (
      SELECT id_in, ot_store
      FROM (
        SELECT c.id_in, c.ot_store,
               len(list_intersect(m1.gset, m2.gset)) AS shared,
               m1.n AS n1, m2.n AS n2
        FROM cand c
        JOIN mh m1 ON c.id_in = m1.doc_id
        JOIN mh m2 ON c.id_ot = m2.doc_id
      ) v
      WHERE CAST(shared AS DOUBLE) / CAST(n1 + n2 - shared AS DOUBLE) >= 0.2
    ),
    flags AS (
      SELECT t.doc_id, t.source,
             MAX(CASE WHEN v.ot_store THEN 1 ELSE 0 END) AS nd_store,
             MAX(CASE WHEN v.ot_store = FALSE THEN 1 ELSE 0 END) AS nd_batch
      FROM tagged t LEFT JOIN verified v ON v.id_in = t.doc_id
      WHERE NOT t.in_store
      GROUP BY 1, 2
    )
    SELECT source,
           COUNT(*) AS n_incoming,
           CAST(SUM(nd_store) AS BIGINT) AS n_neardup_vs_store,
           CAST(SUM(CASE WHEN nd_store = 0 AND nd_batch = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_neardup_within_batch,
           CAST(SUM(CASE WHEN nd_store = 0 AND nd_batch = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_admitted
    FROM flags GROUP BY source
"""


@register("dedup_incremental_neardup_ingest", _INC_NEARDUP_SQL)
def dedup_incremental_neardup_ingest(spark, sf_dir):
    """Incremental near-dup ingest: batch probes a persisted LSH store.

    Stage 1 (one-time store ETL, amortized across every future batch in
    production): sketch + band rows of the store slice → parquet.
    Stage 2 (per-batch probe): the incoming 10% computes its own
    sketches, its band rows broadcast against the store band table and
    self-join within the batch, candidates verify by exact jaccard with
    store gsets fetched via a broadcast-id semi reduction.  Per source:
    incoming volume, near-dups of the store, near-dups within the batch,
    and the admitted survivors.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    tagged = d.select(
        "doc_id",
        "source",
        "text",
        (hash_uniform(F.col("doc_id")) < _STORE_FRAC).alias("in_store"),
    )

    # ---- stage 1: the persistent store (one sketch table) ----
    store_mh = minhash_sketch(tagged.filter("in_store").select("doc_id", "text"))
    root = scratch_dir("spark_graft_ndstore_")
    sketch_path = os.path.join(root, "sketch")
    store_mh.write.mode("overwrite").parquet(sketch_path)
    store_sketch = spark.read.parquet(sketch_path)
    # the band table is DERIVED at probe time: band_rows is a pure
    # projection and parquet column pruning keeps the probe scan on
    # (doc_id, h0..h11) only — same bytes as a slim band table, one
    # fewer store table to keep consistent (mirrors the streaming sink)
    store_bands = band_rows(store_sketch)

    # ---- stage 2: the batch probe (store text never read again) ----
    batch = tagged.filter(~F.col("in_store"))
    batch_mh = cache_scoped(minhash_sketch(batch.select("doc_id", "text")))
    batch_bands = band_rows(batch_mh)

    # batch×store candidates: broadcast the (bounded) batch bands, stream
    # the store band table once — the store is never shuffled
    cand_store = (
        store_bands.alias("s")
        .join(F.broadcast(batch_bands.alias("a")), F.col("a.bkey") == F.col("s.bkey"))
        .select(F.col("a.doc_id").alias("id_in"), F.col("s.doc_id").alias("id_ot"))
        .distinct()
    )
    # batch×batch candidates (min-id-survivor orientation)
    a, b = batch_bands.alias("a"), batch_bands.alias("b")
    cand_batch = (
        a.join(
            b.hint("shuffle_hash"),
            (F.col("a.bkey") == F.col("b.bkey")) & (F.col("b.doc_id") < F.col("a.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_in"), F.col("b.doc_id").alias("id_ot"))
        .distinct()
    )

    # verification gsets: candidate ids are few on EVERY side — a
    # broadcast-id inner join filters each gset-carrying frame (store
    # sketch OR batch sketch) down to candidates in one streamed pass
    # before the verify join, so gset arrays are never shuffled at
    # corpus/batch volume and never broadcast (the round-9 sf10 drain
    # profile: un-reduced batch gset shuffles were ~100x the candidate
    # payload)
    def _gsets(mh_side, cand, id_col, n_alias, g_alias):
        need = cand.select(F.col(id_col).alias("doc_id")).distinct()
        return mh_side.join(F.broadcast(need), "doc_id").select(
            F.col("doc_id").alias(id_col),
            F.col("n").alias(n_alias),
            F.col("gset").alias(g_alias),
        )

    def _verify(cand, other_mh):
        v = (
            cand.join(_gsets(batch_mh, cand, "id_in", "n1", "gset1").hint("shuffle_hash"), "id_in")
            .join(_gsets(other_mh, cand, "id_ot", "n2", "gset2").hint("shuffle_hash"), "id_ot")
            .withColumn("shared", F.size(F.array_intersect("gset1", "gset2")))
        )
        jac = F.col("shared").cast("double") / (
            F.col("n1") + F.col("n2") - F.col("shared")
        ).cast("double")
        return v.filter(jac >= 0.2).select("id_in")

    nd_store_ids = _verify(cand_store, store_sketch).distinct()
    nd_batch_ids = _verify(cand_batch, batch_mh).distinct()

    flagged = (
        batch.select("doc_id", "source")
        .join(
            nd_store_ids.withColumn("__st__", F.lit(1)),
            F.col("doc_id") == F.col("id_in"),
            "left",
        )
        .drop("id_in")
        .join(
            nd_batch_ids.withColumn("__ba__", F.lit(1)),
            F.col("doc_id") == F.col("id_in"),
            "left",
        )
        .drop("id_in")
    )
    st = F.col("__st__").isNotNull()
    ba = F.col("__ba__").isNotNull()
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_incoming"),
        F.sum(F.when(st, 1).otherwise(0)).alias("n_neardup_vs_store"),
        F.sum(F.when(~st & ba, 1).otherwise(0)).alias("n_neardup_within_batch"),
        F.sum(F.when(~st & ~ba, 1).otherwise(0)).alias("n_admitted"),
    )


# --------------------------------------------------------------------------
# Streaming twin of the incremental near-dup strategy: a foreachBatch MERGE
# sink that maintains the persistent LSH store (sketch + band buckets) and
# admits each staged micro-batch against it — the continuous-ingest form of
# the batch query above, completing the pattern the exact-fingerprint pair
# (dedup_incremental_new_docs / stream_upsert_dedup_sink) already has.
#
# The doc feed is staged as four files keyed by doc_id % 4 with forced
# mtime order (streaming/ops.py::stage_ordered_feed), so availableNow +
# maxFilesPerTrigger=1 yields four deterministic micro-batches and the
# admission order is SQL-expressible: the oracle unrolls the four rounds
# as chained CTEs over ONE shared verified-pair relation.  Admission
# contract (run_lsh_neardup_ingest docstring): reject with reason 'store'
# on a verified pair to any ADMITTED earlier-batch doc (the store holds
# admitted docs only — a rejected doc never rejects later arrivals, which
# is exactly where this differs from the batch query's wholesale store
# slice); else reason 'batch' on a verified pair to a smaller-id same-
# batch doc (status-blind min-id-survivor); else admit and append the
# doc's sketch + bands to the store.
# --------------------------------------------------------------------------

def _rs_sql(k: int, prev: str) -> str:
    """Batch-k store-rejection CTE: docs of batch k with a verified pair
    into the admitted-so-far set ``prev``."""
    return f"""
    rs{k} AS (
      SELECT DISTINCT p.x AS doc_id
      FROM vps p
      JOIN tb t ON t.doc_id = p.x AND t.batch = {k}
      JOIN {prev} s ON s.doc_id = p.y
    ),
    a{k} AS (
      SELECT t.doc_id FROM tb t WHERE t.batch = {k}
        AND NOT EXISTS (SELECT 1 FROM rs{k} r WHERE r.doc_id = t.doc_id)
        AND NOT EXISTS (SELECT 1 FROM wb w WHERE w.doc_id = t.doc_id)
    ),
    s{k} AS (SELECT doc_id FROM {prev} UNION ALL SELECT doc_id FROM a{k})"""


_STREAM_LSH_SQL = f"""
    WITH {_GRAMS_SQL},
    tb AS (SELECT doc_id, source, doc_id % 4 AS batch FROM documents),
    mh AS (
      SELECT doc_id,
           {_MINHASH_COLS_SQL},
           COUNT(DISTINCT g60) AS n,
           list(DISTINCT g60) AS gset
      FROM grams GROUP BY doc_id
    ),
    sigs AS (SELECT doc_id, {_BAND_KEYS_SQL} FROM mh),
    bands AS (
{_BAND_UNION_ALL_SQL}
    ),
    vp AS (
      SELECT a.doc_id AS x, b.doc_id AS y
      FROM bands a JOIN bands b ON a.bkey = b.bkey AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    vver AS (
      SELECT x, y FROM (
        SELECT v.x, v.y,
               len(list_intersect(m1.gset, m2.gset)) AS shared,
               m1.n AS n1, m2.n AS n2
        FROM vp v JOIN mh m1 ON v.x = m1.doc_id JOIN mh m2 ON v.y = m2.doc_id
      ) t
      WHERE CAST(shared AS DOUBLE) / CAST(n1 + n2 - shared AS DOUBLE) >= 0.2
    ),
    vps AS (SELECT x, y FROM vver UNION ALL SELECT y AS x, x AS y FROM vver),
    wb AS (
      SELECT DISTINCT p.x AS doc_id
      FROM vps p
      JOIN tb ta ON ta.doc_id = p.x
      JOIN tb ty ON ty.doc_id = p.y
      WHERE ty.batch = ta.batch AND p.y < p.x
    ),
    s0 AS (
      SELECT t.doc_id FROM tb t WHERE t.batch = 0
        AND NOT EXISTS (SELECT 1 FROM wb w WHERE w.doc_id = t.doc_id)
    ),{_rs_sql(1, "s0")},{_rs_sql(2, "s1")},{_rs_sql(3, "s2")},
    rs_all AS (
      SELECT doc_id FROM rs1 UNION ALL
      SELECT doc_id FROM rs2 UNION ALL
      SELECT doc_id FROM rs3
    ),
    lab AS (
      SELECT t.source,
             CASE
               WHEN EXISTS (SELECT 1 FROM rs_all r WHERE r.doc_id = t.doc_id)
                 THEN 'store'
               WHEN EXISTS (SELECT 1 FROM wb w WHERE w.doc_id = t.doc_id)
                 THEN 'batch'
               ELSE 'adm'
             END AS lbl
      FROM tb t
    )
    SELECT source,
           CAST(SUM(CASE WHEN lbl = 'adm' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_admitted,
           CAST(SUM(CASE WHEN lbl = 'store' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_rejected_store,
           CAST(SUM(CASE WHEN lbl = 'batch' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_rejected_batch
    FROM lab GROUP BY source
"""


@register("stream_lsh_neardup_ingest", _STREAM_LSH_SQL)
def stream_lsh_neardup_ingest(spark, sf_dir):
    """Streaming LSH near-dup ingest: four staged micro-batches drain
    through a foreachBatch MERGE sink holding the persistent band store;
    per source: admitted docs, rejections against the store, rejections
    within a batch.  Oracle = the four admission rounds unrolled as
    chained CTEs over one verified-pair relation."""
    from ..streaming.ops import run_lsh_neardup_ingest, stage_ordered_feed

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    stage = scratch_dir("spark_graft_lshfeed_")
    stage_ordered_feed(docs, stage, n_batches=4, key="doc_id")
    store = scratch_dir("spark_graft_lshstore_")
    audit = os.path.join(scratch_dir("spark_graft_lshaudit_"), "audit")
    # per-batch join stages are BATCH-sized: size their shuffle partition
    # count from a quarter of the table's bytes (floor 8, cap 512), not
    # the session's corpus-sized default — at 4 drains x ~6 shuffle
    # stages, scheduling 32-task stages over kilobyte batches dominated
    # the drain wall clock at bench scale
    batch_bytes = os.path.getsize(os.path.join(sf_dir, "documents.parquet")) // 4
    run_lsh_neardup_ingest(
        spark,
        stage,
        store,
        audit,
        shuffle_partitions=max(8, min(512, batch_bytes // (4 << 20))),
    )

    admitted = (
        spark.read.parquet(os.path.join(store, "sketch"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_admitted"))
    )
    rej = spark.read.schema("source string, doc_id bigint, reason string").parquet(
        audit
    )
    rej_counts = rej.groupBy("source").agg(
        F.sum(F.when(F.col("reason") == "store", 1).otherwise(0)).alias(
            "n_rejected_store"
        ),
        F.sum(F.when(F.col("reason") == "batch", 1).otherwise(0)).alias(
            "n_rejected_batch"
        ),
    )
    return (
        admitted.join(rej_counts, "source", "full_outer")
        .select(
            "source",
            F.coalesce("n_admitted", F.lit(0)).cast("long").alias("n_admitted"),
            F.coalesce("n_rejected_store", F.lit(0))
            .cast("long")
            .alias("n_rejected_store"),
            F.coalesce("n_rejected_batch", F.lit(0))
            .cast("long")
            .alias("n_rejected_batch"),
        )
    )
