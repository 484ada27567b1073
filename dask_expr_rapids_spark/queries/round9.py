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
  side's sketches and band rows to parquet (the one-time ETL a real
  pipeline runs once, not per batch), then the probe stage reads ONLY
  those parquet files — the store's *text* is never touched again.
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

    # ---- stage 1: the persistent store (sketch + band-bucket tables) ----
    store_mh = minhash_sketch(tagged.filter("in_store").select("doc_id", "text"))
    root = scratch_dir("spark_graft_ndstore_")
    sketch_path = os.path.join(root, "sketch")
    bands_path = os.path.join(root, "bands")
    store_mh.write.mode("overwrite").parquet(sketch_path)
    band_rows(
        spark.read.parquet(sketch_path)
    ).write.mode("overwrite").parquet(bands_path)
    store_sketch = spark.read.parquet(sketch_path)
    store_bands = spark.read.parquet(bands_path)

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

    # verification gsets: candidate store ids are few — broadcast-id inner
    # join filters the store sketch in one streamed pass (no store shuffle,
    # and the gset-carrying side is never broadcast)
    need_store = cand_store.select(F.col("id_ot").alias("doc_id")).distinct()
    st_g = store_sketch.join(F.broadcast(need_store), "doc_id").select(
        F.col("doc_id").alias("id_ot"),
        F.col("n").alias("n2"),
        F.col("gset").alias("gset2"),
    )
    in_g = batch_mh.select(
        F.col("doc_id").alias("id_in"), F.col("n").alias("n1"), F.col("gset").alias("gset1")
    )
    ba_g = batch_mh.select(
        F.col("doc_id").alias("id_ot"), F.col("n").alias("n2"), F.col("gset").alias("gset2")
    )

    def _verify(cand, other_g):
        v = (
            cand.join(in_g.hint("shuffle_hash"), "id_in")
            .join(other_g.hint("shuffle_hash"), "id_ot")
            .withColumn("shared", F.size(F.array_intersect("gset1", "gset2")))
        )
        jac = F.col("shared").cast("double") / (
            F.col("n1") + F.col("n2") - F.col("shared")
        ).cast("double")
        return v.filter(jac >= 0.2).select("id_in")

    nd_store_ids = _verify(cand_store, st_g).distinct()
    nd_batch_ids = _verify(cand_batch, ba_g).distinct()

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
