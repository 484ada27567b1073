"""Similarity search over the `embeddings` table (array<float> column) —
LLM-data pipeline extension (SURVEY.md §7 phase 4).

Determinism strategy: float32 components are quantized to 1e-6 integers
(``round(x * 1e6) → bigint``) before any accumulation.  Integer sums are
exact and order-independent, so Spark and the DuckDB oracle agree
bit-for-bit regardless of shuffle order.  (Casting raw doubles to
high-scale decimals is NOT portable: Spark converts via shortest-repr
BigDecimal, DuckDB via scaled double multiply — they disagree in the last
ulps.)  Quantized cosine differs from float cosine by < 1e-5 relative —
irrelevant for retrieval semantics and documented as the operator contract.

Scale path: the probe set is broadcast; the corpus streams through one
narrow projection + explode; top-k per probe is a windowed rank after a
partial aggregation.  No corpus shuffle.  An IVF-style two-stage variant
(route to nearest centroid, search within cluster) is provided in
operators/similarity.py for the 100 TB posture.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..sources.tables import load_table, spread
from .registry import register

_DIM = 64
_N_QUERIES = 5  # vec_id < 5 are the probe vectors
_TOPK = 5
_Q = 1_000_000  # quantization scale: 1e-6 resolution

#: DuckDB-side quantized element accessor (1-based list index, 0-based u).
_QELEM = "CAST(round(CAST({v}.embedding[CAST(u AS INT) + 1] AS DOUBLE) * 1000000, 0) AS BIGINT)"


def _qelem(col):
    """Spark-side quantized element: exact for float32 inputs (float→double
    exact, *1e6 IEEE-identical, half-away-from-zero round in both engines)."""
    return F.round(col.cast("double") * _Q, 0).cast("long")


_NORMS_SQL = f"""
    norms AS (
      SELECT vec_id,
             SUM({_QELEM.format(v='e')} * {_QELEM.format(v='e')}) AS nrm2
      FROM (SELECT vec_id, embedding, unnest(range({_DIM})) AS u
            FROM embeddings) e
      GROUP BY vec_id
    )
"""


@register(
    "ann_bruteforce_cosine_topk",
    f"""
    WITH {_NORMS_SQL},
    dots AS (
      SELECT q.vec_id AS qid, e.vec_id AS nid,
             SUM({_QELEM.format(v='q')} * {_QELEM.format(v='e')}) AS dot
      FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {_N_QUERIES}) q
      JOIN embeddings e ON e.vec_id <> q.vec_id
      CROSS JOIN (SELECT unnest(range({_DIM})) AS u) u
      GROUP BY 1, 2
    ),
    sims AS (
      SELECT d.qid, d.nid,
             CAST(d.dot AS DOUBLE) / (sqrt(CAST(nq.nrm2 AS DOUBLE))
                                      * sqrt(CAST(ne.nrm2 AS DOUBLE))) AS cosine
      FROM dots d
      JOIN norms nq ON d.qid = nq.vec_id
      JOIN norms ne ON d.nid = ne.vec_id
    )
    SELECT qid, nid,
           (CAST(floor(cosine * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0) AS cosine
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                       ORDER BY cosine DESC, nid) AS rn
          FROM sims) t
    WHERE rn <= {_TOPK}
    """,
)
def ann_bruteforce_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k: the exact baseline every ANN variant is
    measured against.  Probe set broadcast; corpus streamed."""
    e = spread(load_table(spark, sf_dir, "embeddings"))
    qvec = F.transform("embedding", lambda x: _qelem(x))
    quant = e.select("vec_id", qvec.alias("qv"))
    norms = (
        quant.select("vec_id", F.explode("qv").alias("x"))
        .groupBy("vec_id")
        .agg(F.sum(F.col("x") * F.col("x")).alias("nrm2"))
    )
    probes = quant.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("qv").alias("qe")
    )
    pairs = quant.join(F.broadcast(probes), F.col("vec_id") != F.col("qid"))
    dots = (
        pairs.select(
            "qid",
            F.col("vec_id").alias("nid"),
            F.explode(F.zip_with("qe", "qv", lambda x, y: x * y)).alias("p"),
        )
        .groupBy("qid", "nid")
        .agg(F.sum("p").alias("dot"))
    )
    nq = norms.select(F.col("vec_id").alias("qid"), F.col("nrm2").alias("nrm2_q"))
    ne = norms.select(F.col("vec_id").alias("nid"), F.col("nrm2").alias("nrm2_n"))
    sims = (
        dots.join(F.broadcast(nq), "qid")
        .join(ne, "nid")
        .select(
            "qid",
            "nid",
            (
                F.col("dot").cast("double")
                / (F.sqrt(F.col("nrm2_q").cast("double")) * F.sqrt(F.col("nrm2_n").cast("double")))
            ).alias("cosine"),
        )
    )
    from ..functions.exact import pround

    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOPK)
        .select("qid", "nid", pround(F.col("cosine"), 6).alias("cosine"))
    )


_NPROBE = 2

_IVF_SQL = f"""
    WITH sums AS (
      -- integer MEAN per (cluster, dim): floor(exact-sum / count) matches
      -- Spark's decimal-sum + floor-div (overflow-safe at any cluster size)
      SELECT label, CAST(u AS INT) AS u,
             CAST(FLOOR(CAST(SUM({_QELEM.format(v='e')}) AS DOUBLE)
                        / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS s
      FROM (SELECT label, embedding, unnest(range({_DIM})) AS u
            FROM embeddings) e
      GROUP BY 1, 2
    ),
    snorm AS (SELECT label, SUM(s * s) AS sn2 FROM sums GROUP BY label),
    pexpl AS (
      SELECT vec_id AS qid, CAST(u AS INT) AS u, {_QELEM.format(v='q')} AS qp
      FROM (SELECT vec_id, embedding, unnest(range({_DIM})) AS u
            FROM embeddings WHERE vec_id < {_N_QUERIES}) q
    ),
    pnorm AS (SELECT qid, SUM(qp * qp) AS pn2 FROM pexpl GROUP BY qid),
    rdots AS (
      SELECT p.qid, s.label, SUM(p.qp * s.s) AS dot
      FROM pexpl p JOIN sums s ON p.u = s.u
      GROUP BY 1, 2
    ),
    routed AS (
      SELECT qid, label FROM (
        SELECT d.qid, d.label,
               ROW_NUMBER() OVER (
                 PARTITION BY d.qid
                 ORDER BY CAST(d.dot AS DOUBLE)
                          / (sqrt(CAST(sn.sn2 AS DOUBLE)) * sqrt(CAST(pn.pn2 AS DOUBLE)))
                          DESC, d.label) AS rn
        FROM rdots d
        JOIN snorm sn ON d.label = sn.label
        JOIN pnorm pn ON d.qid = pn.qid
      ) t WHERE rn <= {_NPROBE}
    ),
    {_NORMS_SQL.strip()},
    dots AS (
      SELECT r.qid, e.vec_id AS nid,
             SUM({_QELEM.format(v='q')} * {_QELEM.format(v='e')}) AS dot
      FROM routed r
      JOIN embeddings e ON e.label = r.label AND e.vec_id <> r.qid
      JOIN (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {_N_QUERIES}) q
        ON q.vec_id = r.qid
      CROSS JOIN (SELECT unnest(range({_DIM})) AS u) u
      GROUP BY 1, 2
    ),
    sims AS (
      SELECT d.qid, d.nid,
             CAST(d.dot AS DOUBLE) / (sqrt(CAST(nq.nrm2 AS DOUBLE))
                                      * sqrt(CAST(ne.nrm2 AS DOUBLE))) AS cosine
      FROM dots d
      JOIN norms nq ON d.qid = nq.vec_id
      JOIN norms ne ON d.nid = ne.vec_id
    )
    SELECT qid, nid,
           (CAST(floor(cosine * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0) AS cosine
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                       ORDER BY cosine DESC, nid) AS rn
          FROM sims) t
    WHERE rn <= {_TOPK}
"""


@register("ann_ivf_cosine_topk", _IVF_SQL)
def ann_ivf_cosine_topk(spark, sf_dir):
    """IVF two-stage ANN (operators/similarity.py:ivf_topk): route each
    probe to its nprobe=2 nearest cluster sum-vectors (labels = coarse
    clusters), exact quantized-cosine top-k inside routed clusters only.
    At 100 TB the corpus is partitioned by cluster id so stage 2 is a
    partition-pruned scan of nprobe/nclusters of the data."""
    from ..functions.exact import pround
    from ..operators.similarity import ivf_topk

    e = spread(load_table(spark, sf_dir, "embeddings"))
    probes = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    out = ivf_topk(e, probes, k=_TOPK, nprobe=_NPROBE)
    return out.select("qid", F.col("vec_id").alias("nid"), pround(F.col("cosine"), 6).alias("cosine"))


@register(
    "embedding_centroids",
    f"""
    SELECT label, CAST(u AS INT) AS pos,
           CAST(SUM({_QELEM.format(v='e')}) AS DOUBLE)
             / (1000000.0 * CAST(COUNT(*) AS DOUBLE)) AS centroid
    FROM (SELECT label, embedding, unnest(range({_DIM})) AS u FROM embeddings) e
    GROUP BY label, CAST(u AS INT)
    """,
)
def embedding_centroids(spark, sf_dir):
    """Per-label centroid vector (exploded form) — the building block of
    IVF coarse quantization / k-means mean updates at scale."""
    e = spread(load_table(spark, sf_dir, "embeddings"))
    return (
        e.select("label", F.posexplode("embedding").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(
            (
                # decimal accumulate: exact at any cluster population (the
                # DuckDB twin's SUM(BIGINT) is HUGEINT — also exact)
                F.sum(_qelem(F.col("x")).cast("decimal(28,0)")).cast("double")
                / (F.lit(float(_Q)) * F.count(F.lit(1)).cast("double"))
            ).alias("centroid")
        )
        .select("label", F.col("pos").cast("int").alias("pos"), "centroid")
    )


# --------------------------------------------------------------------------
# IVF over the ACTUAL 100 TB layout: the corpus materialized as a
# hive-partitioned parquet store (one directory per coarse cluster), so
# the routed stage-2 search is a partition-PRUNED scan — Spark's dynamic
# partition pruning turns the broadcast routing relation into a runtime
# partition filter, and only nprobe/nclusters of the store's files are
# read.  Same semantics (and the same oracle) as ann_ivf_cosine_topk; the
# difference under test is the STORAGE-side plan shape, pinned by
# tests/test_plans.py::test_ivf_partitioned_store_prunes.
# The store is built once per (process, sf_dir) — the "build the index
# once, query it many times" contract of a vector store.
# --------------------------------------------------------------------------
_IVF_STORES: dict[str, str] = {}


def _ivf_store_path(spark, sf_dir: str) -> str:
    path = _IVF_STORES.get(sf_dir)
    if path is None:
        import os

        from ..scratch import scratch_dir

        path = os.path.join(scratch_dir("spark_graft_ivf_store_"), "embeddings_by_label")
        (
            load_table(spark, sf_dir, "embeddings")
            .write.mode("overwrite")
            .partitionBy("label")
            .parquet(path)
        )
        _IVF_STORES[sf_dir] = path
    return path


@register("ann_ivf_partitioned_store", _IVF_SQL)
def ann_ivf_partitioned_store(spark, sf_dir):
    from ..functions.exact import pround
    from ..operators.similarity import ivf_topk

    store = spark.read.parquet(_ivf_store_path(spark, sf_dir))
    probes = store.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    out = ivf_topk(store, probes, k=_TOPK, nprobe=_NPROBE)
    return out.select(
        "qid", F.col("vec_id").alias("nid"), pround(F.col("cosine"), 6).alias("cosine")
    )


# --------------------------------------------------------------------------
# k-NN classification — the simplest similarity-backed model: predict a
# probe's label by majority vote among its K nearest labeled neighbors
# (Cover & Hart '67).  Reuses the brute-force quantized-cosine machinery
# (probes broadcast, corpus streamed, no corpus shuffle); the vote is a
# (qid, label) aggregate over K*|probes| rows.  Tiebreaks are total:
# neighbors rank by (cosine DESC, nid), labels win by (votes DESC,
# best_rank ASC, label ASC) — deterministic in both engines.  At 100 TB
# the brute-force candidate stage swaps for the IVF/LSH routers above;
# the vote is unchanged.
# --------------------------------------------------------------------------
_KNN_K = 10


@register(
    "knn_label_classifier",
    f"""
    WITH {_NORMS_SQL},
    dots AS (
      SELECT q.vec_id AS qid, e.vec_id AS nid, e.label,
             SUM({_QELEM.format(v='q')} * {_QELEM.format(v='e')}) AS dot
      FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {_N_QUERIES}) q
      JOIN embeddings e ON e.vec_id >= {_N_QUERIES}
      CROSS JOIN (SELECT unnest(range({_DIM})) AS u) u
      GROUP BY 1, 2, 3
    ),
    sims AS (
      SELECT d.qid, d.nid, d.label,
             CAST(d.dot AS DOUBLE) / (sqrt(CAST(nq.nrm2 AS DOUBLE))
                                      * sqrt(CAST(ne.nrm2 AS DOUBLE))) AS cosine
      FROM dots d
      JOIN norms nq ON d.qid = nq.vec_id
      JOIN norms ne ON d.nid = ne.vec_id
    ),
    topk AS (
      SELECT qid, label,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY cosine DESC, nid) AS rn
      FROM sims
    ),
    votes AS (
      SELECT qid, label, CAST(COUNT(*) AS BIGINT) AS n_votes,
             CAST(MIN(rn) AS BIGINT) AS best_rank
      FROM topk WHERE rn <= {_KNN_K} GROUP BY qid, label
    )
    SELECT qid, label AS pred_label, n_votes, best_rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                       ORDER BY n_votes DESC, best_rank, label) AS vr
          FROM votes) t
    WHERE vr = 1
    """,
)
def knn_label_classifier(spark, sf_dir):
    """k-NN (K=10) label prediction for the probe vectors by majority
    vote over quantized-cosine nearest neighbors; brute-force candidate
    stage (probes broadcast, corpus streamed), hash-aggregate vote."""
    e = spread(load_table(spark, sf_dir, "embeddings"))
    qvec = F.transform("embedding", lambda x: _qelem(x))
    quant = e.select("vec_id", "label", qvec.alias("qv"))
    norms = (
        quant.select("vec_id", F.explode("qv").alias("x"))
        .groupBy("vec_id")
        .agg(F.sum(F.col("x") * F.col("x")).alias("nrm2"))
    )
    probes = quant.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("qv").alias("qe")
    )
    train = quant.filter(F.col("vec_id") >= _N_QUERIES)
    pairs = train.crossJoin(F.broadcast(probes))
    dots = (
        pairs.select(
            "qid",
            F.col("vec_id").alias("nid"),
            "label",
            F.explode(F.zip_with("qe", "qv", lambda x, y: x * y)).alias("p"),
        )
        .groupBy("qid", "nid", "label")
        .agg(F.sum("p").alias("dot"))
    )
    nq = norms.select(F.col("vec_id").alias("qid"), F.col("nrm2").alias("nrm2_q"))
    ne = norms.select(F.col("vec_id").alias("nid"), F.col("nrm2").alias("nrm2_n"))
    sims = (
        dots.join(F.broadcast(nq), "qid")
        .join(ne, "nid")
        .select(
            "qid",
            "nid",
            "label",
            (
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("nrm2_q").cast("double"))
                    * F.sqrt(F.col("nrm2_n").cast("double"))
                )
            ).alias("cosine"),
        )
    )
    wk = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    votes = (
        sims.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= _KNN_K)
        .groupBy("qid", "label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_votes"),
            F.min("rn").cast("long").alias("best_rank"),
        )
    )
    wv = W.partitionBy("qid").orderBy(
        F.desc("n_votes"), F.asc("best_rank"), F.asc("label")
    )
    return (
        votes.withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
        .select("qid", F.col("label").alias("pred_label"), "n_votes", "best_rank")
    )
