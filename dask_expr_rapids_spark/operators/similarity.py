"""Reusable similarity-search operators over embedding DataFrames
(``array<float>`` column + integer id) — the scale path behind the
``ann_*`` queries in ``queries/similarity.py``.

Not in the reference (its surface stops at the pandas algebra,
``/root/reference/dask_expr/_collection.py``); this is the LLM-data
extension layer (SURVEY.md §7 phase 4).

Determinism contract: vectors are quantized to 1e-6 integers first; all
dot products / norms are exact BIGINT sums (order-independent), so results
are identical across shuffle orders and engines.

Scale design (100 TB / 1000-executor posture):

* the probe set is always broadcast — the corpus is never shuffled for
  brute force, only scanned once;
* IVF routing means each probe touches ``nprobe/nclusters`` of the corpus;
  with the corpus parquet partitioned (or bucketed) by cluster id, the
  routed search prunes partitions at the scan — the cluster assignment
  column is the index;
* per-probe top-k is a ``row_number`` window over (probe, candidate) pairs
  — cardinality ≤ probes × routed-corpus, never corpus².
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

#: quantization scale (1e-6 resolution) — float32 inputs survive exactly:
#: float→double is exact, ×1e6 is IEEE-identical everywhere, and
#: half-away-from-zero rounding matches DuckDB's ``round``.
Q_SCALE = 1_000_000


def quantize(col) -> Column:
    """``array<float>`` → ``array<bigint>`` at 1e-6 resolution."""
    return F.transform(col, lambda x: F.round(x.cast("double") * Q_SCALE, 0).cast("long"))


def _isum(arr) -> Column:
    return F.aggregate(arr, F.lit(0).cast("long"), lambda acc, x: acc + x)


def dot_q(a, b) -> Column:
    """Exact integer dot product of two quantized vectors."""
    return _isum(F.zip_with(a, b, lambda x, y: x * y))


def norm2_q(a) -> Column:
    """Exact integer squared norm of a quantized vector."""
    return _isum(F.transform(a, lambda x: x * x))


def cosine_q(a, b) -> Column:
    """Cosine from quantized vectors: exact integer dot/norms, one final
    double division — bit-identical across engines and shuffle orders."""
    return dot_q(a, b).cast("double") / (
        F.sqrt(norm2_q(a).cast("double")) * F.sqrt(norm2_q(b).cast("double"))
    )


def brute_force_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id: str = "qid",
) -> DataFrame:
    """Exact cosine top-k: broadcast probes against the streamed corpus.

    ``probes`` must carry (`probe_id`, `vec_col`).  Returns
    (probe_id, id_col, cosine) with deterministic tie-break on id.
    """
    c = corpus.select(F.col(id_col), quantize(F.col(vec_col)).alias("__qv__"))
    p = probes.select(F.col(probe_id), quantize(F.col(vec_col)).alias("__qp__"))
    pairs = c.join(F.broadcast(p), F.col(id_col) != F.col(probe_id))
    sims = pairs.select(
        probe_id, id_col, cosine_q(F.col("__qp__"), F.col("__qv__")).alias("cosine")
    )
    w = W.partitionBy(probe_id).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        sims.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= k)
        .drop("__rn__")
    )


def cluster_sums(
    corpus: DataFrame,
    cluster_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Integer MEAN vector per cluster as (cluster, sv array<bigint>, sn2).

    Routing uses the centroid mean, not the raw sum: a raw sum-vector's
    entries grow with cluster size, and its squared norm overflows BIGINT
    at ~10× the driver SF (found by the sf1 rehearsal,
    scripts/scale_rehearsal.py).  The mean keeps entries at probe scale
    (~Q_SCALE × |value|) REGARDLESS of cluster population, so the integer
    dot/norm stay in range at any corpus size; values up to |v|≈380 are
    safe at dim 64 (Q_SCALE² × v² × dim < 2⁶³).

    Exactness: per-dim sums accumulate in DECIMAL(28,0) — exact and
    order-independent at any cluster size (a BIGINT sum itself overflows
    around 10¹¹ members × unit values) — then one floor-division to the
    integer mean.  floor(exact_int_as_double / n) is IEEE-deterministic,
    so Spark and the DuckDB oracle agree bit-for-bit.

    One corpus pass (posexplode → partial-agg by (cluster, dim)), then
    re-assembled into a dense array so downstream routing is a tiny
    broadcast relation of nclusters rows.
    """
    per_dim = (
        corpus.select(F.col(cluster_col), F.posexplode(quantize(F.col(vec_col))).alias("u", "x"))
        .groupBy(cluster_col, "u")
        .agg(
            F.floor(
                F.sum(F.col("x").cast("decimal(28,0)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("s")
        )
    )
    return per_dim.groupBy(cluster_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("u", "s"))), lambda st: st["s"]
        ).alias("sv")
    ).withColumn("sn2", norm2_q(F.col("sv")))


def kmeans_assign(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "cluster",
) -> DataFrame:
    """Deterministic Lloyd k-means over quantized vectors — the coarse
    quantizer that gives IVF real geometric clusters when no cluster
    column exists in the data.

    Init = the ``k`` lowest-id vectors (seedless, reproducible).  Each
    iteration: assign every vector to its nearest centroid (squared-L2 on
    quantized ints — exact), recompute centroid means per dimension.  The
    centroid relation is k×dim — always broadcast; the corpus is scanned
    once per iteration, never shuffled except the (id → cluster) partial
    agg.  ``iters`` is a small constant: this is a quantizer, not a
    convergence-grade clustering.
    """
    if iters < 1:
        raise ValueError("kmeans_assign requires iters >= 1")
    q = corpus.select(F.col(id_col), quantize(F.col(vec_col)).alias("__qv__"))
    # seed = the k lowest ids actually present (works for sparse/offset ids,
    # e.g. a filtered corpus) — k×dim rows, trivially collected by limit
    cents = (
        q.orderBy(F.asc(id_col))
        .limit(k)
        .select(F.col(id_col).alias("__cid__"), F.col("__qv__").alias("__cv__"))
    )
    for _ in range(iters):
        d2 = _isum(F.zip_with("__qv__", "__cv__", lambda x, y: (x - y) * (x - y)))
        assign = (
            q.crossJoin(F.broadcast(cents))
            .withColumn("__d2__", d2)
            .withColumn(
                "__rn__",
                F.row_number().over(
                    W.partitionBy(id_col).orderBy(F.asc("__d2__"), F.asc("__cid__"))
                ),
            )
            .filter(F.col("__rn__") == 1)
            .select(id_col, "__cid__", "__qv__")
        )
        per_dim = (
            assign.select("__cid__", F.posexplode("__qv__").alias("u", "x"))
            .groupBy("__cid__", "u")
            .agg(F.avg("x").alias("m"))
        )
        cents = per_dim.groupBy("__cid__").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("u", "m"))),
                lambda st: F.round(st["m"], 0).cast("long"),
            ).alias("__cv__")
        )
    return assign.select(F.col(id_col), F.col("__cid__").alias(out_col))


def ivf_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int,
    nprobe: int = 2,
    cluster_col: str = "label",
    id_col: str = "vec_id",
    probe_id: str = "qid",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style two-stage ANN: route each probe to its ``nprobe`` nearest
    cluster sum-vectors, then exact top-k within the routed clusters only.

    At scale the corpus should be stored partitioned by ``cluster_col`` so
    stage 2 is a partition-pruned scan; stage 1 touches only
    nclusters × dim integers.
    """
    sums = cluster_sums(corpus, cluster_col, id_col, vec_col)
    pq = probes.select(F.col(probe_id), quantize(F.col(vec_col)).alias("__qp__"))
    # routing relation = probes × nclusters rows — all array math, no explode
    route_cos = pq.crossJoin(F.broadcast(sums)).select(
        probe_id,
        cluster_col,
        (
            dot_q(F.col("__qp__"), F.col("sv")).cast("double")
            / (
                F.sqrt(F.col("sn2").cast("double"))
                * F.sqrt(norm2_q(F.col("__qp__")).cast("double"))
            )
        ).alias("rcos"),
    )
    wr = W.partitionBy(probe_id).orderBy(F.desc("rcos"), F.asc(cluster_col))
    routed = (
        route_cos.withColumn("__rn__", F.row_number().over(wr))
        .filter(F.col("__rn__") <= nprobe)
        .select(probe_id, cluster_col)
    )
    # stage 2: exact search restricted to routed clusters
    c = corpus.select(
        F.col(cluster_col), F.col(id_col), quantize(F.col(vec_col)).alias("__qv__")
    )
    p = probes.select(F.col(probe_id), quantize(F.col(vec_col)).alias("__qp__"))
    cand = (
        c.join(F.broadcast(routed), cluster_col)
        .join(F.broadcast(p), probe_id)
        .filter(F.col(id_col) != F.col(probe_id))
    )
    sims = cand.select(
        probe_id, id_col, cosine_q(F.col("__qp__"), F.col("__qv__")).alias("cosine")
    )
    w = W.partitionBy(probe_id).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        sims.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= k)
        .drop("__rn__")
    )
