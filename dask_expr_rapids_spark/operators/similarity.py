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

import pandas as pd  # module-level: pandas_udf type hints resolve under
# `from __future__ import annotations` only if `pd` is importable at
# decoration time (see spark-graft gotchas)
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


# --------------------------------------------------------------------------
# Product quantization (PQ) — the memory-scale ANN path (Jégou et al.,
# "Product Quantization for Nearest Neighbor Search", TPAMI 2011).  IVF
# prunes WHICH vectors are scanned; PQ shrinks WHAT is scanned: a dim-D
# vector becomes m one-byte codes (D=64 → 8 bytes vs 256), so a 100 TB
# embedding corpus compresses ~30× and candidate scoring reads codes, not
# vectors.  Asymmetric distance computation (ADC): each probe precomputes
# a per-subspace lookup table against the codebooks; scoring a candidate
# is m array lookups — no per-pair vector math.
# --------------------------------------------------------------------------


def pq_train(
    corpus: DataFrame,
    m: int = 8,
    ksub: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    arrow_encode: bool = False,
) -> list[list[list[int]]]:
    """Deterministic per-subspace Lloyd codebooks:
    ``codebooks[sub][code] = quantized centroid (dim/m ints)``.

    The codebook relation is m × ksub × (dim/m) integers — driver-tiny by
    construction (like any k-means quantizer, centroids round-trip through
    the driver per iteration; Spark MLlib's KMeans does the same).  The
    CORPUS is only scanned: assignment is a pure per-row projection against
    centroid literals (no join, no shuffle), and the centroid update is one
    map-side-combinable (sub, code, dim) mean agg per iteration.  Exact
    integer means via DECIMAL sums + floor division (order-independent —
    the cluster_sums overflow lesson).

    Init is seedless: code c of subspace j starts at the (c+1)-th
    lowest-id vector's j-th subvector.
    """
    if iters < 1:
        raise ValueError("pq_train requires iters >= 1")
    q = corpus.select(F.col(id_col).alias("__id__"), quantize(F.col(vec_col)).alias("__qv__"))
    first = q.select(F.size("__qv__").alias("d")).first()
    if first is None:
        raise ValueError("pq_train: empty corpus")
    dim = first["d"]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    ds = dim // m
    seed_rows = q.orderBy(F.asc("__id__")).limit(ksub).collect()
    if len(seed_rows) < ksub:
        raise ValueError(f"pq_train: need >= ksub={ksub} vectors, got {len(seed_rows)}")
    books = [
        [list(seed_rows[c]["__qv__"][j * ds : (j + 1) * ds]) for c in range(ksub)]
        for j in range(m)
    ]
    for _ in range(iters):
        codes = (
            _pq_codes_arrow(books, ds) if arrow_encode else _pq_codes_expr(books, ds)
        )
        # the codes projection and the generator live in SEPARATE selects:
        # Spark's ExtractGenerator rewrite of a Project containing a
        # generator re-plans sibling expressions pre-name-resolution,
        # dropping the argmin structs' field names (FIELD_NOT_FOUND `c`)
        per_dim = (
            q.select(codes.alias("__codes__"), "__qv__")
            .select("__codes__", F.posexplode("__qv__").alias("u", "x"))
            .select(
                (F.col("u") / ds).cast("int").alias("sub"),
                F.element_at("__codes__", (F.col("u") / ds).cast("int") + 1).alias("code"),
                (F.col("u") % ds).alias("i"),
                "x",
            )
            .groupBy("sub", "code", "i")
            .agg(
                F.floor(
                    F.sum(F.col("x").cast("decimal(28,0)")).cast("double")
                    / F.count(F.lit(1)).cast("double")
                ).alias("mean")
            )
            .collect()
        )
        new = [[list(books[j][c]) for c in range(ksub)] for j in range(m)]
        for r in per_dim:  # empty codes keep their previous centroid
            new[r["sub"]][r["code"]][r["i"]] = int(r["mean"])
        books = new
    return books


def _book_lit(book_j: list[list[int]]) -> Column:
    """Codebook of one subspace as a literal array<array<bigint>> column."""
    return F.array(*[F.array(*[F.lit(int(v)).cast("long") for v in c]) for c in book_j])


def _pq_codes_arrow(books: list[list[list[int]]], ds: int) -> Column:
    """Arrow-vectorized twin of :func:`_pq_codes_expr` for large corpora.

    The HOF form evaluates ~m·ksub·ds (=1024 at the defaults) interpreted
    lambda nodes per row (higher-order functions never enter codegen), so
    encoding dominates PQ cost once the corpus passes ~100k vectors
    (ann_pq was the most expensive non-output-bound query of the sf10
    rehearsal at 49 s).  This path computes the same argmin in one numpy
    batch per Arrow chunk: distances in int64 (exact — quantized values
    ≤ ~1e6, ds=8 terms, far under 2^63), ``np.argmin`` returns the FIRST
    minimum (ties to the lowest code, same rule as
    ``array_position(d2s, array_min(d2s))``), so the codes are
    bit-identical to the HOF form — pinned by
    tests/test_scale_ops.py::test_pq_arrow_encode_matches_hof."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    m = len(books)
    # (m, ksub, ds) int64 codebook tensor, broadcast with the task binary
    bk = np.asarray(books, dtype=np.int64)

    @pandas_udf("array<int>")
    def _encode(qv: pd.Series) -> pd.Series:
        x = np.asarray(qv.to_list(), dtype=np.int64)  # (n, m*ds)
        n = x.shape[0]
        sub = x.reshape(n, m, ds)  # (n, m, ds)
        # (n, m, ksub, ds) diffs would be large; loop over m (small) and
        # vectorize over (n, ksub, ds) — exact int64 arithmetic
        codes = np.empty((n, m), dtype=np.int32)
        for j in range(m):
            d = sub[:, j, None, :] - bk[j][None, :, :]  # (n, ksub, ds)
            d2 = np.einsum("nkd,nkd->nk", d, d)  # int64 exact
            codes[:, j] = np.argmin(d2, axis=1)  # first min = lowest code
        return pd.Series(list(codes))

    return _encode(F.col("__qv__"))


def _pq_codes_expr(books: list[list[list[int]]], ds: int) -> Column:
    """array<int> of per-subspace nearest-codebook codes for the row's
    ``__qv__``.

    Built with higher-order array functions (slice → transform over the
    literal codebook → zip_with squared diffs), NOT an unrolled
    element_at sum: the unrolled form is m·ksub·ds (≥1024) expression
    nodes, which overflows janino's 64 KB generated-method limit — at sf1
    every task paid a failed codegen compile before falling back to the
    interpreter (52 s for a 20k-vector corpus).  The HOF tree is ~30
    nodes per subspace and evaluates Arrow-speed vectorized.  Argmin tie
    rule: ``array_position(d2s, array_min(d2s))`` returns the FIRST
    minimum — ties break to the lowest code, same as the struct-ordering
    form it replaces."""
    def _sq_dist_to(s):
        return lambda c: _isum(F.zip_with(s, c, lambda x, y: (x - y) * (x - y)))

    cols = []
    for j, book_j in enumerate(books):
        sub = F.slice(F.col("__qv__"), j * ds + 1, ds)
        d2s = F.transform(_book_lit(book_j), _sq_dist_to(sub))
        cols.append((F.array_position(d2s, F.array_min(d2s)) - 1).cast("int"))
    return F.array(*cols)


def pq_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int,
    m: int = 8,
    ksub: int = 16,
    iters: int = 2,
    rerank: int = 4,
    id_col: str = "vec_id",
    probe_id: str = "qid",
    vec_col: str = "embedding",
    arrow_encode: bool = False,
) -> DataFrame:
    """ADC cosine top-k with exact re-ranking: train codebooks, encode the
    corpus to m codes (+ a reconstructed-norm column), build per-probe
    dot-product lookup tables, score candidates with m integer lookups
    each, then re-score the per-probe ADC shortlist (k × ``rerank``
    candidates) against the TRUE vectors — the standard IVFADC+R shape:
    quantization error decides only which ~4k rows reach the exact pass,
    not the final ranking.

    Scale shape: the encoded corpus is the only big relation (id + m
    bytes + one bigint — this IS the compressed index you'd persist);
    probes ride broadcast with their tables; ADC scoring is a narrow
    projection; the exact pass touches probes × k × rerank rows — a
    semi-join-sized fetch from the full-vector store, never a scan.  No
    corpus shuffle anywhere.  ``rerank=0`` returns raw ADC scores.
    """
    books = pq_train(
        corpus,
        m=m,
        ksub=ksub,
        iters=iters,
        id_col=id_col,
        vec_col=vec_col,
        arrow_encode=arrow_encode,
    )
    ds = len(books[0][0])
    q = corpus.select(F.col(id_col), quantize(F.col(vec_col)).alias("__qv__"))
    # reconstructed squared norm = sum of codebook-entry norms (exact ints)
    cn2 = [[sum(v * v for v in books[j][c]) for c in range(len(books[0]))] for j in range(m)]
    enc = q.select(
        F.col(id_col),
        (
            _pq_codes_arrow(books, ds) if arrow_encode else _pq_codes_expr(books, ds)
        ).alias("__codes__"),
    ).withColumn(
        "__rn2__",
        sum(
            F.element_at(F.array(*[F.lit(x) for x in cn2[j]]), F.col("__codes__")[j] + 1)
            for j in range(m)
        ),
    )
    # per-probe ADC tables: table[j][c] = dot(probe subvector j, codebook[j][c])
    # — same HOF shape as the codes expression (see _pq_codes_expr note)
    p = probes.select(F.col(probe_id), quantize(F.col(vec_col)).alias("__qv__"))

    def _dot_with(s):
        return lambda c: _isum(F.zip_with(s, c, lambda x, y: x * y))

    def dot_table(j: int) -> Column:
        sub = F.slice(F.col("__qv__"), j * ds + 1, ds)
        return F.transform(_book_lit(books[j]), _dot_with(sub))

    pt = p.select(
        F.col(probe_id),
        norm2_q(F.col("__qv__")).alias("__pn2__"),
        *[dot_table(j).alias(f"__t{j}__") for j in range(m)],
    )
    scored = enc.join(F.broadcast(pt), F.col(id_col) != F.col(probe_id)).select(
        probe_id,
        id_col,
        (
            sum(
                F.element_at(f"__t{j}__", F.col("__codes__")[j] + 1) for j in range(m)
            ).cast("double")
            / (
                F.sqrt(F.col("__pn2__").cast("double"))
                * F.sqrt(F.col("__rn2__").cast("double"))
            )
        ).alias("pq_cosine"),
    )
    w = W.partitionBy(probe_id).orderBy(F.desc("pq_cosine"), F.asc(id_col))
    if not rerank:
        return (
            scored.withColumn("__rn__", F.row_number().over(w))
            .filter(F.col("__rn__") <= k)
            .drop("__rn__")
        )
    shortlist = (
        scored.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= k * rerank)
        .select(probe_id, id_col)
    )
    # exact pass: fetch true vectors for the shortlist only (broadcast —
    # probes × k × rerank rows), score with the exact integer cosine
    exact = (
        q.join(F.broadcast(shortlist), id_col)
        .join(F.broadcast(p.select(F.col(probe_id), F.col("__qv__").alias("__qp__"))), probe_id)
        .select(probe_id, id_col, cosine_q(F.col("__qp__"), F.col("__qv__")).alias("pq_cosine"))
    )
    we = W.partitionBy(probe_id).orderBy(F.desc("pq_cosine"), F.asc(id_col))
    return (
        exact.withColumn("__rn__", F.row_number().over(we))
        .filter(F.col("__rn__") <= k)
        .drop("__rn__")
    )
