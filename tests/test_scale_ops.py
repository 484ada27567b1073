"""Scale-path operators: salting equivalence (salted result == plain
result), the timeseries generator's determinism, and similarity operators'
agreement with each other."""

from __future__ import annotations

import pyspark.sql.functions as F

from dask_expr_rapids_spark.operators.similarity import brute_force_topk, ivf_topk
from dask_expr_rapids_spark.operators.skew import salted_groupby_agg, salted_join
from dask_expr_rapids_spark.sources.tables import load_table, timeseries

from .conftest import SF_DIR, canonical_rows


def _same(df1, df2, name):
    assert canonical_rows(df1.toPandas()) == canonical_rows(df2.toPandas()), name


def test_salted_groupby_matches_plain(spark):
    e = load_table(spark, SF_DIR, "events")
    salted = salted_groupby_agg(
        e,
        ["event_type"],
        stage1={
            "n": F.count(F.lit(1)),
            "users": F.collect_set("user_id"),
            "mx": F.max("value"),
        },
        stage2={
            "n": F.sum("n"),
            "users": F.size(F.array_distinct(F.flatten(F.collect_list("users")))),
            "mx": F.max("mx"),
        },
        salt_cols=["event_id"],
        buckets=8,
    )
    plain = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("users"),
        F.max("value").alias("mx"),
    )
    _same(salted, plain, "salted_groupby")


def test_salted_join_matches_plain(spark):
    o = load_table(spark, SF_DIR, "orders")
    c = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_mktsegment")
    plain = o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "c_mktsegment"
    )
    salted = salted_join(
        o.withColumnRenamed("o_custkey", "c_custkey"), c, on="c_custkey", buckets=4
    ).select("o_orderkey", "c_mktsegment")
    _same(salted, plain, "salted_join")


def test_timeseries_generator(spark):
    df = timeseries(spark, start="2024-01-01", n_rows=1000, freq_seconds=60)
    assert df.count() == 1000
    row = df.orderBy("timestamp").first()
    assert str(row["timestamp"]).startswith("2024-01-01 00:00")
    # deterministic: same seed → same content
    df2 = timeseries(spark, start="2024-01-01", n_rows=1000, freq_seconds=60)
    _same(df, df2, "timeseries determinism")
    # columns and ranges
    stats = df.agg(
        F.min("x").alias("xmin"), F.max("x").alias("xmax"), F.countDistinct("name").alias("nn")
    ).first()
    assert -1.0 <= stats["xmin"] <= stats["xmax"] <= 1.0
    assert stats["nn"] > 10


def test_ivf_recall_with_kmeans_clusters(spark):
    """IVF routed over k-means geometric clusters (the real coarse
    quantizer) must recover a solid fraction of the exact top-k even on
    this near-uniform synthetic corpus; the floor guards regressions."""
    from dask_expr_rapids_spark.operators.similarity import kmeans_assign

    e = load_table(spark, SF_DIR, "embeddings")
    clusters = kmeans_assign(e, k=6, iters=2)
    corpus = e.join(clusters, "vec_id")
    probes = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    exact = {
        (r["qid"], r["vec_id"])
        for r in brute_force_topk(e, probes, k=5).collect()
    }
    approx = {
        (r["qid"], r["vec_id"])
        for r in ivf_topk(corpus, probes, k=5, nprobe=3, cluster_col="cluster").collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall collapsed: {recall}"


def test_pq_recall_and_determinism(spark):
    """PQ/ADC top-k must (a) recover a solid fraction of the exact top-k —
    a compressed index that retrieves noise is worthless — and (b) be
    bit-stable across invocations (integer codebooks + integer lookup
    tables; the only doubles are the final cosine divisions)."""
    from dask_expr_rapids_spark.operators.similarity import pq_topk

    e = load_table(spark, SF_DIR, "embeddings")
    probes = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    exact = {
        (r["qid"], r["vec_id"])
        for r in brute_force_topk(e, probes, k=5).collect()
    }
    got1 = sorted(
        (r["qid"], r["vec_id"], r["pq_cosine"])
        for r in pq_topk(e, probes, k=5, m=8, ksub=16, iters=2, rerank=8).collect()
    )
    approx = {(q, v) for q, v, _ in got1}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"PQ recall collapsed: {recall}"
    got2 = sorted(
        (r["qid"], r["vec_id"], r["pq_cosine"])
        for r in pq_topk(e, probes, k=5, m=8, ksub=16, iters=2, rerank=8).collect()
    )
    assert got1 == got2  # deterministic end-to-end


def test_embedding_dedup_bucket_fanout_bounded(spark):
    """The banded-LSH candidate stage caps every (band, bkey) bucket, so
    per-bucket self-join work is <= cap^2 under ANY key skew — the 100-TB
    guarantee behind dedup_embedding_cosine."""
    from dask_expr_rapids_spark.queries.dedup_ext import _emb_banded_capped

    e = load_table(spark, SF_DIR, "embeddings")
    # force a pathological cap to prove the bound binds (not just that data
    # happens to be small)
    capped = _emb_banded_capped(e, cap=3)
    sizes = capped.groupBy("band", "bkey").count().agg(F.max("count")).collect()[0][0]
    assert sizes <= 3
    # default cap: bound also holds, and at this scale it never binds, so
    # the capped candidate set equals the uncapped one (no recall loss)
    default = _emb_banded_capped(e)
    max_default = default.groupBy("band", "bkey").count().agg(F.max("count")).collect()[0][0]
    from dask_expr_rapids_spark.queries.dedup_ext import _BUCKET_CAP

    assert max_default <= _BUCKET_CAP
    n_bands_rows = e.count() * 8
    assert default.count() == n_bands_rows  # nothing dropped at test scale


def test_connected_components_chain_and_clique(spark):
    """Min-label propagation with path halving: chains (worst case for
    plain propagation) and cliques both converge; labels = min reachable
    id; isolated pairs stay separate."""
    from dask_expr_rapids_spark.operators.graph import (
        component_summary,
        connected_components,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (20, 21), (21, 22), (20, 22)],
        "src long, dst long",
    )
    labels = {r["node"]: r["comp"] for r in connected_components(edges).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}
    summary = {r["comp"]: (r["n_members"], r["canonical"])
               for r in component_summary(connected_components(edges)).collect()}
    assert summary == {1: (5, 1), 10: (2, 10), 20: (3, 20)}


def test_cc_loop_partitions_scale_with_edges():
    """The CC iteration state must spread over more partitions as the edge
    list grows (reference parity: its shuffles scale stages with
    npartitions, dask_expr/_shuffle.py:348-363 — a fixed cap never appears
    there).  Floor 8 at rehearsal scale; ~64 MB of edges per partition
    beyond it."""
    from dask_expr_rapids_spark.operators.graph import (
        _EDGES_PER_PARTITION,
        _loop_partitions,
    )

    assert _loop_partitions(0) == 8
    assert _loop_partitions(1_000) == 8
    assert _loop_partitions(8 * _EDGES_PER_PARTITION) == 8
    assert _loop_partitions(9 * _EDGES_PER_PARTITION) == 9
    # 100 TB posture: billions of edges → thousands of tasks per round
    assert _loop_partitions(5_000_000_000) == 2000
    # monotone in edge count
    sizes = [_loop_partitions(n) for n in (0, 10**6, 10**8, 10**9, 10**10)]
    assert sizes == sorted(sizes)


def test_hash_sample_deterministic_under_repartition(spark):
    """Membership is a pure function of the key: any partitioning of the
    same rows yields the SAME sample — the reproducibility contract
    df.sample (per-partition seeded) cannot give."""
    from dask_expr_rapids_spark.operators.sampling import hash_sample

    df = spark.range(2000).withColumnRenamed("id", "k")
    s1 = {r["k"] for r in hash_sample(df, "k", 0.3).collect()}
    s2 = {r["k"] for r in hash_sample(df.repartition(17), "k", 0.3).collect()}
    assert s1 == s2
    assert 0.25 < len(s1) / 2000 < 0.35  # Bernoulli(0.3) within tolerance


def test_stratified_take_exact_counts(spark):
    from pyspark.sql import functions as F

    from dask_expr_rapids_spark.operators.sampling import stratified_take

    d = load_table(spark, SF_DIR, "documents").select("doc_id", "source")
    took = stratified_take(d, "source", k=5, key="doc_id")
    counts = took.groupBy("source").count().collect()
    assert all(r["count"] == 5 for r in counts)
    # deterministic: same selection on re-run
    a = {r["doc_id"] for r in took.collect()}
    b = {r["doc_id"] for r in stratified_take(d.repartition(7), "source", k=5, key="doc_id").collect()}
    assert a == b


def test_connected_components_random_graphs_vs_union_find(spark):
    """Differential: CC labels on seeded pseudo-random graphs must equal a
    pure-Python union-find — guards the loop's init/propagation/halving
    against structural regressions (chains, stars, merged stars, cycles)."""
    import random

    from dask_expr_rapids_spark.operators.graph import connected_components

    def union_find_labels(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # canonical label = min node of the component
        return {n: find(n) for n in parent}

    rng = random.Random(20260814)
    for trial in range(3):
        n_nodes = rng.randrange(20, 60)
        n_edges = rng.randrange(10, 80)
        edges = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        want = union_find_labels(edges)
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r["node"]: r["comp"] for r in connected_components(df).collect()}
        assert got == want, f"trial {trial}: {sorted(set(got.items()) ^ set(want.items()))}"


def test_compaction_sizes_from_measured_bytes(spark, tmp_path):
    """compact_parquet must fold a fragmented dataset into
    ceil(bytes/target) files — sized from the measured input, never a
    constant — while the data survives byte-exact (query oracle covers
    content; this pins the file mechanics)."""
    from dask_expr_rapids_spark.sources.compaction import (
        compact_parquet,
        dataset_bytes,
        dataset_file_count,
    )

    d = load_table(spark, SF_DIR, "documents")
    frag = str(tmp_path / "frag")
    d.repartition(32).write.parquet(frag)
    assert dataset_file_count(spark, frag) == 32
    total = dataset_bytes(spark, frag)
    out = str(tmp_path / "out")
    back = compact_parquet(spark, frag, out, target_bytes=128 << 20)
    assert dataset_file_count(spark, out) == max(1, -(-total // (128 << 20)))
    assert back.count() == d.count()
    # a tiny target forces MULTIPLE output files, still ceil(bytes/target)
    small_target = max(1, total // 3)
    out2 = str(tmp_path / "out2")
    compact_parquet(spark, frag, out2, target_bytes=small_target)
    assert dataset_file_count(spark, out2) == -(-total // small_target)


def test_zorder_write_narrows_file_stats(spark):
    """Z-order layout proof: after sorting by the Morton code, each
    parquet file's (user bucket, value bucket) min/max ranges are
    dramatically narrower than an unclustered write's — the statistics
    row-group/file pruning exploits for filters on EITHER key."""
    import glob
    import os

    import pyarrow.parquet as papq

    from dask_expr_rapids_spark.queries.lakehouse import morton_col
    from dask_expr_rapids_spark.scratch import scratch_dir

    ev = load_table(spark, SF_DIR, "events")
    # full-range buckets in both dimensions regardless of test SF (the
    # tiny fixture's user_id cardinality is below 256)
    ub = F.pmod(F.col("event_id"), F.lit(256)).cast("int")
    vb = F.pmod(F.floor(F.col("value") * 10).cast("int"), F.lit(256))
    z = ev.select(ub.alias("ub"), vb.alias("vb"), morton_col(ub, vb).alias("morton"))
    root = scratch_dir("spark_graft_zorder_")
    plain, zdir = os.path.join(root, "plain"), os.path.join(root, "zorder")
    # same file count both layouts so widths are comparable; 64 range
    # partitions fix ~6 morton bits → ~3 high bits per dimension (fewer
    # files only narrow ONE dimension — the interleave trades bits evenly)
    z.repartition(64).write.mode("overwrite").parquet(plain)
    z.repartitionByRange(64, "morton").sortWithinPartitions("morton").write.mode(
        "overwrite"
    ).parquet(zdir)

    def avg_width(path, col):
        widths = []
        for f in glob.glob(os.path.join(path, "part-*.parquet")):
            md = papq.ParquetFile(f).metadata
            idx = md.schema.to_arrow_schema().get_field_index(col)
            lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
            hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
            widths.append(hi - lo)
        return sum(widths) / len(widths)

    # unclustered files span ~the full 0..255 range in both dims; Z-order
    # files must be at least 2x narrower in BOTH dimensions at once
    for col in ("ub", "vb"):
        w_plain, w_z = avg_width(plain, col), avg_width(zdir, col)
        assert w_z < w_plain / 2, (col, w_plain, w_z)


def test_weighted_take_salt_invariant(spark):
    """The salted two-phase plan must be EXACTLY the unsalted result for
    any salt count (top-k of per-salt top-ks == global top-k)."""
    from dask_expr_rapids_spark.operators.sampling import weighted_take

    d = load_table(spark, SF_DIR, "documents").filter(F.col("n_chars") > 0)
    d = d.select("source", "doc_id", "n_chars")
    results = [
        canonical_rows(
            weighted_take(d, "source", 5, "doc_id", "n_chars", n_salts=s)
            .select("source", "rank", "doc_id")
            .toPandas()
        )
        for s in (1, 4, 16)
    ]
    assert results[0] == results[1] == results[2]


def test_morton_code_roundtrip(spark):
    """The Morton interleave must be a bijection on (ub, vb) — decode in
    plain Python and compare."""
    from dask_expr_rapids_spark.queries.lakehouse import morton_col

    ub = F.pmod(F.col("event_id"), F.lit(256)).cast("int")
    vb = F.pmod(F.col("event_id") * 7 + 13, F.lit(256)).cast("int")
    rows = (
        load_table(spark, SF_DIR, "events")
        .select(ub.alias("ub"), vb.alias("vb"), morton_col(ub, vb).alias("m"))
        .limit(500)
        .collect()
    )
    assert rows
    for r in rows:
        du = sum(((r.m >> (2 * i)) & 1) << i for i in range(8))
        dv = sum(((r.m >> (2 * i + 1)) & 1) << i for i in range(8))
        assert (du, dv) == (r.ub, r.vb), (r.m, r.ub, r.vb)


def test_substring_span_invariants(spark):
    """Span accounting invariants: every doc with spans satisfies
    n_spans * L <= dup_chars <= doc_len (spans are maximal, merged,
    each at least one gram long)."""
    from dask_expr_rapids_spark.queries import REGISTRY
    from dask_expr_rapids_spark.queries.spans import _SPAN_L

    rows = REGISTRY["dedup_substring_spans"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_spans >= 1
        assert r.n_spans * _SPAN_L <= r.dup_chars <= r.doc_len, r


def test_pq_arrow_encode_matches_hof(spark):
    """The Arrow-vectorized PQ encode (large-corpus path) must produce
    BIT-IDENTICAL results to the interpreted-HOF form: int64 distances
    are exact in both, and np.argmin's first-minimum tie rule equals
    array_position(d2s, array_min(d2s))."""
    from dask_expr_rapids_spark.operators.similarity import pq_topk
    from dask_expr_rapids_spark.sources.tables import load_table

    e = load_table(spark, SF_DIR, "embeddings")
    probes = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    a = pq_topk(e, probes, k=5, rerank=8, arrow_encode=False).collect()
    b = pq_topk(e, probes, k=5, rerank=8, arrow_encode=True).collect()
    ka = sorted((r["qid"], r["vec_id"], r["pq_cosine"]) for r in a)
    kb = sorted((r["qid"], r["vec_id"], r["pq_cosine"]) for r in b)
    assert ka == kb
