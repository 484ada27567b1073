"""Round-7 operator invariants beyond the DuckDB-oracle compare:
structural properties that must hold at ANY scale (the oracle only
witnesses one dataset)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dask_expr_rapids_spark.queries import REGISTRY
from dask_expr_rapids_spark.queries.registry import release_caches

from .conftest import SF_DIR


def test_kmeans_clusters_partition_the_corpus(spark):
    """Every vector lands in exactly one cluster: sum of n_members equals
    the corpus size, cluster ids are within [0, K), inertia >= 0."""
    out = REGISTRY["kmeans_embedding_clusters"].fn(spark, SF_DIR).collect()
    release_caches()
    n_vecs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert sum(r["n_members"] for r in out) == n_vecs
    assert all(0 <= r["cid"] < 4 for r in out)
    assert all(r["inertia"] >= 0.0 for r in out)


def test_pagerank_mass_is_conserved_and_deterministic(spark):
    """With 3 damped iterations the total rank mass stays within the
    damping leak bound of the 1e12 budget (floor-division only loses
    mass, never creates it), and two runs give identical top-k (the
    integer pipeline has no shuffle-order sensitivity)."""
    from dask_expr_rapids_spark.queries.graphrank import _PR_MASS

    fn = REGISTRY["pagerank_word_centrality"].fn
    a = [tuple(r) for r in fn(spark, SF_DIR).collect()]
    release_caches()
    b = [tuple(r) for r in fn(spark, SF_DIR).collect()]
    release_caches()
    assert a == b
    assert all(0 < rank <= _PR_MASS for _, rank in a)
    # descending with deterministic word tiebreak
    assert a == sorted(a, key=lambda t: (-t[1], t[0]))


def test_zipf_topk_is_take_ordered(spark):
    """The top-R vocabulary selection must plan as TakeOrderedAndProject —
    never a global sort of the full vocabulary."""
    from dask_expr_rapids_spark.plans import plan_of

    df = REGISTRY["zipf_fit_vocabulary"].fn(spark, SF_DIR)
    assert "TakeOrderedAndProject" in plan_of(df, "simple")
    release_caches()


def test_leakage_safe_split_never_divides_a_cluster(spark):
    """Directly verify the structural guarantee on the doc-level
    assignment: no exact-dedup cluster spans two splits."""
    from dask_expr_rapids_spark.functions.text import fingerprint
    from dask_expr_rapids_spark.operators.sampling import hash_uniform
    from pyspark.sql import Window as W

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    w = W.partitionBy(fingerprint(F.col("text")))
    canon = d.select("doc_id", F.min("doc_id").over(w).alias("canon"))
    u = hash_uniform(F.col("canon"))
    split = F.when(u < 0.90, "train").when(u < 0.95, "val").otherwise("test")
    per_cluster = (
        canon.select("canon", split.alias("split"))
        .groupBy("canon")
        .agg(F.countDistinct("split").alias("k"))
    )
    assert per_cluster.filter(F.col("k") > 1).count() == 0
