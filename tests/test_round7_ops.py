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


def test_bloom_semijoin_no_false_negatives(spark):
    """Bloom guarantee: every member passes (FN = 0 structurally); the
    FP audit columns are consistent (pass = member + false_pos) and the
    deliberately-tight filter keeps FP below saturation."""
    out = REGISTRY["bloom_semijoin_orders"].fn(spark, SF_DIR).collect()
    release_caches()
    assert sum(r["n_false_neg"] for r in out) == 0
    for r in out:
        assert r["n_pass"] == r["n_member"] + r["n_false_pos"]
        assert 0 <= r["n_false_pos"] <= r["n_orders"] - r["n_member"]
    n_non_member = sum(r["n_orders"] - r["n_member"] for r in out)
    n_fp = sum(r["n_false_pos"] for r in out)
    assert n_fp / max(n_non_member, 1) < 0.5  # tight m, but not saturated


def test_sessionize_batch_partitions_every_event(spark):
    """Sessions partition the event stream: per-session counts sum to the
    table size, durations are non-negative, indices start at 1."""
    out = REGISTRY["sessionize_users_batch"].fn(spark, SF_DIR).collect()
    release_caches()
    n_events = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert sum(r["n_events"] for r in out) == n_events
    assert all(r["dur_us"] >= 0 for r in out)
    assert min(r["session_idx"] for r in out) == 1


def test_peak_concurrency_matches_global_sweep(spark):
    """The day-partitioned sweep (carry + per-day running sum) equals the
    single global sweep it replaces, day by day."""
    from dask_expr_rapids_spark.queries.analytics import _DAY_US

    sessions = (
        REGISTRY["sessionize_users_batch"].fn(spark, SF_DIR).toPandas()
    )
    out = {
        r["day"]: r["peak_concurrency"]
        for r in REGISTRY["peak_concurrency_daily"].fn(spark, SF_DIR).collect()
    }
    release_caches()
    import collections
    import datetime

    deltas = collections.Counter()
    # a session is open through its last event's microsecond: [s, s+dur+1)
    for s, d in zip(sessions["start_us"], sessions["dur_us"]):
        deltas[int(s)] += 1
        deltas[int(s + d + 1)] -= 1
    running = 0
    day_peak: dict[int, int] = {}
    prev_day = None
    for ts in sorted(deltas):
        day = ts // _DAY_US
        if day != prev_day:
            # concurrency at day start (the carry) seeds each new day's peak
            for dd in range(prev_day + 1 if prev_day is not None else day, day + 1):
                day_peak[dd] = max(day_peak.get(dd, 0), running)
            prev_day = day
        running += deltas[ts]
        day_peak[day] = max(day_peak[day], running)
    expect = {
        datetime.date(1970, 1, 1) + datetime.timedelta(days=d): p
        for d, p in day_peak.items()
        if p > 0
    }
    got = {datetime.date.fromisoformat(k): v for k, v in out.items()}
    assert got == expect, {
        d: (got.get(d), expect.get(d))
        for d in set(got) | set(expect)
        if got.get(d) != expect.get(d)
    }


def test_hll_set_ops_inclusion_exclusion(spark):
    """The intersection row is EXACTLY a + b - union in both the exact
    and estimated columns, and every estimate is within 50% of exact
    (m=256 keeps sigma ~6.5%)."""
    rows = {
        r["set_name"]: r
        for r in REGISTRY["hll_set_ops_users"].fn(spark, SF_DIR).collect()
    }
    release_caches()
    a, b, u, i = (rows[k] for k in ("click", "purchase", "union", "intersection"))
    assert i["n_exact"] == a["n_exact"] + b["n_exact"] - u["n_exact"]
    assert u["n_exact"] >= max(a["n_exact"], b["n_exact"])
    assert abs(i["n_est"] - (a["n_est"] + b["n_est"] - u["n_est"])) < 1e-3
    for r in (a, b, u):
        assert abs(r["rel_err"]) < 0.5


def test_dq_report_shape_and_fk_green(spark):
    """Seven checks, every n_checked positive, ok == (n_bad == 0), and
    the synthetic tables' referential integrity actually holds."""
    out = {r["check_name"]: r for r in REGISTRY["dq_validation_report"].fn(spark, SF_DIR).collect()}
    release_caches()
    assert len(out) == 7
    for r in out.values():
        assert r["n_checked"] > 0
        assert r["ok"] == (r["n_bad"] == 0)
    assert out["fk_orders_custkey"]["n_bad"] == 0
    assert out["fk_lineitem_orderkey"]["n_bad"] == 0
    assert out["unique_o_orderkey"]["n_bad"] == 0
