"""Property-based differential testing (hypothesis): random data + random
operator pipelines through the facade must match eager pandas exactly.

This goes beyond the reference's test suite (which has no randomized
testing, SURVEY.md §5.6): any discrepancy hypothesis finds is a real
semantic divergence between the facade and pandas.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dask_expr_rapids_spark.operators import SparkFrame

_settings = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# Finite doubles that survive float64 round-trips and divisions cleanly.
finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False, width=32
)


@st.composite
def frames(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    a = draw(st.lists(finite, min_size=n, max_size=n))
    b = draw(st.lists(st.integers(min_value=-5, max_value=5), min_size=n, max_size=n))
    return pd.DataFrame({"a": np.array(a, dtype="float64"), "b": np.array(b, dtype="int64")})


@given(pdf=frames(), c1=st.sampled_from(["a", "b"]), c2=st.sampled_from(["a", "b"]))
@_settings
def test_arith_matches_pandas(spark, pdf, c1, c2):
    f = SparkFrame.from_pandas(spark, pdf, npartitions=3)
    got = f.assign(r=f[c1] + f[c2] * 2 - 1).to_pandas()["r"]
    want = (pdf[c1] + pdf[c2] * 2 - 1).rename("r")
    pd.testing.assert_series_equal(got, want, check_dtype=False, check_names=False)


@given(pdf=frames(), thresh=st.integers(min_value=-5, max_value=5))
@_settings
def test_filter_matches_pandas(spark, pdf, thresh):
    f = SparkFrame.from_pandas(spark, pdf, npartitions=3)
    got = f[f["b"] > thresh].to_pandas()
    want = pdf[pdf.b > thresh]
    assert len(got) == len(want)
    if len(want):
        pd.testing.assert_frame_equal(
            got[["a", "b"]], want, check_dtype=False
        )


@given(pdf=frames())
@_settings
def test_groupby_sum_count_matches_pandas(spark, pdf):
    f = SparkFrame.from_pandas(spark, pdf, npartitions=3)
    got = f.groupby("b").agg({"a": ["sum", "count"]}).to_pandas().sort_index()
    want = pdf.groupby("b").agg(a_sum=("a", "sum"), a_count=("a", "count"))
    assert len(got) == len(want)
    for k in want.index:
        assert got.loc[k, "a_sum"] == pytest.approx(want.loc[k, "a_sum"], rel=1e-9, abs=1e-9)
        assert got.loc[k, "a_count"] == want.loc[k, "a_count"]


@given(pdf=frames(), periods=st.integers(min_value=1, max_value=3))
@_settings
def test_shift_cumsum_matches_pandas(spark, pdf, periods):
    f = SparkFrame.from_pandas(spark, pdf, npartitions=2)
    got = f.assign(s=f["a"].shift(periods), c=f["b"].cumsum()).to_pandas()
    want = pdf.assign(s=pdf.a.shift(periods), c=pdf.b.cumsum())
    pd.testing.assert_frame_equal(got[["s", "c"]], want[["s", "c"]], check_dtype=False)


@given(pdf=frames())
@_settings
def test_sort_drop_duplicates_matches_pandas(spark, pdf):
    f = SparkFrame.from_pandas(spark, pdf, npartitions=3)
    got = f.drop_duplicates(subset="b").to_pandas().sort_index()
    want = pdf.drop_duplicates(subset="b")
    pd.testing.assert_frame_equal(got[["a", "b"]], want, check_dtype=False)


# --------------------------------------------------------------------------
# Round-5 operators: merge_asof and interval_join under random data.
# Integer "times" keep tie/boundary cases frequent — exactly where the
# union+window side-ordering and the bucket-boundary arithmetic can drift
# from the authoritative semantics.
# --------------------------------------------------------------------------
@st.composite
def asof_inputs(draw):
    nl = draw(st.integers(min_value=1, max_value=25))
    nr = draw(st.integers(min_value=1, max_value=25))
    t = st.integers(min_value=0, max_value=30)
    k = st.integers(min_value=0, max_value=3)
    left = pd.DataFrame(
        {
            "k": draw(st.lists(k, min_size=nl, max_size=nl)),
            "t": draw(st.lists(t, min_size=nl, max_size=nl)),
        }
    )
    left["lid"] = range(nl)
    right = pd.DataFrame(
        {
            "k": draw(st.lists(k, min_size=nr, max_size=nr)),
            "t": draw(st.lists(t, min_size=nr, max_size=nr)),
        }
    )
    # pandas merge_asof requires unique (k, t) on the right for a stable
    # answer; dedup so the expected value is well-defined in BOTH engines
    right = right.drop_duplicates(["k", "t"]).reset_index(drop=True)
    right["rv"] = np.arange(len(right), dtype="float64")
    return left, right


@given(data=asof_inputs(), direction=st.sampled_from(["backward", "forward"]),
       exact=st.booleans())
@_settings
def test_merge_asof_property_matches_pandas(spark, data, direction, exact):
    from dask_expr_rapids_spark.operators.asof import merge_asof

    left, right = data
    want = pd.merge_asof(
        left.sort_values(["t", "lid"]),
        right.sort_values("t"),
        on="t",
        by="k",
        direction=direction,
        allow_exact_matches=exact,
    ).sort_values("lid")
    got = (
        merge_asof(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="t",
            by="k",
            direction=direction,
            allow_exact_matches=exact,
        )
        .toPandas()
        .sort_values("lid")
    )
    exp = [(r.lid, None if pd.isna(r.rv) else r.rv) for r in want.itertuples()]
    act = [(r.lid, None if pd.isna(r.asof_rv) else r.asof_rv) for r in got.itertuples()]
    assert act == exp, f"{direction}/{exact}:\n{act}\n{exp}"


@st.composite
def interval_inputs(draw):
    np_ = draw(st.integers(min_value=1, max_value=20))
    ni = draw(st.integers(min_value=1, max_value=8))
    t = st.integers(min_value=0, max_value=10_000)  # seconds
    pts = pd.DataFrame({"pid": range(np_), "sec": draw(st.lists(t, min_size=np_, max_size=np_))})
    los = draw(st.lists(t, min_size=ni, max_size=ni))
    widths = draw(st.lists(st.integers(min_value=0, max_value=5000), min_size=ni, max_size=ni))
    ivs = pd.DataFrame({"iid": range(ni), "lo_s": los, "hi_s": [l + w for l, w in zip(los, widths)]})
    return pts, ivs


@given(data=interval_inputs(), bucket=st.sampled_from([60, 600, 3600]))
@_settings
def test_interval_join_property_matches_naive(spark, data, bucket):
    from pyspark.sql import functions as F

    from dask_expr_rapids_spark.operators.rangejoin import interval_join

    pts, ivs = data
    spts = spark.createDataFrame(pts).select(
        "pid", F.timestamp_seconds("sec").alias("t")
    )
    sivs = spark.createDataFrame(ivs).select(
        "iid",
        F.timestamp_seconds("lo_s").alias("lo"),
        F.timestamp_seconds("hi_s").alias("hi"),
    )
    got = sorted(
        (r.pid, r.iid)
        for r in interval_join(spts, sivs, "t", "lo", "hi", bucket_seconds=bucket).collect()
    )
    want = sorted(
        (p.pid, i.iid)
        for p in pts.itertuples()
        for i in ivs.itertuples()
        if i.lo_s <= p.sec <= i.hi_s
    )
    assert got == want


# ---------------------------------------------------------------------------
# GroupBy agg-spec compiler (operators/frame.py GroupBy.agg): random
# dict/list/str/callable specs — including mixed JVM + pandas-UDF specs,
# which exercise the two-aggregate join path — must match eager pandas.
# The reference leans hardest on groupby differential coverage
# (dask_expr/tests/test_groupby.py); this generalizes those fixed cases.
# ---------------------------------------------------------------------------

_GB_FNS = ["sum", "mean", "min", "max", "count", "nunique", "median", "var", "std"]


def _spread(s):
    return float(s.max() - s.min())


@st.composite
def gb_frames(draw):
    n = draw(st.integers(min_value=2, max_value=30))
    k = draw(st.lists(st.integers(min_value=-2, max_value=2), min_size=n, max_size=n))
    a = draw(st.lists(finite, min_size=n, max_size=n))
    b = draw(st.lists(st.integers(min_value=-50, max_value=50), min_size=n, max_size=n))
    return pd.DataFrame(
        {
            "k": np.array(k, dtype="int64"),
            "a": np.array(a, dtype="float64"),
            "b": np.array(b, dtype="int64"),
        }
    )


@st.composite
def agg_specs(draw):
    kind = draw(
        st.sampled_from(["str", "list", "dict", "dict_multi", "callable", "mixed"])
    )
    if kind == "str":
        return draw(st.sampled_from(_GB_FNS))
    if kind == "list":
        return draw(
            st.lists(st.sampled_from(_GB_FNS), min_size=1, max_size=3, unique=True)
        )
    if kind == "dict":
        cols = draw(
            st.lists(st.sampled_from(["a", "b"]), min_size=1, max_size=2, unique=True)
        )
        return {c: draw(st.sampled_from(_GB_FNS)) for c in cols}
    if kind == "dict_multi":
        return {
            c: draw(
                st.lists(st.sampled_from(_GB_FNS), min_size=1, max_size=3, unique=True)
            )
            for c in ["a", "b"]
        }
    if kind == "callable":
        return _spread
    # mixed JVM aggregates + a pandas-UDF callable in one spec → the
    # compiler must split into two aggregates and rejoin on the keys
    return {"a": [draw(st.sampled_from(_GB_FNS)), _spread], "b": "sum"}


def _expected_entries(spec, value_cols):
    """Mirror of GroupBy.agg's alias rules: (col, fn, alias) triples."""
    if isinstance(spec, str):
        return [(c, spec, c) for c in value_cols]
    if callable(spec):
        nm = getattr(spec, "__name__", "agg")
        return [(c, spec, f"{c}_{nm}") for c in value_cols]
    if isinstance(spec, dict):
        out = []
        for col, fns in spec.items():
            single = isinstance(fns, str) or callable(fns)
            for f in fns if isinstance(fns, (list, tuple)) else [fns]:
                nm = f if isinstance(f, str) else getattr(f, "__name__", "agg")
                out.append((col, f, col if single else f"{col}_{nm}"))
        return out
    return [
        (c, f, f"{c}_{f if isinstance(f, str) else getattr(f, '__name__', 'agg')}")
        for f in spec
        for c in value_cols
    ]


def _pd_agg(s, fn):
    return fn(s) if callable(fn) else getattr(s, fn)()


@given(pdf=gb_frames(), spec=agg_specs())
@_settings
def test_groupby_agg_spec_matches_pandas(spark, pdf, spec):
    f = SparkFrame.from_pandas(spark, pdf, npartitions=3)
    got = f.groupby("k").agg(spec).to_pandas().sort_index()
    entries = _expected_entries(spec, ["a", "b"])
    groups = pdf.groupby("k")
    assert sorted(got.index.tolist()) == sorted(groups.groups)
    for key, g in groups:
        for col, fn, alias in entries:
            want = _pd_agg(g[col], fn)
            have = got.loc[key, alias]
            if pd.isna(want):
                assert pd.isna(have), (key, alias, have)
            else:
                assert have == pytest.approx(want, rel=1e-9, abs=1e-9), (
                    key,
                    alias,
                    have,
                    want,
                )


@given(
    data=st.lists(
        st.tuples(st.sampled_from(["g1", "g2", "g3"]), finite),
        min_size=1,
        max_size=60,
    )
)
@_settings
def test_grouped_lower_median_both_paths_match_python(spark, data):
    """Property (round 8): for ANY grouped float data — duplicates,
    negatives, heavy ties — both grouped_lower_median paths return
    exactly the Python-computed lower median (rank (n+1)//2 of the
    sorted multiset) for every group."""
    from dask_expr_rapids_spark.operators.selection import grouped_lower_median

    pdf = pd.DataFrame(data, columns=["g", "v"])
    pdf["v"] = pdf["v"].astype("float64")
    expected = {}
    for g, grp in pdf.groupby("g"):
        vals = sorted(grp["v"].tolist())
        expected[g] = vals[(len(vals) + 1) // 2 - 1]
    df = spark.createDataFrame(pdf)
    for force in ("window", "selection"):
        got = {
            r["g"]: r["m"]
            for r in grouped_lower_median(df, "g", "v", "m", force=force).collect()
        }
        assert got == expected, (force, got, expected)
