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
