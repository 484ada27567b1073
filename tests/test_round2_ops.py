"""Round-2 operator additions, differential-tested against pandas
(the reference's methodology, SURVEY.md §5.1):

* rolling ``center=`` (reference ``_rolling.py:120-122``)
* rolling skew/kurt sample-bias correction (pandas G1/G2 estimators)
* resample quantile / median / prod (reference ``_resample.py:21-269``)
* timedelta: ``to_timedelta`` + ``dt.total_seconds`` + timestamp
  subtraction (reference ``_expr.py:1090`` ToTimedelta)
* merge ``indicator=`` and outer/right key coalescing (reference
  ``_merge.py``)
* ``Series.any/all`` (reference ``_reductions.py:793-814``)
* repartition variants: ``coalesce``, ``repartition(freq=)``
  (reference ``_repartition.py:385-478``)
* guard rails: ``salted_join`` how-restriction, ``kmeans_assign``
  sparse-id seeding, ``apply_rows``
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pandas.testing as pdt
import pytest

from dask_expr_rapids_spark.operators import SparkFrame

N = 60


@pytest.fixture(scope="module")
def pdf():
    rng = np.random.RandomState(7)
    return pd.DataFrame(
        {
            "x": np.arange(N, dtype="int64"),
            "z": rng.randn(N),
            "b": [bool(i % 3) for i in range(N)],
        }
    )


@pytest.fixture(scope="module")
def sf(spark, pdf):
    return SparkFrame.from_pandas(spark, pdf, npartitions=4)


def eq_series(sp_result, pd_result):
    got = sp_result.to_pandas()
    pdt.assert_series_equal(got, pd_result, check_dtype=False, check_names=False)


# -- rolling center --------------------------------------------------------


@pytest.mark.parametrize("window", [3, 4, 7])
def test_rolling_center_mean(sf, pdf, window):
    eq_series(
        sf["z"].rolling(window, center=True).mean(),
        pdf.z.rolling(window, center=True).mean(),
    )


def test_rolling_center_sum_min_periods(sf, pdf):
    eq_series(
        sf["z"].rolling(5, min_periods=2, center=True).sum(),
        pdf.z.rolling(5, min_periods=2, center=True).sum(),
    )


def test_rolling_center_time_window_supported(sf):
    # implemented in round 3 (test_round3_ops.py::test_rolling_center_time_window
    # checks values against pandas); here just assert it no longer raises
    sf["z"].rolling("5min", center=True)


# -- rolling skew / kurt (sample-adjusted, pandas estimators) --------------


def test_rolling_skew_matches_pandas(sf, pdf):
    eq_series(sf["z"].rolling(7).skew(), pdf.z.rolling(7).skew())


def test_rolling_kurt_matches_pandas(sf, pdf):
    eq_series(sf["z"].rolling(8).kurt(), pdf.z.rolling(8).kurt())


# -- resample quantile / median / prod -------------------------------------


@pytest.fixture(scope="module")
def ts_frames(spark):
    idx = pd.date_range("2024-01-01", periods=48, freq="30min")
    p = pd.DataFrame({"v": np.linspace(0.5, 4.0, 48)}, index=idx)
    return p, SparkFrame.from_pandas(spark, p)


def test_resample_median(ts_frames):
    p, f = ts_frames
    got = f.resample("2h").median().to_pandas().sort_index()
    pdt.assert_frame_equal(
        got, p.resample("2h").median(), check_dtype=False, check_freq=False
    )


def test_resample_quantile(ts_frames):
    p, f = ts_frames
    got = f.resample("2h").quantile(0.25).to_pandas().sort_index()
    pdt.assert_frame_equal(
        got, p.resample("2h").quantile(0.25), check_dtype=False, check_freq=False
    )


def test_resample_prod(ts_frames):
    p, f = ts_frames
    got = f.resample("4h").prod().to_pandas().sort_index()
    pdt.assert_frame_equal(
        got, p.resample("4h").prod(), check_dtype=False, check_freq=False
    )


def test_resample_pre_epoch_bucket(spark):
    # cast('long') truncates toward zero: pre-1970 rows would land one
    # bucket late without the floor fix
    idx = pd.to_datetime(
        ["1969-12-31 23:59:30", "1969-12-31 23:58:00", "1970-01-01 00:00:30"]
    )
    p = pd.DataFrame({"v": [1.0, 2.0, 4.0]}, index=idx)
    f = SparkFrame.from_pandas(spark, p)
    got = f.resample("1min").sum().to_pandas().sort_index()
    want = p.resample("1min").sum()
    want = want[want.v != 0]  # spark emits no empty buckets
    pdt.assert_frame_equal(got, want, check_dtype=False, check_freq=False)


# -- timedelta -------------------------------------------------------------


def test_to_timedelta_total_seconds(sf, pdf):
    got = sf["x"].to_timedelta(unit="min").dt.total_seconds()
    want = pd.to_timedelta(pdf.x, unit="min").dt.total_seconds()
    eq_series(got, want)


def test_timestamp_subtraction_total_seconds(spark):
    p = pd.DataFrame(
        {
            "a": pd.to_datetime(["2024-01-02 03:00:00", "2024-03-01 00:00:30"]),
            "b": pd.to_datetime(["2024-01-01 00:00:00", "2024-02-28 12:00:00"]),
        }
    )
    f = SparkFrame.from_pandas(spark, p)
    got = (f["a"] - f["b"]).dt.total_seconds()
    want = (p.a - p.b).dt.total_seconds()
    eq_series(got, want)


# -- merge indicator + outer key coalesce ----------------------------------


@pytest.fixture(scope="module")
def merge_frames(spark):
    left = pd.DataFrame({"k": [1, 2, 3], "lv": ["a", "b", "c"]})
    right = pd.DataFrame({"k": [2, 3, 4], "rv": ["x", "y", "z"]})
    return (
        left,
        right,
        SparkFrame.from_pandas(spark, left),
        SparkFrame.from_pandas(spark, right),
    )


def _merged(sfl, sfr, **kw):
    out = sfl.merge(sfr, on="k", **kw).to_pandas().reset_index(drop=True)
    return out.sort_values("k", na_position="last").reset_index(drop=True)


def _pd_merged(left, right, **kw):
    out = pd.merge(left, right, on="k", **kw)
    return out.sort_values("k", na_position="last").reset_index(drop=True)


@pytest.mark.parametrize("how", ["outer", "right"])
def test_merge_outer_right_key_coalesced(merge_frames, how):
    left, right, sfl, sfr = merge_frames
    got = _merged(sfl, sfr, how=how)
    want = _pd_merged(left, right, how=how)
    # the defining check: right-only rows carry their key, not NULL
    assert not got["k"].isna().any()
    pdt.assert_frame_equal(got[["k", "lv", "rv"]], want[["k", "lv", "rv"]], check_dtype=False)


@pytest.mark.parametrize("how", ["inner", "left", "outer"])
def test_merge_indicator(merge_frames, how):
    left, right, sfl, sfr = merge_frames
    got = _merged(sfl, sfr, how=how, indicator=True)
    want = _pd_merged(left, right, how=how, indicator=True)
    assert list(got["_merge"]) == [str(v) for v in want["_merge"]]


# -- Series.any / all ------------------------------------------------------


def test_series_any_all(sf, pdf):
    assert sf["b"].any() == bool(pdf.b.any())
    assert sf["b"].all() == bool(pdf.b.all())
    assert (sf["x"] > 100).any() is False
    assert (sf["x"] >= 0).all() is True


# -- repartition variants --------------------------------------------------


def test_coalesce_reduces_partitions(sf):
    assert sf.coalesce(2).npartitions <= 2


def test_repartition_freq_groups_time_buckets(spark):
    idx = pd.date_range("2024-01-01", periods=96, freq="15min")
    p = pd.DataFrame({"v": np.arange(96.0)}, index=idx)
    f = SparkFrame.from_pandas(spark, p, npartitions=8).repartition(freq="1d")
    # all rows of one day land in one partition: count distinct partitions
    # per day via spark_partition_id
    from pyspark.sql import functions as F

    counts = (
        f.to_spark()
        .withColumn("pid", F.spark_partition_id())
        .groupBy(F.date_trunc("day", F.col("__index__")))
        .agg(F.countDistinct("pid").alias("n"))
        .collect()
    )
    assert all(r["n"] == 1 for r in counts)
    # and the data is unchanged
    assert f.to_pandas()["v"].sum() == p.v.sum()


# -- guard rails -----------------------------------------------------------


def test_salted_join_rejects_right_full(spark):
    from dask_expr_rapids_spark.operators.skew import salted_join

    df = spark.range(10).withColumnRenamed("id", "k")
    with pytest.raises(ValueError):
        salted_join(df, df, on="k", how="right")
    with pytest.raises(ValueError):
        salted_join(df, df, on="k", how="full")


def test_kmeans_assign_sparse_ids(spark):
    from pyspark.sql import functions as F

    from dask_expr_rapids_spark.operators.similarity import kmeans_assign

    # ids 1000, 1010, 1020, ... — the old `id < k` seeding yields ZERO
    # centroids here; orderBy(id).limit(k) must still produce k
    df = (
        spark.range(40)
        .select(
            (F.col("id") * 10 + 1000).alias("vec_id"),
            F.array(
                (F.col("id") % 7).cast("float"), (F.col("id") % 3).cast("float")
            ).alias("embedding"),
        )
    )
    out = kmeans_assign(df, k=3, iters=1)
    rows = out.collect()
    assert len(rows) == 40
    assert 1 <= len({r["cluster"] for r in rows}) <= 3


def test_kmeans_assign_iters_zero_raises(spark):
    from dask_expr_rapids_spark.operators.similarity import kmeans_assign

    with pytest.raises(ValueError):
        kmeans_assign(spark.range(5).withColumnRenamed("id", "vec_id"), iters=0)


def test_apply_rows(sf, pdf):
    got = sf.apply_rows(
        lambda row: {"x": row["x"], "w": row["x"] * 2 + 1},
        schema="x long, w long",
    ).to_pandas()
    want = pd.DataFrame({"x": pdf.x, "w": pdf.x * 2 + 1})
    pdt.assert_frame_equal(
        got.sort_index()[["x", "w"]], want, check_dtype=False
    )


def test_spread_non_file_source_untouched(spark):
    from dask_expr_rapids_spark.sources.tables import spread

    df = spark.range(100)
    assert spread(df) is df


# -- §2.1 named constructors (reference io/io.py:139-546) ------------------


def test_from_array_1d_2d(spark):
    a1 = np.arange(10.0)
    f1 = SparkFrame.from_array(spark, a1)
    got1 = f1.to_pandas()
    assert list(got1["0"]) == list(a1)

    a2 = np.arange(12.0).reshape(4, 3)
    f2 = SparkFrame.from_array(spark, a2, columns=["a", "b", "c"])
    got2 = f2.to_pandas().sort_index()
    want2 = pd.DataFrame(a2, columns=["a", "b", "c"])
    pdt.assert_frame_equal(got2, want2, check_dtype=False)


def test_from_scalars(spark):
    f = SparkFrame.from_scalars(spark, [1.5, 2.5, 3.5], names=["x", "y", "z"])
    got = f.to_pandas()
    assert dict(zip(got.index, got["0"])) == {"x": 1.5, "y": 2.5, "z": 3.5}


def test_from_map(spark):
    def make(item):
        return pd.DataFrame({"src": [item] * 2, "v": [1.0, 2.0]})

    f = SparkFrame.from_map(spark, make, ["p1", "p2", "p3"], schema="src string, v double")
    got = f.to_pandas()
    assert len(got) == 6
    assert sorted(set(got["src"])) == ["p1", "p2", "p3"]
    assert got.groupby("src")["v"].sum().eq(3.0).all()


def test_from_delayed(spark):
    thunks = [lambda i=i: pd.DataFrame({"v": [float(i)]}) for i in range(4)]
    f = SparkFrame.from_delayed(spark, thunks, schema="v double")
    got = sorted(f.to_pandas()["v"])
    assert got == [0.0, 1.0, 2.0, 3.0]


# -- JoinRecursive list API ------------------------------------------------


def test_join_list_of_frames(spark):
    base = pd.DataFrame({"a": [1.0, 2.0, 3.0]}, index=[0, 1, 2])
    f = SparkFrame.from_pandas(spark, base)
    others = [
        SparkFrame.from_pandas(spark, pd.DataFrame({"b": [10.0, 20.0]}, index=[0, 1])),
        SparkFrame.from_pandas(spark, pd.DataFrame({"c": [5.0]}, index=[2])),
    ]
    got = f.join(others, how="left").to_pandas().sort_index()
    want = base.join([o for o in [
        pd.DataFrame({"b": [10.0, 20.0]}, index=[0, 1]),
        pd.DataFrame({"c": [5.0]}, index=[2]),
    ]], how="left")
    pdt.assert_frame_equal(got[want.columns.tolist()], want, check_dtype=False)


# -- row-wise (axis=1) reductions ------------------------------------------


def test_rowwise_reductions(spark):
    p = pd.DataFrame(
        {"a": [1.0, 2.0, None], "b": [4.0, None, 6.0], "c": [7.0, 8.0, 9.0]}
    )
    f = SparkFrame.from_pandas(spark, p)
    num = p[["a", "b", "c"]]
    eq_series(f.sum(axis=1), num.sum(axis=1))
    eq_series(f.mean(axis=1), num.mean(axis=1))
    eq_series(f.min(axis=1), num.min(axis=1))
    eq_series(f.max(axis=1), num.max(axis=1))
    eq_series(f.var(axis=1), num.var(axis=1))
    eq_series(f.std(axis=1), num.std(axis=1))


def test_rowwise_nunique(spark):
    p = pd.DataFrame({"a": [1.0, 2.0], "b": [1.0, 3.0], "c": [2.0, 3.0]})
    f = SparkFrame.from_pandas(spark, p)
    eq_series(f.nunique_row(), p.nunique(axis=1))


def test_frame_axis0_reduction_raises(spark, pdf):
    f = SparkFrame.from_pandas(spark, pdf)
    with pytest.raises(NotImplementedError):
        f.sum(axis=0)
