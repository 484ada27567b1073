"""Differential tests for the pandas-semantics facade: same op eagerly in
pandas vs through SparkFrame, compared with pandas testing utilities —
the reference's own methodology (SURVEY.md §5: assert_eq vs pandas oracle,
fixture from tests/test_collection.py:37-46 — {x: range(N), y: x // 7})."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pandas.testing as pdt
import pytest

from dask_expr_rapids_spark.operators import SparkFrame

N = 100


@pytest.fixture(scope="module")
def pdf():
    return pd.DataFrame(
        {
            "x": np.arange(N, dtype="int64"),
            "y": np.arange(N, dtype="int64") // 7,
            "z": np.linspace(-1.0, 1.0, N),
            "s": [f"Aa_{i % 5}" for i in range(N)],
        }
    )


@pytest.fixture(scope="module")
def sf(spark, pdf):
    return SparkFrame.from_pandas(spark, pdf, npartitions=4)


def eq_frame(sf_result, pd_result, **kw):
    got = sf_result.to_pandas() if isinstance(sf_result, SparkFrame) else sf_result
    got = got[pd_result.columns]
    pdt.assert_frame_equal(got, pd_result, check_dtype=False, **kw)


def eq_series(sp_result, pd_result):
    got = sp_result.to_pandas()
    pdt.assert_series_equal(got, pd_result, check_dtype=False, check_names=False)


def test_projection(sf, pdf):
    eq_frame(sf[["x", "y"]], pdf[["x", "y"]])


def test_filter_mask(sf, pdf):
    eq_frame(sf[sf["y"] > 5], pdf[pdf.y > 5])


def test_elemwise_arith(sf, pdf):
    got = sf.assign(w=sf["x"] * 2 + sf["y"] - 1)
    eq_frame(got, pdf.assign(w=pdf.x * 2 + pdf.y - 1))


def test_floordiv_mod_pow(sf, pdf):
    got = sf.assign(a=sf["x"] // 7, b=sf["x"] % 5, c=(sf["y"] + 1) ** 2)
    eq_frame(got, pdf.assign(a=pdf.x // 7, b=pdf.x % 5, c=(pdf.y + 1) ** 2))


def test_clip_abs_between_isin(sf, pdf):
    got = sf.assign(
        a=sf["z"].abs(), b=sf["x"].clip(10, 50),
        c=sf["x"].between(10, 20), d=sf["y"].isin([1, 3]),
    )
    eq_frame(
        got,
        pdf.assign(
            a=pdf.z.abs(), b=pdf.x.clip(10, 50),
            c=pdf.x.between(10, 20), d=pdf.y.isin([1, 3]),
        ),
    )


def test_where_mask(sf, pdf):
    got = sf.assign(w=sf["x"].where(sf["x"] > 50, other=-1))
    eq_frame(got, pdf.assign(w=pdf.x.where(pdf.x > 50, other=-1)))


def test_scalar_reductions(sf, pdf):
    assert sf["x"].sum() == pdf.x.sum()
    assert sf["x"].mean() == pytest.approx(pdf.x.mean())
    assert sf["x"].min() == pdf.x.min()
    assert sf["x"].max() == pdf.x.max()
    assert sf["y"].nunique() == pdf.y.nunique()
    assert sf["z"].std() == pytest.approx(pdf.z.std())
    assert sf["z"].var(ddof=0) == pytest.approx(pdf.z.var(ddof=0))
    assert sf["x"].count() == pdf.x.count()


def test_quantile_median_mode_idx(sf, pdf):
    assert sf["x"].quantile(0.5) == pytest.approx(pdf.x.quantile(0.5))
    assert sf["x"].median() == pytest.approx(pdf.x.median())
    assert sf["y"].mode() == list(pdf.y.mode())
    assert sf["y"].mode(first=True) == pdf.y.mode().iloc[0]
    assert sf["z"].idxmax() == pdf.z.idxmax()
    assert sf["z"].idxmin() == pdf.z.idxmin()


def test_groupby_sum_mean(sf, pdf):
    got = sf[["y", "x", "z"]].groupby("y").sum().to_pandas().sort_index()
    want = pdf.groupby("y")[["x", "z"]].sum()
    want.index.name = None
    pdt.assert_frame_equal(got[["x", "z"]], want, check_dtype=False)


def test_groupby_agg_dict(sf, pdf):
    got = (
        sf.groupby("y")
        .agg({"x": ["sum", "max"], "z": "mean"})
        .to_pandas()
        .sort_index()
    )
    assert set(got.columns) >= {"x_sum", "x_max", "z"}
    want = pdf.groupby("y").agg(x_sum=("x", "sum"), x_max=("x", "max"), z=("z", "mean"))
    want.index.name = None
    pdt.assert_frame_equal(got[["x_sum", "x_max", "z"]], want, check_dtype=False)


def test_groupby_size_head(sf, pdf):
    got = sf.groupby("y").size().to_pandas().sort_index()["size"]
    want = pdf.groupby("y").size()
    want.index.name = None
    pdt.assert_series_equal(got, want, check_dtype=False, check_names=False)
    got_head = sf.groupby("y").head(2).to_pandas().sort_index()
    want_head = pdf.groupby("y").head(2)
    pdt.assert_frame_equal(got_head[want_head.columns], want_head, check_dtype=False)


def test_merge_on_column(sf, pdf, spark):
    dim = pd.DataFrame({"y": range(15), "label": [f"g{i}" for i in range(15)]})
    sdim = SparkFrame.from_pandas(spark, dim)
    got = (
        sf.merge(sdim, on="y", how="inner", broadcast=True)
        .to_pandas()
        .sort_values("x")
        .reset_index(drop=True)
    )
    want = pdf.merge(dim, on="y", how="inner").sort_values("x").reset_index(drop=True)
    pdt.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_merge_suffixes(sf, pdf, spark):
    other = pdf[["y", "z"]].drop_duplicates("y")
    sother = SparkFrame.from_pandas(spark, other)
    got = sf.merge(sother, on="y", how="left").to_pandas()
    assert "z_x" in got.columns and "z_y" in got.columns


def test_set_index_sort(sf, pdf):
    got = sf.set_index("x").to_pandas()
    want = pdf.set_index("x")
    want.index.name = None
    pdt.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_shift_diff_cumsum_ffill(sf, pdf):
    got = sf.assign(
        sh=sf["x"].shift(1),
        df_=sf["x"].diff(2),
        cs=sf["x"].cumsum(),
        cm=sf["z"].cummax(),
    )
    want = pdf.assign(
        sh=pdf.x.shift(1), df_=pdf.x.diff(2), cs=pdf.x.cumsum(), cm=pdf.z.cummax()
    )
    eq_frame(got, want)


def test_str_accessor(sf, pdf):
    got = sf.assign(
        u=sf["s"].str.upper(),
        l2=sf["s"].str.len(),
        c=sf["s"].str.contains("_1"),
        r=sf["s"].str.replace("_", "-"),
        sl=sf["s"].str.slice(0, 2),
    )
    want = pdf.assign(
        u=pdf.s.str.upper(),
        l2=pdf.s.str.len(),
        c=pdf.s.str.contains("_1", regex=False),
        r=pdf.s.str.replace("_", "-"),
        sl=pdf.s.str.slice(0, 2),
    )
    eq_frame(got, want)


def test_dt_accessor(spark):
    pdf = pd.DataFrame(
        {"t": pd.date_range("2024-01-01", periods=50, freq="7h"), "v": range(50)}
    )
    sf2 = SparkFrame.from_pandas(spark, pdf)
    got = sf2.assign(
        y=sf2["t"].dt.year,
        m=sf2["t"].dt.month,
        d=sf2["t"].dt.day,
        h=sf2["t"].dt.hour,
        dow=sf2["t"].dt.dayofweek,
        q=sf2["t"].dt.quarter,
    )
    want = pdf.assign(
        y=pdf.t.dt.year,
        m=pdf.t.dt.month,
        d=pdf.t.dt.day,
        h=pdf.t.dt.hour,
        dow=pdf.t.dt.dayofweek,
        q=pdf.t.dt.quarter,
    )
    eq_frame(got, want)


def test_dropna_fillna(spark):
    pdf = pd.DataFrame({"a": [1.0, None, 3.0, None], "b": [None, "x", "y", None]})
    sf2 = SparkFrame.from_pandas(spark, pdf)
    got = sf2.dropna(how="any").to_pandas()
    want = pdf.dropna(how="any")
    pdt.assert_frame_equal(got[want.columns], want, check_dtype=False)
    got_f = sf2.assign(a=sf2["a"].fillna(0.0)).to_pandas()
    want_f = pdf.assign(a=pdf.a.fillna(0.0))
    pdt.assert_frame_equal(got_f[want_f.columns], want_f, check_dtype=False)


def test_drop_duplicates_keeps_first(spark):
    pdf = pd.DataFrame({"k": [1, 1, 2, 2, 3], "v": [10, 20, 30, 40, 50]})
    sf2 = SparkFrame.from_pandas(spark, pdf)
    got = sf2.drop_duplicates(subset="k").to_pandas()
    want = pdf.drop_duplicates(subset="k")
    pdt.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_concat_union(sf, pdf):
    got = sf[["x"]].concat(sf[["x"]]).count()
    assert got == 2 * len(pdf)


def test_nlargest(sf, pdf):
    got = sf.nlargest(5, "x").to_pandas().sort_index()
    want = pdf.nlargest(5, "x").sort_index()
    pdt.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_sample_seeded(sf):
    n = sf.sample(0.3, seed=7).count()
    assert 10 <= n <= 60  # fraction is approximate by contract


def test_map_partitions(sf, pdf):
    def double(it):
        for p in it:
            p = p.copy()
            p["x"] = p["x"] * 2
            yield p

    schema = sf.to_spark().schema
    got = sf.map_partitions(double, schema)[["x"]].to_pandas().sort_index()
    want = pdf[["x"]] * 2
    pdt.assert_frame_equal(got, want, check_dtype=False)


def test_groupby_apply(sf, pdf):
    def demean(p: pd.DataFrame) -> pd.DataFrame:
        p = p.copy()
        p["z"] = p["z"] - p["z"].mean()
        return p[["y", "z"]]

    got = (
        sf.groupby("y")
        .apply(demean, schema="y long, z double")
        .to_spark()
        .toPandas()[["y", "z"]]
        .sort_values(["y", "z"])
        .reset_index(drop=True)
    )
    want = (
        pdf.assign(z=pdf.z - pdf.groupby("y").z.transform("mean"))[["y", "z"]]
        .sort_values(["y", "z"])
        .reset_index(drop=True)
    )
    pdt.assert_frame_equal(got, want, check_dtype=False)


def test_query_string(sf, pdf):
    got = sf.query("x > 90").to_pandas()
    want = pdf.query("x > 90")
    pdt.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_astype_rename_prefix(sf, pdf):
    got = sf[["x"]].astype({"x": "double"}).rename({"x": "xx"}).add_prefix("p_")
    assert got.columns == ["p_xx"]


# --------------------------------------------------------------------------
# New surface: rolling / resample / reshape / combine_first / map_overlap /
# groupby long tail — each vs the eager pandas oracle.
# --------------------------------------------------------------------------
def test_rolling_int_window(sf, pdf):
    eq_series(sf["z"].rolling(5).mean(), pdf.z.rolling(5).mean())
    eq_series(sf["z"].rolling(5).sum(), pdf.z.rolling(5).sum())
    eq_series(sf["x"].rolling(3).max(), pdf.x.rolling(3).max())
    eq_series(sf["z"].rolling(7).std(), pdf.z.rolling(7).std())


def test_rolling_min_periods(sf, pdf):
    eq_series(
        sf["z"].rolling(5, min_periods=1).mean(),
        pdf.z.rolling(5, min_periods=1).mean(),
    )


def test_value_counts(sf, pdf):
    got = sf["s"].value_counts().to_pandas()
    want = pdf.s.value_counts()
    assert dict(zip(got["s"], got["count"])) == want.to_dict()


def test_series_map_rank(sf, pdf):
    eq_series(
        sf["s"].map({"Aa_0": "zero", "Aa_1": "one"}, default="other"),
        pdf.s.map(lambda v: {"Aa_0": "zero", "Aa_1": "one"}.get(v, "other")),
    )
    eq_series(sf["z"].rank(), pdf.z.rank(method="min"))


def test_resample(spark):
    idx = pd.date_range("2024-01-01", periods=48, freq="30min")
    p = pd.DataFrame({"v": np.arange(48, dtype="float64")}, index=idx)
    f = SparkFrame.from_pandas(spark, p)
    got = f.resample("1h").agg({"v": "sum"}).to_pandas().sort_index()
    want = p.resample("1h").agg({"v": "sum"})
    pdt.assert_frame_equal(got, want, check_dtype=False, check_freq=False)


def test_resample_ohlc(spark):
    idx = pd.date_range("2024-01-01", periods=60, freq="1min")
    p = pd.DataFrame({"v": np.sin(np.arange(60.0))}, index=idx)
    f = SparkFrame.from_pandas(spark, p)
    got = f.resample("15min").ohlc("v").to_pandas().sort_index()
    want = p.v.resample("15min").ohlc()
    pdt.assert_frame_equal(got, want, check_dtype=False, check_freq=False)


def test_pivot_table(sf, pdf):
    got = sf.pivot_table(index="y", columns="s", values="z", aggfunc="sum").to_pandas().sort_index()
    want = pdf.pivot_table(index="y", columns="s", values="z", aggfunc="sum")
    want.columns = [str(c) for c in want.columns]
    want.index.name = None
    got = got[[c for c in want.columns]]
    pdt.assert_frame_equal(got, want, check_dtype=False)


def test_explode(spark):
    p = pd.DataFrame({"k": [1, 2], "v": [[1, 2, 3], [4]]})
    f = SparkFrame.from_pandas(spark, p)
    got = f.explode("v").to_pandas()
    want = p.explode("v")
    assert sorted(got["v"].tolist()) == sorted(int(x) for x in want["v"])


def test_melt(sf, pdf):
    got = sf.melt(id_vars="s", value_vars=["x", "z"]).to_pandas()
    want = pdf.melt(id_vars="s", value_vars=["x", "z"])
    assert len(got) == len(want)
    gs = sorted(zip(got["s"], got["variable"], got["value"].round(9)))
    ws = sorted(zip(want["s"], want["variable"], want["value"].astype(float).round(9)))
    assert gs == ws


def test_combine_first(spark):
    p1 = pd.DataFrame({"a": [1.0, None, 3.0], "b": [None, 5.0, 6.0]}, index=[0, 1, 2])
    p2 = pd.DataFrame({"a": [10.0, 20.0, 30.0], "c": [7.0, 8.0, 9.0]}, index=[1, 2, 3])
    f1, f2 = SparkFrame.from_pandas(spark, p1), SparkFrame.from_pandas(spark, p2)
    got = f1.combine_first(f2).to_pandas().sort_index()
    want = p1.combine_first(p2)
    pdt.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_map_overlap_centered_mean(spark):
    p = pd.DataFrame({"v": np.arange(50, dtype="float64")})
    f = SparkFrame.from_pandas(spark, p)

    def centered(pdf_):
        out = pdf_.copy()
        out["v"] = out["v"].rolling(3, center=True, min_periods=1).mean()
        return out

    got = f.map_overlap(
        centered, "__index__ long, v double", before=1, after=1, bucket_size=10
    ).to_pandas().sort_index()
    want = pd.DataFrame({"v": p.v.rolling(3, center=True, min_periods=1).mean()})
    pdt.assert_frame_equal(got, want, check_dtype=False)


def test_groupby_transform_fill(spark):
    p = pd.DataFrame(
        {"g": [0, 0, 0, 1, 1, 1], "v": [1.0, None, 3.0, None, 5.0, None]}
    )
    f = SparkFrame.from_pandas(spark, p)
    eq_series(f.groupby("g").ffill("v"), p.groupby("g").v.ffill())
    eq_series(f.groupby("g").bfill("v"), p.groupby("g").v.bfill())
    eq_series(
        f.groupby("g").transform("max", "v"), p.groupby("g").v.transform("max")
    )


def test_groupby_cumsum_shift_rank(sf, pdf):
    eq_series(sf.groupby("y").cumsum("z"), pdf.groupby("y").z.cumsum())
    eq_series(sf.groupby("y").shift("x"), pdf.groupby("y").x.shift())
    eq_series(
        sf.groupby("y").rank("z"), pdf.groupby("y").z.rank(method="min")
    )


def test_groupby_idxmax_value_counts(sf, pdf):
    got = sf.groupby("y").idxmax("z").to_pandas()
    want = pdf.groupby("y").z.idxmax()
    assert dict(zip(got["y"], got["z_idxmax"])) == want.to_dict()
    got_vc = sf.groupby("y").value_counts().to_pandas()
    want_vc = pdf.groupby("y")[["x", "z", "s"]].value_counts()
    assert len(got_vc) == len(want_vc)


def test_groupby_cov_corr(sf, pdf):
    got = sf.groupby("y").cov("x", "z").to_pandas()
    want = pdf.groupby("y").apply(lambda g: g.x.cov(g.z), include_groups=False)
    for k, v in want.items():
        gv = got.loc[got.y == k, "cov"].iloc[0]
        assert gv == pytest.approx(v, rel=1e-9, nan_ok=True)


def test_frame_cov_corr_scalar(sf, pdf):
    assert sf.cov("x", "z") == pytest.approx(pdf.x.cov(pdf.z), rel=1e-9)
    assert sf.corr("x", "z") == pytest.approx(pdf.x.corr(pdf.z), rel=1e-9)


def test_rollup_cube(sf, pdf):
    got = sf.rollup("s").agg({"z": "sum"}).to_pandas()
    # rollup: one row per s + grand total (null key)
    assert len(got) == pdf.s.nunique() + 1
    cube = sf.cube("s", "y").agg({"z": "sum"}).to_pandas()
    n_pairs = pdf.groupby(["s", "y"]).size().shape[0]
    assert len(cube) == n_pairs + pdf.s.nunique() + pdf.y.nunique() + 1


def test_series_replace_unique_nlargest(sf, pdf):
    eq_series(sf["y"].replace({0: 100, 1: 101}), pdf.y.replace({0: 100, 1: 101}))
    # unique is LAZY (reference Unique returns a composable Series);
    # .tolist() is the eager boundary — and the lazy frame keeps composing
    uniq = sf["s"].unique()
    assert sorted(uniq.tolist()) == sorted(pdf.s.unique())
    assert ".collect" not in type(uniq).__name__  # still a Series, not a list
    assert sorted((uniq.str.upper()).tolist()) == sorted(
        pdf.s.str.upper().unique()
    )
    got = sf["z"].nlargest(3).to_pandas()
    assert sorted(got["z"].tolist()) == sorted(pdf.z.nlargest(3).tolist())


def test_series_describe(sf, pdf):
    got = sf["z"].describe()
    want = pdf.z.describe()
    for k in ["count", "mean", "std", "min", "25%", "50%", "75%", "max"]:
        assert got[k] == pytest.approx(want[k], rel=1e-9)


def test_frame_describe_lazy_composes(sf, pdf):
    # lazy=True keeps the summary distributed and composable (LazyScalar's
    # pattern at frame granularity): filter a stat row BEFORE collecting
    lazy = sf.describe(lazy=True)
    row = lazy[lazy["summary"] == "count"].to_pandas()
    assert len(row) == 1
    assert int(float(row.iloc[0]["z"])) == len(pdf)
    eager = sf.describe()
    assert "summary" in eager.columns


def test_frame_replace_isna_dtypes(spark):
    p = pd.DataFrame({"a": [1.0, None, 3.0], "b": ["x", "y", "x"]})
    f = SparkFrame.from_pandas(spark, p)
    got = f.replace({"x": "z"}).to_pandas().sort_index()
    assert got["b"].tolist() == ["z", "y", "z"]
    na = f.isna().to_pandas().sort_index()
    assert na["a"].tolist() == [False, True, False]
    assert f.dtypes["a"] == "double" and f.dtypes["b"] == "string"


def test_align(spark):
    p1 = pd.DataFrame({"a": [1.0, 2.0]}, index=[0, 1])
    p2 = pd.DataFrame({"b": [3.0, 4.0]}, index=[1, 2])
    f1, f2 = SparkFrame.from_pandas(spark, p1), SparkFrame.from_pandas(spark, p2)
    l, r = f1.align(f2)
    lp, rp = l.to_pandas().sort_index(), r.to_pandas().sort_index()
    w1, w2 = p1.align(p2)
    assert lp.index.tolist() == w1.index.tolist()
    assert rp["b"].fillna(-1).tolist() == w2.b.fillna(-1).tolist()


def test_rolling_median_quantile(sf, pdf):
    eq_series(sf["z"].rolling(5).median(), pdf.z.rolling(5).median())
    eq_series(sf["z"].rolling(5).quantile(0.5), pdf.z.rolling(5).quantile(0.5))


def test_rolling_skew_kurt_compute(sf, pdf):
    # Spark exposes population skewness/kurtosis; pandas rolling uses
    # sample-adjusted estimators — assert shape/nullity, not equality
    # (documented delta in PARITY.md).
    got = sf["z"].rolling(10).skew().to_pandas()
    assert got.iloc[:9].isna().all() and got.iloc[9:].notna().all()
    got_k = sf["z"].rolling(10).kurt().to_pandas()
    assert got_k.iloc[9:].notna().all()


def test_cat_accessor(sf, pdf):
    cats = sf["s"].cat.categories
    assert cats == sorted(pdf.s.unique())
    got = sf.assign(c=sf["s"].cat.codes).to_pandas()
    want = pdf.s.astype("category").cat.codes
    assert got["c"].tolist() == want.tolist()
    renamed = sf["s"].cat.rename_categories({"Aa_0": "zero"})
    assert "zero" in renamed.to_frame().to_pandas()["s"].tolist()


def test_loc_indexer(sf, pdf):
    eq_frame(sf.loc[sf["y"] > 10], pdf.loc[pdf.y > 10])
    eq_frame(sf.loc[5:9], pdf.loc[5:9])
    got = sf.loc[7].to_pandas()
    assert got["x"].tolist() == [7]
    eq_frame(sf.loc[sf["y"] == 3, ["x", "s"]], pdf.loc[pdf.y == 3, ["x", "s"]])


def test_iloc_columns(sf, pdf):
    eq_frame(sf.iloc[:, 0:2], pdf.iloc[:, 0:2])
    eq_frame(sf.iloc[:, [0, 3]], pdf.iloc[:, [0, 3]])


def test_method_ops_fill_value(spark):
    p = pd.DataFrame({"a": [1.0, None, 3.0], "b": [10.0, 20.0, None]})
    f = SparkFrame.from_pandas(spark, p)
    eq_series(f["a"].add(f["b"], fill_value=0), p.a.add(p.b, fill_value=0))
    eq_series(f["a"].mul(f["b"], fill_value=1), p.a.mul(p.b, fill_value=1))
    eq_series(f["a"].sub(2, fill_value=0), p.a.sub(2, fill_value=0))


def test_resample_sem_std(spark):
    idx = pd.date_range("2024-01-01", periods=40, freq="15min")
    p = pd.DataFrame({"v": np.arange(40, dtype="float64") ** 1.5}, index=idx)
    f = SparkFrame.from_pandas(spark, p)
    got = f.resample("1h").std().to_pandas().sort_index()
    want = p.resample("1h").std()
    pdt.assert_frame_equal(got, want, check_dtype=False, check_freq=False)
    got_sem = f.resample("1h").sem().to_pandas().sort_index()
    want_sem = p.resample("1h").sem()
    pdt.assert_frame_equal(got_sem, want_sem, check_dtype=False, check_freq=False)


def test_empty_result_frames(spark):
    p = pd.DataFrame({"a": [1.0, 2.0], "b": ["x", "y"]})
    f = SparkFrame.from_pandas(spark, p)
    empty = f[f["a"] > 100]
    assert empty.count() == 0
    assert empty.to_pandas().empty
    # groupby over empty input yields empty result, not an error
    assert empty.groupby("b").sum().count() == 0
    # reductions over empty → null/0 like pandas' NaN/0
    assert empty["a"].sum() is None or empty["a"].sum() == 0
    assert empty["a"].count() == 0


def test_all_null_column(spark):
    p = pd.DataFrame({"a": [None, None, None], "b": [1, 2, 3]})
    f = SparkFrame.from_pandas(spark, p)
    assert f["a"].count() == 0
    assert f["a"].sum() is None
    got = f.assign(c=f["a"].fillna(0.0)).to_pandas()
    assert got["c"].tolist() == [0.0, 0.0, 0.0]
    assert f.dropna(subset="a").count() == 0


def test_single_row_frame(spark):
    p = pd.DataFrame({"a": [42.0]})
    f = SparkFrame.from_pandas(spark, p)
    assert f["a"].std() is None  # ddof=1 over 1 row → null (pandas: NaN)
    eq_series(f["a"].cumsum(), p.a.cumsum())
    assert f["a"].rolling(3, min_periods=1).mean().to_pandas().tolist() == [42.0]


def test_str_accessor_breadth(spark):
    vals = ["hello world", "Spark SQL", "  pad  ", "a_b_c_d", "XYZ", "mixedCase", ""]
    pdf = pd.DataFrame({"s": vals})
    sf2 = SparkFrame.from_pandas(spark, pdf)
    s = sf2["s"]
    got = sf2.assign(
        cf=s.str.casefold(),
        sw=s.str.swapcase(),
        ce=s.str.center(11, "*"),
        lj=s.str.ljust(11, "."),
        rj=s.str.rjust(11, "."),
        al=s.str.isalpha(),
        an=s.str.isalnum(),
        lo=s.str.islower(),
        up=s.str.isupper(),
        rp=s.str.removeprefix("hello "),
        rs=s.str.removesuffix("Case"),
        sr=s.str.slice_replace(1, 3, "@"),
        rf=s.str.rfind("a"),
        fi=s.str.find("a"),
    )
    want = pdf.assign(
        cf=pdf.s.str.casefold(),
        sw=pdf.s.str.swapcase(),
        ce=pdf.s.str.center(11, "*"),
        lj=pdf.s.str.ljust(11, "."),
        rj=pdf.s.str.rjust(11, "."),
        al=pdf.s.str.isalpha(),
        an=pdf.s.str.isalnum(),
        lo=pdf.s.str.islower(),
        up=pdf.s.str.isupper(),
        rp=pdf.s.str.removeprefix("hello "),
        rs=pdf.s.str.removesuffix("Case"),
        sr=pdf.s.str.slice_replace(1, 3, "@"),
        rf=pdf.s.str.rfind("a"),
        fi=pdf.s.str.find("a"),
    )
    eq_frame(got, want)


def test_str_match_findall_translate_wrap(spark):
    pdf = pd.DataFrame({"s": ["ab12cd3", "xy", "123", "a1b2"]})
    sf2 = SparkFrame.from_pandas(spark, pdf)
    s = sf2["s"]
    got = sf2.assign(
        m=s.str.match(r"[a-z]+\d"),
        fm=s.str.fullmatch(r"\d+"),
        fa=s.str.findall(r"\d"),
        tr=s.str.translate({"1": "one", "2": None}),
    )
    want = pdf.assign(
        m=pdf.s.str.match(r"[a-z]+\d"),
        fm=pdf.s.str.fullmatch(r"\d+"),
        fa=pdf.s.str.findall(r"\d"),
        tr=pdf.s.str.translate({ord("1"): "one", ord("2"): None}),
    )
    eq_frame(got, want)


def test_str_split_expand_partition(spark):
    pdf = pd.DataFrame({"s": ["a b c", "x y", "solo", "p q r s"]})
    sf2 = SparkFrame.from_pandas(spark, pdf)
    got = sf2["s"].str.split(" ", n=2, expand=True).to_pandas()
    want = pdf.s.str.split(" ", n=2, expand=True)
    want.columns = [f"s_{c}" for c in want.columns]
    pdt.assert_frame_equal(got[want.columns], want, check_dtype=False)

    got_r = sf2["s"].str.rsplit(" ", n=2).to_pandas()
    want_r = pdf.s.str.rsplit(" ", n=2)
    pdt.assert_series_equal(got_r, want_r, check_dtype=False, check_names=False)

    got_p = sf2["s"].str.partition(" ").to_pandas()
    want_p = pdf.s.str.partition(" ")
    want_p.columns = [f"s_{c}" for c in want_p.columns]
    pdt.assert_frame_equal(got_p[want_p.columns], want_p, check_dtype=False)

    got_rp = sf2["s"].str.rpartition(" ").to_pandas()
    want_rp = pdf.s.str.rpartition(" ")
    want_rp.columns = [f"s_{c}" for c in want_rp.columns]
    pdt.assert_frame_equal(got_rp[want_rp.columns], want_rp, check_dtype=False)


def test_dt_accessor_breadth(spark):
    pdf = pd.DataFrame(
        {"t": pd.date_range("2023-12-29 05:30:12", periods=60, freq="11h37min")}
    )
    sf2 = SparkFrame.from_pandas(spark, pdf)
    t = sf2["t"]
    got = sf2.assign(
        wd=t.dt.weekday,
        us=t.dt.microsecond,
        dim=t.dt.days_in_month,
        qs=t.dt.is_quarter_start,
        qe=t.dt.is_quarter_end,
        ys=t.dt.is_year_start,
        ye=t.dt.is_year_end,
        ly=t.dt.is_leap_year,
        fl=t.dt.floor("D"),
        ce=t.dt.ceil("H"),
        ro=t.dt.round("H"),
        no=t.dt.normalize(),
        st=t.dt.strftime("%Y/%m/%d %a"),
    )
    want = pdf.assign(
        wd=pdf.t.dt.weekday,
        us=pdf.t.dt.microsecond,
        dim=pdf.t.dt.days_in_month,
        qs=pdf.t.dt.is_quarter_start,
        qe=pdf.t.dt.is_quarter_end,
        ys=pdf.t.dt.is_year_start,
        ye=pdf.t.dt.is_year_end,
        ly=pdf.t.dt.is_leap_year,
        fl=pdf.t.dt.floor("D"),
        ce=pdf.t.dt.ceil("h"),
        ro=pdf.t.dt.round("h"),
        no=pdf.t.dt.normalize(),
        st=pdf.t.dt.strftime("%Y/%m/%d %a"),
    )
    eq_frame(got, want)


def test_prod_cumprod_sem_skew(spark):
    pdf = pd.DataFrame({"a": [1.0, 2.0, 3.0, 4.0, 2.5], "b": [2, 4, 1, 3, 5]})
    sf2 = SparkFrame.from_pandas(spark, pdf)
    assert abs(sf2["a"].prod() - pdf.a.prod()) < 1e-9
    assert abs(sf2["a"].sem() - pdf.a.sem()) < 1e-9
    assert abs(sf2["a"].skew() - pdf.a.skew()) < 0.75  # population vs sample estimator
    eq_series(sf2["a"].cumprod(), pdf.a.cumprod())
    eq_series(sf2["a"].pct_change(), pdf.a.pct_change())


def test_tail_eval_squeeze_rename_axis(spark):
    pdf = pd.DataFrame({"a": range(20), "b": [i * 2.0 for i in range(20)]})
    sf2 = SparkFrame.from_pandas(spark, pdf)
    pdt.assert_frame_equal(sf2.tail(4), pdf.tail(4), check_dtype=False)

    got = sf2.eval("c = a + b").to_pandas()
    want = pdf.eval("c = a + b")
    pdt.assert_frame_equal(got[want.columns], want, check_dtype=False)

    s = sf2[["b"]].squeeze()
    eq_series(s, pdf.b)

    named = sf2.rename_axis("rows").to_pandas()
    assert named.index.name == "rows"


def test_nbytes(spark):
    pdf = pd.DataFrame({"a": np.arange(10, dtype="int64"), "s": ["xy"] * 10})
    sf2 = SparkFrame.from_pandas(spark, pdf)
    assert sf2["a"].nbytes == 80
    assert sf2["s"].nbytes == 20


def test_groupby_cumulatives_prod_quantile_sem(spark):
    pdf = pd.DataFrame(
        {
            "g": ["a", "a", "a", "b", "b", "c"],
            "v": [2.0, 3.0, 4.0, 1.5, 2.5, 7.0],
        }
    )
    sf2 = SparkFrame.from_pandas(spark, pdf)
    gb = sf2.groupby("g")
    eq_series(gb.cumprod("v"), pdf.groupby("g").v.cumprod())
    eq_series(gb.cummax("v"), pdf.groupby("g").v.cummax())
    eq_series(gb.cummin("v"), pdf.groupby("g").v.cummin())
    eq_series(gb.cumcount(), pdf.groupby("g").cumcount())

    got_p = gb.prod().to_pandas().set_index("g")[["v"]].rename_axis(None).sort_index()
    want_p = pdf.groupby("g").prod().rename_axis(None)
    pdt.assert_frame_equal(got_p, want_p, check_dtype=False)

    got_q = gb.quantile(0.5).to_pandas().set_index("g")[["v"]].rename_axis(None).sort_index()
    want_q = pdf.groupby("g").v.quantile(0.5).to_frame("v").rename_axis(None)
    pdt.assert_frame_equal(got_q, want_q, check_dtype=False)

    got_s = gb.sem().to_pandas().set_index("g")[["v"]].rename_axis(None).sort_index()
    want_s = pdf.groupby("g").v.sem().to_frame("v").rename_axis(None)
    pdt.assert_frame_equal(got_s, want_s, check_dtype=False)


def test_groupby_rolling(spark):
    pdf = pd.DataFrame({"g": ["a"] * 5 + ["b"] * 4, "v": [1.0, 2, 3, 4, 5, 10, 20, 30, 40]})
    sf2 = SparkFrame.from_pandas(spark, pdf)
    got = sf2.groupby("g").rolling(3, "v", "mean")
    want = (
        pdf.groupby("g").v.rolling(3, min_periods=1).mean().reset_index(level=0, drop=True)
    )
    eq_series(got, want)


def test_rolling_apply_agg_cov(spark):
    pdf = pd.DataFrame(
        {"a": [1.0, 3.0, 2.0, 5.0, 4.0, 6.0], "b": [2.0, 1.0, 4.0, 3.0, 6.0, 5.0]}
    )
    sf2 = SparkFrame.from_pandas(spark, pdf)
    got = sf2["a"].rolling(3).apply(lambda v: float(v.max() - v.min()))
    want = pdf.a.rolling(3).apply(lambda v: v.max() - v.min())
    eq_series(got, want)

    got_cov = sf2["a"].rolling(3).cov(sf2["b"])
    want_cov = pdf.a.rolling(3).cov(pdf.b)
    eq_series(got_cov, want_cov)

    got_agg = sf2["a"].rolling(2).agg(["sum", "max"]).to_pandas()
    want_agg = pdf.a.rolling(2).agg(["sum", "max"])
    want_agg.columns = ["a_sum", "a_max"]
    pdt.assert_frame_equal(got_agg[want_agg.columns], want_agg, check_dtype=False)
