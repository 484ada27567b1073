"""Round-3 regression tests: ADVICE fixes (axis defaults, streaming sink
safety, CC convergence/conf hygiene, byte-size parsing, repartition
validation) and the map_overlap re-partitioning rework."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pandas.testing as pdt
import pytest

from dask_expr_rapids_spark.operators.frame import SparkFrame
from dask_expr_rapids_spark.operators.graph import connected_components
from dask_expr_rapids_spark.sources.tables import _parse_bytes


# -- ADVICE: frame reductions must not silently default to axis=1 ----------
def test_frame_reduction_default_axis_raises(spark):
    f = SparkFrame.from_pandas(spark, pd.DataFrame({"x": [1.0, 2.0], "y": [3.0, 4.0]}))
    for meth in ("sum", "mean", "min", "max", "var", "std"):
        with pytest.raises(NotImplementedError):
            getattr(f, meth)()  # pandas default axis=0 → loud, not row-wise
        getattr(f, meth)(axis=1)  # explicit row-wise still works


# -- ADVICE: repartition with no arguments is a clear error ----------------
def test_repartition_requires_target(spark):
    f = SparkFrame.from_pandas(spark, pd.DataFrame({"x": [1, 2, 3]}))
    with pytest.raises(ValueError, match="npartitions"):
        f.repartition()
    assert f.repartition(2).npartitions == 2


# -- ADVICE: byte-size conf parser covers k/m/g/t suffixes -----------------
def test_parse_bytes_suffixes():
    assert _parse_bytes("134217728") == 134217728
    assert _parse_bytes("128m") == 128 << 20
    assert _parse_bytes("128mb") == 128 << 20
    assert _parse_bytes("1g") == 1 << 30
    assert _parse_bytes("256k") == 256 << 10
    assert _parse_bytes("2t") == 2 << 40
    assert _parse_bytes("64b") == 64
    assert _parse_bytes(" 512M ") == 512 << 20
    assert _parse_bytes("garbage") == 134217728  # safe default


# -- ADVICE: connected_components hygiene ----------------------------------
def test_cc_does_not_mutate_session_conf(spark):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["src", "dst"]
    )
    out = {
        r["node"]: r["comp"] for r in connected_components(edges).collect()
    }
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_cc_unconverged_raises(spark):
    # a 9-node path has diameter 8: one round of propagation (+halving)
    # cannot finish, and partial labels must not be returned silently
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 9)], ["src", "dst"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=1)
    with pytest.raises(ValueError):
        connected_components(edges, max_iter=0)


# -- streaming sink: unsafe update+overwrite combination -------------------
def test_stream_drain_update_multibatch_refuses(spark, tmp_path):
    import pyspark.sql.functions as F

    from dask_expr_rapids_spark.streaming.ops import (
        read_events_stream,
        run_available_now_to_files,
    )

    src = tmp_path / "src"
    src.mkdir()
    pd.DataFrame({"user_id": [1, 2], "value": [1.0, 2.0]}).to_parquet(
        src / "a.parquet", index=False
    )
    pd.DataFrame({"user_id": [3, 4], "value": [3.0, 4.0]}).to_parquet(
        src / "b.parquet", index=False
    )
    stream = read_events_stream(spark, str(src), max_files_per_trigger=1)
    agg = stream.groupBy("user_id").agg(F.sum("value").alias("total"))
    with pytest.raises(Exception, match="more than one micro-batch"):
        run_available_now_to_files(
            agg,
            str(tmp_path / "out_update"),
            output_mode="update",
            checkpoint=str(tmp_path / "ckpt1"),
        )
    # complete mode drains the same multi-batch stream safely
    out = run_available_now_to_files(
        agg,
        str(tmp_path / "out_complete"),
        output_mode="complete",
        checkpoint=str(tmp_path / "ckpt2"),
    )
    got = {r["user_id"]: r["total"] for r in out.collect()}
    assert got == {1: 1.0, 2: 2.0, 3: 3.0, 4: 4.0}


# -- map_overlap: correctness preserved + no single-partition funnel -------
def test_map_overlap_multipartition_plan(spark):
    p = pd.DataFrame({"v": np.arange(100, dtype="float64")})
    f = SparkFrame.from_pandas(spark, p)

    def centered(pdf_):
        out = pdf_.copy()
        out["v"] = out["v"].rolling(5, center=True, min_periods=1).mean()
        return out

    res = f.map_overlap(
        centered, "__index__ long, v double", before=2, after=2, bucket_size=10
    )
    plan = res._sdf._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    got = res.to_pandas().sort_index()
    want = pd.DataFrame({"v": p.v.rolling(5, center=True, min_periods=1).mean()})
    pdt.assert_frame_equal(got, want, check_dtype=False)


# -- pandas-semantics partials closed in round 3 ---------------------------
# ffill/bfill limit=, multi-value mode, callable agg specs, non-numeric
# describe, shift(freq=), Resampler.size — all differential vs pandas
# (reference methodology, SURVEY.md §5.1).


@pytest.fixture(scope="module")
def gap_pdf():
    return pd.DataFrame(
        {
            "g": [1, 1, 1, 1, 1, 2, 2, 2, 2, 2],
            "v": [1.0, None, None, None, 5.0, None, 7.0, None, None, None],
        }
    )


def _eq_series(sp_result, pd_result):
    got = sp_result.to_pandas()
    pdt.assert_series_equal(got, pd_result, check_dtype=False, check_names=False)


@pytest.mark.parametrize("limit", [1, 2, None])
def test_ffill_bfill_limit(spark, gap_pdf, limit):
    f = SparkFrame.from_pandas(spark, gap_pdf, npartitions=3)
    _eq_series(f["v"].ffill(limit=limit), gap_pdf.v.ffill(limit=limit))
    _eq_series(f["v"].bfill(limit=limit), gap_pdf.v.bfill(limit=limit))


@pytest.mark.parametrize("limit", [1, None])
def test_groupby_ffill_bfill_limit(spark, gap_pdf, limit):
    f = SparkFrame.from_pandas(spark, gap_pdf, npartitions=3)
    _eq_series(
        f.groupby("g").ffill("v", limit=limit),
        gap_pdf.groupby("g").v.ffill(limit=limit),
    )
    _eq_series(
        f.groupby("g").bfill("v", limit=limit),
        gap_pdf.groupby("g").v.bfill(limit=limit),
    )


def test_mode_multi_value(spark):
    p = pd.DataFrame({"v": [3, 1, 1, 3, 2, None]})
    f = SparkFrame.from_pandas(spark, p)
    assert f["v"].mode() == list(p.v.mode())  # tie -> [1.0, 3.0]
    assert f["v"].mode(first=True) == 1.0
    single = pd.DataFrame({"v": [5, 5, 7]})
    fs = SparkFrame.from_pandas(spark, single)
    assert fs["v"].mode() == [5]


def test_groupby_agg_callable_specs(spark, gap_pdf):
    f = SparkFrame.from_pandas(spark, gap_pdf, npartitions=3)

    def val_range(s: pd.Series) -> float:
        return float(s.max() - s.min())

    got = (
        f.groupby("g")
        .agg({"v": ["sum", val_range]})
        .to_pandas()
        .sort_index()[["v_sum", "v_val_range"]]
    )
    want = (
        gap_pdf.groupby("g")
        .v.agg(["sum", val_range])
        .rename(columns={"sum": "v_sum", "val_range": "v_val_range"})
    )
    want.index.name = None
    pdt.assert_frame_equal(got, want, check_dtype=False)

    # bare callable spec applies to every non-key column
    got2 = f.groupby("g").agg(val_range).to_pandas().sort_index()
    assert list(got2["v_val_range"]) == list(want["v_val_range"])


def test_describe_string(spark):
    p = pd.DataFrame({"s": ["b", "a", "b", None, "c", "b"]})
    f = SparkFrame.from_pandas(spark, p)
    got = f["s"].describe()
    want = p.s.describe()
    assert got["count"] == want["count"]
    assert got["unique"] == want["unique"]
    assert got["top"] == want["top"]
    assert got["freq"] == want["freq"]


def test_describe_datetime(spark):
    ts = pd.to_datetime(
        ["2024-01-02", "2024-01-01", "2024-01-02", "2024-03-05"]
    )
    p = pd.DataFrame({"t": ts})
    f = SparkFrame.from_pandas(spark, p)
    got = f["t"].describe()
    assert got["count"] == 4
    assert got["unique"] == 3
    assert pd.Timestamp(got["top"]) == pd.Timestamp("2024-01-02")
    assert got["freq"] == 2
    assert pd.Timestamp(got["first"]) == ts.min()
    assert pd.Timestamp(got["last"]) == ts.max()


def test_shift_freq(spark):
    idx = pd.date_range("2024-01-01", periods=6, freq="1h")
    p = pd.DataFrame({"v": np.arange(6, dtype="float64")}, index=idx)
    f = SparkFrame.from_pandas(spark, p, npartitions=2)
    got = f["v"].shift(2, freq="1h").to_pandas()
    want = p.v.shift(2, freq="1h")
    pdt.assert_series_equal(got, want, check_dtype=False, check_names=False, check_freq=False)
    got_neg = f["v"].shift(-3, freq="30min").to_pandas()
    want_neg = p.v.shift(-3, freq="30min")
    pdt.assert_series_equal(got_neg, want_neg, check_dtype=False, check_names=False, check_freq=False)


def test_resample_size(spark):
    idx = pd.to_datetime(
        ["2024-01-01 00:05", "2024-01-01 00:40", "2024-01-01 01:10",
         "2024-01-01 01:20", "2024-01-01 03:59"]
    )
    p = pd.DataFrame({"v": [1.0, None, 3.0, None, 5.0]}, index=idx)
    f = SparkFrame.from_pandas(spark, p, npartitions=2)
    got = (
        f.resample("1h").size().to_pandas().sort_index()["size"]
    )
    want = p.resample("1h").size()
    want = want[want > 0]  # Spark emits only non-empty buckets
    pdt.assert_series_equal(got, want, check_dtype=False, check_names=False, check_freq=False)


# -- categorical known/unknown state machine (reference _categorical.py) ---
def test_cat_state_machine(spark):
    p = pd.DataFrame({"s": ["b", "a", "c", "a", None]})
    f = SparkFrame.from_pandas(spark, p)
    s = f["s"]
    assert s.cat.known is False
    known = s.cat.as_known()
    assert known.cat.known is True
    assert known.cat.categories == ["a", "b", "c"]
    # cached dictionary reused (no recompute): mutate cache to prove reuse
    known._cat_known = ["a", "b"]
    assert known.cat.categories == ["a", "b"]
    assert known.cat.as_unknown().cat.known is False
    ext = s.cat.set_categories(["c", "b"])
    got = ext.cat.codes.to_pandas().tolist()
    assert got == [1, -1, 0, -1, -1]  # 'a' and null -> -1
    added = ext.cat.add_categories(["z"])
    assert added.cat.categories == ["c", "b", "z"]
    removed = added.cat.remove_categories("b")
    assert removed.cat.categories == ["c", "z"]


# -- repartition(divisions=) / partition_size= (reference _repartition) ----
def test_repartition_divisions(spark):
    p = pd.DataFrame({"v": np.arange(100, dtype="int64")})
    f = SparkFrame.from_pandas(spark, p, npartitions=5)
    r = f.repartition(divisions=[0, 25, 50, 99])
    assert r.npartitions == 3
    # contents preserved (boundaries inclusive at the ends)
    assert sorted(r.to_pandas().v.tolist()) == list(range(100))
    # out-of-range rows are dropped, like dask's divisions contract
    r2 = f.repartition(divisions=[10, 50, 89])
    assert sorted(r2.to_pandas().v.tolist()) == list(range(10, 90))


def test_repartition_partition_size(spark):
    p = pd.DataFrame({"v": np.arange(1000, dtype="int64")})
    f = SparkFrame.from_pandas(spark, p, npartitions=2)
    small = f.repartition(partition_size="1k")  # tiny target -> many parts
    assert small.npartitions > 2
    big = f.repartition(partition_size="1g")  # huge target -> 1 part
    assert big.npartitions == 1


# -- rolling center=True over a time-offset window -------------------------
@pytest.mark.parametrize("window", ["3s", "4s", "5s"])
def test_rolling_center_time_window(spark, window):
    idx = pd.to_datetime(
        ["2024-01-01 00:00:00", "2024-01-01 00:00:01", "2024-01-01 00:00:02",
         "2024-01-01 00:00:03", "2024-01-01 00:00:04", "2024-01-01 00:00:06"]
    )
    p = pd.DataFrame({"v": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]}, index=idx)
    f = SparkFrame.from_pandas(spark, p, npartitions=2)
    got = f["v"].rolling(window, center=True).sum().to_pandas()
    want = p.v.rolling(window, center=True).sum()
    pdt.assert_series_equal(got, want, check_dtype=False, check_names=False, check_freq=False)


# -- LazyScalar: composable reductions, one job instead of two -------------
def test_lazy_scalar_composes(spark):
    p = pd.DataFrame({"x": np.arange(20, dtype="float64")})
    f = SparkFrame.from_pandas(spark, p, npartitions=3)
    got = f[f["x"] > f["x"].mean(lazy=True)].to_pandas().sort_index()
    want = p[p.x > p.x.mean()]
    pdt.assert_frame_equal(got[["x"]], want, check_dtype=False)
    # arithmetic against the lazy scalar also composes
    centered = (f["x"] - f["x"].mean(lazy=True)).to_pandas()
    pdt.assert_series_equal(
        centered, p.x - p.x.mean(), check_dtype=False, check_names=False
    )
    # force the value
    assert float(f["x"].max(lazy=True)) == 19.0
    # the composed plan contains no second scan via collect: it is a single
    # DataFrame whose plan embeds the aggregate (smoke: count works)
    assert f[f["x"] >= f["x"].min(lazy=True)].count() == 20


# -- the last two documented non-goals, now implemented --------------------
def test_partitions_positional(spark):
    p = pd.DataFrame({"v": np.arange(40, dtype="int64")})
    f = SparkFrame.from_pandas(spark, p, npartitions=4)
    total = sum(f.partitions[i].count() for i in range(f.npartitions))
    assert total == 40
    # slice form unions contiguous partitions; full slice is everything
    assert f.partitions[:].count() == 40
    assert f.partitions[0].npartitions >= 1


def test_memory_usage(spark):
    p = pd.DataFrame({"a": [1, 2, 3], "s": ["xx", "yyy", None]})
    f = SparkFrame.from_pandas(spark, p)
    got = f.memory_usage()
    assert got["a"] == 3 * 8  # bigint non-null count x width
    assert got["s"] == 5  # octet lengths of 'xx' + 'yyy'


# -- small pandas-surface parity added in round 3 --------------------------
def test_surface_parity_methods(spark):
    p = pd.DataFrame({"a": [3, 1, 2], "s": ["x", "y", "z"], "f": [0.5, 1.5, 2.5]})
    f = SparkFrame.from_pandas(spark, p, npartitions=2)
    assert f.shape == (3, 3)
    assert f.axes[1] == ["a", "s", "f"]
    assert f.keys() == ["a", "s", "f"]
    assert dict(f.dtypes)["s"] == "string"
    assert [k for k, _ in f.items()] == ["a", "s", "f"]
    assert len(f.divisions) == f.npartitions + 1
    assert f.copy().count() == 3
    assert sorted(f.get_partition(0).to_pandas().index.tolist() +
                  f.get_partition(1).to_pandas().index.tolist()) == [0, 1, 2]
    assert f.select_dtypes(include="number").columns == ["a", "f"]
    assert f.select_dtypes(exclude="string").columns == ["a", "f"]
    assert f[["a"]].to_series().name == "a"
    assert f.shuffle("a", npartitions=3).npartitions == 3
    per_part = f.memory_usage_per_partition()
    assert per_part.sum() > 0
    assert "a: bigint" in f.info()
    persisted = f.persist()
    assert persisted.count() == 3
    persisted._sdf.unpersist()


def test_series_parity_methods(spark):
    p = pd.DataFrame({"v": [1.0, 2.0, 3.0], "u": [3.0, 1.0, 2.0]})
    f = SparkFrame.from_pandas(spark, p, npartitions=2)
    s = f["v"]
    assert s.dtype == "double"
    assert s.shape == (3,)
    assert list(s.values) == [1.0, 2.0, 3.0]
    assert s.is_monotonic_increasing is True
    assert s.is_monotonic_decreasing is False
    assert f["u"].is_monotonic_increasing is False
    assert s.copy().sum() == 6.0
    assert s.median_approximate() == 2.0
    # named comparisons mirror the dunder operators
    assert f[s.ge(2.0)].count() == 2
    assert f[s.isnull()].count() == 0
    assert f[s.notna()].count() == 3
