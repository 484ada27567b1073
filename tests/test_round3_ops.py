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
