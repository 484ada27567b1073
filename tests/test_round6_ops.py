"""Unit tests for round-6 operators: sequence packing semantics and the
md5-uniform SQL twin used by domain mixing."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from dask_expr_rapids_spark.operators.packing import pack_sequences
from dask_expr_rapids_spark.operators.sampling import hash_uniform, hash_uniform_sql


def test_pack_sequences_block_semantics(spark):
    pdf = pd.DataFrame(
        {
            "g": ["a"] * 5 + ["b"] * 3,
            "i": list(range(5)) + list(range(3)),
            "tok": [300, 300, 300, 300, 300, 600, 600, 600],
        }
    )
    df = spark.createDataFrame(pdf)
    out = (
        pack_sequences(df, "tok", 512, group_cols=["g"], order_col="i")
        .orderBy("g", "i")
        .collect()
    )
    # group a: prefix sums before = 0,300,600,900,1200 -> blocks 0,0,1,1,2
    assert [r["seq_id"] for r in out if r["g"] == "a"] == [0, 0, 1, 1, 2]
    # group b: 0,600,1200 -> 0,1,2 (independent of group a)
    assert [r["seq_id"] for r in out if r["g"] == "b"] == [0, 1, 2]


def test_pack_sequences_stable_under_repartition(spark):
    pdf = pd.DataFrame({"g": ["x"] * 40, "i": range(40), "tok": [97] * 40})
    a = pack_sequences(spark.createDataFrame(pdf), "tok", 256, ["g"], "i")
    b = pack_sequences(spark.createDataFrame(pdf).repartition(7), "tok", 256, ["g"], "i")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pack_sequences_rejects_bad_capacity(spark):
    df = spark.createDataFrame(pd.DataFrame({"g": ["x"], "i": [0], "tok": [1]}))
    import pytest

    with pytest.raises(ValueError):
        pack_sequences(df, "tok", 0, ["g"], "i")


def test_hash_uniform_sql_matches_spark(spark, oracle):
    keys = list(range(100))
    got_spark = (
        spark.createDataFrame(pd.DataFrame({"k": keys}))
        .select(hash_uniform(F.col("k")).alias("u"))
        .toPandas()["u"]
        .tolist()
    )
    got_duck = oracle.execute(
        f"SELECT {hash_uniform_sql('k')} AS u FROM (SELECT unnest(range(100)) AS k)"
    ).df()["u"].tolist()
    assert got_spark == got_duck  # bit-identical, not approx
