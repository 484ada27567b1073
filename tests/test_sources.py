"""Environment-drift guards for the load boundary.

Round 4 lesson: a silent testdata regeneration flipped ``events.ts`` from
parquet TIMESTAMP(NANOS) to naive ``timestamp[us]`` (TIMESTAMP_NTZ in
Spark) and broke nine tests with confusing downstream errors.  These tests
pin the CONTRACT instead: whatever encoding is on disk, ``load_table``
yields the expected dtypes — so the next drift fails ONE obvious test.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from dask_expr_rapids_spark.sources.tables import TABLES, load_table, _normalize_ts

from .conftest import SF_DIR

# key-column dtype contract per table (load_table output, not raw parquet)
EXPECTED_DTYPES = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_regionkey": "int"},
    "customer": {"c_custkey": "bigint", "c_nationkey": "int", "c_acctbal": "double"},
    "supplier": {"s_suppkey": "bigint", "s_nationkey": "int"},
    "part": {"p_partkey": "bigint", "p_retailprice": "double"},
    # every time-typed column must load as plain session-tz timestamp (NOT
    # timestamp_ntz, NOT bigint) whatever the parquet encoding is
    "orders": {"o_orderkey": "bigint", "o_custkey": "bigint", "o_orderdate": "timestamp"},
    "lineitem": {
        "l_orderkey": "bigint",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_shipdate": "timestamp",
    },
    "events": {"event_id": "bigint", "ts": "timestamp", "user_id": "bigint", "value": "double"},
    "documents": {"doc_id": "bigint", "text": "string", "lang": "string", "n_chars": "bigint"},
    "embeddings": {"vec_id": "bigint", "embedding": "array<float>", "label": "int"},
}


@pytest.mark.parametrize("table", TABLES)
def test_load_table_dtype_contract(spark, table):
    path = os.path.join(SF_DIR, f"{table}.parquet")
    if not os.path.exists(path):
        pytest.skip(f"{path} absent")
    df = load_table(spark, SF_DIR, table)
    got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    want = EXPECTED_DTYPES[table]
    bad = {c: (want[c], got.get(c)) for c in want if got.get(c) != want[c]}
    assert not bad, f"{table}: dtype drift (want, got) = {bad} — full schema {got}"


def test_ts_normalization_all_encodings(spark, tmp_path):
    """Write the same frame as ns-TIMESTAMP, naive us (NTZ), and us-LTZ
    parquet; assert load-path normalization produces identical timestamps."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ts = pd.to_datetime(
        ["2024-01-01 00:00:00.123456", "2024-06-15 12:34:56.654321", "1969-12-31 23:59:59.5"]
    )
    ids = [1, 2, 3]

    paths = {}
    for name, arrow_type in [
        ("ns", pa.timestamp("ns")),
        ("us_ntz", pa.timestamp("us")),
        ("us_ltz", pa.timestamp("us", tz="UTC")),
    ]:
        t = pa.table({"event_id": pa.array(ids, pa.int64()), "ts": pa.array(ts, arrow_type)})
        d = tmp_path / name
        d.mkdir()
        p = str(d / "events.parquet")
        pq.write_table(t, p)
        paths[name] = str(d)

    results = {}
    for name, d in paths.items():
        df = load_table(spark, d, "events")
        assert df.schema["ts"].dataType.simpleString() == "timestamp", (
            f"{name}: ts is {df.schema['ts'].dataType.simpleString()}"
        )
        results[name] = sorted(
            (r.event_id, r.ts.isoformat()) for r in df.select("event_id", "ts").collect()
        )
    assert results["ns"] == results["us_ntz"] == results["us_ltz"], results


def test_normalize_ts_accepts_ntz_frames(spark):
    """A user-supplied NTZ frame (not via load_table) still works through
    the time-semantics paths — rolling time window + dt accessor."""
    from pyspark.sql import functions as F

    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(["2024-01-01 00:00:00.250000", "2024-01-01 00:02:00.000000"]),
            "v": [1.0, 2.0],
        }
    )
    ntz = spark.createDataFrame(pdf, schema="ts timestamp_ntz, v double")
    assert ntz.schema["ts"].dataType.simpleString() == "timestamp_ntz"
    out = _normalize_ts(ntz)
    assert out.schema["ts"].dataType.simpleString() == "timestamp"
    # unix_micros path used by rolling/range windows must not throw on the
    # normalized frame and must preserve sub-second precision
    micros = [r[0] for r in out.select(F.unix_micros(F.col("ts").cast("timestamp"))).collect()]
    assert micros[0] % 1_000_000 == 250_000


def test_orc_roundtrip_partitioned(spark, tmp_path):
    """ORC sink with hive partitioning: values and dtypes survive the
    write→read cycle, and the partition column is recovered."""
    from dask_expr_rapids_spark.sources.tables import load_table, read_orc, to_orc

    n = load_table(spark, SF_DIR, "nation")
    path = str(tmp_path / "nation_orc_part")
    to_orc(n, path, partition_on=["n_regionkey"])
    back = read_orc(spark, path)
    assert sorted(back.columns) == sorted(n.columns)
    want = sorted(
        (r.n_nationkey, r.n_name, int(r.n_regionkey)) for r in n.collect()
    )
    got = sorted(
        (r.n_nationkey, r.n_name, int(r.n_regionkey)) for r in back.collect()
    )
    assert got == want
