"""Shared fixtures: one SparkSession per test session + the DuckDB
differential oracle (mirrors the driver's compare: sorted columns, row
count, order-insensitive exact value match)."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from dask_expr_rapids_spark.session import get_spark
from dask_expr_rapids_spark.sources.tables import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "4g"},
    )
    yield s


@pytest.fixture(scope="session")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


def _normalize_cell(v) -> str:
    if v is None or (isinstance(v, float) and v != v):
        return "NULL"
    if pd.isna(v):
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def canonical_rows(pdf: pd.DataFrame) -> list[str]:
    """Order-insensitive canonical form: sort columns by name, stringify
    every cell, sort the row-strings.  Exact float repr — no tolerance —
    matching the strictest possible driver hash."""
    cols = sorted(pdf.columns)
    rows = [
        "\x1f".join(_normalize_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows)


def assert_matches_oracle(spark_df, con, sql: str, name: str = "?"):
    spdf = spark_df.toPandas()
    opdf = con.execute(sql).df()
    assert sorted(spdf.columns) == sorted(opdf.columns), (
        f"{name}: column mismatch spark={sorted(spdf.columns)} oracle={sorted(opdf.columns)}"
    )
    assert len(spdf) == len(opdf), f"{name}: row count {len(spdf)} vs {len(opdf)}"
    srows, orows = canonical_rows(spdf), canonical_rows(opdf)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)}/{len(srows)} row mismatches; first 3: "
        + "\n".join(f"spark={a!r}\noracle={b!r}" for _, a, b in mismatches[:3])
    )
