"""Differential correctness: every registry query vs its DuckDB oracle —
the same check the driver runs (row count + columns + order-insensitive
exact values), run locally at SPARK_GRAFT_TEST_SF_DIR (default sf0.001)."""

from __future__ import annotations

import pytest

from dask_expr_rapids_spark.queries import REGISTRY

from .conftest import SF_DIR, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, oracle, name):
    q = REGISTRY[name]
    df = q.fn(spark, SF_DIR)
    if q.sql is None:
        assert df.count() >= 0  # rows-only check, like the driver's
        return
    assert_matches_oracle(df, oracle, q.sql, name)


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) >= 5


def test_registry_contract():
    import __spark_entry__ as entry_mod

    qs, sqls = entry_mod.queries(), entry_mod.oracle_sql()
    assert len(qs) >= 10
    assert set(sqls) <= set(qs)
