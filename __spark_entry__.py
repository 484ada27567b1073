"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship TPC-H Q1-shaped query at sf0.001 (smoke).
``queries()`` / ``oracle_sql()`` — the registry from
``dask_expr_rapids_spark.queries``: one named query per implemented operator
family from SURVEY.md §2, each with a DuckDB-runnable ANSI-SQL twin whose
column names match the Spark result exactly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dask_expr_rapids_spark.queries import oracle_sql as _oracle_sql_fn
from dask_expr_rapids_spark.queries import queries as _queries_fn


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from dask_expr_rapids_spark.queries.relational import q01_pricing_summary

    return q01_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _queries_fn()


def oracle_sql() -> dict[str, str]:
    return _oracle_sql_fn()
