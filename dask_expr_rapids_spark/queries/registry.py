"""Query registry: name → (Spark callable, DuckDB-oracle SQL).

The Spark callable takes ``(spark, sf_dir)`` and returns a DataFrame; the
SQL twin must produce the same rows with the same column names (the driver
sorts columns by name and hash-compares values).  Queries whose semantics
are not SQL-expressible register ``sql=None`` → driver runs a rows-only
check.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "Query"] = {}


@dataclass(frozen=True)
class Query:
    name: str
    fn: SparkQuery
    sql: Optional[str]
    doc: str = ""


def register(name: str, sql: Optional[str], doc: str = ""):
    """Decorator: add a (spark_fn, oracle_sql) pair to the registry."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, sql=sql, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def queries() -> dict[str, SparkQuery]:
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.sql for name, q in REGISTRY.items() if q.sql is not None}
