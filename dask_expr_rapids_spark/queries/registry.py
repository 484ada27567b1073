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

#: DataFrames persisted by the *current* query invocation (self-join
#: pipelines cache their build side).  Scoped, not leaked: the next
#: ``register``-wrapped call — or an explicit ``release_caches()`` from the
#: bench/test harness — unpersists them, so a session holds at most one
#: query's cached blocks at a time.
_EPHEMERAL: list[DataFrame] = []

_LAST_INVOCATION: tuple[str, str] | None = None


def cache_scoped(df: DataFrame) -> DataFrame:
    """Persist an intermediate whose lifetime is one query invocation."""
    df = df.persist()
    _EPHEMERAL.append(df)
    return df


def release_caches() -> None:
    while _EPHEMERAL:
        try:
            _EPHEMERAL.pop().unpersist()
        except Exception:
            pass


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

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Scoped-cache hygiene: a *different* query invalidates the
            # previous one's persisted intermediates.  Re-running the same
            # query keeps them — Spark's CacheManager reuses cached data
            # for plan-equivalent persists, so warm re-runs stay warm.
            global _LAST_INVOCATION
            key = (name, sf_dir)
            if _LAST_INVOCATION != key:
                release_caches()
            _LAST_INVOCATION = key
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        REGISTRY[name] = Query(name=name, fn=wrapped, sql=sql, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def queries() -> dict[str, SparkQuery]:
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.sql for name, q in REGISTRY.items() if q.sql is not None}
