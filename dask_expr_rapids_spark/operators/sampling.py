"""Deterministic sampling operators for training-data curation.

Data mixes for model training are specified as per-source rates ("keep
10% of web, 50% of books") or exact per-stratum counts.  Spark's
``df.sample`` is seeded per-partition — resplitting the input changes
the sample — so curation pipelines use HASH-based selection instead:
membership is a pure function of the row key, reproducible across
cluster sizes, partitionings, engines, and reruns, and trivially
auditable (the SQL oracle computes the same md5 arithmetic).

Scale: both operators are one scan; ``hash_sample`` is a pure filter
(pushes nothing to the driver, no shuffle), ``stratified_take`` is one
window shuffle on the strata key.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

#: 2^32 — md5's first 8 hex digits as an integer are uniform on [0, 2^32).
_HASH_SPACE = float(1 << 32)


def hash_uniform(key: Column) -> Column:
    """Deterministic uniform [0,1) from a key column: first 8 hex digits
    of md5(key-as-string).  Identical arithmetic is expressible in any
    engine with md5 — the reproducibility contract of the sampler."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("double")
        / F.lit(_HASH_SPACE)
    )


def hash_uniform_sql(key_sql: str) -> str:
    """DuckDB/ANSI twin of :func:`hash_uniform` — digit-by-digit hex
    decode of the first 8 md5 chars (no ``conv`` in DuckDB), divided by
    2^32.  Same arithmetic, bit-identical doubles."""
    return (
        "("
        + " + ".join(
            f"(strpos('0123456789abcdef', substr(md5(CAST({key_sql} AS VARCHAR)), {i + 1}, 1)) - 1)"
            f" * {16 ** (7 - i)}"
            for i in range(8)
        )
        + ") / 4294967296.0"
    )


def hash_sample(df: DataFrame, key: str, rate) -> DataFrame:
    """Bernoulli sample at ``rate`` (a float or a per-row rate Column),
    keyed by ``key`` — a pure filter: no shuffle, no driver involvement,
    stable under repartitioning and re-execution."""
    rate_col = rate if isinstance(rate, Column) else F.lit(float(rate))
    return df.filter(hash_uniform(F.col(key)) < rate_col)


def stratified_rates(df: DataFrame, key: str, strata: str, rates: Mapping[str, float],
                     default: float = 0.0) -> DataFrame:
    """Per-stratum Bernoulli rates ("the data-mix spec"): ``rates`` maps a
    stratum value to its keep-probability."""
    rate_col = F.lit(float(default))
    for value, r in rates.items():
        rate_col = F.when(F.col(strata) == value, float(r)).otherwise(rate_col)
    return hash_sample(df, key, rate_col)


def stratified_take(df: DataFrame, strata, k: int, key: str) -> DataFrame:
    """EXACTLY ``k`` rows per stratum (fewer if the stratum is smaller),
    chosen by deterministic md5 rank — unbiased within each stratum and
    reproducible everywhere.  One window shuffle on the strata columns."""
    strata = [strata] if isinstance(strata, str) else list(strata)
    w = W.partitionBy(*strata).orderBy(
        F.md5(F.col(key).cast("string")), F.col(key)
    )
    return (
        df.withColumn("__rk__", F.row_number().over(w))
        .filter(F.col("__rk__") <= k)
        .drop("__rk__")
    )


def weighted_take(
    df: DataFrame,
    strata,
    k: int,
    key: str,
    weight: str,
    n_salts: int = 16,
) -> DataFrame:
    """EXACTLY ``k`` rows per stratum, sampled WITHOUT replacement with
    probability proportional to ``weight`` — the A-Res scheme (Efraimidis
    & Spirakis '06): rank by ``u^(1/w)`` descending, equivalently
    ``ln(u)/w`` with ``u`` the deterministic md5-uniform of ``key``.
    RNG-free, repartition-stable, identical in any engine with md5.

    Skew posture: a stratum column typically has FEW distinct values, so
    a single row_number window would funnel the whole corpus through
    n_strata tasks.  Two-phase instead: a salted local top-k (stratum ×
    ``key % n_salts`` — bounded fan-in per task) prunes to ≤ k·n_salts
    candidates per stratum, then the global window ranks only survivors.
    Salting never changes the result (top-k of per-salt top-ks = global
    top-k); the oracle runs the unsalted SQL to prove it.
    """
    strata = [strata] if isinstance(strata, str) else list(strata)
    u = F.greatest(hash_uniform(F.col(key)), F.lit(1e-12))
    ares = (F.log(u) / F.col(weight).cast("double")).alias("__ares__")
    salted = df.withColumn("__ares__", ares).withColumn(
        "__salt__", F.pmod(F.col(key), F.lit(n_salts))
    )
    w_local = W.partitionBy(*strata, "__salt__").orderBy(
        F.desc("__ares__"), F.col(key)
    )
    survivors = (
        salted.withColumn("__rk__", F.row_number().over(w_local))
        .filter(F.col("__rk__") <= k)
        .drop("__rk__", "__salt__")
    )
    w_global = W.partitionBy(*strata).orderBy(F.desc("__ares__"), F.col(key))
    return (
        survivors.withColumn("rank", F.row_number().over(w_global))
        .filter(F.col("rank") <= k)
        .drop("__ares__")
    )


def ares_key_sql(key_sql: str, weight_sql: str) -> str:
    """SQL twin of the A-Res key: ``ln(max(u, 1e-12)) / w``."""
    return f"(ln(GREATEST({hash_uniform_sql(key_sql)}, 1e-12)) / CAST({weight_sql} AS DOUBLE))"
