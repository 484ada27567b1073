"""Order-independent (exact) float aggregation helpers.

Floating-point sums depend on accumulation order, and Spark's shuffle order
is nondeterministic — so ``SUM(double)`` differs in the last ulps between
runs and between engines.  The reference sidesteps this only by being
single-threaded-per-partition; at cluster scale it has the same issue
(tree reduction, ``/root/reference/dask_expr/_reductions.py:296-324``).

We make headline aggregates *exactly* reproducible by summing in fixed-point
decimal: ``cast(x as decimal(30,8))`` is a deterministic per-value rounding,
and decimal addition is associative/commutative, so any shuffle order (and
any other engine doing the same) produces bit-identical results.  The final
result is surfaced as ``double`` for a stable schema.

This costs ~nothing at scale: decimal sum is still a JVM-side whole-stage
codegen'd partial/final HashAggregate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: fixed-point type used for exact sums: 8 fractional digits, 22 integral —
#: enough for sums of trillions of currency-scale values (100 TB posture).
DEC = "decimal(30,8)"


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DEC)).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent mean: exact decimal sum (cast to double) divided by
    count in IEEE double — both engines produce bit-identical results because
    the division inputs are identical.  (Dividing *in decimal* would hit
    engine-specific result-scale rules.)"""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(DEC)).cast("double") / F.count(c).cast("double")
    return out.alias(alias) if alias else out


def pround(col: Column, n: int) -> Column:
    """Engine-portable rounding: ``floor(x*10^n + 0.5) / 10^n``.

    Native ROUND(double) differs between engines at representability
    boundaries (Spark rounds the shortest-repr BigDecimal, DuckDB scales in
    double).  floor/multiply/add are plain IEEE ops — identical everywhere.
    Half-values round toward +inf; |x|*10^n must fit a long."""
    scale = float(10**n)
    return (F.floor(col * scale + F.lit(0.5)).cast("double") / scale)


def pround_expr(sql_expr: str, n: int) -> str:
    """SQL twin of :func:`pround`."""
    scale = float(10**n)
    return f"(CAST(floor(({sql_expr}) * {scale} + 0.5) AS DOUBLE) / {scale})"


def dsum_expr(sql_expr: str) -> str:
    """DuckDB/ANSI-side twin of :func:`dsum` (same fixed-point semantics)."""
    return f"CAST(SUM(CAST(({sql_expr}) AS DECIMAL(30,8))) AS DOUBLE)"


def davg_expr(sql_expr: str) -> str:
    """DuckDB/ANSI-side twin of :func:`davg`."""
    return (
        f"CAST(SUM(CAST(({sql_expr}) AS DECIMAL(30,8))) AS DOUBLE)"
        f" / CAST(COUNT({sql_expr}) AS DOUBLE)"
    )
