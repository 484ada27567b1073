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


#: split radixes for portable decimal→double conversion.
_P32 = 4294967296  # 2^32
_P64 = _P32 * _P32  # 2^64


def dec_to_double(dec: Column, scale: int = 8) -> Column:
    """Portable DECIMAL→DOUBLE conversion via a three-part modulo split.

    Native casts diverge between engines above 2^53 (Spark rounds the
    BigDecimal correctly; DuckDB's int128 path double-rounds) — observed as
    last-ulp mismatches on large sums.  Division-based splits are no better
    (DuckDB coerces decimal ``/`` and ``//`` to double).  Modulo, however,
    is exact decimal arithmetic in both engines, so we decompose the
    internal integer |I| = hi + mid + lo with hi a multiple of 2^64 (≤ 21
    significant bits for I < 2^85), mid a multiple of 2^32 below 2^64
    (≤ 32 significant bits), lo < 2^32 — each part converts to double
    EXACTLY, and both engines then perform the identical IEEE adds and the
    final ``/ 10^scale``.  Deterministic everywhere for |I| < 2^85, far
    above any sum in this engine.
    """
    from decimal import Decimal

    i = (dec * (10**scale)).cast("decimal(38,0)")
    sgn = F.when(i < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
    a = F.abs(i)
    m64 = a % F.lit(Decimal(_P64))
    m32 = a % F.lit(_P32)
    hi = (a - m64).cast("double")
    mid = (m64 - m32).cast("double")
    lo = m32.cast("double")
    return sgn * ((hi + mid) + lo) / float(10**scale)


def dec2dbl_expr(inner: str, scale: int = 8) -> str:
    """SQL twin of :func:`dec_to_double`; ``inner`` must be a DECIMAL
    expression (e.g. a SUM over a decimal cast).  The add order is written
    explicitly to match the Spark side's left-associated adds."""
    i = f"CAST(({inner}) * {10**scale} AS DECIMAL(38,0))"
    a = f"abs({i})"
    sgn = f"(CASE WHEN {i} < 0 THEN -1.0 ELSE 1.0 END)"
    hi = f"CAST({a} - ({a} % {_P64}) AS DOUBLE)"
    mid = f"CAST(({a} % {_P64}) - ({a} % {_P32}) AS DOUBLE)"
    lo = f"CAST({a} % {_P32} AS DOUBLE)"
    return f"({sgn} * (({hi} + {mid}) + {lo}) / {float(10**scale)!r})"


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    out = dec_to_double(F.sum(c.cast(DEC)), 8)
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent mean: exact decimal sum (portably converted to
    double) divided by count in IEEE double — both engines produce
    bit-identical results because every step is identical.  (Dividing *in
    decimal* would hit engine-specific result-scale rules.)"""
    c = F.col(col) if isinstance(col, str) else col
    out = dec_to_double(F.sum(c.cast(DEC)), 8) / F.count(c).cast("double")
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
    return dec2dbl_expr(f"SUM(CAST(({sql_expr}) AS DECIMAL(30,8)))", 8)


def davg_expr(sql_expr: str) -> str:
    """DuckDB/ANSI-side twin of :func:`davg`."""
    return (
        f"{dec2dbl_expr(f'SUM(CAST(({sql_expr}) AS DECIMAL(30,8)))', 8)}"
        f" / CAST(COUNT({sql_expr}) AS DOUBLE)"
    )
