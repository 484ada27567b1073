"""Pandas-semantics collection API over Spark DataFrames.

Re-expresses the reference's user-facing collections
(``/root/reference/dask_expr/_collection.py:193`` FrameBase, ``:885``
DataFrame, ``:1529`` Series, ``dask_expr/_groupby.py:992`` GroupBy) as thin
wrappers around a ``pyspark.sql.DataFrame`` — the Spark plan *is* the lazy
expression tree, so there is no Expr class hierarchy here at all
(SURVEY.md §7).

The pandas row index (the one semantic Spark lacks, SURVEY.md §1.5) is an
ordinary column named ``__index__`` — the same trick the reference plays
inside its own shuffles (``_merge.py:268-274``, ``_reductions.py:157``,
``io/parquet.py:52``).  Ops that consume index order (shift, diff, cumsum,
rolling, sort_index, to_pandas) use a Window ordered by it; everything else
ignores it.

Scale posture: every method emits declarative DataFrame calls — Catalyst
does pruning/pushdown/join-selection; nothing here collects to the driver
except explicit ``.to_pandas()``/scalar reductions, mirroring
``compute()`` in the reference (``_collection.py:266-271``).
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Mapping, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

INDEX = "__index__"

_AGG_FNS: dict[str, Callable[[Any], Column]] = {
    "sum": F.sum,
    "mean": F.avg,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
    "count": F.count,
    "first": F.first,
    "last": F.last,
    "std": F.stddev_samp,
    "var": F.var_samp,
    "nunique": F.countDistinct,
    "collect_list": F.collect_list,
    "collect_set": F.collect_set,
    "median": F.median,
    "product": F.product,
    "prod": F.product,
    "any": F.bool_or,
    "all": F.bool_and,
}


def _as_list(x) -> list:
    if x is None:
        return []
    if isinstance(x, (list, tuple)):
        return list(x)
    return [x]


class LazyScalar:
    """Unevaluated scalar reduction (reference ``Scalar``,
    ``_collection.py:1850``): instead of collecting eagerly, the 1×1
    aggregate composes into the consuming plan as a broadcast cross join —
    ``df[df.x > df.x.mean(lazy=True)]`` is ONE Spark job (scan feeds both
    the aggregate and the filter; Catalyst reuses the exchange), where the
    eager form runs two.  ``compute()``/``float()`` force the value."""

    _seq = 0

    def __init__(self, frame: "SparkFrame", agg: Column):
        LazyScalar._seq += 1
        self._name = f"__lazy{LazyScalar._seq}__"
        self._agg_sdf = frame._sdf.agg(agg.alias(self._name))

    def compute(self):
        return self._agg_sdf.collect()[0][0]

    def __float__(self) -> float:
        return float(self.compute())

    def __repr__(self) -> str:
        return f"<LazyScalar {self._name} (uncomputed)>"


class Series:
    """A named column expression bound to a parent frame (reference
    ``Series``, ``_collection.py:1529``).  Elementwise ops build Column
    expressions; reductions trigger a job and return a driver scalar
    (reference ``Scalar``, ``_collection.py:1850``), or a composable
    ``LazyScalar`` with ``lazy=True``."""

    def __init__(self, frame: "SparkFrame", expr: Column, name: str):
        self._frame = frame
        self._expr = expr
        self.name = name

    # -- elementwise arithmetic / comparison / logic (reference
    # _expr.py:1746-1876) --------------------------------------------------
    def _bin(self, other, op, name=None) -> "Series":
        if isinstance(other, LazyScalar):
            # graft the 1-row aggregate onto the plan: broadcast cross join,
            # then operate against the joined scalar column — no collect
            joined = SparkFrame(
                self._frame._sdf.crossJoin(F.broadcast(other._agg_sdf))
            )
            return Series(
                joined, op(self._expr, F.col(other._name)), name or self.name
            )
        rhs = other._expr if isinstance(other, Series) else F.lit(other)
        return Series(self._frame, op(self._expr, rhs), name or self.name)

    def __add__(self, o):
        return self._bin(o, lambda a, b: a + b)

    def __radd__(self, o):
        return self._bin(o, lambda a, b: b + a)

    def __sub__(self, o):
        return self._bin(o, lambda a, b: a - b)

    def __rsub__(self, o):
        return self._bin(o, lambda a, b: b - a)

    def __mul__(self, o):
        return self._bin(o, lambda a, b: a * b)

    def __rmul__(self, o):
        return self._bin(o, lambda a, b: b * a)

    def __truediv__(self, o):
        return self._bin(o, lambda a, b: a / b)

    def __pow__(self, o):
        return self._bin(o, lambda a, b: a**b)

    def __mod__(self, o):
        return self._bin(o, lambda a, b: a % b)

    def __floordiv__(self, o):
        return self._bin(o, lambda a, b: F.floor(a / b))

    def __lt__(self, o):
        return self._bin(o, lambda a, b: a < b)

    def __le__(self, o):
        return self._bin(o, lambda a, b: a <= b)

    def __gt__(self, o):
        return self._bin(o, lambda a, b: a > b)

    def __ge__(self, o):
        return self._bin(o, lambda a, b: a >= b)

    def __eq__(self, o):  # type: ignore[override]
        return self._bin(o, lambda a, b: a == b)

    def __ne__(self, o):  # type: ignore[override]
        return self._bin(o, lambda a, b: a != b)

    def __and__(self, o):
        return self._bin(o, lambda a, b: a & b)

    def __or__(self, o):
        return self._bin(o, lambda a, b: a | b)

    def __invert__(self):
        return Series(self._frame, ~self._expr, self.name)

    def __neg__(self):
        return Series(self._frame, -self._expr, self.name)

    # -- named arithmetic with fill_value (reference MethodOperator,
    # _expr.py:1759-1770: null operands replaced by fill_value first) ------
    def _method_op(self, other, op, fill_value):
        rhs = other._expr if isinstance(other, Series) else F.lit(other)
        lhs = self._expr
        if fill_value is not None:
            lhs = F.coalesce(lhs, F.lit(fill_value))
            rhs = F.coalesce(rhs, F.lit(fill_value))
        return Series(self._frame, op(lhs, rhs), self.name)

    def add(self, other, fill_value=None):
        return self._method_op(other, lambda a, b: a + b, fill_value)

    def sub(self, other, fill_value=None):
        return self._method_op(other, lambda a, b: a - b, fill_value)

    def mul(self, other, fill_value=None):
        return self._method_op(other, lambda a, b: a * b, fill_value)

    def div(self, other, fill_value=None):
        return self._method_op(other, lambda a, b: a / b, fill_value)

    truediv = div

    def pow(self, other, fill_value=None):
        return self._method_op(other, lambda a, b: a**b, fill_value)

    # -- scalar functions (reference _expr.py:1020-1172) -------------------
    def abs(self):
        return Series(self._frame, F.abs(self._expr), self.name)

    def round(self, n=0):
        return Series(self._frame, F.round(self._expr, n), self.name)

    def clip(self, lower=None, upper=None):
        e = self._expr
        if lower is not None:
            e = F.greatest(e, F.lit(lower))
        if upper is not None:
            e = F.least(e, F.lit(upper))
        return Series(self._frame, e, self.name)

    def between(self, left, right):
        return Series(self._frame, self._expr.between(left, right), self.name)

    def isin(self, values: Iterable):
        return Series(self._frame, self._expr.isin(*list(values)), self.name)

    def isna(self):
        return Series(self._frame, self._expr.isNull(), self.name)

    isnull = isna

    def notnull(self):
        return Series(self._frame, self._expr.isNotNull(), self.name)

    notna = notnull

    # -- named comparison methods (reference eq/ne/lt/le/gt/ge,
    # _collection.py method operators) -------------------------------------
    def eq(self, other):
        return self.__eq__(other)

    def ne(self, other):
        return self.__ne__(other)

    def lt(self, other):
        return self.__lt__(other)

    def le(self, other):
        return self.__le__(other)

    def gt(self, other):
        return self.__gt__(other)

    def ge(self, other):
        return self.__ge__(other)

    def copy(self) -> "Series":
        """Plans are immutable — copy is a same-plan handle (reference
        ``copy``; dask likewise returns a shallow expression copy)."""
        return Series(self._frame, self._expr, self.name)

    @property
    def dtype(self) -> str:
        """Spark SQL type name of the column (the engine's dtype)."""
        return (
            self._frame._sdf.select(self._expr.alias("v"))
            .schema[0]
            .dataType.simpleString()
        )

    @property
    def shape(self) -> tuple:
        return (self._frame._sdf.count(),)

    @property
    def values(self):
        """Materialized numpy array (driver action, like ``compute()``)."""
        return self.to_pandas().to_numpy()

    @property
    def is_monotonic_increasing(self) -> bool:
        """Reference ``IsMonotonicIncreasing`` (_reductions.py): one window
        pass + aggregate — no collect of the data."""
        return self._monotonic(F.col("__v__") >= F.col("__p__"))

    @property
    def is_monotonic_decreasing(self) -> bool:
        return self._monotonic(F.col("__v__") <= F.col("__p__"))

    def _monotonic(self, cmp) -> bool:
        w = W.orderBy(INDEX)
        d = self._frame._sdf.select(
            self._expr.alias("__v__"), F.lag(self._expr).over(w).alias("__p__")
        )
        row = d.agg(
            F.min(F.when(F.col("__p__").isNull(), True).otherwise(cmp)).alias("ok")
        ).collect()[0]
        return bool(row["ok"]) if row["ok"] is not None else True

    def median_approximate(self, accuracy: int = 10_000):
        """Reference ``median_approximate`` → native approx_percentile
        sketch (one pass, mergeable — the scale path for quantiles)."""
        return self._reduce(
            F.expr(f"approx_percentile({self._to_sql()}, 0.5, {accuracy})")
        )

    def fillna(self, value):
        return Series(self._frame, F.coalesce(self._expr, F.lit(value)), self.name)

    def mask(self, cond: "Series", other=None):
        return Series(
            self._frame,
            F.when(cond._expr, F.lit(other)).otherwise(self._expr),
            self.name,
        )

    def where(self, cond: "Series", other=None):
        return Series(
            self._frame,
            F.when(cond._expr, self._expr).otherwise(F.lit(other)),
            self.name,
        )

    def astype(self, dtype: str):
        return Series(self._frame, self._expr.cast(dtype), self.name)

    def to_timedelta(self, unit: str = "s"):
        """Reference ``ToTimedelta`` (``_expr.py:1090``): numeric →
        ``DayTimeIntervalType`` (SURVEY §1.4).  Timestamp subtraction
        already yields the same interval type natively; ``.dt
        .total_seconds()`` converts back."""
        factor = {"d": 86400.0, "h": 3600.0, "min": 60.0, "m": 60.0,
                  "s": 1.0, "ms": 1e-3, "us": 1e-6}[unit]
        secs = (self._expr.cast("double") * factor).cast("decimal(18,6)")
        return Series(
            self._frame,
            F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), secs),
            self.name,
        )

    def alias(self, name: str):
        return Series(self._frame, self._expr, name)

    rename = alias

    @property
    def str(self):
        from .accessors import StringMethods

        return StringMethods(self)

    @property
    def dt(self):
        from .accessors import DatetimeMethods

        return DatetimeMethods(self)

    @property
    def cat(self):
        from .accessors import CategoricalMethods

        return CategoricalMethods(self)

    # -- reductions → driver scalar (reference _reductions.py) -------------
    def _reduce(self, agg: Column, lazy: bool = False):
        if lazy:
            return LazyScalar(self._frame, agg)
        return self._frame._sdf.agg(agg).collect()[0][0]

    def sum(self, lazy: bool = False):
        return self._reduce(F.sum(self._expr), lazy)

    def mean(self, lazy: bool = False):
        return self._reduce(F.avg(self._expr), lazy)

    def min(self, lazy: bool = False):
        return self._reduce(F.min(self._expr), lazy)

    def max(self, lazy: bool = False):
        return self._reduce(F.max(self._expr), lazy)

    def count(self, lazy: bool = False):
        return self._reduce(F.count(self._expr), lazy)

    def nunique(self):
        return self._reduce(F.countDistinct(self._expr))

    def nunique_approx(self, rsd: float = 0.05):
        """Reference ``NuniqueApprox`` (HyperLogLog, _reductions.py:1028-1049)."""
        return self._reduce(F.approx_count_distinct(self._expr, rsd))

    def std(self, ddof: int = 1):
        return self._reduce(F.stddev_samp(self._expr) if ddof else F.stddev_pop(self._expr))

    def var(self, ddof: int = 1):
        return self._reduce(F.var_samp(self._expr) if ddof else F.var_pop(self._expr))

    def prod(self):
        """Reference ``Prod`` (_reductions.py:734-790)."""
        return self._reduce(F.product(self._expr))

    product = prod

    def any(self):
        """Reference ``Any`` (_reductions.py:793-802); NULLs don't count
        (pandas skipna default)."""
        out = self._reduce(F.bool_or(self._expr.cast("boolean")))
        return bool(out) if out is not None else False

    def all(self):
        """Reference ``All`` (_reductions.py:804-814)."""
        out = self._reduce(F.bool_and(self._expr.cast("boolean")))
        return bool(out) if out is not None else True

    def sem(self, ddof: int = 1):
        """Standard error of the mean: std/sqrt(count)."""
        row = self._frame._sdf.agg(
            (F.stddev_samp(self._expr) if ddof else F.stddev_pop(self._expr)).alias("s"),
            F.count(self._expr).alias("n"),
        ).collect()[0]
        return None if row["n"] == 0 or row["s"] is None else row["s"] / row["n"] ** 0.5

    def skew(self):
        return self._reduce(F.skewness(self._expr))

    def kurt(self):
        return self._reduce(F.kurtosis(self._expr))

    kurtosis = kurt

    @property
    def nbytes(self):
        """Data bytes (reference ``NBytes``, _reductions.py:842-897):
        fixed-width dtypes → rows × width; strings → total octet length.
        One metadata-friendly aggregate, no collect of the data."""
        dt = self._frame._sdf.select(self._expr.alias("v")).schema[0].dataType.simpleString()
        widths = {"bigint": 8, "double": 8, "int": 4, "float": 4,
                  "smallint": 2, "tinyint": 1, "boolean": 1, "date": 4, "timestamp": 8}
        if dt in widths:
            return self._reduce(F.count(self._expr)) * widths[dt]
        return self._reduce(F.sum(F.octet_length(self._expr.cast("string"))))

    def quantile(self, q: float = 0.5):
        return self._reduce(F.expr(f"percentile({self._to_sql()}, {q})"))

    def median(self):
        return self.quantile(0.5)

    def mode(self, first: bool = False):
        """All tied most-frequent values, ascending (pandas semantics;
        reference ``_reductions.py:994-1025`` keeps every tie).  With
        ``first=True`` returns the single smallest mode as a scalar — the
        pre-round-3 tie-break behavior.

        Scale shape: one hash aggregate over the values, a driver scalar
        for the max count (consistent with the eager-scalar design), then
        a filter over the distinct-value counts.  No global window."""
        sdf = self._frame._sdf.select(self._expr.alias("v")).filter(
            self._expr.isNotNull()
        )
        counts = sdf.groupBy("v").agg(F.count(F.lit(1)).alias("__c__"))
        if first:
            row = counts.orderBy(F.desc("__c__"), F.asc("v")).limit(1).collect()
            return row[0][0] if row else None
        mx = counts.agg(F.max("__c__")).collect()[0][0]
        if mx is None:
            return []
        return [
            r[0]
            for r in counts.filter(F.col("__c__") == mx)
            .select("v")
            .orderBy("v")
            .collect()
        ]

    def idxmax(self):
        return self._frame._sdf.agg(F.max_by(F.col(INDEX), self._expr)).collect()[0][0]

    def idxmin(self):
        return self._frame._sdf.agg(F.min_by(F.col(INDEX), self._expr)).collect()[0][0]

    def _to_sql(self) -> str:
        # only safe for plain column refs; used by quantile
        return self.name

    def to_frame(self) -> "SparkFrame":
        return SparkFrame(
            self._frame._sdf.select(F.col(INDEX), self._expr.alias(self.name))
        )

    # -- ordered ops (index-order semantics; reference §2.10) --------------
    def _ordered_window(self):
        return W.orderBy(INDEX)

    def shift(self, periods: int = 1, freq: str | None = None):
        """Reference ``Shift`` / ``ShiftIndex`` (``_expr.py:2255-2315``):
        with ``freq`` the datetime index moves by ``periods * freq`` and the
        values stay put — a pure projection, no window, no shuffle."""
        if freq is not None:
            secs = _offset_seconds(freq) * periods
            sdf = self._frame._sdf.select(
                F.expr(f"timestampadd(SECOND, {secs}, `{INDEX}`)").alias(INDEX),
                self._expr.alias(self.name),
            )
            return SparkFrame(sdf)[self.name]
        w = self._ordered_window()
        fn = F.lag(self._expr, periods) if periods >= 0 else F.lead(self._expr, -periods)
        return Series(self._frame, fn.over(w), self.name)

    def diff(self, periods: int = 1):
        w = self._ordered_window()
        return Series(self._frame, self._expr - F.lag(self._expr, periods).over(w), self.name)

    def cumsum(self):
        w = self._ordered_window().rowsBetween(W.unboundedPreceding, 0)
        return Series(self._frame, F.sum(self._expr).over(w), self.name)

    def cummax(self):
        w = self._ordered_window().rowsBetween(W.unboundedPreceding, 0)
        return Series(self._frame, F.max(self._expr).over(w), self.name)

    def cummin(self):
        w = self._ordered_window().rowsBetween(W.unboundedPreceding, 0)
        return Series(self._frame, F.min(self._expr).over(w), self.name)

    def cumprod(self):
        """Reference ``CumProd`` (_cumulative.py:9-116); running product
        window — same serial-order semantics as the reference's carry
        chain."""
        w = self._ordered_window().rowsBetween(W.unboundedPreceding, 0)
        return Series(self._frame, F.product(self._expr).over(w), self.name)

    def pct_change(self, periods: int = 1):
        w = self._ordered_window()
        prev = F.lag(self._expr, periods).over(w)
        return Series(self._frame, (self._expr - prev) / prev, self.name)

    def cumcount(self):
        w = self._ordered_window().rowsBetween(W.unboundedPreceding, 0)
        return Series(self._frame, F.count(self._expr).over(w), self.name)

    def ffill(self, limit: int | None = None):
        """Forward fill; ``limit`` bounds the fill distance (reference
        ``FillnaCheck``/ffill ``_expr.py:2207-2252``) — a bounded window
        frame, so the per-row state stays O(limit)."""
        lo = W.unboundedPreceding if limit is None else -limit
        w = self._ordered_window().rowsBetween(lo, 0)
        return Series(self._frame, F.last(self._expr, ignorenulls=True).over(w), self.name)

    def bfill(self, limit: int | None = None):
        hi = W.unboundedFollowing if limit is None else limit
        w = self._ordered_window().rowsBetween(0, hi)
        return Series(self._frame, F.first(self._expr, ignorenulls=True).over(w), self.name)

    def map(self, mapping: Mapping, default=None) -> "Series":
        """Dict-based value map (reference ``Map``, ``_expr.py:1240-1270``):
        compiled into a chained CASE WHEN — JVM-side, no UDF."""
        expr = F.lit(default)
        for k, v in mapping.items():
            expr = F.when(self._expr == F.lit(k), F.lit(v)).otherwise(expr)
        return Series(self._frame, expr, self.name)

    def replace(self, to_replace, value=None) -> "Series":
        """Reference ``Replace`` (``_expr.py:1027``): scalar or dict form."""
        mapping = to_replace if isinstance(to_replace, Mapping) else {to_replace: value}
        expr = self._expr
        for k, v in mapping.items():
            expr = F.when(self._expr == F.lit(k), F.lit(v)).otherwise(expr)
        return Series(self._frame, expr, self.name)

    def unique(self) -> "Series":
        """Reference ``Unique`` (``_reductions.py:478-509``) — LAZY: the
        reference returns a composable Series collection (you can keep
        chaining filters/maps on it), never a driver-side list.  A
        high-cardinality ``df.x.unique()`` mid-pipeline must stay
        distributed — eager collect here is a driver OOM at 100 TB.  Use
        ``.tolist()`` / ``.compute()`` for the explicit eager boundary."""
        name = self.name or "v"
        sdf = self._frame._sdf.select(self._expr.alias(name)).distinct()
        return Series(SparkFrame(sdf), F.col(name), name)

    def tolist(self) -> list:
        """Explicit eager boundary (reference ``compute()`` semantics):
        collect the Series' values to a driver list."""
        return [
            r[0] for r in self._frame._sdf.select(self._expr.alias("v")).collect()
        ]

    def nlargest(self, n: int = 5) -> "SparkFrame":
        sdf = self._frame._sdf.select(F.col(INDEX), self._expr.alias(self.name))
        return SparkFrame(sdf.orderBy(F.desc(self.name), F.asc(INDEX)).limit(n))

    def nsmallest(self, n: int = 5) -> "SparkFrame":
        sdf = self._frame._sdf.select(F.col(INDEX), self._expr.alias(self.name))
        return SparkFrame(sdf.orderBy(F.asc(self.name), F.asc(INDEX)).limit(n))

    def describe(self) -> pd.Series:
        """Reference ``DescribeNumeric`` / ``DescribeNonNumeric``
        (``_describe.py:16-94``): numeric columns get count/mean/std/
        quantiles; strings get count/unique/top/freq; datetimes add
        first/last.  One aggregate job either way."""
        dt = (
            self._frame._sdf.select(self._expr.alias("v"))
            .schema[0]
            .dataType.simpleString()
        )
        if dt == "string" or dt.startswith(("timestamp", "date")):
            agg = self._frame._sdf.agg(
                F.count(self._expr).alias("count"),
                F.count_distinct(self._expr).alias("unique"),
                # mode_v = smallest value with the max frequency (pandas
                # surfaces one top; ties broken by value, like our mode)
                F.min(self._expr).alias("_min"),
                F.max(self._expr).alias("_max"),
            ).collect()[0]
            top_row = (
                self._frame._sdf.filter(self._expr.isNotNull())
                .groupBy(self._expr.alias("v"))
                .agg(F.count(F.lit(1)).alias("c"))
                .orderBy(F.desc("c"), F.asc("v"))
                .limit(1)
                .collect()
            )
            top, freq = (top_row[0]["v"], top_row[0]["c"]) if top_row else (None, None)
            out = {
                "count": agg["count"],
                "unique": agg["unique"],
                "top": top,
                "freq": freq,
            }
            if dt.startswith(("timestamp", "date")):
                out["first"] = agg["_min"]
                out["last"] = agg["_max"]
            return pd.Series(out, name=self.name)
        row = self._frame._sdf.agg(
            F.count(self._expr).alias("count"),
            F.avg(self._expr).alias("mean"),
            F.stddev_samp(self._expr).alias("std"),
            F.min(self._expr).alias("min"),
            F.expr(f"percentile({self.name}, 0.25)").alias("25%"),
            F.expr(f"percentile({self.name}, 0.5)").alias("50%"),
            F.expr(f"percentile({self.name}, 0.75)").alias("75%"),
            F.max(self._expr).alias("max"),
        ).collect()[0]
        return pd.Series(row.asDict(), name=self.name)

    def rank(self, method: str = "min", ascending: bool = True) -> "Series":
        order = F.asc(self._expr) if ascending else F.desc(self._expr)
        w = W.orderBy(order)
        fn = {"min": F.rank, "dense": F.dense_rank, "first": F.row_number}[method]
        return Series(self._frame, fn().over(w).cast("double"), self.name)

    def value_counts(self, normalize: bool = False, sort: bool = True) -> "SparkFrame":
        """Reference ``ValueCounts`` (_reductions.py:1122-1159)."""
        sdf = self._frame._sdf.select(self._expr.alias(self.name)).groupBy(self.name).agg(
            F.count(F.lit(1)).alias("count")
        )
        if normalize:
            total = F.sum("count").over(W.partitionBy())
            sdf = sdf.withColumn("proportion", F.col("count") / total).drop("count")
        if sort:
            sdf = sdf.orderBy(F.desc("proportion" if normalize else "count"), F.asc(self.name))
        return SparkFrame(sdf.withColumn(INDEX, F.col(self.name)))

    def rolling(
        self, window, min_periods: int | None = None, center: bool = False
    ) -> "Rolling":
        """Reference ``Rolling`` (``_rolling.py:228``): integer row windows
        or time-based windows (string offset) over index order; ``center=``
        per reference ``_rolling.py:120-122``."""
        return Rolling(self, window, min_periods, center)

    def to_pandas(self) -> pd.Series:
        pdf = (
            self._frame._sdf.select(F.col(INDEX), self._expr.alias(self.name or "0"))
            .orderBy(INDEX)
            .toPandas()
        )
        out = pdf.set_index(INDEX)[self.name or "0"]
        out.index.name = None
        return out

    compute = to_pandas


_SEC = {"s": 1, "min": 60, "h": 3600, "d": 86400}


def _offset_seconds(rule: str) -> int:
    import re

    m = re.fullmatch(r"(\d+)\s*(s|min|h|d)", rule.strip().lower())
    if not m:
        raise ValueError(f"unsupported offset: {rule!r} (use e.g. '30s', '5min', '1h', '1d')")
    return int(m.group(1)) * _SEC[m.group(2)]


class Rolling:
    """Windowed aggregation container (reference ``Rolling``,
    ``/root/reference/dask_expr/_rolling.py:38-323``).  Integer windows →
    ``rowsBetween``; time-offset windows ('5min') → ``rangeBetween`` over
    epoch seconds of the (timestamp) index — both JVM window functions, no
    MapOverlap machinery needed (SURVEY.md §2.10)."""

    def __init__(
        self, series: Series, window, min_periods: int | None, center: bool = False
    ):
        self._s = series
        self._window = window
        self._min_periods = min_periods
        self._center = center

    def _spec(self):
        if isinstance(self._window, int):
            if self._center:
                # pandas center: before = w//2, after = w - before - 1
                # (reference _rolling.py:120-122)
                before = self._window // 2
                after = self._window - before - 1
            else:
                before, after = self._window - 1, 0
            w = W.orderBy(INDEX).rowsBetween(-before, after)
            count_needed = self._min_periods if self._min_periods is not None else self._window
        else:
            # micros-resolution range window: sub-second timestamps bucket
            # correctly (unix_timestamp would truncate to whole seconds)
            usecs = _offset_seconds(self._window) * 1_000_000
            if self._center:
                # pandas centered offset window is (t - w/2, t + w/2]
                # (verified empirically; closed='right' both shifted)
                half = usecs // 2
                lo, hi = -(half - 1), usecs - half
            else:
                lo, hi = -(usecs - 1), 0
            # cast: accept TIMESTAMP_NTZ indexes too (identity on timestamp;
            # unix_micros rejects ntz) — exact under the pinned UTC tz
            w = W.orderBy(F.unix_micros(F.col(INDEX).cast("timestamp"))).rangeBetween(lo, hi)
            count_needed = self._min_periods if self._min_periods is not None else 1
        return w, count_needed

    def _agg(self, fn) -> Series:
        w, need = self._spec()
        expr = fn(self._s._expr).over(w)
        guard = F.count(self._s._expr).over(w) >= need
        return Series(self._s._frame, F.when(guard, expr), self._s.name)

    def sum(self):
        return self._agg(F.sum)

    def mean(self):
        return self._agg(F.avg)

    def min(self):
        return self._agg(F.min)

    def max(self):
        return self._agg(F.max)

    def count(self):
        w, _ = self._spec()
        return Series(self._s._frame, F.count(self._s._expr).over(w), self._s.name)

    def std(self):
        return self._agg(F.stddev_samp)

    def var(self):
        return self._agg(F.var_samp)

    def median(self):
        return self.quantile(0.5)

    def quantile(self, q: float):
        """Exact windowed percentile (aggregate-as-window-function) —
        reference RollingQuantile (``_rolling.py``); bounded window sizes
        keep the exact computation cheap."""
        return self._agg(lambda c: F.expr(f"percentile({self._s.name}, {q})"))

    def skew(self):
        """Sample-adjusted skew G1 = sqrt(n(n-1))/(n-2) * g1 — matches
        pandas; Spark's ``skewness`` is the population g1."""
        w, need = self._spec()
        n = F.count(self._s._expr).over(w).cast("double")
        g1 = F.skewness(self._s._expr).over(w)
        G1 = F.sqrt(n * (n - 1)) / (n - 2) * g1
        guard = (n >= need) & (n >= 3)
        return Series(self._s._frame, F.when(guard, G1), self._s.name)

    def kurt(self):
        """Sample-adjusted excess kurtosis G2 = ((n+1)g2 + 6)(n-1)/((n-2)(n-3))
        — matches pandas; Spark's ``kurtosis`` is the population g2."""
        w, need = self._spec()
        n = F.count(self._s._expr).over(w).cast("double")
        g2 = F.kurtosis(self._s._expr).over(w)
        G2 = ((n + 1) * g2 + 6) * (n - 1) / ((n - 2) * (n - 3))
        guard = (n >= need) & (n >= 4)
        return Series(self._s._frame, F.when(guard, G2), self._s.name)

    def cov(self, other: "Series"):
        """Windowed covariance with another column of the same frame
        (reference ``RollingCov``, ``_rolling.py:285-323``)."""
        w, need = self._spec()
        expr = F.covar_samp(self._s._expr, other._expr).over(w)
        guard = F.count(self._s._expr).over(w) >= need
        return Series(self._s._frame, F.when(guard, expr), self._s.name)

    def agg(self, fnames) -> "SparkFrame":
        """Multiple window aggregates at once → frame with one column per
        function (reference ``RollingAgg``, ``_rolling.py:220-287``)."""
        w, need = self._spec()
        guard = F.count(self._s._expr).over(w) >= need
        cols = [
            F.when(guard, _AGG_FNS[f](self._s._expr).over(w)).alias(
                f"{self._s.name}_{f}"
            )
            for f in _as_list(fnames)
        ]
        return SparkFrame(self._s._frame._sdf.select(F.col(INDEX), *cols))

    def apply(self, fn, dtype: str = "double"):
        """Arbitrary Python fn over each window's values (reference
        ``RollingApply``).  The window materializes as an array column
        (bounded by the window size), then one Arrow-batched pandas UDF
        applies ``fn`` per row — never row-at-a-time Python."""
        import pandas as pd  # noqa: F811
        from pyspark.sql.functions import pandas_udf

        w, need = self._spec()
        arr = F.collect_list(self._s._expr).over(w)
        guard = F.count(self._s._expr).over(w) >= need

        @pandas_udf(dtype)
        def _apply(vals: pd.Series) -> pd.Series:
            import numpy as np

            return vals.map(lambda v: fn(np.asarray(v)) if v is not None else None)

        return Series(self._s._frame, F.when(guard, _apply(arr)), self._s.name)


class Resampler:
    """Time-bucket aggregation container (reference ``Resampler``,
    ``/root/reference/dask_expr/_resample.py:21-269``): buckets via
    timestamp truncation (``F.window``-equivalent epoch arithmetic), then a
    plain hash aggregate — scales like any groupBy."""

    def __init__(self, frame: "SparkFrame", rule: str):
        self._frame = frame
        self._secs = _offset_seconds(rule)

    def _bucket(self):
        # F.floor (not cast) so pre-1970 timestamps bucket to the earlier
        # boundary — cast('long') truncates toward zero, flooring only for
        # positive epochs
        return F.timestamp_seconds(
            F.floor(F.unix_timestamp(F.col(INDEX).cast("timestamp")) / self._secs).cast("long")
            * self._secs
        )

    def agg(self, spec: Mapping[str, str]) -> "SparkFrame":
        aggs = [_AGG_FNS[fname](col).alias(col) for col, fname in spec.items()]
        sdf = (
            self._frame._sdf.groupBy(self._bucket().alias(INDEX))
            .agg(*aggs)
        )
        return SparkFrame(sdf)

    def _all(self, fname: str) -> "SparkFrame":
        cols = [c for c in self._frame.columns]
        return self.agg({c: fname for c in cols})

    def sum(self):
        return self._all("sum")

    def mean(self):
        return self._all("mean")

    def count(self):
        return self._all("count")

    def min(self):
        return self._all("min")

    def max(self):
        return self._all("max")

    def first(self):
        return self._all("first")

    def last(self):
        return self._all("last")

    def std(self):
        return self._all("std")

    def var(self):
        return self._all("var")

    def nunique(self):
        return self._all("nunique")

    def prod(self):
        """Per-bucket product (reference ``ResampleProd``, ``_resample.py``)."""
        return self._all("prod")

    def size(self) -> "SparkFrame":
        """Rows per bucket including nulls (reference ``ResampleSize``,
        ``_resample.py:21-269``) — one hash aggregate."""
        sdf = self._frame._sdf.groupBy(self._bucket().alias(INDEX)).agg(
            F.count(F.lit(1)).alias("size")
        )
        return SparkFrame(sdf)

    def median(self):
        """Exact per-bucket median (reference ``ResampleMedian``)."""
        return self._all("median")

    def quantile(self, q: float = 0.5) -> "SparkFrame":
        """Exact per-bucket percentile with linear interpolation — matches
        pandas ``Resampler.quantile`` (reference ``ResampleQuantile``,
        ``_resample.py:21-269``)."""
        aggs = [
            F.expr(f"percentile(`{c}`, {q})").alias(c) for c in self._frame.columns
        ]
        return SparkFrame(
            self._frame._sdf.groupBy(self._bucket().alias(INDEX)).agg(*aggs)
        )

    def sem(self) -> "SparkFrame":
        """Standard error of the mean per bucket (reference ResampleSem)."""
        cols = [c for c in self._frame.columns]
        aggs = [
            (F.stddev_samp(c) / F.sqrt(F.count(c).cast("double"))).alias(c)
            for c in cols
        ]
        return SparkFrame(self._frame._sdf.groupBy(self._bucket().alias(INDEX)).agg(*aggs))

    def ohlc(self, col: str) -> "SparkFrame":
        """first/max/min/last by bucket (reference ResampleOhlc)."""
        w = W.partitionBy("__b__").orderBy(INDEX)
        sdf = (
            self._frame._sdf.withColumn("__b__", self._bucket())
            .withColumn("__rn_a__", F.row_number().over(w))
            .withColumn("__rn_d__", F.row_number().over(W.partitionBy("__b__").orderBy(F.desc(INDEX))))
        )
        return SparkFrame(
            sdf.groupBy(F.col("__b__").alias(INDEX))
            .agg(
                F.max(F.when(F.col("__rn_a__") == 1, F.col(col))).alias("open"),
                F.max(col).alias("high"),
                F.min(col).alias("low"),
                F.max(F.when(F.col("__rn_d__") == 1, F.col(col))).alias("close"),
            )
        )


class SparkFrame:
    """Pandas-like DataFrame over a Spark plan (reference ``DataFrame``,
    ``_collection.py:885``).  Wraps a ``pyspark.sql.DataFrame`` that always
    carries an ``__index__`` column."""

    def __init__(self, sdf: DataFrame):
        if INDEX not in sdf.columns:
            sdf = sdf.withColumn(
                INDEX, F.monotonically_increasing_id()
            )  # positional fallback; from_pandas provides the real index
        self._sdf = sdf

    # -- construction / IO (reference io/io.py, io/parquet.py) -------------
    @classmethod
    def from_pandas(
        cls, spark: SparkSession, pdf: pd.DataFrame, npartitions: int | None = None
    ) -> "SparkFrame":
        p = pdf.copy()
        p.insert(0, INDEX, pdf.index.to_numpy())
        sdf = spark.createDataFrame(p)
        if npartitions:
            sdf = sdf.repartition(npartitions)
        return cls(sdf)

    @classmethod
    def from_array(
        cls,
        spark: SparkSession,
        arr,
        columns=None,
        chunksize: int = 50_000,
    ) -> "SparkFrame":
        """Reference ``FromArray`` (``io/io.py:484-546``): 1-D array →
        single column ``"0"``; 2-D → one column per second-axis slot, index
        = 0..n-1.  ``chunksize`` maps to partition count (the reference's
        per-chunk task = a Spark partition)."""
        import numpy as np

        a = np.asarray(arr)
        if a.ndim == 1:
            pdf = pd.DataFrame({(columns[0] if columns else "0"): a})
        else:
            cols = list(columns) if columns is not None else [str(i) for i in range(a.shape[1])]
            pdf = pd.DataFrame(a, columns=cols)
        nparts = max(1, -(-len(a) // chunksize))
        return cls.from_pandas(spark, pdf, npartitions=nparts)

    @classmethod
    def from_scalars(cls, spark: SparkSession, values, names) -> "SparkFrame":
        """Reference ``FromScalars`` (``io/io.py:443-481``): a one-partition
        series-like frame with index = ``names`` and the scalar values in
        column ``"0"``."""
        pdf = pd.DataFrame({"0": list(values)}, index=list(names))
        return cls.from_pandas(spark, pdf, npartitions=1)

    @classmethod
    def from_map(
        cls,
        spark: SparkSession,
        fn: Callable,
        items,
        schema,
        npartitions: int | None = None,
    ) -> "SparkFrame":
        """Reference ``FromMap`` (``io/io.py:139-213``): one input item →
        one partition's worth of rows, produced by ``fn(item)`` (a pandas
        DataFrame matching ``schema``).

        Spark-first shape: the item list rides the closure; a ``range``
        frame with one row per item fans out across executors and
        ``mapInPandas`` calls ``fn`` per item — arbitrary Python
        constructors (file readers, API fetches) without any RDD surface.
        """
        items = list(items)
        idx = spark.range(len(items)).repartition(npartitions or max(1, len(items)))

        def _mapper(it):
            for pdf in it:
                for i in pdf["id"]:
                    out = fn(items[int(i)])
                    if INDEX not in out.columns:
                        out = out.copy()
                        out[INDEX] = out.index.to_numpy()
                    yield out

        full_schema = schema if INDEX in str(schema) else f"{schema}, {INDEX} long"
        return cls(idx.mapInPandas(_mapper, full_schema))

    @classmethod
    def from_delayed(
        cls, spark: SparkSession, thunks, schema, npartitions: int | None = None
    ) -> "SparkFrame":
        """Reference ``FromDelayed`` (``io/_delayed.py``): deferred
        zero-argument callables, each producing one partition's pandas
        frame; evaluation happens on executors at scan time."""
        return cls.from_map(spark, lambda t: t(), thunks, schema, npartitions)

    @classmethod
    def read_parquet(
        cls, spark: SparkSession, path: str, index: str | None = None
    ) -> "SparkFrame":
        sdf = spark.read.parquet(path)
        if index is not None:
            sdf = sdf.withColumnRenamed(index, INDEX)
        return cls(sdf)

    def to_parquet(self, path: str, mode: str = "overwrite", partition_on=None) -> None:
        from ..sources.tables import to_parquet

        to_parquet(self._sdf, path, mode=mode, partition_on=_as_list(partition_on) or None)

    @property
    def columns(self) -> list[str]:
        return [c for c in self._sdf.columns if c != INDEX]

    @property
    def index(self) -> Series:
        return Series(self, F.col(INDEX), INDEX)

    def __getitem__(self, key):
        if isinstance(key, str):
            return Series(self, F.col(key), key)
        if isinstance(key, Series):  # boolean mask → Filter (reference _expr.py:1366)
            mask_sdf = key._frame._sdf
            lazy_cols = [c for c in mask_sdf.columns if c.startswith("__lazy")]
            if lazy_cols:
                # mask built against a LazyScalar: its frame is ours plus
                # the broadcast scalar column(s) — filter there, then drop
                return SparkFrame(mask_sdf.filter(key._expr).drop(*lazy_cols))
            return SparkFrame(self._sdf.filter(key._expr))
        if isinstance(key, (list, tuple)):  # Projection (reference _expr.py:1378)
            return SparkFrame(self._sdf.select(INDEX, *key))
        raise TypeError(f"unsupported key: {key!r}")

    def __getattr__(self, name: str):
        if name.startswith("_"):
            raise AttributeError(name)
        if name in self._sdf.columns:
            return Series(self, F.col(name), name)
        raise AttributeError(name)

    # -- projections / mutation (reference _expr.py:1321-1441) -------------
    def assign(self, **kwargs) -> "SparkFrame":
        sdf = self._sdf
        for k, v in kwargs.items():
            if callable(v) and not isinstance(v, (Series, Column)):
                v = v(self)
            expr = v._expr if isinstance(v, Series) else (v if isinstance(v, Column) else F.lit(v))
            sdf = sdf.withColumn(k, expr)
        return SparkFrame(sdf)

    def drop(self, columns) -> "SparkFrame":
        return SparkFrame(self._sdf.drop(*_as_list(columns)))

    def rename(self, columns: Mapping[str, str]) -> "SparkFrame":
        return SparkFrame(self._sdf.withColumnsRenamed(dict(columns)))

    def add_prefix(self, prefix: str) -> "SparkFrame":
        return SparkFrame(
            self._sdf.withColumnsRenamed({c: prefix + c for c in self.columns})
        )

    def add_suffix(self, suffix: str) -> "SparkFrame":
        return SparkFrame(
            self._sdf.withColumnsRenamed({c: c + suffix for c in self.columns})
        )

    def astype(self, dtypes: Mapping[str, str] | str) -> "SparkFrame":
        if isinstance(dtypes, str):
            dtypes = {c: dtypes for c in self.columns}
        sdf = self._sdf
        for c, t in dtypes.items():
            sdf = sdf.withColumn(c, F.col(c).cast(t))
        return SparkFrame(sdf)

    # -- filtering (reference Filter/Query _expr.py:905,1366) --------------
    def query(self, expr: str) -> "SparkFrame":
        return SparkFrame(self._sdf.filter(expr))

    def eval(self, expr: str):
        """Reference ``Eval`` (_expr.py:1355-1363): ``'col = expression'``
        assigns a column; a bare expression returns a Series.  Compiled to a
        SQL expression — stays in codegen, no Python eval."""
        lhs, eq, rhs = expr.partition("=")
        is_assign = (
            eq
            and not rhs.startswith("=")  # '=='
            and not lhs.rstrip().endswith(("<", ">", "!"))  # '<=' '>=' '!='
        )
        if is_assign:
            return SparkFrame(self._sdf.withColumn(lhs.strip(), F.expr(rhs.strip())))
        return Series(self, F.expr(expr), "_eval")

    def rename_axis(self, name: str) -> "SparkFrame":
        """Index-name metadata only (the physical index column is always
        ``__index__``); recorded for to_pandas round-trips."""
        out = SparkFrame(self._sdf)
        out._index_name = name
        return out

    def squeeze(self):
        """1-column frame → Series (reference FrameBase.squeeze)."""
        cols = [c for c in self._sdf.columns if c != INDEX]
        if len(cols) != 1:
            return self
        return Series(self, F.col(cols[0]), cols[0])

    def dropna(self, how: str = "any", subset=None, thresh=None) -> "SparkFrame":
        return SparkFrame(
            self._sdf.dropna(how=how, thresh=thresh, subset=_as_list(subset) or None)
        )

    def fillna(self, value) -> "SparkFrame":
        return SparkFrame(self._sdf.fillna(value))

    def sample(self, frac: float, seed: int | None = None) -> "SparkFrame":
        return SparkFrame(self._sdf.sample(fraction=frac, seed=seed))

    def replace(self, to_replace: Mapping, subset=None) -> "SparkFrame":
        return SparkFrame(
            self._sdf.replace(dict(to_replace), subset=_as_list(subset) or None)
        )

    def isna(self) -> "SparkFrame":
        sdf = self._sdf.select(
            INDEX, *[F.col(c).isNull().alias(c) for c in self.columns]
        )
        return SparkFrame(sdf)

    def align(self, other: "SparkFrame", join: str = "outer") -> tuple["SparkFrame", "SparkFrame"]:
        """Reference alignment (``_align.py:9``, ``_expr.py:797-817``):
        both frames re-indexed onto the joined index domain."""
        idx = (
            self._sdf.select(INDEX)
            .join(other._sdf.select(INDEX), INDEX, join)
            .distinct()
        )
        left = SparkFrame(idx.join(self._sdf, INDEX, "left"))
        right = SparkFrame(idx.join(other._sdf, INDEX, "left"))
        return left, right

    @property
    def dtypes(self) -> dict[str, str]:
        return {
            f.name: f.dataType.simpleString()
            for f in self._sdf.schema.fields
            if f.name != INDEX
        }

    # -- small pandas-surface parity (reference _collection.py) ------------
    def copy(self) -> "SparkFrame":
        """Plans are immutable — copy is a same-plan handle, like dask's
        shallow expression copy."""
        return SparkFrame(self._sdf)

    @property
    def shape(self) -> tuple:
        """(row count, column count) — the row count is a job, like the
        reference's ``shape`` computing ``Len``."""
        return (self._sdf.count(), len(self.columns))

    @property
    def axes(self) -> list:
        return [None, self.columns]

    @property
    def divisions(self) -> tuple:
        """Unknown divisions (reference frames without computed divisions
        report ``(None, …)`` the same way): Spark partitions carry no
        pre-declared index boundaries unless range-partitioned."""
        return tuple([None] * (self.npartitions + 1))

    def keys(self) -> list:
        return self.columns

    def items(self):
        for c in self.columns:
            yield c, self[c]

    def get_partition(self, i: int) -> "SparkFrame":
        """Reference ``get_partition`` → ``partitions[i]``."""
        return self.partitions[i]

    def persist(self) -> "SparkFrame":
        """Materialize and pin the plan (reference ``persist``): Spark
        cache + an eager count to populate it."""
        sdf = self._sdf.persist()
        sdf.count()
        return SparkFrame(sdf)

    def to_series(self) -> "Series":
        """Single-column frame → Series (reference ``to_series``)."""
        cols = self.columns
        if len(cols) != 1:
            raise ValueError(f"to_series needs exactly 1 column, have {cols}")
        return self[cols[0]]

    @classmethod
    def from_dict(
        cls, spark: SparkSession, data: Mapping, npartitions: int | None = None
    ) -> "SparkFrame":
        """Reference ``from_dict`` (``io/io.py``)."""
        return cls.from_pandas(spark, pd.DataFrame(data), npartitions=npartitions)

    def select_dtypes(self, include=None, exclude=None) -> "SparkFrame":
        """Column subset by engine dtype name (reference/pandas
        ``select_dtypes``); 'number' matches the numeric family."""
        numeric = {"bigint", "int", "smallint", "tinyint", "double", "float", "decimal"}

        def matches(dt: str, spec) -> bool:
            for s in _as_list(spec):
                if s == "number" and dt.split("(")[0] in numeric:
                    return True
                if dt == s or dt.startswith(str(s)):
                    return True
            return False

        cols = []
        for name, dt in self.dtypes.items():
            if include is not None and not matches(dt, include):
                continue
            if exclude is not None and matches(dt, exclude):
                continue
            cols.append(name)
        return self[cols]

    def shuffle(self, on, npartitions: int | None = None) -> "SparkFrame":
        """Hash-partition by key columns (reference ``shuffle``): the
        explicit pre-partitioning used to co-locate downstream key-local
        work — one exchange, no sort."""
        cols = [F.col(c) for c in _as_list(on)]
        sdf = (
            self._sdf.repartition(npartitions, *cols)
            if npartitions
            else self._sdf.repartition(*cols)
        )
        return SparkFrame(sdf)

    def memory_usage_per_partition(self, deep: bool = True) -> pd.Series:
        """Bytes per physical partition (reference
        ``memory_usage_per_partition``): octet-length sum grouped by
        ``spark_partition_id`` — one scan, no collect of data."""
        sz = sum(
            (
                F.octet_length(F.col(c).cast("string"))
                for c in self.columns
            ),
            F.lit(0),
        )
        rows = (
            self._sdf.select(F.spark_partition_id().alias("pid"), sz.alias("sz"))
            .groupBy("pid")
            .agg(F.sum("sz").alias("bytes"))
            .orderBy("pid")
            .collect()
        )
        return pd.Series({r["pid"]: r["bytes"] for r in rows})

    def info(self) -> str:
        """Schema + partition summary (reference ``info``); returns the
        text instead of printing."""
        lines = [f"SparkFrame: {len(self.columns)} columns, {self.npartitions} partitions"]
        for name, dt in self.dtypes.items():
            lines.append(f"  {name}: {dt}")
        return "\n".join(lines)

    def to_csv(self, path: str, mode: str = "overwrite", header: bool = True) -> None:
        self._sdf.drop(INDEX).write.mode(mode).option(
            "header", str(header).lower()
        ).csv(path)

    def drop_duplicates(self, subset=None) -> "SparkFrame":
        cols = _as_list(subset) or self.columns
        w = W.partitionBy(*cols).orderBy(INDEX)
        sdf = (
            self._sdf.withColumn("__rn__", F.row_number().over(w))
            .filter(F.col("__rn__") == 1)
            .drop("__rn__")
        )
        return SparkFrame(sdf)

    # -- loc / iloc (reference Loc/LocIndexer/ILocIndexer,
    # _indexing.py:15-79: boolean-mask loc, index-value loc, iloc column
    # slices; positional row iloc is a non-goal, as in the reference) ------
    @property
    def loc(self) -> "_LocIndexer":
        return _LocIndexer(self)

    @property
    def iloc(self) -> "_ILocIndexer":
        return _ILocIndexer(self)

    # -- index discipline (reference _shuffle.py:708-861, SURVEY §1.5) -----
    def set_index(self, col: str, npartitions: int | None = None) -> "SparkFrame":
        sdf = self._sdf.drop(INDEX).withColumnRenamed(col, INDEX)
        n = npartitions or sdf.sparkSession.conf.get("spark.sql.shuffle.partitions")
        return SparkFrame(
            sdf.repartitionByRange(int(n), INDEX).sortWithinPartitions(INDEX)
        )

    def reset_index(self, name: str = "index", drop: bool = False) -> "SparkFrame":
        sdf = self._sdf
        if drop:
            sdf = sdf.drop(INDEX)
        else:
            sdf = sdf.withColumnRenamed(INDEX, name)
        return SparkFrame(sdf)  # re-adds a positional __index__ if dropped

    def sort_values(self, by, ascending: bool = True) -> "SparkFrame":
        cols = [F.asc(c) if ascending else F.desc(c) for c in _as_list(by)]
        return SparkFrame(self._sdf.orderBy(*cols))

    def sort_index(self) -> "SparkFrame":
        return SparkFrame(self._sdf.orderBy(INDEX))

    def head(self, n: int = 5) -> pd.DataFrame:
        return self._finalize(self._sdf.orderBy(INDEX).limit(n).toPandas())

    def tail(self, n: int = 5) -> pd.DataFrame:
        """Reference ``Tail`` (_expr.py:1675-1684): last n rows in index
        order — top-n on the reversed order (TakeOrderedAndProject), then
        re-sorted ascending driver-side."""
        pdf = self._sdf.orderBy(F.desc(INDEX)).limit(n).toPandas()
        return self._finalize(pdf.iloc[::-1].reset_index(drop=True))

    def nlargest(self, n: int, columns) -> "SparkFrame":
        return SparkFrame(self._sdf.orderBy(*[F.desc(c) for c in _as_list(columns)]).limit(n))

    def nsmallest(self, n: int, columns) -> "SparkFrame":
        return SparkFrame(self._sdf.orderBy(*[F.asc(c) for c in _as_list(columns)]).limit(n))

    def repartition(
        self,
        npartitions: int | None = None,
        freq: str | None = None,
        divisions: Sequence | None = None,
        partition_size: str | int | None = None,
    ) -> "SparkFrame":
        """Reference ``Repartition{ToFewer,ToMore,Freq,Divisions,Size}``
        (``_repartition.py:385-478``).

        * ``freq=`` range-partitions by the time-bucketed index so each
          partition holds whole time buckets.
        * ``divisions=`` reproduces the reference's explicit-boundary form:
          division ``i`` owns ``divisions[i] <= idx < divisions[i+1]``
          (last boundary inclusive, like dask).  Rows route via a compiled
          CASE ladder on the index, then ``repartitionByRange`` on the
          division number — ordered partitions without a sampling pass.
        * ``partition_size=`` targets bytes per partition (``"128MB"`` or
          an int): partition count = ceil(estimated bytes / target), the
          estimate from the JVM plan's ``sizeInBytes`` statistic — no data
          scan, no collect.
        * otherwise a plain hash ``repartition(npartitions)``.
        """
        if freq is not None:
            secs = _offset_seconds(freq)
            bucket = F.floor(F.unix_timestamp(F.col(INDEX).cast("timestamp")) / secs)
            sdf = (
                self._sdf.repartitionByRange(npartitions, bucket)
                if npartitions
                else self._sdf.repartitionByRange(bucket)
            )
            return SparkFrame(sdf)
        if divisions is not None:
            bounds = list(divisions)
            if len(bounds) < 2:
                raise ValueError("divisions needs at least 2 boundary values")
            div = F.lit(len(bounds) - 2)  # last division is right-inclusive
            for i in reversed(range(len(bounds) - 1)):
                div = F.when(F.col(INDEX) < F.lit(bounds[i + 1]), F.lit(i)).otherwise(div)
            sdf = self._sdf.filter(
                (F.col(INDEX) >= F.lit(bounds[0])) & (F.col(INDEX) <= F.lit(bounds[-1]))
            ).repartitionByRange(len(bounds) - 1, div)
            return SparkFrame(sdf)
        if partition_size is not None:
            from ..sources.tables import _parse_bytes

            target = (
                partition_size
                if isinstance(partition_size, int)
                else _parse_bytes(str(partition_size))
            )
            est = int(
                self._sdf._jdf.queryExecution()
                .optimizedPlan()
                .stats()
                .sizeInBytes()
            )
            n = max(1, -(-est // target))
            return SparkFrame(self._sdf.repartition(n))
        if npartitions is None:
            raise ValueError(
                "repartition() requires one of npartitions, freq, divisions, "
                "or partition_size (reference Repartition takes an explicit target)"
            )
        return SparkFrame(self._sdf.repartition(npartitions))

    def coalesce(self, npartitions: int) -> "SparkFrame":
        """Shuffle-free partition-count reduction (reference
        ``RepartitionToFewer``, ``_repartition.py:385``)."""
        return SparkFrame(self._sdf.coalesce(npartitions))

    @property
    def npartitions(self) -> int:
        return self._sdf.rdd.getNumPartitions()

    @property
    def partitions(self) -> "_PartitionsIndexer":
        """Positional partition selection (reference ``Partitions``,
        ``_expr.py``; ``df.partitions[i]`` / ``[i:j]``): a filter on
        ``spark_partition_id()`` — one scan, the non-selected partitions
        produce empty tasks (no shuffle, no collect)."""
        return _PartitionsIndexer(self)

    def memory_usage(self, deep: bool = True) -> pd.Series:
        """Per-column bytes (reference ``MemoryUsage``,
        ``_reductions.py``): fixed-width dtypes cost width × non-null
        count; strings/binary cost their octet length (the ``deep=True``
        pandas meaning — shallow object-pointer sizes have no Spark
        analog).  One aggregate job over all columns."""
        widths = {
            "bigint": 8, "double": 8, "int": 4, "float": 4, "smallint": 2,
            "tinyint": 1, "boolean": 1, "date": 4, "timestamp": 8,
            "timestamp_ntz": 8,
        }
        aggs = []
        cols = [c for c in self._sdf.columns if c != INDEX]
        for f_ in self._sdf.schema.fields:
            if f_.name not in cols:
                continue
            dt = f_.dataType.simpleString()
            if dt in widths:
                aggs.append((F.count(F.col(f_.name)) * widths[dt]).alias(f_.name))
            else:
                aggs.append(
                    F.coalesce(
                        F.sum(F.octet_length(F.col(f_.name).cast("string"))),
                        F.lit(0),
                    ).alias(f_.name)
                )
        row = self._sdf.agg(*aggs).collect()[0]
        return pd.Series(row.asDict())

    # -- joins (reference _merge.py; suffixes via pre-rename) --------------
    def merge(
        self,
        right: "SparkFrame",
        on=None,
        how: str = "inner",
        left_on=None,
        right_on=None,
        suffixes: tuple[str, str] = ("_x", "_y"),
        broadcast: bool = False,
        indicator: bool = False,
    ) -> "SparkFrame":
        lkeys = _as_list(on) or _as_list(left_on)
        rkeys = _as_list(on) or _as_list(right_on)
        if not lkeys:
            lkeys = rkeys = [INDEX]  # index join (reference _merge.py:45-58)
        lsdf = self._sdf
        rsdf = right._sdf.drop(INDEX) if INDEX not in rkeys else right._sdf
        overlap = (set(lsdf.columns) & set(rsdf.columns)) - set(
            k for k, r in zip(lkeys, rkeys) if k == r
        ) - {INDEX}
        lsdf = lsdf.withColumnsRenamed({c: c + suffixes[0] for c in overlap})
        rsdf = rsdf.withColumnsRenamed({c: c + suffixes[1] for c in overlap})
        if indicator:
            # reference _merge.py `indicator` operand: "_merge" column
            # marking row provenance (left_only / right_only / both)
            lsdf = lsdf.withColumn("__ind_l__", F.lit(True))
            rsdf = rsdf.withColumn("__ind_r__", F.lit(True))
        fix = lambda c, sfx: c + sfx if c in overlap else c  # noqa: E731
        cond = None
        for lk, rk in zip(lkeys, rkeys):
            c = lsdf[fix(lk, suffixes[0])] == rsdf[fix(rk, suffixes[1])]
            cond = c if cond is None else (cond & c)
        if broadcast:
            rsdf = F.broadcast(rsdf)

        def _merge_flag(lcol, rcol):
            return (
                F.when(lcol.isNotNull() & rcol.isNotNull(), F.lit("both"))
                .when(lcol.isNotNull(), F.lit("left_only"))
                .otherwise(F.lit("right_only"))
                .alias("_merge")
            )

        if lkeys == [INDEX]:
            joined = lsdf.join(rsdf, lkeys, how)
            if indicator:
                joined = joined.withColumn(
                    "_merge", _merge_flag(F.col("__ind_l__"), F.col("__ind_r__"))
                ).drop("__ind_l__", "__ind_r__")
            return SparkFrame(joined)
        joined = lsdf.join(rsdf, cond, how)
        # Pandas semantics for shared equi-keys: one output key column. For
        # right/outer joins the left key is NULL on right-only rows, so
        # coalesce both sides (reference _merge.py key handling) instead of
        # dropping the right key unconditionally.
        outerish = how in ("right", "right_outer", "outer", "full", "fullouter", "full_outer")
        shared = {
            lk for lk, rk in zip(lkeys, rkeys)
            if lk == rk and lk in lsdf.columns and lk in rsdf.columns
        }
        hidden = {"__ind_l__", "__ind_r__"}
        sel = []
        for c in lsdf.columns:
            if c in hidden:
                continue
            if c in shared and outerish:
                sel.append(F.coalesce(lsdf[c], rsdf[c]).alias(c))
            else:
                sel.append(lsdf[c])
        sel.extend(rsdf[c] for c in rsdf.columns if c not in shared and c not in hidden)
        if indicator:
            sel.append(_merge_flag(lsdf["__ind_l__"], rsdf["__ind_r__"]))
        return SparkFrame(joined.select(*sel))

    def join(self, right, how: str = "left") -> "SparkFrame":
        """Index join; ``right`` may be one frame or a list (reference
        ``JoinRecursive``, ``_merge.py`` join-a-list path — folded left)."""
        if isinstance(right, (list, tuple)):
            out = self
            for r in right:
                out = out.merge(r, on=INDEX, how=how)
            return out
        return self.merge(right, on=INDEX, how=how)

    # -- row-wise (axis=1) reductions (reference VarColumns/NUniqueColumns
    # family, _reductions.py row-wise ops) ----------------------------------
    def _row_values(self, skipna: bool = True) -> Column:
        arr = F.array(*[F.col(c).cast("double") for c in self.columns])
        return F.filter(arr, lambda x: x.isNotNull()) if skipna else arr

    def _axis1(self, axis) -> bool:
        # Default is pandas' axis=0, which we deliberately do NOT implement
        # at frame level — raising here is a LOUD divergence so ported
        # ``df.sum()`` code never silently receives row-wise sums
        # (per-column reductions are the Series API: ``df['x'].sum()``).
        if axis in (1, "columns"):
            return True
        raise NotImplementedError(
            "axis=0 frame reductions: use the Series API per column "
            "(reference semantics covered by Series.sum/mean/...); "
            "pass axis=1 explicitly for row-wise reductions"
        )

    def sum(self, axis=0) -> Series:
        self._axis1(axis)
        arr = self._row_values()
        return Series(
            self, F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x), "sum"
        )

    def mean(self, axis=0) -> Series:
        self._axis1(axis)
        arr = self._row_values()
        n = F.size(arr)
        total = F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)
        return Series(self, F.when(n > 0, total / n), "mean")

    def min(self, axis=0) -> Series:
        self._axis1(axis)
        return Series(self, F.array_min(self._row_values()), "min")

    def max(self, axis=0) -> Series:
        self._axis1(axis)
        return Series(self, F.array_max(self._row_values()), "max")

    def var(self, axis=0, ddof: int = 1) -> Series:
        """Reference ``VarColumns`` (row-wise variance)."""
        self._axis1(axis)
        arr = self._row_values()
        n = F.size(arr).cast("double")
        s1 = F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)
        s2 = F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x * x)
        var = (s2 - s1 * s1 / n) / (n - ddof)
        return Series(self, F.when(n > ddof, var), "var")

    def std(self, axis=0, ddof: int = 1) -> Series:
        self._axis1(axis)
        return Series(self, F.sqrt(self.var(axis, ddof)._expr), "std")

    def nunique_row(self) -> Series:
        """Reference ``NUniqueColumns``: distinct values within each row
        (string-compared across dtypes like pandas object coercion)."""
        arr = F.array(*[F.col(c).cast("string") for c in self.columns])
        return Series(
            self,
            F.size(F.array_distinct(F.filter(arr, lambda x: x.isNotNull()))),
            "nunique",
        )

    # -- set ops (reference _concat.py) ------------------------------------
    def concat(self, *others: "SparkFrame") -> "SparkFrame":
        sdf = self._sdf
        for o in others:
            sdf = sdf.unionByName(o._sdf, allowMissingColumns=True)
        return SparkFrame(sdf)

    # -- groupby (reference _groupby.py) -----------------------------------
    def groupby(self, by) -> "GroupBy":
        return GroupBy(self, _as_list(by))

    # -- time-series containers (reference _resample.py, _rolling.py) ------
    def resample(self, rule: str) -> "Resampler":
        return Resampler(self, rule)

    # -- reshape (reference PivotTable _reductions.py:556-659; Explode
    # _expr.py:1296-1306; melt absent in reference — free extension) --------
    def pivot_table(
        self, index: str, columns: str, values: str, aggfunc: str = "sum"
    ) -> "SparkFrame":
        sdf = (
            self._sdf.groupBy(index)
            .pivot(columns)
            .agg(_AGG_FNS[aggfunc](values))
        )
        return SparkFrame(sdf.withColumn(INDEX, F.col(index)))

    def explode(self, column: str) -> "SparkFrame":
        return SparkFrame(self._sdf.withColumn(column, F.explode_outer(column)))

    def melt(self, id_vars, value_vars=None, var_name="variable", value_name="value") -> "SparkFrame":
        ids = _as_list(id_vars)
        vals = _as_list(value_vars) or [c for c in self.columns if c not in ids]
        sdf = self._sdf.select(
            INDEX,
            *ids,
            F.expr(
                "stack({n}, {args}) as ({var}, {val})".format(
                    n=len(vals),
                    args=", ".join(f"'{c}', cast(`{c}` as double)" for c in vals),
                    var=var_name,
                    val=value_name,
                )
            ),
        )
        return SparkFrame(sdf)

    def combine_first(self, other: "SparkFrame") -> "SparkFrame":
        """Reference ``CombineFirst`` (``_expr.py:857-884``): full outer
        index join + per-column coalesce (self wins)."""
        lsdf = self._sdf
        rsdf = other._sdf
        lcols, rcols = set(lsdf.columns) - {INDEX}, set(rsdf.columns) - {INDEX}
        l = lsdf.withColumnsRenamed({c: c + "__l" for c in lcols})
        r = rsdf.withColumnsRenamed({c: c + "__r" for c in rcols})
        joined = l.join(r, INDEX, "outer")
        out_cols = [F.col(INDEX)]
        for c in sorted(lcols | rcols):
            if c in lcols and c in rcols:
                out_cols.append(F.coalesce(c + "__l", c + "__r").alias(c))
            elif c in lcols:
                out_cols.append(F.col(c + "__l").alias(c))
            else:
                out_cols.append(F.col(c + "__r").alias(c))
        return SparkFrame(joined.select(*out_cols))

    # -- pairwise stats (reference GroupBy.cov/corr _groupby.py:428-455,
    # frame-level via F.covar_samp / F.corr) --------------------------------
    def cov(self, c1: str, c2: str) -> float:
        return self._sdf.agg(F.covar_samp(c1, c2)).collect()[0][0]

    def corr(self, c1: str, c2: str) -> float:
        return self._sdf.agg(F.corr(c1, c2)).collect()[0][0]

    # -- multi-dim aggs (absent in reference — free Spark extensions §2.6) -
    def rollup(self, *cols) -> "GroupBy":
        gb = GroupBy(self, list(cols))
        gb._grouping = self._sdf.rollup(*cols)
        return gb

    def cube(self, *cols) -> "GroupBy":
        gb = GroupBy(self, list(cols))
        gb._grouping = self._sdf.cube(*cols)
        return gb

    # -- MapOverlap (reference _expr.py:595-794): partition-boundary overlap
    # for custom sliding logic that Window functions can't express ----------
    def map_overlap(
        self, fn: Callable, schema, before: int = 0, after: int = 0, bucket_size: int = 10_000
    ) -> "SparkFrame":
        """Apply ``fn(pdf) -> pdf`` over index-ordered buckets, each padded
        with ``before``/``after`` neighbor rows; padding rows are trimmed
        from the output (same-length contract, like the reference's
        ``MapOverlap`` trim ``_expr.py:649-672``).

        Scale shape: NO global ordering step.  The frame is range-
        partitioned by the index (a distributed sample-based shuffle, the
        same cost class as ``orderBy``), positions are computed per
        partition, and only the ``before``/``after`` boundary rows are
        duplicated to the neighboring bucket — each row lands in ≤ 3
        buckets, every window in the plan is partitioned.  Keep
        ``before``/``after`` ≪ ``bucket_size``.
        """
        n_rows = self._sdf.count()
        n_buckets = max(1, -(-n_rows // bucket_size))
        # localCheckpoint pins both the sampled range boundaries and
        # spark_partition_id, which are otherwise not retry-deterministic
        d = (
            self._sdf.repartitionByRange(n_buckets, F.col(INDEX))
            .sortWithinPartitions(INDEX)
            .withColumn("__pid__", F.spark_partition_id().cast("long"))
            .localCheckpoint()
        )
        w = W.partitionBy("__pid__").orderBy(INDEX)
        base = d.withColumn("__lpos__", F.row_number().over(w) - 1).withColumn(
            "__cnt__", F.count(F.lit(1)).over(W.partitionBy("__pid__"))
        )
        pid = F.col("__pid__")
        targets = F.array_compact(
            F.array(
                pid,
                F.when((F.col("__lpos__") < after) & (pid > 0), pid - 1),
                F.when(
                    (F.col("__lpos__") >= F.col("__cnt__") - before)
                    & (pid < n_buckets - 1),
                    pid + 1,
                ),
            )
        )
        exploded = base.withColumn("__bucket__", F.explode(targets)).drop("__cnt__")

        def _apply(key, pdf: pd.DataFrame):
            # global order == (range-partition id, position within it)
            pdf = pdf.sort_values(["__pid__", "__lpos__"])
            own = (pdf["__bucket__"] == pdf["__pid__"]).to_numpy()
            out = fn(pdf.drop(columns=["__bucket__", "__pid__", "__lpos__"]))
            return out[own]

        result = exploded.groupBy("__bucket__").applyInPandas(_apply, schema)
        return SparkFrame(result)

    # -- reductions (frame-level) ------------------------------------------
    def count(self) -> int:
        return self._sdf.count()

    __len__ = count

    def nunique_approx(self, rsd: float = 0.05) -> int:
        return self._sdf.agg(
            F.approx_count_distinct(F.struct(*self.columns), rsd)
        ).collect()[0][0]

    def describe(self, lazy: bool = False):
        """Reference Describe (_describe.py:16-94) → native summary().

        ``lazy=True`` keeps the summary a composable distributed frame
        (LazyScalar's pattern at frame granularity) — the default eager
        pandas return is the API boundary, fine because the result is
        O(columns), never O(rows)."""
        out = self._sdf.drop(INDEX).summary()
        return SparkFrame(out) if lazy else out.toPandas()

    # -- UDF surface (reference MapPartitions _expr.py:517-592) ------------
    def map_partitions(self, fn: Callable, schema) -> "SparkFrame":
        return SparkFrame(self._sdf.mapInPandas(fn, schema))

    def apply_rows(self, fn: Callable, schema) -> "SparkFrame":
        """Row-wise apply via Arrow-batched mapInPandas (reference ``Apply``,
        ``_expr.py`` apply path).  The index column is carried through
        automatically; ``schema`` describes only the user-visible columns."""
        idx_type = self._sdf.schema[INDEX].dataType.simpleString()
        full_schema = (
            schema if INDEX in str(schema) else f"{schema}, {INDEX} {idx_type}"
        )

        def _mapper(it):
            for pdf in it:
                out = pdf.apply(fn, axis=1, result_type="expand")
                if INDEX not in out.columns:
                    out[INDEX] = pdf[INDEX].values
                yield out

        return SparkFrame(self._sdf.mapInPandas(_mapper, full_schema))

    # -- materialization ----------------------------------------------------
    def _finalize(self, pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.set_index(INDEX)
        out.index.name = getattr(self, "_index_name", None)
        return out

    def to_pandas(self) -> pd.DataFrame:
        return self._finalize(self._sdf.orderBy(INDEX).toPandas())

    compute = to_pandas

    def to_spark(self) -> DataFrame:
        return self._sdf

    def explain(self, mode: str = "formatted") -> None:
        self._sdf.explain(mode)


class _PartitionsIndexer:
    """``df.partitions[i]`` / ``df.partitions[i:j]`` (reference
    ``Partitions``): selects physical partitions by position via a
    ``spark_partition_id()`` filter."""

    def __init__(self, frame: "SparkFrame"):
        self._f = frame

    def __getitem__(self, key) -> "SparkFrame":
        pid = F.spark_partition_id()
        if isinstance(key, slice):
            n = self._f.npartitions
            start, stop, step = key.indices(n)
            wanted = list(range(start, stop, step))
            return SparkFrame(self._f._sdf.filter(pid.isin(wanted)))
        if key < 0:
            key = self._f.npartitions + key
        return SparkFrame(self._f._sdf.filter(pid == int(key)))


class _LocIndexer:
    """Label-based row (and optional column) selection on ``__index__``."""

    def __init__(self, frame: "SparkFrame"):
        self._f = frame

    def __getitem__(self, key):
        cols = None
        if isinstance(key, tuple):
            key, cols = key
        if isinstance(key, Series):  # boolean mask
            out = SparkFrame(self._f._sdf.filter(key._expr))
        elif isinstance(key, slice):  # index-range (inclusive, pandas-style)
            sdf = self._f._sdf
            if key.start is not None:
                sdf = sdf.filter(F.col(INDEX) >= key.start)
            if key.stop is not None:
                sdf = sdf.filter(F.col(INDEX) <= key.stop)
            out = SparkFrame(sdf)
        else:  # scalar index label
            out = SparkFrame(self._f._sdf.filter(F.col(INDEX) == F.lit(key)))
        if cols is not None:
            out = out[_as_list(cols)]
        return out


class _ILocIndexer:
    """Positional COLUMN slicing only (row iloc is a non-goal distributed —
    same scope as the reference's ILocIndexer, _indexing.py:64-79)."""

    def __init__(self, frame: "SparkFrame"):
        self._f = frame

    def __getitem__(self, key):
        if not (isinstance(key, tuple) and len(key) == 2):
            raise TypeError("iloc supports [:, col_slice] only")
        rows, cols = key
        if not (isinstance(rows, slice) and rows == slice(None)):
            raise TypeError("iloc row selection is not supported (use loc)")
        selected = self._f.columns[cols] if isinstance(cols, slice) else [
            self._f.columns[i] for i in _as_list(cols)
        ]
        return self._f[_as_list(selected)]


class GroupBy:
    """Deferred grouping container (reference ``GroupBy``,
    ``_groupby.py:992``).  Aggregations map to partial/final
    HashAggregates; ``apply`` maps to ``applyInPandas`` (reference
    ``GroupByApply`` shuffle+UDF, ``_groupby.py:636-739``)."""

    def __init__(self, frame: SparkFrame, by: list[str]):
        self._frame = frame
        self._by = by
        self._grouping = None  # rollup/cube override (SparkFrame.rollup)

    def _grouped(self):
        return (
            self._grouping
            if self._grouping is not None
            else self._frame._sdf.groupBy(*self._by)
        )

    def _agg_all(self, fname: str) -> SparkFrame:
        fn = _AGG_FNS[fname]
        cols = [c for c in self._frame.columns if c not in self._by]
        sdf = self._grouped().agg(
            *[fn(c).alias(c) for c in cols]
        )
        # grouped result: group keys become the index domain; keep keys as
        # columns AND use the first key as __index__ for ordering parity
        sdf = sdf.withColumn(INDEX, F.col(self._by[0]))
        return SparkFrame(sdf)

    def sum(self):
        return self._agg_all("sum")

    def mean(self):
        return self._agg_all("mean")

    def min(self):
        return self._agg_all("min")

    def max(self):
        return self._agg_all("max")

    def count(self):
        return self._agg_all("count")

    def first(self):
        return self._agg_all("first")

    def last(self):
        return self._agg_all("last")

    def std(self):
        return self._agg_all("std")

    def var(self):
        return self._agg_all("var")

    def nunique(self):
        return self._agg_all("nunique")

    def median(self):
        return self._agg_all("median")

    def size(self) -> SparkFrame:
        sdf = (
            self._frame._sdf.groupBy(*self._by)
            .agg(F.count(F.lit(1)).alias("size"))
            .withColumn(INDEX, F.col(self._by[0]))
        )
        return SparkFrame(sdf)

    @staticmethod
    def _compile_agg(col: str, fname) -> Column:
        """One spec entry → a Spark aggregate Column.  String names map to
        built-in JVM aggregates; Python callables compile to an Arrow-
        batched grouped-agg pandas UDF (reference accepts arbitrary
        callables via ``_normalize_spec``, ``_groupby.py:288-326``).
        Callables receive the group's values as a ``pd.Series`` and must
        return a scalar; the result column is ``double``."""
        if callable(fname) and not isinstance(fname, str):
            fn = fname

            def _wrap(s: pd.Series) -> float:
                return fn(s)

            return F.pandas_udf(_wrap, "double")(F.col(col))
        return _AGG_FNS[fname](col)

    @staticmethod
    def _spec_name(fname) -> str:
        return fname if isinstance(fname, str) else getattr(fname, "__name__", "agg")

    def agg(self, spec) -> SparkFrame:
        """Dict/str/list agg spec compiler (reference ``_normalize_spec``,
        ``_groupby.py:302-326``); entries may be aggregate names or Python
        callables (compiled to grouped-agg pandas UDFs).

        Spark rejects mixing grouped-agg pandas UDFs with JVM aggregates in
        one ``agg`` (INVALID_PANDAS_UDF_PLACEMENT), so a mixed spec runs as
        two aggregates over the same grouping joined on the keys — both
        sides share the group-key partitioning, so the join adds no extra
        shuffle of the big table."""
        if isinstance(spec, str):
            return self._agg_all(spec)
        entries: list[tuple[str, Any, str]] = []  # (col, fn, alias)
        if callable(spec):
            cols = [c for c in self._frame.columns if c not in self._by and c != INDEX]
            nm = self._spec_name(spec)
            entries = [(c, spec, f"{c}_{nm}") for c in cols]
        elif isinstance(spec, Mapping):
            for col, fns in spec.items():
                single = isinstance(fns, str) or callable(fns)
                for fname in _as_list(fns):
                    alias = col if single else f"{col}_{self._spec_name(fname)}"
                    entries.append((col, fname, alias))
        elif isinstance(spec, Sequence):
            cols = [c for c in self._frame.columns if c not in self._by]
            for fname in spec:
                for col in cols:
                    entries.append((col, fname, f"{col}_{self._spec_name(fname)}"))
        else:
            raise TypeError(f"unsupported agg spec: {spec!r}")
        jvm = [e for e in entries if isinstance(e[1], str)]
        udf = [e for e in entries if not isinstance(e[1], str)]
        parts = []
        if jvm:
            parts.append(
                self._grouped().agg(
                    *[self._compile_agg(c, f).alias(a) for c, f, a in jvm]
                )
            )
        if udf:
            parts.append(
                self._grouped().agg(
                    *[self._compile_agg(c, f).alias(a) for c, f, a in udf]
                )
            )
        sdf = parts[0]
        if len(parts) == 2:
            sdf = parts[0].join(parts[1], on=list(self._by), how="inner")
        order = [a for _, _, a in entries]
        sdf = sdf.select(*self._by, *order)
        sdf = sdf.withColumn(INDEX, F.col(self._by[0]))
        return SparkFrame(sdf)

    def apply(self, fn: Callable, schema) -> SparkFrame:
        return SparkFrame(
            self._frame._sdf.groupBy(*self._by).applyInPandas(fn, schema)
        )

    def transform(self, fname: str, col: str) -> Series:
        """Reference ``GroupByTransform`` (``_groupby.py:742-745``): group
        aggregate broadcast back to every member row — a Window aggregate,
        no shuffle beyond the group partitioning."""
        w = W.partitionBy(*self._by)
        return Series(self._frame, _AGG_FNS[fname](F.col(col)).over(w), col)

    def shift(self, col: str, periods: int = 1) -> Series:
        w = W.partitionBy(*self._by).orderBy(INDEX)
        return Series(self._frame, F.lag(F.col(col), periods).over(w), col)

    def ffill(self, col: str, limit: int | None = None) -> Series:
        """Reference ``GroupByFFill`` (``_groupby.py:752-761``); ``limit``
        bounds the fill distance within each group."""
        w = (
            W.partitionBy(*self._by)
            .orderBy(INDEX)
            .rowsBetween(W.unboundedPreceding if limit is None else -limit, 0)
        )
        return Series(self._frame, F.last(F.col(col), ignorenulls=True).over(w), col)

    def bfill(self, col: str, limit: int | None = None) -> Series:
        w = (
            W.partitionBy(*self._by)
            .orderBy(INDEX)
            .rowsBetween(0, W.unboundedFollowing if limit is None else limit)
        )
        return Series(self._frame, F.first(F.col(col), ignorenulls=True).over(w), col)

    def _cum_window(self):
        return (
            W.partitionBy(*self._by)
            .orderBy(INDEX)
            .rowsBetween(W.unboundedPreceding, 0)
        )

    def cumsum(self, col: str) -> Series:
        return Series(self._frame, F.sum(F.col(col)).over(self._cum_window()), col)

    def cumprod(self, col: str) -> Series:
        return Series(self._frame, F.product(F.col(col)).over(self._cum_window()), col)

    def cummax(self, col: str) -> Series:
        return Series(self._frame, F.max(F.col(col)).over(self._cum_window()), col)

    def cummin(self, col: str) -> Series:
        return Series(self._frame, F.min(F.col(col)).over(self._cum_window()), col)

    def cumcount(self) -> Series:
        """Row number within group (0-based), pandas ``GroupBy.cumcount``."""
        w = W.partitionBy(*self._by).orderBy(INDEX)
        return Series(self._frame, F.row_number().over(w) - 1, "cumcount")

    def prod(self):
        """Reference GroupBy ``Prod`` (``_groupby.py:1139``)."""
        return self._agg_all("prod")

    def quantile(self, q: float = 0.5):
        """Exact per-group quantile (reference forces a shuffle then exact
        median, ``_groupby.py:781-828``; ``F.percentile`` is the same
        partial/final exact computation)."""
        cols = [c for c in self._frame.columns if c not in self._by and c != INDEX]
        sdf = self._grouped().agg(
            *[F.percentile(F.col(c), F.lit(q)).alias(c) for c in cols]
        )
        return SparkFrame(sdf.withColumn(INDEX, F.col(self._by[0])))

    def sem(self, ddof: int = 1):
        """Standard error of the group mean: std/sqrt(n) per group."""
        cols = [c for c in self._frame.columns if c not in self._by and c != INDEX]
        std = F.stddev_samp if ddof else F.stddev_pop
        sdf = self._grouped().agg(
            *[(std(F.col(c)) / F.sqrt(F.count(F.col(c)))).alias(c) for c in cols]
        )
        return SparkFrame(sdf.withColumn(INDEX, F.col(self._by[0])))

    def rolling(self, window: int, col: str, fname: str = "mean") -> Series:
        """Groupby-rolling (reference ``GroupBy.rolling``,
        ``_groupby.py:1398-1415``): per-group ordered row window — one
        partitioned Window spec, no extra shuffle beyond the grouping."""
        w = (
            W.partitionBy(*self._by)
            .orderBy(INDEX)
            .rowsBetween(-(window - 1), 0)
        )
        return Series(self._frame, _AGG_FNS[fname](F.col(col)).over(w), col)

    def rank(self, col: str, ascending: bool = True) -> Series:
        order = F.asc(col) if ascending else F.desc(col)
        w = W.partitionBy(*self._by).orderBy(order)
        return Series(self._frame, F.rank().over(w).cast("double"), col)

    def idxmax(self, col: str) -> SparkFrame:
        """Reference GroupBy ``IdxMax`` (``_groupby.py:413-420``) →
        ``F.max_by`` over the index column."""
        sdf = self._grouped().agg(F.max_by(F.col(INDEX), F.col(col)).alias(f"{col}_idxmax"))
        return SparkFrame(sdf.withColumn(INDEX, F.col(self._by[0])))

    def idxmin(self, col: str) -> SparkFrame:
        sdf = self._grouped().agg(F.min_by(F.col(INDEX), F.col(col)).alias(f"{col}_idxmin"))
        return SparkFrame(sdf.withColumn(INDEX, F.col(self._by[0])))

    def value_counts(self) -> SparkFrame:
        """Reference GroupBy ``ValueCounts`` (``_groupby.py:423-425``)."""
        cols = [c for c in self._frame.columns if c not in self._by]
        sdf = (
            self._frame._sdf.groupBy(*self._by, *cols)
            .agg(F.count(F.lit(1)).alias("count"))
            .withColumn(INDEX, F.col(self._by[0]))
        )
        return SparkFrame(sdf)

    def cov(self, c1: str, c2: str) -> SparkFrame:
        sdf = self._grouped().agg(F.covar_samp(c1, c2).alias("cov"))
        return SparkFrame(sdf.withColumn(INDEX, F.col(self._by[0])))

    def corr(self, c1: str, c2: str) -> SparkFrame:
        sdf = self._grouped().agg(F.corr(c1, c2).alias("corr"))
        return SparkFrame(sdf.withColumn(INDEX, F.col(self._by[0])))

    def head(self, n: int = 1) -> SparkFrame:
        w = W.partitionBy(*self._by).orderBy(INDEX)
        sdf = (
            self._frame._sdf.withColumn("__rn__", F.row_number().over(w))
            .filter(F.col("__rn__") <= n)
            .drop("__rn__")
        )
        return SparkFrame(sdf)

    def tail(self, n: int = 1) -> SparkFrame:
        w = W.partitionBy(*self._by).orderBy(F.desc(INDEX))
        sdf = (
            self._frame._sdf.withColumn("__rn__", F.row_number().over(w))
            .filter(F.col("__rn__") <= n)
            .drop("__rn__")
        )
        return SparkFrame(sdf)
