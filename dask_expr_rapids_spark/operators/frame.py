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


class Series:
    """A named column expression bound to a parent frame (reference
    ``Series``, ``_collection.py:1529``).  Elementwise ops build Column
    expressions; reductions trigger a job and return a driver scalar
    (reference ``Scalar``, ``_collection.py:1850``)."""

    def __init__(self, frame: "SparkFrame", expr: Column, name: str):
        self._frame = frame
        self._expr = expr
        self.name = name

    # -- elementwise arithmetic / comparison / logic (reference
    # _expr.py:1746-1876) --------------------------------------------------
    def _bin(self, other, op, name=None) -> "Series":
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

    def notnull(self):
        return Series(self._frame, self._expr.isNotNull(), self.name)

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

    # -- reductions → driver scalar (reference _reductions.py) -------------
    def _reduce(self, agg: Column):
        return self._frame._sdf.agg(agg).collect()[0][0]

    def sum(self):
        return self._reduce(F.sum(self._expr))

    def mean(self):
        return self._reduce(F.avg(self._expr))

    def min(self):
        return self._reduce(F.min(self._expr))

    def max(self):
        return self._reduce(F.max(self._expr))

    def count(self):
        return self._reduce(F.count(self._expr))

    def nunique(self):
        return self._reduce(F.countDistinct(self._expr))

    def nunique_approx(self, rsd: float = 0.05):
        """Reference ``NuniqueApprox`` (HyperLogLog, _reductions.py:1028-1049)."""
        return self._reduce(F.approx_count_distinct(self._expr, rsd))

    def std(self, ddof: int = 1):
        return self._reduce(F.stddev_samp(self._expr) if ddof else F.stddev_pop(self._expr))

    def var(self, ddof: int = 1):
        return self._reduce(F.var_samp(self._expr) if ddof else F.var_pop(self._expr))

    def quantile(self, q: float = 0.5):
        return self._reduce(F.expr(f"percentile({self._to_sql()}, {q})"))

    def median(self):
        return self.quantile(0.5)

    def mode(self):
        sdf = self._frame._sdf.select(self._expr.alias("v"))
        row = (
            sdf.groupBy("v")
            .count()
            .orderBy(F.desc("count"), F.asc("v"))
            .limit(1)
            .collect()
        )
        return row[0][0] if row else None

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

    def shift(self, periods: int = 1):
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

    def cumcount(self):
        w = self._ordered_window().rowsBetween(W.unboundedPreceding, 0)
        return Series(self._frame, F.count(self._expr).over(w), self.name)

    def ffill(self):
        w = self._ordered_window().rowsBetween(W.unboundedPreceding, 0)
        return Series(self._frame, F.last(self._expr, ignorenulls=True).over(w), self.name)

    def bfill(self):
        w = self._ordered_window().rowsBetween(0, W.unboundedFollowing)
        return Series(self._frame, F.first(self._expr, ignorenulls=True).over(w), self.name)

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

    def dropna(self, how: str = "any", subset=None, thresh=None) -> "SparkFrame":
        return SparkFrame(
            self._sdf.dropna(how=how, thresh=thresh, subset=_as_list(subset) or None)
        )

    def fillna(self, value) -> "SparkFrame":
        return SparkFrame(self._sdf.fillna(value))

    def sample(self, frac: float, seed: int | None = None) -> "SparkFrame":
        return SparkFrame(self._sdf.sample(fraction=frac, seed=seed))

    def drop_duplicates(self, subset=None) -> "SparkFrame":
        cols = _as_list(subset) or self.columns
        w = W.partitionBy(*cols).orderBy(INDEX)
        sdf = (
            self._sdf.withColumn("__rn__", F.row_number().over(w))
            .filter(F.col("__rn__") == 1)
            .drop("__rn__")
        )
        return SparkFrame(sdf)

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

    def nlargest(self, n: int, columns) -> "SparkFrame":
        return SparkFrame(self._sdf.orderBy(*[F.desc(c) for c in _as_list(columns)]).limit(n))

    def nsmallest(self, n: int, columns) -> "SparkFrame":
        return SparkFrame(self._sdf.orderBy(*[F.asc(c) for c in _as_list(columns)]).limit(n))

    def repartition(self, npartitions: int) -> "SparkFrame":
        return SparkFrame(self._sdf.repartition(npartitions))

    @property
    def npartitions(self) -> int:
        return self._sdf.rdd.getNumPartitions()

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
        fix = lambda c, sfx: c + sfx if c in overlap else c  # noqa: E731
        cond = None
        for lk, rk in zip(lkeys, rkeys):
            c = lsdf[fix(lk, suffixes[0])] == rsdf[fix(rk, suffixes[1])]
            cond = c if cond is None else (cond & c)
        if broadcast:
            rsdf = F.broadcast(rsdf)
        joined = lsdf.join(rsdf, cond if lkeys != [INDEX] else lkeys, how)
        # drop duplicate right-side key columns for equi-key joins
        for lk, rk in zip(lkeys, rkeys):
            if lk == rk and lk != INDEX and lk in lsdf.columns and lk in rsdf.columns:
                joined = joined.drop(rsdf[fix(rk, suffixes[1])])
        return SparkFrame(joined)

    def join(self, right: "SparkFrame", how: str = "left") -> "SparkFrame":
        return self.merge(right, on=INDEX, how=how)

    # -- set ops (reference _concat.py) ------------------------------------
    def concat(self, *others: "SparkFrame") -> "SparkFrame":
        sdf = self._sdf
        for o in others:
            sdf = sdf.unionByName(o._sdf, allowMissingColumns=True)
        return SparkFrame(sdf)

    # -- groupby (reference _groupby.py) -----------------------------------
    def groupby(self, by) -> "GroupBy":
        return GroupBy(self, _as_list(by))

    # -- reductions (frame-level) ------------------------------------------
    def count(self) -> int:
        return self._sdf.count()

    __len__ = count

    def nunique_approx(self, rsd: float = 0.05) -> int:
        return self._sdf.agg(
            F.approx_count_distinct(F.struct(*self.columns), rsd)
        ).collect()[0][0]

    def describe(self) -> pd.DataFrame:
        """Reference Describe (_describe.py:16-94) → native summary()."""
        return self._sdf.drop(INDEX).summary().toPandas()

    # -- UDF surface (reference MapPartitions _expr.py:517-592) ------------
    def map_partitions(self, fn: Callable, schema) -> "SparkFrame":
        return SparkFrame(self._sdf.mapInPandas(fn, schema))

    def apply_rows(self, fn: Callable, schema) -> "SparkFrame":
        def _mapper(it):
            for pdf in it:
                yield pdf.apply(fn, axis=1, result_type="expand")

        return SparkFrame(self._sdf.mapInPandas(_mapper, schema))

    # -- materialization ----------------------------------------------------
    @staticmethod
    def _finalize(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf.set_index(INDEX)
        out.index.name = None
        return out

    def to_pandas(self) -> pd.DataFrame:
        return self._finalize(self._sdf.orderBy(INDEX).toPandas())

    compute = to_pandas

    def to_spark(self) -> DataFrame:
        return self._sdf

    def explain(self, mode: str = "formatted") -> None:
        self._sdf.explain(mode)


class GroupBy:
    """Deferred grouping container (reference ``GroupBy``,
    ``_groupby.py:992``).  Aggregations map to partial/final
    HashAggregates; ``apply`` maps to ``applyInPandas`` (reference
    ``GroupByApply`` shuffle+UDF, ``_groupby.py:636-739``)."""

    def __init__(self, frame: SparkFrame, by: list[str]):
        self._frame = frame
        self._by = by

    def _agg_all(self, fname: str) -> SparkFrame:
        fn = _AGG_FNS[fname]
        cols = [c for c in self._frame.columns if c not in self._by]
        sdf = self._frame._sdf.groupBy(*self._by).agg(
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

    def agg(self, spec) -> SparkFrame:
        """Dict/str/list agg spec compiler (reference ``_normalize_spec``,
        ``_groupby.py:302-326``)."""
        aggs: list[Column] = []
        if isinstance(spec, str):
            return self._agg_all(spec)
        if isinstance(spec, Mapping):
            for col, fns in spec.items():
                for fname in _as_list(fns):
                    alias = f"{col}_{fname}" if not isinstance(fns, str) else col
                    aggs.append(_AGG_FNS[fname](col).alias(alias))
        elif isinstance(spec, Sequence):
            cols = [c for c in self._frame.columns if c not in self._by]
            for fname in spec:
                for col in cols:
                    aggs.append(_AGG_FNS[fname](col).alias(f"{col}_{fname}"))
        else:
            raise TypeError(f"unsupported agg spec: {spec!r}")
        sdf = self._frame._sdf.groupBy(*self._by).agg(*aggs)
        sdf = sdf.withColumn(INDEX, F.col(self._by[0]))
        return SparkFrame(sdf)

    def apply(self, fn: Callable, schema) -> SparkFrame:
        return SparkFrame(
            self._frame._sdf.groupBy(*self._by).applyInPandas(fn, schema)
        )

    def shift(self, col: str, periods: int = 1) -> Series:
        w = W.partitionBy(*self._by).orderBy(INDEX)
        return Series(self._frame, F.lag(F.col(col), periods).over(w), col)

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
