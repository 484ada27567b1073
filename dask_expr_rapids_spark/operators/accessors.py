"""String / datetime accessors for the Series facade.

Reference: ``StringAccessor`` (~55 delegated methods,
``/root/reference/dask_expr/_str_accessor.py:21-74``) and
``DatetimeAccessor`` (``dask_expr/_datetime.py:15-72``).  Every method is a
pure ``pyspark.sql.functions`` mapping — JVM-side, codegen'd.
"""

from __future__ import annotations

from pyspark.sql import functions as F


class StringMethods:
    def __init__(self, series):
        self._s = series

    def _wrap(self, expr):
        from .frame import Series

        return Series(self._s._frame, expr, self._s.name)

    # case
    def upper(self):
        return self._wrap(F.upper(self._s._expr))

    def lower(self):
        return self._wrap(F.lower(self._s._expr))

    def capitalize(self):
        return self._wrap(F.initcap(F.lower(self._s._expr)))

    def title(self):
        return self._wrap(F.initcap(self._s._expr))

    # trim / pad
    def strip(self):
        return self._wrap(F.trim(self._s._expr))

    def lstrip(self):
        return self._wrap(F.ltrim(self._s._expr))

    def rstrip(self):
        return self._wrap(F.rtrim(self._s._expr))

    def pad(self, width: int, side: str = "left", fillchar: str = " "):
        fn = F.lpad if side == "left" else F.rpad
        return self._wrap(fn(self._s._expr, width, fillchar))

    def zfill(self, width: int):
        return self._wrap(F.lpad(self._s._expr, width, "0"))

    # predicates
    def contains(self, pat: str, regex: bool = False):
        e = self._s._expr
        return self._wrap(e.rlike(pat) if regex else e.contains(pat))

    def startswith(self, pat: str):
        return self._wrap(self._s._expr.startswith(pat))

    def endswith(self, pat: str):
        return self._wrap(self._s._expr.endswith(pat))

    def isalpha(self):
        return self._wrap(self._s._expr.rlike("^[A-Za-z]+$"))

    def isdigit(self):
        return self._wrap(self._s._expr.rlike("^[0-9]+$"))

    def isspace(self):
        return self._wrap(self._s._expr.rlike(r"^\s+$"))

    # slicing / extraction
    def len(self):
        return self._wrap(F.length(self._s._expr))

    def slice(self, start: int = 0, stop: int | None = None):
        length = (stop - start) if stop is not None else 2_147_483_647
        return self._wrap(F.substring(self._s._expr, start + 1, length))

    __getitem__ = None  # use .slice

    def get(self, i: int):
        return self._wrap(F.substring(self._s._expr, i + 1, 1))

    def extract(self, pat: str, group: int = 1):
        return self._wrap(F.regexp_extract(self._s._expr, pat, group))

    # edit
    def replace(self, pat: str, repl: str, regex: bool = False):
        e = self._s._expr
        if regex:
            return self._wrap(F.regexp_replace(e, pat, repl))
        return self._wrap(F.replace(e, F.lit(pat), F.lit(repl)))

    def repeat(self, n: int):
        return self._wrap(F.repeat(self._s._expr, n))

    def cat(self, others=None, sep: str = ""):
        """Blockwise concat with other columns (reference CatBlockwise,
        _str_accessor.py:125); whole-column reduction form is
        ``cat_reduce``."""
        exprs = [self._s._expr] + [o._expr for o in (others or [])]
        return self._wrap(F.concat_ws(sep, *exprs))

    def cat_reduce(self, sep: str = ""):
        """Whole-column concatenation in index order (reference Cat,
        _str_accessor.py:138-155).  Single-group collect_list — driver-sized
        result, same serial semantics as the reference."""
        sdf = self._s._frame._sdf.orderBy("__index__").agg(
            F.array_join(F.collect_list(self._s._expr), sep)
        )
        return sdf.collect()[0][0]

    def split(self, pat: str = r"\s+", n: int = -1, expand: bool = False):
        limit = n + 1 if n and n > 0 else -1
        arr = F.split(self._s._expr, pat, limit)
        if not expand:
            return self._wrap(arr)
        raise NotImplementedError("expand=True: use frame.assign per element")

    def count(self, pat: str):
        return self._wrap(F.regexp_count(self._s._expr, F.lit(pat)))

    def find(self, sub: str):
        return self._wrap(F.instr(self._s._expr, sub) - 1)


class DatetimeMethods:
    def __init__(self, series):
        self._s = series

    def _wrap(self, expr):
        from .frame import Series

        return Series(self._s._frame, expr, self._s.name)

    @property
    def year(self):
        return self._wrap(F.year(self._s._expr))

    @property
    def month(self):
        return self._wrap(F.month(self._s._expr))

    @property
    def day(self):
        return self._wrap(F.dayofmonth(self._s._expr))

    @property
    def hour(self):
        return self._wrap(F.hour(self._s._expr))

    @property
    def minute(self):
        return self._wrap(F.minute(self._s._expr))

    @property
    def second(self):
        return self._wrap(F.second(self._s._expr))

    @property
    def dayofweek(self):
        # pandas: Monday=0; Spark dayofweek: Sunday=1
        return self._wrap((F.dayofweek(self._s._expr) + 5) % 7)

    @property
    def dayofyear(self):
        return self._wrap(F.dayofyear(self._s._expr))

    @property
    def quarter(self):
        return self._wrap(F.quarter(self._s._expr))

    @property
    def week(self):
        return self._wrap(F.weekofyear(self._s._expr))

    @property
    def date(self):
        return self._wrap(F.to_date(self._s._expr))

    @property
    def is_month_start(self):
        return self._wrap(F.dayofmonth(self._s._expr) == 1)

    @property
    def is_month_end(self):
        e = self._s._expr
        return self._wrap(F.to_date(e) == F.last_day(e))

    def floor(self, freq: str):
        unit = {"D": "day", "H": "hour", "h": "hour", "T": "minute", "min": "minute"}.get(
            freq, freq
        )
        return self._wrap(F.date_trunc(unit, self._s._expr))

    ceil = None  # not provided natively; compose via floor + interval

    def round(self, freq: str):
        raise NotImplementedError("use floor(freq); round needs interval arithmetic")

    def strftime(self, fmt: str):
        # pandas %Y-%m-%d ↔ Spark yyyy-MM-dd; minimal translation
        java = (
            fmt.replace("%Y", "yyyy")
            .replace("%m", "MM")
            .replace("%d", "dd")
            .replace("%H", "HH")
            .replace("%M", "mm")
            .replace("%S", "ss")
        )
        return self._wrap(F.date_format(self._s._expr, java))

    def day_name(self):
        return self._wrap(F.date_format(self._s._expr, "EEEE"))

    def month_name(self):
        return self._wrap(F.date_format(self._s._expr, "MMMM"))


class CategoricalMethods:
    """Categorical accessor (reference ``CategoricalAccessor``,
    ``/root/reference/dask_expr/_categorical.py:14-129``).

    Spark has no categorical dtype (parquet dictionary-encodes strings
    transparently), so the known/unknown-categories state machine reduces
    to: ``categories``/``as_known`` = the eagerly computed distinct values
    (sorted, like pandas' default), and ``codes`` = a broadcast dictionary
    join mapping each value to its category index.  The dictionary is tiny
    by definition (it's a categorical), so the join is always broadcast —
    no shuffle of the data side."""

    def __init__(self, series):
        self._s = series

    @property
    def categories(self) -> list:
        """Distinct values, sorted — the reference's ``as_known`` eager
        uniques computation (``_categorical.py:55-76``)."""
        rows = (
            self._s._frame._sdf.select(self._s._expr.alias("v"))
            .distinct()
            .orderBy("v")
            .collect()
        )
        return [r["v"] for r in rows if r["v"] is not None]

    def as_known(self):
        """No-op state transition in this engine (categories are always
        computable); returns self for API compatibility."""
        return self

    @property
    def codes(self):
        """Category index per row (−1 for null, like pandas)."""
        from .frame import Series

        cats = self.categories
        expr = F.lit(-1)
        for i, c in reversed(list(enumerate(cats))):
            expr = F.when(self._s._expr == F.lit(c), F.lit(i)).otherwise(expr)
        return Series(self._s._frame, expr, self._s.name)

    def rename_categories(self, mapping: dict):
        from .frame import Series

        expr = self._s._expr
        for old, new in mapping.items():
            expr = F.when(self._s._expr == F.lit(old), F.lit(new)).otherwise(expr)
        return Series(self._s._frame, expr, self._s.name)
