"""String / datetime accessors for the Series facade.

Reference: ``StringAccessor`` (~55 delegated methods,
``/root/reference/dask_expr/_str_accessor.py:21-74``) and
``DatetimeAccessor`` (``dask_expr/_datetime.py:15-72``).  Every method is a
pure ``pyspark.sql.functions`` mapping — JVM-side, codegen'd.

Documented deltas from pandas (ASCII-regex approximations noted per
method): ``index``/``rindex`` return −1 instead of raising on a miss;
character-class predicates (``isalpha`` …) are ASCII; ``wrap`` breaks on
whitespace only.
"""

from __future__ import annotations

import re as _re
import string as _string

from pyspark.sql import functions as F


def _as_seq(x) -> list:
    return list(x) if isinstance(x, (list, tuple, set)) else [x]

_MAXLEN = 2_147_483_647


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

    def casefold(self):
        return self._wrap(F.lower(self._s._expr))

    def title(self):
        return self._wrap(F.initcap(self._s._expr))

    def swapcase(self):
        return self._wrap(
            F.translate(
                self._s._expr,
                _string.ascii_lowercase + _string.ascii_uppercase,
                _string.ascii_uppercase + _string.ascii_lowercase,
            )
        )

    # trim / pad
    def strip(self):
        return self._wrap(F.trim(self._s._expr))

    def lstrip(self):
        return self._wrap(F.ltrim(self._s._expr))

    def rstrip(self):
        return self._wrap(F.rtrim(self._s._expr))

    def pad(self, width: int, side: str = "left", fillchar: str = " "):
        """Pandas semantics: strings already >= width pass through
        (Spark's lpad/rpad would truncate them)."""
        e = self._s._expr
        if side == "both":
            return self.center(width, fillchar)
        fn = F.lpad if side == "left" else F.rpad
        return self._wrap(F.when(F.length(e) >= width, e).otherwise(fn(e, width, fillchar)))

    def center(self, width: int, fillchar: str = " "):
        e = self._s._expr
        left = F.floor((F.lit(width) - F.length(e)) / 2).cast("int")
        centered = F.concat(
            F.repeat(F.lit(fillchar), left),
            e,
            F.repeat(F.lit(fillchar), F.lit(width) - F.length(e) - left),
        )
        return self._wrap(F.when(F.length(e) >= width, e).otherwise(centered))

    def ljust(self, width: int, fillchar: str = " "):
        return self.pad(width, side="right", fillchar=fillchar)

    def rjust(self, width: int, fillchar: str = " "):
        return self.pad(width, side="left", fillchar=fillchar)

    def zfill(self, width: int):
        e = self._s._expr
        return self._wrap(F.when(F.length(e) >= width, e).otherwise(F.lpad(e, width, "0")))

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

    def isalnum(self):
        return self._wrap(self._s._expr.rlike("^[A-Za-z0-9]+$"))

    def isdigit(self):
        return self._wrap(self._s._expr.rlike("^[0-9]+$"))

    def isdecimal(self):
        return self._wrap(self._s._expr.rlike("^[0-9]+$"))

    def isnumeric(self):
        return self._wrap(self._s._expr.rlike("^[0-9]+$"))

    def isspace(self):
        return self._wrap(self._s._expr.rlike(r"^\s+$"))

    def islower(self):
        e = self._s._expr
        return self._wrap((e == F.lower(e)) & e.rlike("[a-z]"))

    def isupper(self):
        e = self._s._expr
        return self._wrap((e == F.upper(e)) & e.rlike("[A-Z]"))

    def istitle(self):
        # each cased run starts uppercase then lowercase (ASCII)
        e = self._s._expr
        return self._wrap(
            e.rlike("^[^a-zA-Z]*([A-Z][a-z]*[^a-zA-Z]*)+$") & ~e.rlike("[A-Z][a-z]*[A-Z]")
        )

    def match(self, pat: str):
        return self._wrap(self._s._expr.rlike(f"^(?:{pat})"))

    def fullmatch(self, pat: str):
        return self._wrap(self._s._expr.rlike(f"^(?:{pat})$"))

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

    def findall(self, pat: str):
        return self._wrap(F.regexp_extract_all(self._s._expr, F.lit(pat), 0))

    def extractall(self, pat: str, group: int = 1):
        """All matches of one capture group as an array column (pandas
        returns a MultiIndex frame; flattened here)."""
        return self._wrap(F.regexp_extract_all(self._s._expr, F.lit(pat), group))

    def removeprefix(self, prefix: str):
        e = self._s._expr
        return self._wrap(
            F.when(e.startswith(prefix), F.substring(e, len(prefix) + 1, _MAXLEN)).otherwise(e)
        )

    def removesuffix(self, suffix: str):
        e = self._s._expr
        return self._wrap(
            F.when(
                e.endswith(suffix), F.substring(e, 1, F.length(e) - len(suffix))
            ).otherwise(e)
        )

    def slice_replace(self, start: int = 0, stop: int | None = None, repl: str = ""):
        e = self._s._expr
        tail = F.substring(e, stop + 1, _MAXLEN) if stop is not None else F.lit("")
        return self._wrap(F.concat(F.substring(e, 1, start), F.lit(repl), tail))

    def translate(self, mapping: dict):
        """Character mapping.  Single-char targets and deletions run in one
        JVM ``translate`` pass (deletions last in the from/to strings);
        multi-char targets fall back to literal replaces afterwards, so a
        multi-char replacement value must not contain another mapping key."""
        as_str = lambda c: chr(c) if isinstance(c, int) else c  # noqa: E731
        one = [(as_str(k), as_str(v)) for k, v in mapping.items()
               if v is not None and len(as_str(v)) == 1]
        multi = [(as_str(k), as_str(v)) for k, v in mapping.items()
                 if v is not None and len(as_str(v)) != 1]
        drop = [as_str(k) for k, v in mapping.items() if v is None]
        e = self._s._expr
        if one or drop:
            src = "".join(k for k, _ in one) + "".join(drop)
            dst = "".join(v for _, v in one)
            e = F.translate(e, src, dst)
        for k, v in multi:
            e = F.replace(e, F.lit(k), F.lit(v))
        return self._wrap(e)

    def wrap(self, width: int):
        """Whitespace-break line wrap (pandas/textwrap also breaks long
        words; this keeps them whole)."""
        e = F.regexp_replace(self._s._expr, rf"(.{{1,{width}}})( +|$)", "$1\n")
        return self._wrap(F.regexp_replace(e, r"\n$", ""))

    def decode(self, encoding: str = "utf-8"):
        return self._wrap(F.decode(self._s._expr, encoding))

    def encode(self, encoding: str = "utf-8"):
        return self._wrap(F.encode(self._s._expr, encoding))

    def join(self, sep: str):
        """Element-wise join of array-of-strings values."""
        return self._wrap(F.array_join(self._s._expr, sep))

    def normalize(self, form: str = "NFC"):
        """Unicode normalization — the one accessor method with no JVM
        builtin; Arrow-batched pandas UDF (never row-at-a-time)."""
        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("string")
        def _norm(s: pd.Series) -> pd.Series:
            return s.str.normalize(form)

        return self._wrap(_norm(self._s._expr))

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

    def _expand(self, arr, n: int):
        """Array column → frame with columns 0..n (reference split
        expand=n semantics, ``_str_accessor.py:77-103``)."""
        from .frame import INDEX, SparkFrame

        name = self._s.name or "0"
        sdf = self._s._frame._sdf.select(
            F.col(INDEX),
            *[F.get(arr, i).alias(f"{name}_{i}") for i in range(n + 1)],
        )
        return SparkFrame(sdf)

    def split(self, pat: str = r"\s+", n: int = -1, expand: bool = False):
        limit = n + 1 if n and n > 0 else -1
        arr = F.split(self._s._expr, pat, limit)
        if not expand:
            return self._wrap(arr)
        if n is None or n <= 0:
            raise ValueError("expand=True requires an explicit n")
        return self._expand(arr, n)

    def rsplit(self, pat: str = " ", n: int = -1, expand: bool = False):
        """Right-split on a LITERAL separator (pandas rsplit is not regex):
        split fully, then rejoin everything left of the last n pieces."""
        e = self._s._expr
        full = F.split(e, _re.escape(pat), -1)
        if n is None or n <= 0:
            return self._expand(full, 0) if expand else self._wrap(full)
        sz = F.size(full)
        head = F.array_join(F.slice(full, 1, F.greatest(sz - n, F.lit(0))), pat)
        tail = F.slice(full, F.greatest(sz - n + 1, F.lit(1)), n)
        arr = F.when(sz <= n + 1, full).otherwise(
            F.concat(F.array(head), tail)
        )
        if not expand:
            return self._wrap(arr)
        return self._expand(arr, n)

    def partition(self, sep: str = " "):
        """3-column frame (before, sep, after); unmatched rows → ('', '', s)
        ordering follows pandas (whole string in column 0, empties after)."""
        from .frame import INDEX, SparkFrame

        e = self._s._expr
        pos = F.instr(e, sep)  # 1-based, 0 if absent
        name = self._s.name or "0"
        sdf = self._s._frame._sdf.select(
            F.col(INDEX),
            F.when(pos > 0, F.substring(e, 1, pos - 1)).otherwise(e).alias(f"{name}_0"),
            F.when(pos > 0, F.lit(sep)).otherwise(F.lit("")).alias(f"{name}_1"),
            F.when(pos > 0, F.substring(e, pos + len(sep), _MAXLEN))
            .otherwise(F.lit(""))
            .alias(f"{name}_2"),
        )
        return SparkFrame(sdf)

    def rpartition(self, sep: str = " "):
        from .frame import INDEX, SparkFrame

        e = self._s._expr
        # last occurrence via the reverse trick (see rfind)
        rpos = F.locate(sep[::-1], F.reverse(e))  # 1-based in reversed string
        pos = F.when(rpos > 0, F.length(e) - rpos - len(sep) + 2).otherwise(F.lit(0))
        name = self._s.name or "0"
        sdf = self._s._frame._sdf.select(
            F.col(INDEX),
            F.when(pos > 0, F.substring(e, 1, pos - 1)).otherwise(F.lit("")).alias(f"{name}_0"),
            F.when(pos > 0, F.lit(sep)).otherwise(F.lit("")).alias(f"{name}_1"),
            F.when(pos > 0, F.substring(e, pos + len(sep), _MAXLEN))
            .otherwise(e)
            .alias(f"{name}_2"),
        )
        return SparkFrame(sdf)

    def count(self, pat: str):
        return self._wrap(F.regexp_count(self._s._expr, F.lit(pat)))

    def find(self, sub: str):
        return self._wrap(F.instr(self._s._expr, sub) - 1)

    def rfind(self, sub: str):
        """0-based index of the LAST occurrence, −1 if absent: locate the
        reversed needle in the reversed haystack."""
        e = self._s._expr
        rpos = F.locate(sub[::-1], F.reverse(e))
        return self._wrap(
            F.when(rpos > 0, F.length(e) - rpos - len(sub) + 1).otherwise(F.lit(-1))
        )

    def index(self, sub: str):
        """Like ``find`` (returns −1 instead of raising — documented delta:
        a distributed engine can't raise per-row)."""
        return self.find(sub)

    def rindex(self, sub: str):
        return self.rfind(sub)


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

    _UNITS = {
        "D": ("day", "12 HOUR", "1 DAY"),
        "H": ("hour", "30 MINUTE", "1 HOUR"),
        "h": ("hour", "30 MINUTE", "1 HOUR"),
        "T": ("minute", "30 SECOND", "1 MINUTE"),
        "min": ("minute", "30 SECOND", "1 MINUTE"),
        "S": ("second", "500 MILLISECOND", "1 SECOND"),
        "s": ("second", "500 MILLISECOND", "1 SECOND"),
    }

    def _unit(self, freq: str):
        return self._UNITS.get(freq, (freq, None, f"1 {freq}"))

    def floor(self, freq: str):
        return self._wrap(F.date_trunc(self._unit(freq)[0], self._s._expr))

    def ceil(self, freq: str):
        unit, _, step = self._unit(freq)
        e = self._s._expr
        fl = F.date_trunc(unit, e)
        return self._wrap(F.when(e == fl, e).otherwise(fl + F.expr(f"INTERVAL {step}")))

    def round(self, freq: str):
        """Round-half-up: floor(t + half-interval)."""
        unit, half, _ = self._unit(freq)
        if half is None:
            raise ValueError(f"round not supported for freq {freq!r}")
        return self._wrap(F.date_trunc(unit, self._s._expr + F.expr(f"INTERVAL {half}")))

    _STRFTIME = {
        "%Y": "yyyy", "%y": "yy", "%m": "MM", "%d": "dd", "%H": "HH",
        "%M": "mm", "%S": "ss", "%j": "DDD", "%a": "EEE", "%A": "EEEE",
        "%b": "MMM", "%B": "MMMM", "%f": "SSSSSS", "%%": "%",
    }

    def strftime(self, fmt: str):
        # pandas %-codes → Java SimpleDateFormat pattern
        java = _re.sub(
            "%.", lambda m: self._STRFTIME.get(m.group(0), m.group(0)), fmt
        )
        return self._wrap(F.date_format(self._s._expr, java))

    def day_name(self):
        return self._wrap(F.date_format(self._s._expr, "EEEE"))

    def month_name(self):
        return self._wrap(F.date_format(self._s._expr, "MMMM"))

    @property
    def weekday(self):
        return self.dayofweek

    @property
    def microsecond(self):
        return self._wrap(
            F.pmod(F.unix_micros(self._s._expr.cast("timestamp")), F.lit(1_000_000)).cast("int")
        )

    @property
    def nanosecond(self):
        # engine timestamps are microsecond precision; ns-within-us is 0
        return self._wrap(F.lit(0))

    @property
    def days_in_month(self):
        return self._wrap(F.dayofmonth(F.last_day(self._s._expr)))

    daysinmonth = days_in_month

    @property
    def is_quarter_start(self):
        e = self._s._expr
        return self._wrap((F.month(e) % 3 == 1) & (F.dayofmonth(e) == 1))

    @property
    def is_quarter_end(self):
        e = self._s._expr
        return self._wrap((F.month(e) % 3 == 0) & (F.to_date(e) == F.last_day(e)))

    @property
    def is_year_start(self):
        e = self._s._expr
        return self._wrap((F.month(e) == 1) & (F.dayofmonth(e) == 1))

    @property
    def is_year_end(self):
        e = self._s._expr
        return self._wrap((F.month(e) == 12) & (F.dayofmonth(e) == 31))

    @property
    def is_leap_year(self):
        y = F.year(self._s._expr)
        return self._wrap(((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0))

    @property
    def time(self):
        """Time-of-day as HH:mm:ss string (Spark has no time type)."""
        return self._wrap(F.date_format(self._s._expr, "HH:mm:ss"))

    def normalize(self):
        return self._wrap(F.date_trunc("day", self._s._expr))

    def total_seconds(self):
        """Timedelta accessor (reference ``_accessor.py`` td namespace /
        ``_expr.py:1090`` ToTimedelta consumers): exact seconds (with
        fraction) of a ``DayTimeIntervalType`` column built by
        ``Series.to_timedelta`` or timestamp subtraction."""
        e = self._s._expr
        part = lambda f: F.date_part(F.lit(f), e)  # noqa: E731
        whole = ((part("DAY") * 24 + part("HOUR")) * 60 + part("MINUTE")) * 60
        return self._wrap(whole.cast("double") + part("SECOND").cast("double"))


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

    # -- known/unknown state machine (reference _categorical.py:55-76) -----
    # The category dictionary is cached on the Series (``_cat_known``);
    # ``as_known`` computes it once (one distinct job) and every later
    # ``categories``/``codes`` access reuses it without re-scanning.

    @property
    def known(self) -> bool:
        """True when the category dictionary has been computed and cached
        (reference ``known`` property)."""
        return getattr(self._s, "_cat_known", None) is not None

    def _compute_categories(self) -> list:
        rows = (
            self._s._frame._sdf.select(self._s._expr.alias("v"))
            .distinct()
            .orderBy("v")
            .collect()
        )
        return [r["v"] for r in rows if r["v"] is not None]

    @property
    def categories(self) -> list:
        """The cached dictionary when known, else the reference's
        ``as_known`` eager uniques computation (``_categorical.py:55-76``)."""
        cached = getattr(self._s, "_cat_known", None)
        return list(cached) if cached is not None else self._compute_categories()

    def as_known(self):
        """Compute and attach the category dictionary (reference
        ``as_known``): one distinct+sort job; subsequent ``categories`` /
        ``codes`` reuse it for free."""
        from .frame import Series

        out = Series(self._s._frame, self._s._expr, self._s.name)
        out._cat_known = self._compute_categories()
        return out

    def as_unknown(self):
        """Drop the cached dictionary (reference ``as_unknown``)."""
        from .frame import Series

        return Series(self._s._frame, self._s._expr, self._s.name)

    def set_categories(self, categories) -> "object":
        """Attach an explicit dictionary without a scan (reference
        ``set_categories``): values outside it code to −1, like pandas."""
        from .frame import Series

        out = Series(self._s._frame, self._s._expr, self._s.name)
        out._cat_known = list(categories)
        return out

    def add_categories(self, new) -> "object":
        cats = self.categories + [c for c in _as_seq(new) if c not in self.categories]
        return self.set_categories(cats)

    def remove_categories(self, drop) -> "object":
        drop_set = set(_as_seq(drop))
        return self.set_categories([c for c in self.categories if c not in drop_set])

    @property
    def codes(self):
        """Category index per row (−1 for null / out-of-dictionary, like
        pandas).  Uses the cached dictionary when known — no extra scan."""
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
