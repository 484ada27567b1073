"""Distributed exact order-statistic selection (grouped lower median).

The robust-stats queries (``robust_outliers_by_type``,
``robust_anomaly_flags_daily``) need the LOWER MEDIAN of a value column
per group — rank ``(n+1) div 2`` in the group's sorted multiset, chosen
over interpolated medians because it is float-interpolation-free and
hash-matches any engine.

The straightforward formulation (``row_number`` window per group) is
correct but its parallelism ceiling is the number of GROUPS: a window
``PARTITION BY event_type`` sorts every row of a type on ONE task, so 5
event types at 20 B rows = 5 tasks sorting 4 B rows each — the round-8
scale-defect fix (the sf1→sf10 scan flagged 9.9× growth at 10× data).

``grouped_lower_median`` keeps the window path for small inputs (fewer
stages win at bench scale) and switches to a two-phase exact selection —
the classic distributed k-th-element algorithm — above ``path_b_bytes``:

1. histogram: ``(group, bucket) → count`` with ``bucket = floor(value ×
   1024)`` — ONE map-side-combinable aggregate whose output is bounded by
   value-range × 1024 buckets per group, independent of row count;
2. locate: a cumulative sum over the (tiny) histogram finds each group's
   median bucket and the count of rows below it;
3. pick: rows of the median bucket only (a broadcast-semi-join-sized
   fetch) are aggregated per distinct value — map-side combinable, and
   heavy-hitter values COLLAPSE instead of concentrating a sort task —
   then one cumulative count over that per-bucket value list selects the
   ``k − below``-th element.

Exactness: identical to the window form — the value at a given rank of a
sorted multiset does not depend on tie order.  Determinism: counts are
integers; ``floor`` on doubles is IEEE-exact; no float accumulation
anywhere.  Contract: bucket resolution is 1/1024 of the value unit — a
distribution packed entirely inside one bucket degenerates to the
single-bucket sort (a second refinement level would fix; not needed for
the engine's telemetry-shaped data).  Finite values >= ~4.5e15 (where
``floor(v*1024)`` would pass the 1<<62 NaN sentinel) are clamped into the
top finite bucket — same single-bucket degeneracy, same exact answer —
so NaN-sorts-last holds over the FULL double range, not just the
telemetry envelope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

#: switch to the selection path above this input size (bench scales keep
#: the 2-stage window plan; rehearsal scales get group-independent
#: parallelism) — same gating pattern as the NB shuffle sizing (ml.py)
DEFAULT_PATH_B_BYTES = 64 << 20

_BUCKETS_PER_UNIT = 1024


def _window_lower_median(df: DataFrame, group: str, col: str, out: str) -> DataFrame:
    w = W.partitionBy(group).orderBy(col)
    wn = W.partitionBy(group)
    ranked = df.select(
        group,
        F.col(col),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return (
        ranked.filter(F.col("rn") == F.expr("(n + 1) DIV 2"))
        .groupBy(group)
        .agg(F.min(col).alias(out))
    )


def _selection_lower_median(df: DataFrame, group: str, col: str, out: str) -> DataFrame:
    # NULL/NaN contract must MATCH the window form (round-8 review fix):
    # Spark's ascending sort puts NULL first and NaN last, so NULL maps
    # to the NULL bucket (window cum-sum orders nulls first by default;
    # the bucket join below is null-safe) and NaN to a +inf sentinel
    # bucket.  A majority-NULL group then yields a NULL median from
    # either path instead of vanishing from the selection output.
    # Finite-value envelope: floor(v*1024) exceeds the 1<<62 NaN sentinel
    # for v >= ~4.5e15 (and a double->long cast saturates at Long.MAX), so
    # finite buckets are clamped to (1<<62)-1.  Values above the clamp all
    # land in that single top bucket — the per-VALUE pick inside the median
    # bucket keeps the result exact (single-bucket degeneracy, documented
    # in the module contract above); NaN stays strictly above every finite
    # bucket, matching the window path's NaN-sorts-last semantics.
    dtype = dict(df.dtypes)[col]
    raw = F.least(
        F.floor(F.col(col) * _BUCKETS_PER_UNIT).cast("long"),
        F.lit((1 << 62) - 1),
    )
    if dtype in ("double", "float"):
        b = F.when(F.isnan(F.col(col)), F.lit(1 << 62)).otherwise(raw)
    else:
        b = raw
    src = df.select(F.col(group), F.col(col), b.alias("__b__"))
    hist = src.groupBy(group, "__b__").agg(F.count(F.lit(1)).alias("__c__"))
    wcum = W.partitionBy(group).orderBy("__b__")
    wtot = W.partitionBy(group)
    located = hist.select(
        group,
        "__b__",
        "__c__",
        (F.sum("__c__").over(wcum) - F.col("__c__")).alias("__below__"),
        F.floor((F.sum("__c__").over(wtot) + F.lit(1)) / F.lit(2))
        .cast("long")
        .alias("__k__"),
    )
    mb = located.filter(
        (F.col("__below__") < F.col("__k__"))
        & (F.col("__below__") + F.col("__c__") >= F.col("__k__"))
    ).select(
        group, F.col("__b__").alias("__mb__"), "__below__", "__k__"
    )
    # rows of the median bucket only; heavy-hitter values collapse in the
    # per-value aggregate instead of landing on one sort task
    inb = src.join(F.broadcast(mb), [group]).filter(
        F.col("__b__").eqNullSafe(F.col("__mb__"))
    )
    vc = inb.groupBy(group, col, "__below__", "__k__").agg(
        F.count(F.lit(1)).alias("__vc__")
    )
    wv = W.partitionBy(group).orderBy(col)
    picked = vc.select(
        group,
        F.col(col),
        "__below__",
        "__k__",
        "__vc__",
        F.sum("__vc__").over(wv).alias("__cum__"),
    ).filter(
        (F.col("__below__") + F.col("__cum__") >= F.col("__k__"))
        & (F.col("__below__") + F.col("__cum__") - F.col("__vc__") < F.col("__k__"))
    )
    return picked.groupBy(group).agg(F.min(col).alias(out))


def grouped_lower_median(
    df: DataFrame,
    group: str,
    col: str,
    out: str,
    input_bytes: int | None = None,
    path_b_bytes: int | None = None,
    force: str | None = None,
) -> DataFrame:
    """``(group, out)`` with ``out`` = the group's lower median of ``col``.

    ``input_bytes`` (e.g. the source parquet size — driver-side metadata
    only) chooses the plan: window form below ``path_b_bytes`` (default
    ``DEFAULT_PATH_B_BYTES``, read at CALL time so tests can force the
    scale path module-wide), distributed selection above it.  ``force`` =
    ``"window"`` / ``"selection"`` pins a path per call (tests
    differential-compare the two)."""
    if path_b_bytes is None:
        path_b_bytes = DEFAULT_PATH_B_BYTES
    if force == "window":
        return _window_lower_median(df, group, col, out)
    if force == "selection":
        return _selection_lower_median(df, group, col, out)
    if input_bytes is not None and input_bytes > path_b_bytes:
        return _selection_lower_median(df, group, col, out)
    return _window_lower_median(df, group, col, out)
