"""Range (interval) join — match points to containing intervals.

The reference has no range join (equi-joins only — validated at
``/root/reference/dask_expr/_collection.py:2122-2127``); Spark's native
answer to ``ON p.t BETWEEN i.lo AND i.hi`` without an equi-key is
BroadcastNestedLoopJoin (fine when one side is broadcast-small) or a
cartesian (disqualifying).  This module adds the scale path:

**Bucketed interval join**: quantize time into fixed-width buckets;
intervals explode into the buckets they cover, points map to exactly one
bucket; equi-join on the bucket id, then apply the exact range predicate.
Each interval of width w produces ceil(w/bucket)+1 rows — bounded
replication, an equi-shuffle instead of a nested loop, and the exact
filter discards boundary false-candidates.  Same plan shape Spark itself
would pick with a storage-level interval index; here it is explicit and
engine-independent.

Choosing ``bucket``: ~ the median interval width.  Too small → interval
replication grows; too big → more false candidates per bucket.  Both
degrade linearly, never quadratically — the worst case is a dense bucket,
capped by AQE skew splitting on the equi-shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKET = "__rj_bucket__"


def _bucket_of(col: Column, bucket_seconds: int) -> Column:
    # floor (not cast) so pre-1970 timestamps bucket to the earlier boundary
    return F.floor(F.unix_micros(col.cast("timestamp")) / (bucket_seconds * 1_000_000)).cast(
        "long"
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    lo: str,
    hi: str,
    bucket_seconds: int = 3600,
    extra_keys: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``lo <= point_ts <= hi`` (and equal ``extra_keys``, if given).

    Output: all point columns + all interval columns (caller aliases
    collisions beforehand).  ``how='inner'`` only — the bucket explode
    makes outer semantics ambiguous; wrap with an anti-join for "points in
    no interval".
    """
    if how != "inner":
        raise ValueError(f"interval_join supports how='inner' only, got {how!r}")
    keys = list(extra_keys or [])

    lo_b = _bucket_of(F.col(lo), bucket_seconds)
    hi_b = _bucket_of(F.col(hi), bucket_seconds)
    exploded = intervals.withColumn(_BUCKET, F.explode(F.sequence(lo_b, hi_b)))
    pts = points.withColumn(_BUCKET, _bucket_of(F.col(point_ts), bucket_seconds))

    joined = pts.join(exploded, [*keys, _BUCKET], "inner").filter(
        (F.col(point_ts) >= F.col(lo)) & (F.col(point_ts) <= F.col(hi))
    )
    return joined.drop(_BUCKET)
