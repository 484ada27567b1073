"""Skew-mitigation operators for hot-key aggregations and joins.

AQE's skew-join splitting (enabled in session.py) handles most runtime
skew; these helpers cover the two cases AQE can't: (a) a groupBy where one
key holds a large fraction of all rows and the *post-shuffle per-key agg
state* is the bottleneck (collect_set, countDistinct, large maps — plain
sum/count skew is already fixed by Spark's map-side partial aggregation),
and (b) a shuffle join against a dimension too big to broadcast that has a
handful of pathologically hot keys.

Both use deterministic salting (hash-derived, not random) so results are
reproducible and resumable — no ``rand()`` in the engine, ever.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def add_salt(df: DataFrame, salt_cols: Sequence[str], buckets: int) -> DataFrame:
    """Deterministic per-row salt in [0, buckets): xxhash64 of stable
    identity columns — spreads a hot key uniformly without RNG."""
    return df.withColumn("__salt__", F.pmod(F.xxhash64(*salt_cols), F.lit(buckets)))


def salted_groupby_agg(
    df: DataFrame,
    by: Sequence[str],
    stage1: dict[str, Column],
    stage2: dict[str, Column],
    salt_cols: Sequence[str],
    buckets: int = 32,
) -> DataFrame:
    """Two-stage aggregation for skewed group keys.

    Stage 1 groups by (key, salt) — a hot key spreads over ``buckets``
    reducers; stage 2 merges the partials by key alone.  The caller states
    the decomposition explicitly (the same contract as the reference's
    chunk/aggregate pairs, ``/root/reference/dask_expr/_reductions.py:
    353-475``): e.g. count → stage1 ``F.count(...)``, stage2
    ``F.sum("n")``; distinct-count → stage1 ``F.collect_set``, stage2
    ``F.size(F.array_distinct(F.flatten(F.collect_list(...))))``.

    Example::

        salted_groupby_agg(
            events, ["event_type"],
            stage1={"n": F.count(F.lit(1)), "users": F.collect_set("user_id")},
            stage2={"n": F.sum("n"),
                    "users": F.size(F.array_distinct(F.flatten(F.collect_list("users"))))},
            salt_cols=["event_id"], buckets=32,
        )
    """
    salted = add_salt(df, salt_cols, buckets)
    partial = salted.groupBy(*by, "__salt__").agg(
        *[expr.alias(name) for name, expr in stage1.items()]
    )
    return partial.groupBy(*by).agg(
        *[expr.alias(name) for name, expr in stage2.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed shuffle join: salt the big side's join key into ``buckets``
    sub-keys (deterministically, from the whole row) and replicate the
    small side once per bucket, so a hot key spreads over ``buckets``
    reducers instead of hot-spotting one.

    Cost: small side × ``buckets`` replication — use when the small side
    is too big for broadcast but ≪ the big side.  For one-sided skew AQE's
    ``skewJoin`` (on in session.py) usually suffices; this is the explicit
    fallback for stable hot keys known in advance.

    Only ``inner`` and ``left`` are supported: with ``right``/``full``,
    an unmatched small-side row survives once per replica, multiplying
    right-only rows by ``buckets``.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "replicated small-side rows would duplicate right-only output"
        )
    big_s = add_salt(big, list(big.columns), buckets)
    rep = small.withColumn(
        "__salt__", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return big_s.join(rep, [on, "__salt__"], how).drop("__salt__")
