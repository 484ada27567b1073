"""Sequence packing: assign documents to fixed-capacity training sequences.

A training pipeline turns a deduped corpus into fixed-length token
sequences; the packing step decides which documents share a sequence.  The
reference has no packing operator (its surface stops at the pandas algebra,
``/root/reference/dask_expr/_collection.py``); this is part of the LLM-data
extension layer.

Strategy: **contiguous block packing** — documents are laid out in a
deterministic order (``order_col``) and a document whose running prefix sum
starts in block ``k`` of ``capacity`` tokens belongs to sequence ``k``
(``seq_id = floor(prefix_sum_before / capacity)``).  A sequence may
overflow by at most one document's tail, which the trainer truncates or
wraps — the standard trade-off that keeps packing a *single window
function* instead of a sequential first-fit scan that cannot be expressed
as a distributed plan.

Scale design (100 TB posture): the window partitions by ``group_cols``
(shard/source), so packing parallelizes across groups and no global sort
exists.  Each group's sort is a shuffle on the group key + local sort —
exactly what ``repartition + sortWithinPartitions`` would do by hand.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    size_col: str | Column,
    capacity: int,
    group_cols: Sequence[str] = (),
    order_col: str = "doc_id",
    out_col: str = "seq_id",
) -> DataFrame:
    """Add ``out_col``: the 0-based sequence index each row packs into.

    ``size_col`` is the row's token (or char) count; ``capacity`` the
    sequence budget.  Deterministic: depends only on (group, order) — stable
    under repartition and identical across engines (integer prefix sums).
    """
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    size = F.col(size_col) if isinstance(size_col, str) else size_col
    w = (
        W.partitionBy(*group_cols)
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(size).over(w), F.lit(0).cast("long"))
    return df.withColumn(out_col, F.floor(cum_before / F.lit(capacity)).cast("bigint"))
