"""As-of (nearest-key temporal) join — a pandas ``merge_asof`` analog.

The reference engine has NO as-of join (``merge_asof`` appears nowhere in
``/root/reference/dask_expr/_collection.py``); this is a pure extension —
one of the canonical "operators Spark lacks" a production time-series /
event pipeline needs.

Scale design — the union + window trick, NOT a join:

A naive formulation (range join + per-row argmax) explodes to
|left| × |matching right| intermediate rows before pruning — quadratic on
hot keys, a skew bomb at 100 TB.  Instead both sides are unioned with a
side marker and a single window pass per key carries the most recent
right-side payload forward::

    union(right tagged 0, left tagged 1)
      → window PARTITION BY by ORDER BY (on, side_rank)
      → last(payload, ignorenulls=True) ROWS UNBOUNDED PRECEDING..CURRENT
      → keep left rows

One shuffle (on the ``by`` key), zero row amplification, monotone state —
the same shape Spark itself uses for sort-merge, and it survives skew
because a hot key costs O(rows-in-key), never O(rows²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: internal marker columns (dropped before return)
_SIDE = "__asof_side__"


def merge_asof(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str] | None = None,
    direction: str = "backward",
    allow_exact_matches: bool = True,
    right_prefix: str = "asof_",
) -> DataFrame:
    """For every left row, attach the right row whose ``on`` value is the
    closest at-or-before it (``backward``) or at-or-after it (``forward``),
    within the same ``by`` group.  Left rows with no match keep nulls
    (pandas ``merge_asof`` left-join semantics).

    Right payload columns (everything except ``by``) come back prefixed
    with ``right_prefix`` to avoid collisions; the matched right ``on``
    value is ``{right_prefix}{on}``.

    Null semantics (pandas ``merge_asof`` REJECTS nulls; a distributed
    engine must define them instead): right rows with null ``on`` are
    dropped (they can never legitimately match), left rows with null
    ``on`` survive with a null match (nulls-first ordering keeps them
    ahead of every right row in BOTH directions), and null ``by`` keys
    group together (Spark partitioning semantics).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by_cols = [by] if isinstance(by, str) else list(by or [])
    right = right.filter(F.col(on).isNotNull())

    payload_cols = [c for c in right.columns if c not in by_cols]
    out_payload = [f"{right_prefix}{c}" for c in payload_cols]

    # side ordering decides whether an exactly-equal right row is visible:
    # visible ⇒ right sorts BEFORE left at equal `on` (so the window's
    # CURRENT ROW includes it), invisible ⇒ after.
    right_rank = 0 if allow_exact_matches else 2
    left_only = [c for c in left.columns if c not in by_cols and c != on]
    cols_order = [*by_cols, on, _SIDE, *left_only, *out_payload]

    tagged_right = right.select(
        *[F.col(c) for c in by_cols],
        F.col(on),
        F.lit(right_rank).alias(_SIDE),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_only],
        *[F.col(c).alias(o) for c, o in zip(payload_cols, out_payload)],
    )
    tagged_left = left.select(
        *[F.col(c) for c in [*by_cols, on]],
        F.lit(1).alias(_SIDE),
        *[F.col(c) for c in left_only],
        *[F.lit(None).cast(right.schema[c].dataType).alias(o) for c, o in zip(payload_cols, out_payload)],
    )
    unioned = tagged_right.select(*cols_order).unionByName(tagged_left.select(*cols_order))

    asc = direction == "backward"
    # nulls FIRST in both directions: a null-`on` left row must precede
    # every (non-null) right row so its carried payload stays null
    order = [
        F.col(on).asc_nulls_first() if asc else F.col(on).desc_nulls_first(),
        F.col(_SIDE).asc(),
    ]
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *[c for c in cols_order if c not in out_payload],
        *[F.last(F.col(o), ignorenulls=True).over(w).alias(o) for o in out_payload],
    )
    return carried.filter(F.col(_SIDE) == 1).drop(_SIDE)
