"""Physical-plan introspection utilities — the engine's scale guard rails.

Where the engine relies on a Catalyst behavior for 100-TB viability
(pushdown reaching the scan, broadcast selection, partial aggregation,
no cartesian products, no row-at-a-time Python), these helpers read the
plan so tests — and users auditing a query — can pin it.

This is the Spark analog of the reference's optimizer-structure
introspection (``/root/reference/dask_expr/io/tests/test_io.py:117-123``
asserts projections land inside ReadParquet operands); here the optimizer
is Catalyst, so the checks read ``df.explain`` output instead of an Expr
tree.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame

__all__ = [
    "plan_of",
    "pushed_filters",
    "read_schema",
    "has_cartesian_product",
    "has_python_row_udf",
    "count_broadcast_exchanges",
    "count_shuffle_exchanges",
    "audit",
]


def plan_of(df: DataFrame, mode: str = "formatted") -> str:
    """``df.explain(mode)`` as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """The ``PushedFilters`` entries of every scan in the plan — empty
    means no predicate reached the parquet reader."""
    out: list[str] = []
    for line in plan_of(df).splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            body = line.removeprefix("PushedFilters:").strip().strip("[]")
            out.extend(p.strip() for p in body.split(",") if p.strip())
    return out


def read_schema(df: DataFrame) -> list[str]:
    """Column names each scan actually reads (``ReadSchema``) — the
    column-pruning witness: a 2-column projection must not read 16."""
    cols: list[str] = []
    for line in plan_of(df).splitlines():
        if "ReadSchema:" in line:
            body = line.split("ReadSchema:", 1)[1]
            inner = body[body.find("<") + 1 : body.rfind(">")]
            depth = 0
            field = []
            for ch in inner:
                if ch == "<":
                    depth += 1
                elif ch == ">":
                    depth -= 1
                if ch == "," and depth == 0:
                    cols.append("".join(field).split(":", 1)[0])
                    field = []
                else:
                    field.append(ch)
            if field:
                cols.append("".join(field).split(":", 1)[0])
    return cols


def has_cartesian_product(df: DataFrame) -> bool:
    """True if the plan contains an unconstrained CartesianProduct — the
    one O(n²) plan shape that cannot survive scale.  (Broadcast
    nested-loop against a tiny side is NOT flagged.)"""
    return "CartesianProduct" in plan_of(df, "simple")


def has_python_row_udf(df: DataFrame) -> bool:
    """True if the plan evaluates a row-at-a-time Python UDF
    (``BatchEvalPython``); Arrow-batched pandas UDFs (``ArrowEvalPython``
    / ``mapInPandas``) are the allowed Python path."""
    return "BatchEvalPython" in plan_of(df, "simple")


def count_broadcast_exchanges(df: DataFrame) -> int:
    return plan_of(df).count("BroadcastExchange")


def count_shuffle_exchanges(df: DataFrame) -> int:
    plan = plan_of(df)
    return plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    ) + plan.count("Exchange RoundRobinPartitioning")


def audit(df: DataFrame) -> dict:
    """One-call scale audit of a DataFrame's physical plan: the checks
    the engine's own plan-shape tests enforce, surfaced as a user-facing
    report (run it on a new query before pointing it at 100 TB).

    Returns ``{"hazards": [...], "stats": {...}}``.  Hazards:

    * ``cartesian_product`` — an unconstrained O(n²) join.
    * ``python_row_udf`` — row-at-a-time Python in the hot path
      (``BatchEvalPython``); rewrite as built-ins or an Arrow UDF.
    * ``scan_without_pruning`` — a parquet scan that reads 12+ columns
      with no pushed filter: usually a missing projection/filter (a
      full-width scan is sometimes intended — judge with the stats).

    Stats: shuffle/broadcast exchange counts, scans, pushed filter and
    read-schema summaries, whole-stage-codegen span count, and the
    Python-eval node count — the numbers to compare when choosing
    between two formulations of the same query.
    """
    plan = plan_of(df)
    hazards: list[str] = []
    if has_cartesian_product(df):
        hazards.append("cartesian_product")
    if has_python_row_udf(df):
        hazards.append("python_row_udf")
    pushed = pushed_filters(df)
    cols = read_schema(df)
    # formatted explain lists each node twice (tree + detail) — halve
    n_scans = plan.count("Scan parquet") // 2
    if n_scans and not pushed and len(cols) >= 12:
        hazards.append("scan_without_pruning")
    return {
        "hazards": hazards,
        "stats": {
            "shuffle_exchanges": count_shuffle_exchanges(df) // 2,
            "broadcast_exchanges": count_broadcast_exchanges(df) // 2,
            "parquet_scans": n_scans,
            "pushed_filters": pushed,
            "read_columns": sorted(set(cols)),
            "codegen_spans": plan.count("WholeStageCodegen") // 2,
            "arrow_python_evals": plan.count("ArrowEvalPython") // 2,
        },
    }
