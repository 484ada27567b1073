"""dask_expr_rapids_spark — a PySpark-native analytics engine with the
query surface of rjzamora/dask-expr-rapids (reference at /root/reference).

Architecture (SURVEY.md §7): Spark DataFrame *is* the lazy IR and Catalyst
*is* the optimizer — the reference's Expr tree, simplify/lower/fuse passes,
and shuffle machinery all map onto stock Spark (SURVEY.md §4.1).  This
package provides:

* ``session``   — scale-tuned SparkSession factory (AQE, pushdown, Arrow);
* ``sources``   — parquet/csv/in-memory/synthetic sources and sinks;
* ``functions`` — exact (order-independent) float aggregation + text fns;
* ``queries``   — the named query registry (driver/oracle surface);
* ``operators`` — composable DataFrame transforms (dedup, similarity,
  pandas-style index ops, rolling/resample helpers);
* ``plans``     — plan-shape assertions (pushdown/broadcast verification).
"""

from .session import get_spark
from .queries import queries, oracle_sql, REGISTRY

__version__ = "0.1.0"

__all__ = ["get_spark", "queries", "oracle_sql", "REGISTRY", "__version__"]
