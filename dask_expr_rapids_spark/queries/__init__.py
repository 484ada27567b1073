"""Named query registry — the driver-facing surface.

Every operator from SURVEY.md §2 is exercised by at least one named query
here; each query carries an ANSI-SQL twin the DuckDB oracle runs on the same
parquet tables (driver contract in ``/root/repo/__spark_entry__.py``).

Import order matters only for registration side effects.
"""

from .registry import REGISTRY, Query, register, queries, oracle_sql

# Registration order = driver verification order (the driver's CORRECTNESS
# window covers the first 50 registered queries).  Round 5 rotation: the
# relational core (relational/tpch_ext/aggregates/window = 50) was hash-
# verified on CURRENT code in CORRECTNESS_r04, so the 45 LLM-pipeline /
# breadth / round-2/3 queries (last driver-green on round-2 code, five of
# them never driver-verified) register FIRST, followed by the new round-5
# queries — together exactly the 50-query window.  The relational core
# closes the list (still locally oracle-checked every run by
# tests/test_correctness.py).
from . import text  # noqa: E402,F401
from . import dedup_ext  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401
from . import streaming  # noqa: E402,F401
from . import breadth  # noqa: E402,F401
from . import frame_api  # noqa: E402,F401
from . import round2  # noqa: E402,F401
from . import round3  # noqa: E402,F401
from . import round5  # noqa: E402,F401
from . import relational  # noqa: E402,F401
from . import tpch_ext  # noqa: E402,F401
from . import aggregates  # noqa: E402,F401
from . import window  # noqa: E402,F401

__all__ = ["REGISTRY", "Query", "register", "queries", "oracle_sql"]
