"""Named query registry — the driver-facing surface.

Every operator from SURVEY.md §2 is exercised by at least one named query
here; each query carries an ANSI-SQL twin the DuckDB oracle runs on the same
parquet tables (driver contract in ``/root/repo/__spark_entry__.py``).

Import order matters only for registration side effects.
"""

from .registry import REGISTRY, Query, register, queries, oracle_sql

# Registration order = driver verification order (the driver's CORRECTNESS
# window covers the first 50 registered queries).  Round 3: the relational
# core (q01-q22, aggregates, window — last driver-verified on round-1 code,
# see CORRECTNESS_r01.json) registers FIRST so it is re-verified against the
# round-2/3 shared-machinery changes; the LLM-pipeline / breadth queries
# (driver-verified on round-2 code, CORRECTNESS_r02.json) follow.
from . import relational  # noqa: E402,F401
from . import tpch_ext  # noqa: E402,F401
from . import aggregates  # noqa: E402,F401
from . import window  # noqa: E402,F401
from . import text  # noqa: E402,F401
from . import dedup_ext  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401
from . import streaming  # noqa: E402,F401
from . import breadth  # noqa: E402,F401
from . import frame_api  # noqa: E402,F401
from . import round2  # noqa: E402,F401
from . import round3  # noqa: E402,F401

__all__ = ["REGISTRY", "Query", "register", "queries", "oracle_sql"]
